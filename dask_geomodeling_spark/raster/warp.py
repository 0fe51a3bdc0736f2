"""Warp raster responses to the request grid (reference:
raster/base.py:9 — ``get_data`` returns a width x height numpy stack in
the REQUEST projection at the request resolution for any bbox; GDAL
performs the warp inside RasterFileSource, raster/sources.py:396).

Spark-first warp, no GDAL: the target grid is a ``spark.range``-derived
frame of ``width * height`` rows (never driver data), each target cell
center inverse-transforms into the source CRS through the SAME
closed-form SQL strings the Reproject operator evaluates
(geometry/proj.py point_transform_sql — shared verbatim with the DuckDB
oracles), floor-snaps to the native unit-cell index, and one
broadcast-grid equi-join against the bbox-pruned source scan resamples
nearest-neighbor.  Map-side expand + one broadcast join: the large
(source) side never shuffles, and the child request carries the
transformed envelope so partition/row-group pruning still applies at
100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import BaseSingle

__all__ = ["Warp", "warp_grid_sql", "warp_bilinear_sql",
           "warp_average_sql", "cubic_weight_sql"]


def _center_sql(dst_crs, native_crs, bbox, width, height):
    """Raw engine-portable SQL pair: the continuous native-CRS
    coordinates of target cell center ``(_i, _j)``."""
    from dask_geomodeling_spark.geometry.proj import point_transform_sql
    x1, y1, x2, y2 = (float(v) for v in bbox)
    dx = (x2 - x1) / int(width)
    dy = (y2 - y1) / int(height)
    cx = ("(CAST({x1!r} AS DOUBLE) + (CAST(_i AS DOUBLE) + 0.5) "
          "* CAST({dx!r} AS DOUBLE))").format(x1=x1, dx=dx)
    cy = ("(CAST({y1!r} AS DOUBLE) + (CAST(_j AS DOUBLE) + 0.5) "
          "* CAST({dy!r} AS DOUBLE))").format(y1=y1, dy=dy)
    dst = str(dst_crs).upper()
    native = str(native_crs).upper()
    if dst == native:
        return cx, cy
    return point_transform_sql(dst, native, cx, cy)


def warp_grid_sql(dst_crs, native_crs, bbox, width, height):
    """The portable SQL pair ``(snap_x, snap_y)`` mapping a target grid
    cell ``(_i, _j)`` — column i of ``width``, row j of ``height`` over
    ``bbox`` in ``dst_crs`` — onto the floor-snapped native unit-cell
    index in ``native_crs``.  Shared verbatim between the Spark plan
    and the DuckDB oracles (the reprojection-oracle contract), hence
    engine-portable SQL only.  ROUND(6) (µm) before the floor absorbs
    the 1-ulp ln/tan drift between the JVM and libm so both engines
    snap identically."""
    sx, sy = _center_sql(dst_crs, native_crs, bbox, width, height)
    return ("CAST(FLOOR(ROUND({}, 6)) AS BIGINT)".format(sx),
            "CAST(FLOOR(ROUND({}, 6)) AS BIGINT)".format(sy))


def warp_bilinear_sql(dst_crs, native_crs, bbox, width, height):
    """The portable SQL pair ``(fx, fy)``: continuous native-CELL
    coordinates of the target cell center shifted by the half-cell so
    ``floor(f)`` is the left/lower neighbor's index and ``f −
    floor(f)`` is that axis's interpolation weight toward the
    right/upper neighbor (native cell (x, y) is the unit square
    [x, x+1)×[y, y+1), center x+0.5).  ROUND(6) before use pins the
    1-ulp cross-engine drift exactly like the nearest path."""
    sx, sy = _center_sql(dst_crs, native_crs, bbox, width, height)
    return ("ROUND({} - 0.5, 6)".format(sx),
            "ROUND({} - 0.5, 6)".format(sy))


def warp_average_sql(native_crs, dst_crs, bbox, width, height):
    """The portable SQL pair ``(i, j)`` binning a native cell's center
    ``(x + 0.5, y + 0.5)`` into the target grid — the 'average'
    algorithm's forward direction (source→grid).  Shared verbatim with
    the DuckDB oracles; ROUND(6) before the floor pins cross-engine
    ulp drift exactly like the nearest path."""
    from dask_geomodeling_spark.geometry.proj import point_transform_sql
    x1, y1, x2, y2 = (float(v) for v in bbox)
    dx = (x2 - x1) / int(width)
    dy = (y2 - y1) / int(height)
    cx, cy = "(CAST(x AS DOUBLE) + 0.5)", "(CAST(y AS DOUBLE) + 0.5)"
    native, dst = str(native_crs).upper(), str(dst_crs).upper()
    if native != dst:
        cx, cy = point_transform_sql(native, dst, cx, cy)
    i = ("CAST(FLOOR(ROUND(({cx} - CAST({x1!r} AS DOUBLE)) "
         "/ CAST({dx!r} AS DOUBLE), 6)) AS BIGINT)").format(
        cx=cx, x1=x1, dx=dx)
    j = ("CAST(FLOOR(ROUND(({cy} - CAST({y1!r} AS DOUBLE)) "
         "/ CAST({dy!r} AS DOUBLE), 6)) AS BIGINT)").format(
        cy=cy, y1=y1, dy=dy)
    return i, j


def cubic_weight_sql(frac, sel):
    """Keys cubic-convolution (a = −0.5, GDAL 'cubic') weight of the
    4-tap corner selected by ``sel`` ∈ {0,1,2,3} (native offsets
    −1, 0, 1, 2) given the fractional coordinate expression ``frac``
    ∈ [0, 1).  ONE textual formula shared verbatim between the Spark
    plan and the DuckDB oracles so both engines evaluate the identical
    IEEE operation sequence:
    near taps (|t| ≤ 1): 1.5t³ − 2.5t² + 1; far taps: −0.5t³ + 2.5t²
    − 4t + 2."""
    def near(t):
        return ("(1.5 * {t} * {t} * {t} - 2.5 * {t} * {t} + 1.0)"
                .format(t=t))

    def far(t):
        return ("(-0.5 * {t} * {t} * {t} + 2.5 * {t} * {t} "
                "- 4.0 * {t} + 2.0)".format(t=t))

    return ("(CASE WHEN {s} = 0 THEN {w_m1} WHEN {s} = 1 THEN {w_0} "
            "WHEN {s} = 2 THEN {w_1} ELSE {w_2} END)").format(
        s=sel,
        w_m1=far("({} + 1.0)".format(frac)),
        w_0=near("({})".format(frac)),
        w_1=near("(1.0 - {})".format(frac)),
        w_2=far("(2.0 - {})".format(frac)))


class Warp(BaseSingle):
    """Resample a raster onto the request grid in a different CRS
    (reference: the implicit warp of raster/base.py:9 get_data).

    Args:
      store: source RasterBlock (native unit-cell grid, native CRS from
        ``store.projection``).
      projection: target CRS of the output grid (defaults to the
        request's ``projection``).
      bbox / width / height: the target window and resolution; each
        defaults to the request value of the same name.  The output is
        a cell table whose ``(y, x)`` are TARGET grid indices — row j,
        column i — with cell (j, i) centered at
        ``(x1 + (i + 0.5)·(x2−x1)/width, y1 + (j + 0.5)·(y2−y1)/height)``
        in the target CRS; ``value`` is the nearest (floor-snapped)
        native cell's value.  Nearest-neighbor is GDAL's default
        resample algorithm.
      algorithm: ``'nearest'`` (default, GDAL's default) or
        ``'bilinear'`` — the 4 native cells whose centers surround the
        target center, weight-averaged over the AVAILABLE ones
        (weights renormalized when a neighbor is absent, so edges
        degrade gracefully instead of going nodata); output ``value``
        is double.  The bilinear path joins a 4×-exploded broadcast
        grid and aggregates per target cell with a fixed-corner-order
        sum, so the result is bit-deterministic; the shuffle it adds
        is bounded by 4·width·height rows (output-sized, never
        source-sized).  ``'average'`` is the DOWNSAMPLING algorithm
        (GDAL 'average'): every native data cell whose center falls
        in a target cell contributes to that cell's mean — see
        ``_build_average`` for the reversed (source→grid) direction
        and the decimal-mean determinism contract.
    """

    def __init__(self, store, projection=None, bbox=None, width=None,
                 height=None, algorithm="nearest"):
        if bbox is not None:
            bbox = tuple(float(v) for v in bbox)
        if algorithm not in ("nearest", "bilinear", "cubic",
                             "average", "mode", "min", "max",
                             "median", "sum", "count"):
            raise ValueError(
                "algorithm must be 'nearest', 'bilinear', 'cubic', "
                "'average', 'mode', 'min', 'max', 'median', 'sum' or "
                "'count', got {!r}".format(algorithm))
        super().__init__(store, projection, bbox,
                         None if width is None else int(width),
                         None if height is None else int(height),
                         algorithm)

    @property
    def projection(self):
        return self.args[1] or self.store.projection

    def _build(self, ctx):
        from dask_geomodeling_spark.geometry.proj import transform_extent
        req = ctx.request
        dst = str(self.args[1] or req.get("projection")
                  or self.store.projection).upper()
        bbox = self.args[2] or req.get("bbox")
        width = self.args[3] or req.get("width")
        height = self.args[4] or req.get("height")
        if bbox is None or not width or not height:
            raise ValueError(
                "Warp needs bbox + width + height (constructor args or "
                "request values)")
        native = str(self.store.projection).upper()
        x1, y1, x2, y2 = (float(v) for v in bbox)
        width, height = int(width), int(height)
        if self.args[5] in ("average", "mode", "min", "max",
                            "median", "sum", "count"):
            return self._build_average(ctx, dst, native,
                                       (x1, y1, x2, y2), width, height)

        # child request: the target window's envelope in the SOURCE
        # CRS (corner transform, margin) — scan pruning keeps working;
        # strip width/height/projection so the child returns every
        # native cell in range, unstrided.  nearest/bilinear reach at
        # most 1 cell beyond the back-transformed center; the cubic
        # 4×4 stencil reaches 2 (round-10 review fix: a 1-cell margin
        # silently clipped the lowest tap row/column and renormalized
        # the kernel at the window's low edges)
        margin = 2 if self.args[5] == "cubic" else 1
        if dst == native:
            nb = (x1, y1, x2, y2)
        else:
            nb = transform_extent((x1, y1, x2, y2), dst, native)
        child = ctx.child(
            bbox=(math.floor(nb[0]) - margin, math.floor(nb[1]) - margin,
                  math.ceil(nb[2]) + margin, math.ceil(nb[3]) + margin),
            width=None, height=None, projection=None)
        cells = self.store._build(child)

        # target grid: width*height rows from range() — executor-built,
        # request-sized, broadcast side of the join.  The inverse
        # transform applies in PLAN STAGES (proj._transform_stages):
        # identical arithmetic to the textual warp_grid_sql the oracles
        # replay, but datum-shifted CRSs stay as small chained
        # projections instead of one substituted mega-expression
        from dask_geomodeling_spark.geometry.proj import (
            _transform_stages)
        base = (ctx.spark.range(width * height)
                .select((F.col("id") % width).alias("_i"),
                        (F.col("id") / width).cast("bigint").alias("_j")))
        dx = (x2 - x1) / width
        dy = (y2 - y1) / height
        base = base.withColumns({
            "_cx": F.expr(
                "(CAST({x1!r} AS DOUBLE) + (CAST(_i AS DOUBLE) + 0.5) "
                "* CAST({dx!r} AS DOUBLE))".format(x1=x1, dx=dx)),
            "_cy": F.expr(
                "(CAST({y1!r} AS DOUBLE) + (CAST(_j AS DOUBLE) + 0.5) "
                "* CAST({dy!r} AS DOUBLE))".format(y1=y1, dy=dy))})
        stages = _transform_stages(dst, native)
        for stage in stages:
            sx, sy = stage("_cx", "_cy")
            base = base.withColumns({"_cx": F.expr(sx),
                                     "_cy": F.expr(sy)})
        if len(stages) > 1:
            # datum CRSs: constraint propagation through the join
            # re-inlines the whole stage chain into a megabyte of
            # canonicalized predicates; cutting lineage on the
            # request-sized grid (it materializes for the broadcast
            # anyway) keeps the optimizer's view tiny
            base = base.localCheckpoint(eager=False)
        if self.args[5] == "nearest":
            grid = base.select(
                "_i", "_j",
                F.expr("CAST(FLOOR(ROUND(_cx, 6)) AS BIGINT)")
                .alias("_sx"),
                F.expr("CAST(FLOOR(ROUND(_cy, 6)) AS BIGINT)")
                .alias("_sy"))
            out = cells.join(
                F.broadcast(grid),
                (cells["x"] == grid["_sx"]) & (cells["y"] == grid["_sy"]))
            return out.select("time", F.col("_j").alias("y"),
                              F.col("_i").alias("x"), "value")

        if self.args[5] == "cubic":
            return self._build_cubic(base, cells)
        # bilinear: 4 surrounding native centers per target cell,
        # exploded on the broadcast (grid) side; fixed-corner-order
        # weighted sum for bit determinism
        grid = (base.select("_i", "_j",
                            F.expr("ROUND(_cx - 0.5, 6)").alias("_fx"),
                            F.expr("ROUND(_cy - 0.5, 6)").alias("_fy"))
                .select("_i", "_j",
                        F.floor("_fx").cast("bigint").alias("_x0"),
                        F.floor("_fy").cast("bigint").alias("_y0"),
                        (F.col("_fx") - F.floor("_fx")).alias("_wx"),
                        (F.col("_fy") - F.floor("_fy")).alias("_wy"))
                .select("_i", "_j", "_x0", "_y0", "_wx", "_wy",
                        F.expr("explode(array(0, 1, 2, 3))")
                        .alias("_k"))
                .select(
                    "_i", "_j", "_k",
                    (F.col("_x0") + F.col("_k") % 2).alias("_sx"),
                    (F.col("_y0") + (F.col("_k") / 2).cast("bigint"))
                    .alias("_sy"),
                    (F.when(F.col("_k") % 2 == 1, F.col("_wx"))
                     .otherwise(1.0 - F.col("_wx"))
                     * F.when(F.col("_k") >= 2, F.col("_wy"))
                     .otherwise(1.0 - F.col("_wy"))).alias("_w")))
        joined = cells.join(
            F.broadcast(grid),
            (cells["x"] == grid["_sx"]) & (cells["y"] == grid["_sy"]))
        return self._corner_agg(joined, 4)

    def _build_cubic(self, base, cells):
        """Keys cubic convolution (a = −0.5, GDAL 'cubic'): the 16
        native centers in the 4×4 window around the back-transformed
        target center, weighted by the shared ``cubic_weight_sql``
        kernel per axis and renormalized over the AVAILABLE neighbors
        (GDAL's nodata convention; with all 16 present the kernel is
        interpolating, Σw = 1).  Same shape as bilinear: the explode
        happens on the broadcast request-sized grid (16·width·height
        rows), the source side never shuffles."""
        grid = (base.select("_i", "_j",
                            F.expr("ROUND(_cx - 0.5, 6)").alias("_fx"),
                            F.expr("ROUND(_cy - 0.5, 6)").alias("_fy"))
                .select("_i", "_j",
                        F.floor("_fx").cast("bigint").alias("_x0"),
                        F.floor("_fy").cast("bigint").alias("_y0"),
                        (F.col("_fx") - F.floor("_fx")).alias("_gx"),
                        (F.col("_fy") - F.floor("_fy")).alias("_gy"))
                .select("_i", "_j", "_x0", "_y0", "_gx", "_gy",
                        F.expr("explode(sequence(0, 15))").alias("_k"))
                .select(
                    "_i", "_j", "_k",
                    F.expr("_x0 + pmod(_k, 4) - 1").alias("_sx"),
                    F.expr("_y0 + _k div 4 - 1").alias("_sy"),
                    F.expr("{wx} * {wy}".format(
                        wx=cubic_weight_sql("_gx", "pmod(_k, 4)"),
                        wy=cubic_weight_sql("_gy", "_k div 4")))
                    .alias("_w")))
        joined = cells.join(
            F.broadcast(grid),
            (cells["x"] == grid["_sx"]) & (cells["y"] == grid["_sy"]))
        return self._corner_agg(joined, 16, guard=True)

    def _build_average(self, ctx, dst, native, bbox, width, height):
        """GDAL-style 'average' resampling — the DOWNSAMPLING path:
        each SOURCE cell center forward-transforms into the target
        CRS, bins into the target cell it falls in, and contributing
        data cells mean per target cell.  The direction is reversed
        vs nearest/bilinear (source→grid instead of grid→source)
        because when target cells cover many native cells a
        center-sample would alias; the one shuffle is the
        bounded-key (≤ width·height groups) mean aggregation with
        map-side partials, and the mean accumulates in DECIMAL so
        the result is independent of partitioning/order (§6 rule 11).
        """
        import math as _m

        from dask_geomodeling_spark.geometry.proj import (
            _transform_stages, transform_extent)
        x1, y1, x2, y2 = bbox
        if dst == native:
            nb = bbox
        else:
            nb = transform_extent(bbox, dst, native)
        child = ctx.child(
            bbox=(_m.floor(nb[0]) - 1, _m.floor(nb[1]) - 1,
                  _m.ceil(nb[2]) + 1, _m.ceil(nb[3]) + 1),
            width=None, height=None, projection=None)
        cells = self.store._build(child)
        src = cells.withColumns({
            "_cx": F.expr("CAST(x AS DOUBLE) + 0.5"),
            "_cy": F.expr("CAST(y AS DOUBLE) + 0.5")})
        for stage in _transform_stages(native, dst):
            sx, sy = stage("_cx", "_cy")
            src = src.withColumns({"_cx": F.expr(sx),
                                   "_cy": F.expr(sy)})
        dx = (x2 - x1) / width
        dy = (y2 - y1) / height
        src = src.withColumns({
            "_i": F.expr(
                "CAST(FLOOR(ROUND((_cx - CAST({x1!r} AS DOUBLE)) "
                "/ CAST({dx!r} AS DOUBLE), 6)) AS BIGINT)".format(
                    x1=x1, dx=dx)),
            "_j": F.expr(
                "CAST(FLOOR(ROUND((_cy - CAST({y1!r} AS DOUBLE)) "
                "/ CAST({dy!r} AS DOUBLE), 6)) AS BIGINT)".format(
                    y1=y1, dy=dy))})
        alg = self.args[5]
        binned = src.where(
            (F.col("_i") >= 0) & (F.col("_i") < width)
            & (F.col("_j") >= 0) & (F.col("_j") < height)
            & F.col("value").isNotNull())
        if alg == "mode":
            # GDAL 'mode' downsampling: deterministic two-level mode
            # (the AggregateRaster majority pattern) — per-(cell,
            # value) counts, then the most frequent value with ties
            # to the SMALLEST value
            counts = (binned.groupBy("time", "_j", "_i", "value")
                      .agg(F.count(F.lit(1)).alias("_n")))
            agg = (counts.groupBy("time", "_j", "_i")
                   .agg(F.expr("min_by(value, struct(-_n, value))")
                        .alias("value")))
        elif alg == "average":
            # DECIMAL mean: order-independent (§6 rule 11)
            agg = (binned.groupBy("time", "_j", "_i")
                   .agg((F.sum(F.col("value").cast("decimal(28,6)"))
                         .cast("double") / F.count(F.lit(1)))
                        .alias("value")))
        elif alg == "sum":
            agg = (binned.groupBy("time", "_j", "_i")
                   .agg(F.sum(F.col("value").cast("decimal(28,6)"))
                        .cast("double").alias("value")))
        else:
            # min / max / count / median (exact sort-based
            # percentile) are order-independent as-is
            from dask_geomodeling_spark.functions import statistic_expr
            agg = (binned.groupBy("time", "_j", "_i")
                   .agg(statistic_expr(alg).cast("double")
                        .alias("value")))
        return agg.select("time", F.col("_j").alias("y"),
                          F.col("_i").alias("x"), "value")

    @staticmethod
    def _corner_agg(joined, n, guard=False):
        # SQL-text expressions instead of nested Column objects (r15
        # optimization, guide §1.2 "per-task work" applied to the
        # DRIVER: the 16-tap cubic build made ~4.5k py4j roundtrips
        # constructing 32 pivot Columns + the fold chains — ~1.0s of
        # plan-build wall at the bench; the text form is ~50 calls
        # for the identical analyzed expressions: same CASE WHEN
        # pivots, same left-fold double sums in the same IEEE order).
        pivots = []
        for k in range(n):
            pivots.append(F.expr(
                "max(CASE WHEN _k = {k} THEN CAST(value AS DOUBLE) "
                "END)".format(k=k)).alias("_v{}".format(k)))
            pivots.append(F.expr(
                "max(CASE WHEN _k = {k} THEN _w END)".format(k=k))
                .alias("_w{}".format(k)))
        agg = joined.groupBy("time", "_j", "_i").agg(*pivots)
        num = "CAST(0.0 AS DOUBLE)"
        den = "CAST(0.0 AS DOUBLE)"
        for k in range(n):
            num = ("({num} + coalesce((_w{k} * _v{k}), "
                   "CAST(0.0 AS DOUBLE)))".format(num=num, k=k))
            den = ("({den} + coalesce(CASE WHEN _v{k} IS NOT NULL "
                   "THEN _w{k} END, CAST(0.0 AS DOUBLE)))"
                   .format(den=den, k=k))
        # bilinear weights are non-negative (den > 0 iff any corner
        # present, the original filter); the cubic kernel has negative
        # lobes, so a nearly-all-missing window could renormalize
        # explosively — guard=True uses |den| > 1e-6 instead.  Either
        # way both engines evaluate the identical sum, so the
        # identical cutoff keeps them in lockstep.
        keep = ("abs({den}) > CAST(1e-6 AS DOUBLE)".format(den=den)
                if guard else
                "{den} > CAST(0.0 AS DOUBLE)".format(den=den))
        return (agg.where(F.expr(keep))
                .select("time", F.col("_j").alias("y"),
                        F.col("_i").alias("x"),
                        F.expr("({num} / {den})".format(num=num,
                                                        den=den))
                        .alias("value")))
