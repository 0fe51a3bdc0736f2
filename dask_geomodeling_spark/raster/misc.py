"""Miscellaneous raster blocks (reference: raster/misc.py).

All single-raster transforms here are pure column projections (no
shuffle); ``Clip`` is a semi-join on the mask's data cells; ``Rasterize``
explodes feature boxes into their covered cells with ``sequence`` —
map-side expansion, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import GeometryBlock
from dask_geomodeling_spark.raster.base import (EPOCH, BaseSingle,
                                                RasterBlock)

__all__ = ["Clip", "Mask", "MaskBelow", "Step", "Classify", "Reclassify",
           "Rasterize", "RasterizeWKT"]


class Clip(BaseSingle):
    """Clip one raster to the cells where another has data and is not
    False (reference: raster/misc.py:30)."""

    def __init__(self, store, source):
        if not isinstance(source, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(store, source)

    @property
    def source(self):
        return self.args[1]

    def _build(self, ctx):
        df = self.store._build(ctx)
        mask = (self.source._build(ctx)
                .filter(F.col("value").isNotNull()
                        & (F.col("value").cast("boolean")))
                .select("time", "y", "x"))
        return df.join(mask, ["time", "y", "x"], "left_semi")


class Mask(BaseSingle):
    """Replace data values with a constant (reference: raster/misc.py:169)."""

    def __init__(self, store, value):
        if not isinstance(value, (int, float)):
            raise TypeError("'{}' object is not allowed".format(type(value)))
        super().__init__(store, value)

    @property
    def value(self):
        return self.args[1]

    def _build(self, ctx):
        df = self.store._build(ctx)
        value = F.when(F.col("value").isNotNull(),
                       F.lit(float(self.value)))
        return df.select("time", "y", "x", value.alias("value"))


class MaskBelow(BaseSingle):
    """Cells below the value become no-data (reference: raster/misc.py:225)."""

    def __init__(self, store, value):
        if not isinstance(value, (int, float)):
            raise TypeError("'{}' object is not allowed".format(type(value)))
        super().__init__(store, value)

    def _build(self, ctx):
        df = self.store._build(ctx)
        value = F.when(F.col("value") >= float(self.args[1]), F.col("value"))
        return df.select("time", "y", "x", value.alias("value"))


class Step(BaseSingle):
    """Step function: left if x < value, at if x == value, right if
    x > value (reference: raster/misc.py:254)."""

    def __init__(self, store, left=0, right=1, value=0, at=None):
        at = (left + right) / 2 if at is None else at
        for x in (left, right, value, at):
            if not isinstance(x, (float, int)):
                raise TypeError("'{}' object is not allowed".format(type(x)))
        super().__init__(store, left, right, value, at)

    @property
    def left(self):
        return self.args[1]

    @property
    def right(self):
        return self.args[2]

    @property
    def value(self):
        return self.args[3]

    @property
    def at(self):
        return self.args[4]

    def _build(self, ctx):
        df = self.store._build(ctx)
        v = F.col("value")
        value = (F.when(v < float(self.value), F.lit(float(self.left)))
                  .when(v == float(self.value), F.lit(float(self.at)))
                  .when(v > float(self.value), F.lit(float(self.right))))
        return df.select("time", "y", "x", value.alias("value"))


class Classify(BaseSingle):
    """Bin index per cell — np.digitize semantics: output 0 means below
    the first edge, len(bins) means above the last (reference:
    raster/misc.py:331)."""

    def __init__(self, store, bins, right=False):
        bins = [float(b) for b in bins]
        if any(b2 <= b1 for b1, b2 in zip(bins, bins[1:])):
            raise TypeError("'bins' should be monotonic")
        super().__init__(store, bins, right)

    @property
    def bins(self):
        return self.args[1]

    @property
    def right(self):
        return self.args[2]

    def _build(self, ctx):
        df = self.store._build(ctx)
        v = F.col("value")
        bins, right = self.bins, self.args[2]
        idx = F.lit(0)
        for b in bins:
            # np.digitize: right=False -> count of (v >= b); right=True ->
            # count of (v > b)
            cond = (v > b) if right else (v >= b)
            idx = idx + F.when(cond, 1).otherwise(0)
        value = F.when(v.isNotNull(), idx.cast("double"))
        return df.select("time", "y", "x", value.alias("value"))


class Reclassify(BaseSingle):
    """Map integer cell values via [from, to] pairs (reference:
    raster/misc.py:402).  The mapping is a broadcast-literal MapType
    lookup — constant-folded, no join."""

    def __init__(self, store, data, select=False):
        if not isinstance(data, list):
            raise TypeError("'{}' object is not allowed".format(type(data)))
        for pair in data:
            if len(pair) != 2:
                raise ValueError("Please supply [from, to] pairs")
        if not isinstance(select, bool):
            raise TypeError("'{}' object is not allowed".format(type(select)))
        super().__init__(store, [[float(a), float(b)] for a, b in data],
                         select)

    @property
    def data(self):
        return self.args[1]

    @property
    def select(self):
        return self.args[2]

    def _build(self, ctx):
        df = self.store._build(ctx)
        v = F.col("value")
        expr = F.when(v.isNull(), F.lit(None).cast("double"))
        for frm, to in self.data:
            expr = expr.when(v == frm, F.lit(to))
        expr = expr.otherwise(
            F.lit(None).cast("double") if self.select else v)
        return df.select("time", "y", "x", expr.alias("value"))


class Rasterize(RasterBlock):
    """Feature frame → raster cells (reference: raster/misc.py:518).

    Boxes (or points) become the integer cells they cover: a map-side
    ``sequence``+``explode`` over each feature — distributes with the
    features, no driver involvement.  ``column_name`` selects the value
    burned per feature (default: boolean presence mask).
    """

    def __init__(self, source, column_name=None, dtype="float64"):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, column_name, dtype)

    @property
    def source(self):
        return self.args[0]

    @property
    def column_name(self):
        return self.args[1]

    def _build(self, ctx):
        from dask_geomodeling_spark.geometry.geom_operations import (
            point_in_polygon_expr, point_in_rings_expr)
        df = self.source._build(ctx)
        cols = set(df.columns)
        value = (F.col(self.column_name).cast("double")
                 if self.column_name else F.lit(1.0))
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            keep = [c for c in ("vertices", "rings") if c in cols]
            cells = df.select(
                value.alias("value"), *keep,
                F.explode(F.sequence(F.floor("ymin"),
                                     F.floor("ymax"))).alias("y"),
                F.col("xmin"), F.col("xmax"))
            cells = cells.select(
                "value", *keep, "y",
                F.explode(F.sequence(F.floor("xmin"),
                                     F.floor("xmax"))).alias("x"))
            if keep:
                # true polygon coverage: keep bbox candidate cells whose
                # CENTER is inside the geometry (GDAL default burn
                # rule); the full ring set (holes/multipolygon) wins
                # over the single exterior ring; ring-less rows keep
                # full-bbox semantics
                cx = "(x + cast(0.5 as double))"
                cy = "(y + cast(0.5 as double))"
                if "rings" in cols:
                    in_rings = point_in_rings_expr(cx, cy)
                    if "vertices" in cols:
                        inside = (
                            F.when(F.col("rings").isNotNull(), in_rings)
                            .when(F.col("vertices").isNotNull(),
                                  point_in_polygon_expr(cx, cy))
                            .otherwise(F.lit(True)))
                    else:
                        inside = F.when(F.col("rings").isNotNull(),
                                        in_rings).otherwise(F.lit(True))
                    cells = cells.filter(inside).drop(*keep)
                else:
                    inside = point_in_polygon_expr(cx, cy)
                    cells = (cells.filter(F.col("vertices").isNull()
                                          | inside).drop(*keep))
        elif "path" in cols:
            # polyline burn (gdal_rasterize all_touched): EXACT
            # supercover — each segment splits at its integer-gridline
            # crossing params, each positive-length piece burns the
            # cell holding its midpoint (corner/point touches burn
            # nothing).  Pure column math: sequence/transform HOFs,
            # map-side with the features, no kernel stage.
            def crossings(axis):
                a, b = ("_s.ax", "_s.bx") if axis == "x" \
                    else ("_s.ay", "_s.by")
                return (
                    "CASE WHEN {b} = {a} OR "
                    "floor(greatest({a}, {b})) < ceil(least({a}, {b}))"
                    " THEN array() "
                    "ELSE transform(sequence("
                    "CAST(ceil(least({a}, {b})) AS BIGINT), "
                    "CAST(floor(greatest({a}, {b})) AS BIGINT)), "
                    "k -> (CAST(k AS DOUBLE) - {a}) / ({b} - {a})) "
                    "END").format(a=a, b=b)
            segs = df.select(
                value.alias("value"),
                F.explode(F.expr(
                    "filter(transform(sequence(1, size(path) - 1), "
                    "i -> struct(path[i-1][0] AS ax, "
                    "path[i-1][1] AS ay, path[i][0] AS bx, "
                    "path[i][1] AS by)), "
                    "s -> s.ax != s.bx OR s.ay != s.by)"))
                .alias("_s"))
            segs = segs.withColumn("_ts", F.expr(
                "array_sort(concat("
                "array(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)), "
                "{x}, {y}))".format(x=crossings("x"),
                                    y=crossings("y"))))
            cells = segs.select(
                "value",
                F.explode(F.expr(
                    "transform(filter(transform("
                    "sequence(1, size(_ts) - 1), "
                    "i -> struct(_ts[i-1] AS t0, _ts[i] AS t1)), "
                    "p -> p.t1 - p.t0 > 1e-12), "
                    "p -> struct("
                    "CAST(floor(_s.ay + (p.t0 + p.t1) / 2 "
                    "* (_s.by - _s.ay)) AS BIGINT) AS y, "
                    "CAST(floor(_s.ax + (p.t0 + p.t1) / 2 "
                    "* (_s.bx - _s.ax)) AS BIGINT) AS x))"))
                .alias("_c")
            ).select("value", F.col("_c.y").alias("y"),
                     F.col("_c.x").alias("x"))
        elif {"x", "y"} <= cols:
            cells = df.select(value.alias("value"),
                              F.floor("y").alias("y"),
                              F.floor("x").alias("x"))
        else:
            raise ValueError("Rasterize requires geometry columns")
        out = (cells.groupBy("y", "x")
               .agg(F.max("value").alias("value"))
               .withColumn("time", F.lit(EPOCH).cast("timestamp")))
        return out.select("time", "y", "x", "value")


class RasterizeWKT(RasterBlock):
    """Rasterize a single WKT geometry (reference: raster/misc.py:712) —
    POINT, POLYGON (including interior rings) and MULTIPOLYGON, all
    via the typed-column parse + center-in-geometry burn rule."""

    def __init__(self, wkt, projection="EPSG:4326"):
        if not isinstance(wkt, str):
            raise TypeError("'{}' object is not allowed".format(type(wkt)))
        super().__init__(wkt, projection)

    @property
    def projection(self):
        """The declared CRS of the WKT — the base-class walk only sees
        RasterBlock args and would fall back to the 4326 default."""
        return self.args[1]

    def _build(self, ctx):
        from dask_geomodeling_spark.geometry.sources import (
            LiteralGeometrySource)
        from dask_geomodeling_spark.raster.misc import Rasterize
        return Rasterize(LiteralGeometrySource(self.args[0]))._build(ctx)
