"""Geometric set operations (reference: geometry/set_operations.py).

Without GDAL/shapely in this environment, the engine's native geometry
algebra covers points and axis-aligned boxes (the same algebra the
request/bbox machinery uses).  ``Intersection`` clips features to the
request geometry — for boxes an exact coordinate clamp, for points a
filter.  ``Difference`` removes the part of each feature covered by the
other block's features; exact for point-vs-box, conservative (NULL-out on
overlap) for box-vs-box, documented.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle, GeometryBlock

__all__ = ["Difference", "Intersection"]


_BOX_RING_SQL = ("CASE WHEN xmin IS NOT NULL AND xmax > xmin "
                 "AND ymax > ymin THEN array(array("
                 "array(xmin, ymin), array(xmax, ymin), "
                 "array(xmax, ymax), array(xmin, ymax))) END")


def _diff_rings(lr, orr):
    """Per-row kernel for the exact Difference ring path (runs inside
    the Arrow-batched map; reference semantics set_operations.py:70-78:
    per-index a.difference(b), missing-in-b passthrough)."""
    from dask_geomodeling_spark.geometry.polyclip import (
        polygon_difference)
    if lr is None:
        return None
    if orr is None:
        return lr
    return polygon_difference(lr, orr) or None


class Difference(BaseSingle):
    """Geometric difference of two GeometryBlocks (reference:
    geometry/set_operations.py:12) — per-index: subtract the geometry of
    the matching feature in ``other``.

    When either side carries polygon geometry (``rings``/``vertices``
    columns) the difference is EXACT: the boundary-classification
    kernel (geometry/polyclip.py) computes the true per-index
    ``a.difference(b)`` — holes, multipolygon parts, shared edges and
    partial overlaps all handled, the reference's shapely semantics
    (set_operations.py:12,70-78).  Box rows engage by synthesizing
    their boundary ring (the result of box−polygon is a polygon);
    point rows test EXACT even-odd containment against the other
    feature's rings and empty to NULL coordinates when covered;
    missing-in-other rows pass through unchanged.

    Legacy path (neither side has ring columns): a point covered by
    the matching other-feature's box becomes empty (NULL coordinates);
    a box fully covered becomes NULL; partial box overlap is NULL-ed
    conservatively.
    """

    def __init__(self, source, other):
        if not isinstance(other, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(other)))
        super().__init__(source, other)

    @property
    def other(self):
        return self.args[1]

    @property
    def columns(self):
        cols = set(self.source.columns)
        # exact differences of box/vertices rows are general polygons
        if {"rings", "vertices"} & (cols | set(self.other.columns)):
            cols.add("rings")
        return cols

    def _build(self, ctx):
        idx = self.source.index_column
        left = self.source._build(ctx)
        oidx = self.other.index_column
        right = self.other._build(ctx)
        rcols = set(right.columns)
        lcols = set(left.columns)
        if {"rings", "vertices"} & (lcols | rcols):
            return self._build_rings(ctx, idx, left, lcols, oidx,
                                     right, rcols)
        if {"xmin", "ymin", "xmax", "ymax"} <= rcols:
            box = right.select(F.col(oidx).alias(idx),
                               F.col("xmin").alias("_oxmin"),
                               F.col("ymin").alias("_oymin"),
                               F.col("xmax").alias("_oxmax"),
                               F.col("ymax").alias("_oymax"))
        else:  # point other: zero-area box
            box = right.select(F.col(oidx).alias(idx),
                               F.col("x").alias("_oxmin"),
                               F.col("y").alias("_oymin"),
                               F.col("x").alias("_oxmax"),
                               F.col("y").alias("_oymax"))
        df = left.join(box, on=idx, how="left")
        lcols = set(left.columns)
        if {"x", "y"} <= lcols:
            covered = ((F.col("x") >= F.col("_oxmin"))
                       & (F.col("x") <= F.col("_oxmax"))
                       & (F.col("y") >= F.col("_oymin"))
                       & (F.col("y") <= F.col("_oymax")))
            covered = F.coalesce(covered, F.lit(False))
            # evaluate the predicate once against the ORIGINAL coords
            df = df.withColumns({
                "x": F.when(~covered, F.col("x")),
                "y": F.when(~covered, F.col("y"))})
        else:
            overlap = ((F.col("xmin") <= F.col("_oxmax"))
                       & (F.col("xmax") >= F.col("_oxmin"))
                       & (F.col("ymin") <= F.col("_oymax"))
                       & (F.col("ymax") >= F.col("_oymin")))
            overlap = F.coalesce(overlap, F.lit(False))
            df = df.withColumns({c: F.when(~overlap, F.col(c))
                                 for c in ("xmin", "ymin", "xmax", "ymax")})
        return df.drop("_oxmin", "_oymin", "_oxmax", "_oymax")

    def _build_rings(self, ctx, idx, left, lcols, oidx, right, rcols):
        """Exact polygon path (round 8; see class docstring)."""
        from dask_geomodeling_spark.geometry.geom_operations import (
            point_in_rings_expr)
        from dask_geomodeling_spark.geometry.polyclip import (
            RINGS_TYPE, map_rings_binary)
        # other-side geometry as one flat ring list: rings, else the
        # wrapped exterior ring, else the box boundary; points have
        # zero area (nothing to subtract)
        parts = []
        if "rings" in rcols:
            parts.append(F.col("rings"))
        if "vertices" in rcols:
            parts.append(F.when(F.col("vertices").isNotNull(),
                                F.array(F.col("vertices"))))
        if {"xmin", "ymin", "xmax", "ymax"} <= rcols:
            parts.append(F.expr(_BOX_RING_SQL))
        other_r = (F.coalesce(*parts) if len(parts) > 1
                   else parts[0] if parts
                   else F.lit(None).cast(RINGS_TYPE))
        ob = right.select(F.col(oidx).alias(idx),
                          other_r.alias("_orings"))
        df = left.join(ob, on=idx, how="left")

        # left geometry: real ring data, else the box boundary — the
        # latter only when there IS something to subtract, so
        # untouched box rows keep their bbox-only representation
        lparts = []
        if "rings" in lcols:
            lparts.append(F.col("rings"))
        if "vertices" in lcols:
            lparts.append(F.when(F.col("vertices").isNotNull(),
                                 F.array(F.col("vertices"))))
        if {"xmin", "ymin", "xmax", "ymax"} <= lcols:
            lparts.append(F.when(F.col("_orings").isNotNull(),
                                 F.expr(_BOX_RING_SQL)))
        if not lparts:
            # point-only left: exact even-odd containment empties
            # covered points (no kernel round-trip needed)
            covered = F.coalesce(
                point_in_rings_expr("x", "y", "_orings"), F.lit(False))
            return (df.withColumns({
                        "x": F.when(~covered, F.col("x")),
                        "y": F.when(~covered, F.col("y"))})
                    .drop("_orings"))
        lr = F.coalesce(*lparts) if len(lparts) > 1 else lparts[0]
        df = df.withColumn("_lrings", lr).withColumn(
            "_engaged", F.col("_lrings").isNotNull()
            & F.col("_orings").isNotNull())
        from dask_geomodeling_spark.geometry.polyclip import (
            kernel_parallelism)
        df = kernel_parallelism(df, ctx.spark)
        df = map_rings_binary(df, "_lrings", "_orings", _diff_rings)
        df = df.withColumn("rings", F.col("_lrings"))
        has_ring = F.col("rings").isNotNull()
        updates = {}
        if "vertices" in lcols:
            updates["vertices"] = F.when(
                has_ring, F.try_element_at(F.col("rings"), F.lit(1)))
        covered_pt = None
        if {"x", "y"} <= lcols:
            covered_pt = (F.col("x").isNotNull() & F.coalesce(
                point_in_rings_expr("x", "y", "_orings"), F.lit(False)))
            updates["x"] = F.when(~covered_pt, F.col("x"))
            updates["y"] = F.when(~covered_pt, F.col("y"))
        if {"xmin", "ymin", "xmax", "ymax"} <= lcols:
            pts = "flatten(rings)"
            for c, (axis, agg) in (("xmin", (0, F.array_min)),
                                   ("ymin", (1, F.array_min)),
                                   ("xmax", (0, F.array_max)),
                                   ("ymax", (1, F.array_max))):
                rec = agg(F.expr("transform({}, v -> v[{}])"
                                 .format(pts, axis)))
                e = F.when(has_ring, rec).when(F.col("_engaged"),
                                               F.lit(None))
                if covered_pt is not None:
                    e = e.when(covered_pt, F.lit(None))
                updates[c] = e.otherwise(F.col(c))
        return (df.withColumns(updates)
                .drop("_lrings", "_orings", "_engaged"))


def _clip_rings(lr, qr):
    """Per-row kernel for the polygon-request Intersection path."""
    from dask_geomodeling_spark.geometry.polyclip import (
        polygon_intersection)
    if lr is None or qr is None:
        return None
    return polygon_intersection(lr, qr) or None


class Intersection(BaseSingle):
    """Clip geometries to the request geometry (reference:
    geometry/set_operations.py:84).

    Box request geometry (bbox tuple or box WKT): boxes are clamped
    exactly; points are already filtered by the request pushdown;
    polygon rings clip EXACTLY via four Sutherland–Hodgman half-plane
    passes (geom_operations.clip_ring_box_expr), with the bbox columns
    recomputed from the clipped ring.

    POLYGON request geometry (a POLYGON/MULTIPOLYGON WKT string, holes
    included — round 8): ring rows clip EXACTLY against the request
    polygon through the boundary-classification kernel
    (geometry/polyclip.py); point rows keep their coordinates only
    when even-odd inside the request polygon; box-only rows clamp to
    the polygon's bbox (conservative, documented — their exact clip
    is available by carrying rings)."""

    def _build(self, ctx):
        df = self.source._build(ctx)
        geometry = ctx.request.get("geometry")
        if geometry is None:
            return df
        poly = None
        if isinstance(geometry, str):
            from dask_geomodeling_spark.geometry.sources import (
                parse_point_or_box_wkt)
            f = parse_point_or_box_wkt(geometry)
            if "rings" in f:
                poly = f["rings"]
            elif "vertices" in f:
                poly = [f["vertices"]]
            if "x" in f:
                x1, y1, x2, y2 = f["x"], f["y"], f["x"], f["y"]
            else:
                x1, y1 = f["xmin"], f["ymin"]
                x2, y2 = f["xmax"], f["ymax"]
        else:
            x1, y1, x2, y2 = geometry
        cols = set(df.columns)
        if poly is not None:
            return self._clip_to_polygon(df, cols, poly,
                                         (x1, y1, x2, y2))
        if "vertices" in cols or "rings" in cols:
            from dask_geomodeling_spark.geometry.geom_operations import (
                clip_ring_box_expr, clip_rings_box_expr)
            if "rings" in cols:
                # clip every ring independently (convex window keeps
                # the orientation-normalized signed-area contract),
                # then re-derive the compat exterior ring
                df = df.withColumn(
                    "rings",
                    F.when(F.col("rings").isNotNull(),
                           clip_rings_box_expr(x1, y1, x2, y2)))
                if "vertices" in cols:
                    # try_element_at: a polygon whose bbox overlaps the
                    # window but whose geometry doesn't clips to ZERO
                    # rings; plain element_at would abort the job under
                    # ANSI mode (INVALID_ARRAY_INDEX_IN_ELEMENT_AT).
                    df = df.withColumn(
                        "vertices",
                        F.when(F.col("rings").isNotNull(),
                               F.try_element_at(F.col("rings"), F.lit(1)))
                        .otherwise(F.when(
                            F.col("vertices").isNotNull(),
                            clip_ring_box_expr(x1, y1, x2, y2))))
            else:
                df = df.withColumn(
                    "vertices",
                    F.when(F.col("vertices").isNotNull(),
                           clip_ring_box_expr(x1, y1, x2, y2)))
            if {"xmin", "ymin", "xmax", "ymax"} <= cols:
                if "rings" in cols and "vertices" in cols:
                    src_pts = ("CASE WHEN rings IS NOT NULL THEN "
                               "flatten(rings) ELSE vertices END")
                elif "rings" in cols:
                    src_pts = "flatten(rings)"
                else:
                    src_pts = "vertices"
                xs = F.expr("transform({}, v -> v[0])".format(src_pts))
                ys = F.expr("transform({}, v -> v[1])".format(src_pts))
                ring = F.expr("{} IS NOT NULL AND size({}) > 0"
                              .format(src_pts, src_pts))
                df = (df.withColumn(
                        "xmin", F.when(ring, F.array_min(xs))
                        .otherwise(F.greatest("xmin", F.lit(float(x1)))))
                      .withColumn(
                        "ymin", F.when(ring, F.array_min(ys))
                        .otherwise(F.greatest("ymin", F.lit(float(y1)))))
                      .withColumn(
                        "xmax", F.when(ring, F.array_max(xs))
                        .otherwise(F.least("xmax", F.lit(float(x2)))))
                      .withColumn(
                        "ymax", F.when(ring, F.array_max(ys))
                        .otherwise(F.least("ymax", F.lit(float(y2))))))
            return df
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            df = (df.withColumn("xmin", F.greatest("xmin", F.lit(float(x1))))
                    .withColumn("ymin", F.greatest("ymin", F.lit(float(y1))))
                    .withColumn("xmax", F.least("xmax", F.lit(float(x2))))
                    .withColumn("ymax", F.least("ymax", F.lit(float(y2)))))
        return df

    def _clip_to_polygon(self, df, cols, poly, bbox):
        """Exact clip against a polygon-shaped request geometry
        (round 8; see class docstring)."""
        from dask_geomodeling_spark.geometry.geom_operations import (
            point_in_rings_expr)
        from dask_geomodeling_spark.geometry.polyclip import (
            map_rings_binary, rings_literal_sql)
        x1, y1, x2, y2 = bbox
        lit = rings_literal_sql(poly)
        has_ring_cols = bool({"rings", "vertices"} & cols)
        if has_ring_cols:
            lparts = []
            if "rings" in cols:
                lparts.append(F.col("rings"))
            if "vertices" in cols:
                lparts.append(F.when(F.col("vertices").isNotNull(),
                                     F.array(F.col("vertices"))))
            lr = (F.coalesce(*lparts) if len(lparts) > 1
                  else lparts[0])
            from dask_geomodeling_spark.config import (
                ensure_min_partitions)
            df = ensure_min_partitions(df)
            df = (df.withColumn("_lrings", lr)
                  .withColumn("_qrings", F.expr(lit)))
            df = map_rings_binary(df, "_lrings", "_qrings",
                                  _clip_rings)
            df = df.withColumn("rings", F.col("_lrings")) \
                if "rings" in cols else df.withColumnRenamed(
                    "_lrings", "rings")
            has_ring = F.col("rings").isNotNull()
            updates = {}
            if "vertices" in cols:
                updates["vertices"] = F.when(
                    has_ring,
                    F.try_element_at(F.col("rings"), F.lit(1)))
            inside_pt = None
            if {"x", "y"} <= cols:
                df = df.withColumn("_qr2", F.expr(lit))
                inside_pt = F.coalesce(
                    point_in_rings_expr("x", "y", "_qr2"),
                    F.lit(False))
                updates["x"] = F.when(inside_pt, F.col("x"))
                updates["y"] = F.when(inside_pt, F.col("y"))
            if {"xmin", "ymin", "xmax", "ymax"} <= cols:
                pts = "flatten(rings)"
                for c, (axis, agg, clamp) in (
                        ("xmin", (0, F.array_min,
                                  F.greatest("xmin", F.lit(float(x1))))),
                        ("ymin", (1, F.array_min,
                                  F.greatest("ymin", F.lit(float(y1))))),
                        ("xmax", (0, F.array_max,
                                  F.least("xmax", F.lit(float(x2))))),
                        ("ymax", (1, F.array_max,
                                  F.least("ymax", F.lit(float(y2)))))):
                    rec = agg(F.expr("transform({}, v -> v[{}])"
                                     .format(pts, axis)))
                    updates[c] = F.when(has_ring, rec).otherwise(clamp)
            out = df.withColumns(updates)
            drop = [c for c in ("_lrings", "_qrings", "_qr2")
                    if c in out.columns]
            return out.drop(*drop)
        if {"x", "y"} <= cols:
            df = df.withColumn("_qr2", F.expr(lit))
            inside_pt = F.coalesce(
                point_in_rings_expr("x", "y", "_qr2"), F.lit(False))
            df = (df.withColumns({
                      "x": F.when(inside_pt, F.col("x")),
                      "y": F.when(inside_pt, F.col("y"))})
                  .drop("_qr2"))
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            df = (df.withColumn("xmin", F.greatest("xmin", F.lit(float(x1))))
                    .withColumn("ymin", F.greatest("ymin", F.lit(float(y1))))
                    .withColumn("xmax", F.least("xmax", F.lit(float(x2))))
                    .withColumn("ymax", F.least("ymax", F.lit(float(y2)))))
        return df
