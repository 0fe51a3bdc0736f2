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


class Difference(BaseSingle):
    """Geometric difference of two GeometryBlocks (reference:
    geometry/set_operations.py:12) — per-index: subtract the geometry of
    the matching feature in ``other``.

    Point sources: a point covered by the matching other-feature's box
    becomes empty (NULL coordinates).  Box sources: a box fully covered
    becomes NULL; partial overlap is NULL-ed conservatively (the exact
    result is not a box).
    """

    def __init__(self, source, other):
        if not isinstance(other, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(other)))
        super().__init__(source, other)

    @property
    def other(self):
        return self.args[1]

    def _build(self, ctx):
        idx = self.source.index_column
        left = self.source._build(ctx)
        oidx = self.other.index_column
        right = self.other._build(ctx)
        rcols = set(right.columns)
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


class Intersection(BaseSingle):
    """Clip geometries to the request geometry (reference:
    geometry/set_operations.py:84).  Boxes are clamped exactly; points
    are already filtered by the request pushdown; polygon rings clip
    EXACTLY via four Sutherland–Hodgman half-plane passes
    (geom_operations.clip_ring_box_expr), with the bbox columns
    recomputed from the clipped ring."""

    def _build(self, ctx):
        df = self.source._build(ctx)
        geometry = ctx.request.get("geometry")
        if geometry is None:
            return df
        x1, y1, x2, y2 = geometry
        cols = set(df.columns)
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
