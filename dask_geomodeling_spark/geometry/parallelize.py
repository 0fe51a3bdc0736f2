"""Parallelization blocks (reference: geometry/parallelize.py).

The reference's ``GeometryTiler`` splits a request into square tiles and
evaluates them as independent dask tasks.  On Spark, *partitioning is the
tiling*: the block repartitions the feature frame by a spatial tile key so
downstream per-tile work (sinks, aggregations) is distributed and
co-located.  No driver-side tile loop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle

__all__ = ["GeometryTiler", "Subdivide"]


class GeometryTiler(BaseSingle):
    """Tile-partition a feature frame (reference:
    geometry/parallelize.py:18).

    Args:
      source: GeometryBlock (point or box geometry columns).
      size: tile edge length (request-projection units).
      projection: accepted for parity (EPSG:4326 native).
    """

    def __init__(self, source, size, projection="EPSG:4326"):
        size = float(size)
        if size <= 0:
            raise ValueError("'size' must be greater than 0")
        super().__init__(source, size, projection)

    @property
    def size(self):
        return self.args[1]

    @property
    def columns(self):
        return set(self.source.columns) | {"tile_x", "tile_y"}

    def _build(self, ctx):
        df = self.source._build(ctx)
        cols = set(df.columns)
        if {"x", "y"} <= cols:
            cx, cy = F.col("x"), F.col("y")
        elif {"xmin", "ymin", "xmax", "ymax"} <= cols:
            cx = (F.col("xmin") + F.col("xmax")) / 2
            cy = (F.col("ymin") + F.col("ymax")) / 2
        else:
            raise ValueError("GeometryTiler requires geometry columns")
        df = (df.withColumn("tile_x", F.floor(cx / self.size))
                .withColumn("tile_y", F.floor(cy / self.size)))
        return df.repartition("tile_x", "tile_y")


class Subdivide(BaseSingle):
    """Grid-subdivide polygons (the PostGIS ``ST_Subdivide`` /
    Sedona-style skew-control analogue; no reference counterpart —
    the reference's single-machine shapely ops never face per-feature
    skew).  Each feature splits into one row per covered grid cell
    with the EXACT Sutherland–Hodgman clip of its ring stack to that
    cell — a continent-sized polygon becomes thousands of bounded
    parts co-keyed with the grid, so spatial joins and zonal stats
    shuffle uniform cells instead of one hot feature.

    Pure column math end to end: bbox → ``sequence``-exploded cell
    ids (map-side, bounded by covered-cell count), then the four-pass
    half-plane clip with the CELL EDGES AS COLUMN EXPRESSIONS — no
    Python kernel, no shuffle.  Degenerate edge-touch slivers (< 3
    surviving vertices) drop; the part's exact area equals the
    feature∩cell area, and parts re-dissolve to the original
    (shared cell edges are measure-zero).

    Output: source columns with ``rings`` replaced by the part and
    ``cell_x``/``cell_y`` (bigint cell ids) appended.
    """

    def __init__(self, source, cell_size):
        cs = float(cell_size)
        if not cs > 0:
            raise ValueError("cell_size must be > 0")
        clash = {"cell_x", "cell_y"} & set(source.columns)
        if clash:
            raise ValueError(
                "column(s) {} collide with Subdivide's synthesized "
                "cell-id columns; rename them upstream"
                .format(sorted(clash)))
        super().__init__(source, cs)

    @property
    def columns(self):
        return set(self.source.columns) | {"rings", "cell_x",
                                           "cell_y"}

    def _build(self, ctx):
        from dask_geomodeling_spark.geometry.geom_operations import (
            clip_rings_box_cols_expr)
        from dask_geomodeling_spark.geometry.spatial_join import (
            SpatialJoin)
        cs = self.args[1]
        df = self.source._build(ctx)
        cols = set(df.columns)
        csl = "CAST({!r} AS DOUBLE)".format(cs)
        gr = SpatialJoin._ring_expr(cols, "_g0")
        df = df.withColumn("_g", gr)
        pts = "flatten(_g)"
        df = (df
              .withColumn("_cx", F.explode(F.expr(
                  "sequence(CAST(FLOOR(array_min(transform({p}, "
                  "q -> q[0])) / {cs}) AS BIGINT), "
                  "CAST(FLOOR(array_max(transform({p}, "
                  "q -> q[0])) / {cs}) AS BIGINT))"
                  .format(p=pts, cs=csl))))
              .withColumn("_cy", F.explode(F.expr(
                  "sequence(CAST(FLOOR(array_min(transform({p}, "
                  "q -> q[1])) / {cs}) AS BIGINT), "
                  "CAST(FLOOR(array_max(transform({p}, "
                  "q -> q[1])) / {cs}) AS BIGINT))"
                  .format(p=pts, cs=csl)))))
        clipped = clip_rings_box_cols_expr(
            "CAST(_cx AS DOUBLE) * {cs}".format(cs=csl),
            "CAST(_cy AS DOUBLE) * {cs}".format(cs=csl),
            "(CAST(_cx AS DOUBLE) + 1) * {cs}".format(cs=csl),
            "(CAST(_cy AS DOUBLE) + 1) * {cs}".format(cs=csl),
            rings_col="_g")
        # edge-touch slivers survive the vertex-count filter as
        # duplicated-vertex rings — drop parts with no positive area
        from dask_geomodeling_spark.geometry.geom_operations import (
            rings_area_expr)
        df = (df.withColumn("_g", clipped)
              .filter(F.expr("size(_g) > 0")
                      & (rings_area_expr("_g") > 0)))
        return (df.withColumn("rings", F.col("_g"))
                .withColumnRenamed("_cx", "cell_x")
                .withColumnRenamed("_cy", "cell_y")
                .drop("_g"))
