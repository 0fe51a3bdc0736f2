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

__all__ = ["GeometryTiler"]


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
