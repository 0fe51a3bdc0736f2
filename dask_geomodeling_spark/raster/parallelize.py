"""Raster parallelization (reference: raster/parallelize.py).

``RasterTiler`` (reference :13) splits requests into square tiles for
dask; on Spark, partitioning IS the tiling — the block repartitions the
cell table by spatial tile so downstream per-tile work is co-located."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import BaseSingle

__all__ = ["RasterTiler"]


class RasterTiler(BaseSingle):
    """Tile-partition a raster cell table (reference:
    raster/parallelize.py:13).

    Args:
      source: RasterBlock.
      size: tile edge length in cells.
    """

    def __init__(self, source, size, projection="EPSG:4326"):
        size = float(size)
        if size <= 0:
            raise ValueError("'size' must be greater than 0")
        super().__init__(source, size, projection)

    @property
    def size(self):
        return self.args[1]

    def _build(self, ctx):
        df = self.store._build(ctx)
        return df.repartition(F.floor(F.col("y") / self.size),
                              F.floor(F.col("x") / self.size))
