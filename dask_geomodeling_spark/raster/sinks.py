"""Raster sinks (reference: raster/sinks.py).

``RasterFileSink``/``to_file`` (reference :18/:144) write GeoTIFF tiles;
the cluster-native sink is partitioned parquet of the cell table — date
partitions give time pruning, and a (y, x) sort within files gives data
clustering for bbox scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import BaseSingle

__all__ = ["RasterFileSink", "to_file"]


class RasterFileSink(BaseSingle):
    """Write a raster cell table to parquet (reference:
    raster/sinks.py:18).

    Args:
      source: RasterBlock.
      url: output directory.
      partition_by_time: partition layout by date (default True).
    """

    def __init__(self, source, url, partition_by_time=True):
        if not isinstance(url, str):
            raise TypeError("'{}' object is not allowed".format(type(url)))
        super().__init__(source, url, partition_by_time)

    def _build(self, ctx):
        return self.store._build(ctx)

    def write(self, spark=None, mode="overwrite", **request):
        df = self.plan(spark, **request)
        writer = df.sortWithinPartitions("y", "x").write.mode(mode)
        if self.args[2]:
            df2 = df.withColumn("date", F.to_date("time"))
            writer = (df2.sortWithinPartitions("y", "x")
                      .write.mode(mode).partitionBy("date"))
        writer.parquet(self.args[1])
        return self.args[1]


def to_file(source, url, tile_size=None, spark=None, **request):
    """Export a raster block (reference: raster/sinks.py:144).
    ``tile_size`` repartitions by spatial tile before the write."""
    from dask_geomodeling_spark.raster.parallelize import RasterTiler

    if tile_size:
        source = RasterTiler(source, tile_size)
    return RasterFileSink(source, url).write(spark, **request)
