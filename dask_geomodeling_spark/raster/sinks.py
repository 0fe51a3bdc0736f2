"""Raster sinks (reference: raster/sinks.py).

``RasterFileSink``/``to_file`` (reference :18/:144) write GeoTIFF tiles;
the cluster-native sink is partitioned parquet of the cell table — date
partitions give time pruning, and a (y, x) sort within files gives data
clustering for bbox scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import BaseSingle

__all__ = ["RasterFileSink", "RasterTableSink", "to_file"]


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
        if self.args[2]:
            # UTC calendar date, session-timezone independent — a
            # non-UTC writer session would otherwise shift rows into
            # neighboring date partitions and a UTC reader's pruning
            # would silently drop them (r14 review).  NOTE for
            # pre-existing layouts written by a NON-UTC session under
            # older engine versions: their directories carry
            # session-local dates and must be rewritten (one
            # read-all + write) before UTC pruning reads them.
            from dask_geomodeling_spark.config import utc_date
            writer = (df.withColumn("date", utc_date(F.col("time")))
                      .sortWithinPartitions("y", "x")
                      .write.mode(mode).partitionBy("date"))
        else:
            writer = df.sortWithinPartitions("y", "x").write.mode(mode)
        writer.parquet(self.args[1])
        return self.args[1]


def to_file(source, url, tile_size=None, spark=None, **request):
    """Export a raster block (reference: raster/sinks.py:144).
    ``tile_size`` repartitions by spatial tile before the write."""
    from dask_geomodeling_spark.raster.parallelize import RasterTiler

    if tile_size:
        source = RasterTiler(source, tile_size)
    return RasterFileSink(source, url).write(spark, **request)


class RasterTableSink(BaseSingle):
    """Write a raster cell table as a (y, x)-bucketed saved table — the
    co-location layout for shuffle-free raster⋈raster joins at scale
    (SURVEY.md §6 rule 2): two rasters bucketed with the same spec
    sort-merge-join on (time, y, x) with NO Exchange on either side.

    Args:
      source: RasterBlock.
      table: metastore table name.
      buckets: bucket count — match it across co-joined rasters.
    """

    def __init__(self, source, table, buckets=64):
        if not isinstance(table, str):
            raise TypeError("'{}' object is not allowed".format(type(table)))
        super().__init__(source, table, int(buckets))

    def _build(self, ctx):
        return self.store._build(ctx)

    def write(self, spark=None, mode="overwrite", **request):
        df = self.plan(spark, **request)
        (df.write.mode(mode)
         .bucketBy(self.args[2], "y", "x")
         .sortBy("y", "x")
         .format("parquet")
         .saveAsTable(self.args[1]))
        return self.args[1]
