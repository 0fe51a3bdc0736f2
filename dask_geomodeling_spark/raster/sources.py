"""Raster sources (reference: raster/sources.py).

``MemorySource`` (reference :157) wraps in-memory numpy data;
``RasterFileSource`` (reference :396) reads GDAL files.  The Spark-first
sources produce cell tables: ``MemorySource`` from driver-side arrays
(tests / small rasters), ``RasterParquetSource`` from partitioned parquet
(the 100 TB path — partitioned by time, bucketable by (y, x)), and
``TableRasterSource`` adapts any SQL expression over existing tables into
a raster lineage.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import (EPOCH, RasterBlock,
                                                apply_raster_request)

__all__ = ["MemorySource", "RasterParquetSource", "TableRasterSource",
           "DataFrameRasterSource"]


class DataFrameRasterSource(RasterBlock):
    """Wrap an existing DataFrame with (time, y, x, value) columns as a
    RasterBlock — the adapter that binds any tabular lineage to the
    raster plane without copying data."""

    def __init__(self, df):
        self._df = df
        super().__init__("dataframe-{}".format(id(df)))

    def _build(self, ctx):
        df = self._df.select(F.col("time").cast("timestamp"),
                             F.col("y").cast("bigint"),
                             F.col("x").cast("bigint"),
                             F.col("value").cast("double"))
        return apply_raster_request(df, ctx.request)


class MemorySource(RasterBlock):
    """In-memory raster (reference: raster/sources.py:157).

    Args:
      data: nested lists / numpy array, shaped (bands, height, width) or
        (height, width). ``no_data_value`` entries become NULL cells.
      no_data_value: value marking no-data in ``data``.
      time_first: timestamp of the first band (datetime, default epoch).
      time_delta: timedelta between bands (None = static raster).
    """

    def __init__(self, data, no_data_value=None, time_first=EPOCH,
                 time_delta=None, projection="EPSG:4326"):
        try:
            import numpy as np
            if isinstance(data, np.ndarray):
                data = data.tolist()
        except ImportError:
            pass
        if not isinstance(time_first, datetime):
            raise TypeError(
                "'{}' object is not allowed".format(type(time_first)))
        if time_delta is not None and not isinstance(time_delta, timedelta):
            raise TypeError(
                "'{}' object is not allowed".format(type(time_delta)))
        super().__init__(data, no_data_value, time_first, time_delta,
                         projection)

    @property
    def period(self):
        data, _, t0, dt = self.args[:4]
        bands = len(data) if isinstance(data[0][0], list) else 1
        if dt is None or bands == 1:
            return (t0, t0)
        return (t0, t0 + dt * (bands - 1))

    def _build(self, ctx):
        data, nodata, t0, dt = self.args[:4]
        if not isinstance(data[0][0], list):
            data = [data]  # (h, w) -> (1, h, w)
        rows = []
        for band, grid in enumerate(data):
            t = t0 + (dt * band if dt else timedelta(0))
            for y, row in enumerate(grid):
                for x, v in enumerate(row):
                    value = None if (v is None or v == nodata) else float(v)
                    rows.append((t, y, x, value))
        df = ctx.spark.createDataFrame(
            rows, schema="time timestamp, y bigint, x bigint, value double")
        return apply_raster_request(df, ctx.request)


class RasterParquetSource(RasterBlock):
    """Cell-table parquet source — the scale path (reference analogue:
    RasterFileSource, raster/sources.py:396, which reads GDAL files via a
    time-indexed URL template).  Expect columns (time, y, x, value);
    a directory partitioned by date and bucketed by (y, x) gives partition
    pruning on time plus shuffle-free grid joins."""

    def __init__(self, url, time_first=None, time_delta=None):
        if not isinstance(url, str):
            raise TypeError("'{}' object is not allowed".format(type(url)))
        super().__init__(url, time_first, time_delta)

    def _build(self, ctx):
        df = ctx.spark.read.parquet(self.args[0])
        # a RasterFileSink layout carries a `date` partition column:
        # derive partition predicates from the time request so the scan
        # prunes whole date directories (PartitionFilters), not just
        # row groups
        if "date" in df.columns:
            start, stop = ctx.request.get("start"), ctx.request.get("stop")
            if start is not None:
                df = df.filter(F.col("date") >= F.to_date(F.lit(start)))
            if stop is not None:
                df = df.filter(F.col("date") <= F.to_date(F.lit(stop)))
        return apply_raster_request(df.select("time", "y", "x", "value"),
                                    ctx.request)


class TableRasterSource(RasterBlock):
    """Adapt a SQL expression over registered tables into a raster cell
    table — lets any tabular lineage (e.g. the driver's lineitem table)
    feed the raster plane without copying data.

    Args:
      sql: a query producing columns (time, y, x, value).
    """

    def __init__(self, sql):
        if not isinstance(sql, str):
            raise TypeError("'{}' object is not allowed".format(type(sql)))
        super().__init__(sql)

    def _build(self, ctx):
        df = ctx.spark.sql(self.args[0])
        return apply_raster_request(
            df.select(F.col("time").cast("timestamp"),
                      F.col("y").cast("bigint"),
                      F.col("x").cast("bigint"),
                      F.col("value").cast("double")),
            ctx.request)
