"""Raster-plane base (reference: raster/base.py:9 ``RasterBlock``).

**Spark-first raster model**: a raster stack is a long-form **cell table**

    time: timestamp   -- band timestamp (constant epoch for static rasters)
    y, x: bigint      -- cell indices
    value: double     -- cell value; NULL = 'no data'

The reference returns dense numpy stacks per request; a dense array does
not distribute, a cell table does: it partitions by time (partition
pruning), co-partitions by (y, x) for shuffle-free same-grid alignment
(bucketing at scale), and NULL-as-no-data makes every no-data rule an
ordinary SQL NULL rule that Catalyst understands.  Scalar elemwise math is
pure column projection (no shuffle); raster⋈raster alignment is an equi-
join on (time, y, x).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dask_geomodeling_spark.core.blocks import Block

__all__ = ["RasterBlock", "BaseSingle", "CELL_COLUMNS", "EPOCH",
           "apply_raster_request", "align"]

CELL_COLUMNS = ("time", "y", "x", "value")
#: band timestamp used for non-temporal rasters
EPOCH = datetime(1970, 1, 1)


def apply_raster_request(df, request):
    """Translate a raster request (reference raster/base.py:9 docstring:
    bbox + start/stop + width/height striding) into predicates — pushed
    into the scan by Catalyst."""
    bbox = request.get("bbox")
    if bbox is not None:
        x1, y1, x2, y2 = bbox
        df = df.filter((F.col("x") >= x1) & (F.col("x") <= x2)
                       & (F.col("y") >= y1) & (F.col("y") <= y2))
        # width/height request a coarser resolution than the native grid
        # (reference raster/base.py:9: the response is a width x height
        # array over the bbox): nearest-cell striding keeps every
        # stride-th cell — a pure scan predicate, no resample shuffle
        width, height = request.get("width"), request.get("height")
        if width:
            sx = max(int((x2 - x1 + 1) // int(width)), 1)
            if sx > 1:
                df = df.filter(F.pmod(F.col("x") - F.lit(int(x1)),
                                      F.lit(sx)) == 0)
        if height:
            sy = max(int((y2 - y1 + 1) // int(height)), 1)
            if sy > 1:
                df = df.filter(F.pmod(F.col("y") - F.lit(int(y1)),
                                      F.lit(sy)) == 0)
    start, stop = request.get("start"), request.get("stop")
    if start is not None:
        df = df.filter(F.col("time") >= F.lit(start))
    if stop is not None:
        df = df.filter(F.col("time") <= F.lit(stop))
    return df


def align(dfs, how="full"):
    """Align raster cell tables on (time, y, x) → one frame with columns
    ``v0..v{n-1}``.  The equi-join keys are the grid coordinates; with both
    sides bucketed by (y, x) at write time this is shuffle-free, and AQE
    handles skew otherwise."""
    out = dfs[0].select("time", "y", "x", F.col("value").alias("v0"))
    for i, df in enumerate(dfs[1:], start=1):
        right = df.select("time", "y", "x",
                          F.col("value").alias("v{}".format(i)))
        out = out.join(right, ["time", "y", "x"], how)
    return out


class RasterBlock(Block):
    """Base raster block (reference: raster/base.py:9)."""

    def _build(self, ctx):
        raise NotImplementedError

    def get_data(self, spark=None, **request):
        """Materialized cell response; ``mode="time"`` returns the distinct
        band times (reference's time request), ``mode="extent"`` the cell
        bbox."""
        df = self.plan(spark, **request)
        mode = request.get("mode", "vals")
        if mode == "time":
            rows = df.select("time").distinct().orderBy("time").collect()
            return {"time": [r[0] for r in rows]}
        if mode == "extent":
            row = df.agg(F.min("x"), F.min("y"), F.max("x"), F.max("y")).first()
            return {"extent": tuple(row)}
        return {"features": df, "no_data_value": None}

    # ---------------------------------------------------------- sugar
    def __add__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Add
        return Add(self, other)

    __radd__ = __add__

    def __sub__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Subtract
        return Subtract(self, other)

    def __mul__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Multiply
        return Multiply(self, other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Divide
        return Divide(self, other)


class BaseSingle(RasterBlock):
    """Single-source raster base (reference: raster/base.py:177)."""

    def __init__(self, store, *args):
        if not isinstance(store, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(store)))
        super().__init__(store, *args)

    @property
    def store(self):
        return self.args[0]
