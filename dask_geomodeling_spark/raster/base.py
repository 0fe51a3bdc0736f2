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
           "apply_raster_request", "align",
           "raster_statistic_expr"]

CELL_COLUMNS = ("time", "y", "x", "value")


def raster_statistic_expr(statistic, col="value"):
    """``functions.statistic_expr`` with the raster plane's value
    contract applied: the value column is DOUBLE everywhere, so
    ``count`` (the one integer-typed statistic) casts — one shared
    definition for TemporalAggregate/Cumulative/reductions/Place
    (round 14; FocalStatistic and Warp cast all statistics already).
    The FEATURE plane's AggregateRaster keeps raw bigint counts —
    counts are natural integers in attribute columns."""
    from dask_geomodeling_spark.functions import statistic_expr
    expr = statistic_expr(statistic, col)
    return expr.cast("double") if statistic == "count" else expr
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
    # bounds become UTC-instant literals via timestamp_micros — a
    # naive-datetime/string F.lit renders through the session
    # timezone, silently shifting the filter on a non-UTC session
    # (r14 review; naive bounds are UTC by the dt_to_ms convention)
    from dask_geomodeling_spark.utils import request_instant_us
    if start is not None:
        df = df.filter(F.col("time")
                       >= F.timestamp_micros(
                           F.lit(request_instant_us(start))))
    if stop is not None:
        df = df.filter(F.col("time")
                       <= F.timestamp_micros(
                           F.lit(request_instant_us(stop))))
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
        bbox.

        A ``projection`` differing from the block's native CRS WARPS
        the response onto the request grid when the request also
        carries ``width``/``height`` (reference raster/base.py:9
        returns request-projection, request-resolution stacks): the
        cells come back as target-grid indices resampled
        nearest-neighbor through the closed-form transforms
        (raster/warp.py).  Without a requested resolution the request
        ``bbox`` transforms into the native CRS before it filters the
        scan and the response cells stay on the native grid, with the
        returned ``projection`` saying so."""
        req_proj = request.get("projection")
        native = str(self.projection).upper()
        mode = request.get("mode", "vals")
        if (req_proj is not None and request.get("bbox") is not None
                and str(req_proj).upper() != native
                and request.get("width") and request.get("height")
                and mode == "vals"):
            from dask_geomodeling_spark.raster.warp import Warp
            df = Warp(self).plan(spark, **request)
            return {"features": df, "no_data_value": None,
                    "projection": str(req_proj).upper()}
        if (req_proj is not None and request.get("bbox") is not None
                and str(req_proj).upper() != native):
            from dask_geomodeling_spark.geometry.proj import (
                transform_extent)
            request = dict(request, bbox=transform_extent(
                tuple(request["bbox"]), str(req_proj).upper(), native))
        df = self.plan(spark, **request)
        if mode in ("time", "meta"):
            # the band list is the reference's own API contract
            # (raster/base.py:46 returns one entry per band), but the
            # driver materialization is BOUNDED: start/stop filtered in
            # the plan, plus an optional request `limit` before the
            # collect — a 1e8-band store cannot OOM the driver on a
            # metadata call when the caller windows the request.
            bands = df.select("time").distinct().orderBy("time")
            limit = request.get("limit")
            if limit is not None:
                bands = bands.limit(int(limit))
            rows = bands.collect()
            if mode == "time":
                return {"time": [r[0] for r in rows]}
            # cell tables carry no per-band sidecar: None placeholders
            # aligned to the time axis
            return {"meta": [None for _ in rows]}
        if mode == "extent":
            row = df.agg(F.min("x"), F.min("y"), F.max("x"), F.max("y")).first()
            return {"extent": tuple(row), "projection": native}
        return {"features": df, "no_data_value": None,
                "projection": native}

    def to_file(self, *args, **kwargs):
        """Export utility (reference: raster/base.py:52)."""
        from dask_geomodeling_spark.raster.sinks import to_file
        return to_file(self, *args, **kwargs)

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

    def __neg__(self):
        from dask_geomodeling_spark.raster.elemwise import Multiply
        return Multiply(self, -1)

    def __pow__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Power
        return Power(self, other)

    # comparisons build blocks, exactly like the reference
    # (raster/base.py:126-176) — so `raster > 5` is a view, not a bool.
    # __hash__ is restored explicitly below: defining __eq__ would
    # otherwise clear it, and blocks rely on identity hashing.
    def __eq__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Equal
        return Equal(self, other)

    def __ne__(self, other):
        from dask_geomodeling_spark.raster.elemwise import NotEqual
        return NotEqual(self, other)

    def __gt__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Greater
        return Greater(self, other)

    def __ge__(self, other):
        from dask_geomodeling_spark.raster.elemwise import GreaterEqual
        return GreaterEqual(self, other)

    def __lt__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Less
        return Less(self, other)

    def __le__(self, other):
        from dask_geomodeling_spark.raster.elemwise import LessEqual
        return LessEqual(self, other)

    def __invert__(self):
        from dask_geomodeling_spark.raster.elemwise import Invert
        return Invert(self)

    def __and__(self, other):
        from dask_geomodeling_spark.raster.elemwise import And
        return And(self, other)

    def __or__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Or
        return Or(self, other)

    def __xor__(self, other):
        from dask_geomodeling_spark.raster.elemwise import Xor
        return Xor(self, other)

    __hash__ = object.__hash__

    # ------------------------------------------------- store metadata
    # The reference derives these from per-store metadata chains
    # (raster/base.py:187-227 delegate up the block tree).  In the
    # cell-table model the plan IS the metadata source: each property
    # compiles to a tiny aggregation that Catalyst prunes to the one
    # column it needs — on date-partitioned parquet min/max(time) come
    # from footer statistics, so these stay cheap at 100 TB.  They are
    # actions (they run a job); blocks stay session-free until then.
    def _meta_plan(self):
        return self.plan()

    @property
    def period(self):
        """(first, last) band timestamp, or None when empty
        (reference: raster/base.py:199)."""
        row = self._meta_plan().agg(F.min("time"), F.max("time")).first()
        if row is None or row[0] is None:
            return None
        return (row[0], row[1])

    @property
    def timedelta(self):
        """The equidistant band spacing, or None when bands are not
        aligned / fewer than 2 bands (reference: raster/base.py:203).

        Executor-side: n distinct timestamps are equally spaced iff
        ``span = max−min`` divides evenly by ``n−1`` AND every offset
        from ``min`` is a multiple of ``span/(n−1)`` (n distinct
        multiples of d inside [0, (n−1)·d] must fill every slot).
        Two scalar aggregation jobs; the time dimension itself never
        reaches the driver."""
        from datetime import timedelta as _timedelta
        meta = self._meta_plan()
        row = meta.agg(
            F.countDistinct("time").alias("n"),
            F.unix_micros(F.min("time")).alias("mn"),
            F.unix_micros(F.max("time")).alias("mx")).first()
        n, mn, mx = row
        if not n or n < 2:
            return None
        span = mx - mn
        if span % (n - 1):
            return None
        d = span // (n - 1)
        off = meta.agg(
            F.max(F.pmod(F.unix_micros(F.col("time")) - F.lit(mn),
                         F.lit(d))).alias("r")).first().r
        return _timedelta(microseconds=d) if off == 0 else None

    @property
    def temporal(self):
        """Whether the raster has a real time axis (more than one band
        — reference: raster/base.py:207 store.temporal)."""
        return len(self._meta_plan().select("time").distinct().head(2)) > 1

    @property
    def extent(self):
        """Cell-index bounding box (x1, y1, x2, y2), or None when empty
        (reference: raster/base.py:195)."""
        row = self._meta_plan().agg(F.min("x"), F.min("y"),
                                    F.max("x"), F.max("y")).first()
        if row is None or row[0] is None:
            return None
        return (row[0], row[1], row[2], row[3])

    @property
    def dtype(self):
        """numpy dtype of the value plane (reference: raster/base.py:211)."""
        import numpy as np
        kind = self._meta_plan().schema["value"].dataType.simpleString()
        return np.dtype({"double": "float64", "float": "float32",
                         "boolean": "bool", "bigint": "int64",
                         "int": "int32"}.get(kind, "float64"))

    @property
    def fillvalue(self):
        """No-data marker (reference: raster/base.py:215).  The cell
        table encodes no-data as SQL NULL, so there is no sentinel
        number: None (and None for boolean rasters, like the
        reference's 'no fill for bool')."""
        return None

    @property
    def geometry(self):
        """WKT polygon of the extent (reference returns an ogr geometry,
        raster/base.py:219; WKT is the GDAL-free analogue)."""
        ext = self.extent
        if ext is None:
            return None
        x1, y1, x2, y2 = ext
        return ("POLYGON (({x1} {y1}, {x2} {y1}, {x2} {y2}, "
                "{x1} {y2}, {x1} {y1}))").format(x1=x1, y1=y1, x2=x2, y2=y2)

    @property
    def projection(self):
        """CRS carried by the source chain (reference:
        raster/base.py:223); sources default to EPSG:4326."""
        for arg in self.args:
            if isinstance(arg, RasterBlock):
                return arg.projection
        return "EPSG:4326"

    @property
    def geo_transform(self):
        """GDAL-style (x0, dx, 0, y0, 0, dy) over the unit cell grid
        (reference: raster/base.py:227)."""
        ext = self.extent
        if ext is None:
            return None
        return (float(ext[0]), 1.0, 0.0, float(ext[1]), 0.0, 1.0)

    def __len__(self):
        """Number of temporal bands (reference: raster/base.py:75)."""
        period = self.period
        if period is None:
            return 0
        start, stop = period
        if start == stop:
            return 1
        delta = self.timedelta
        if delta is None:
            return self._meta_plan().select("time").distinct().count()
        return int((stop - start).total_seconds()
                   / delta.total_seconds()) + 1


class BaseSingle(RasterBlock):
    """Single-source raster base (reference: raster/base.py:177)."""

    def __init__(self, store, *args):
        if not isinstance(store, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(store)))
        super().__init__(store, *args)

    @property
    def store(self):
        return self.args[0]
