"""Temporal raster operations (reference: raster/temporal.py).

All temporal ops stay on the cell table: ``TemporalAggregate`` is a
grouped aggregation over ``window(time, freq)`` (map-side partial
aggregation + one shuffle on (y, x, window)); ``Cumulative`` is a running
window per cell; ``Snap`` builds a tiny time-mapping table (distinct
timestamps are small) and broadcast-joins it onto the cells.
"""

from __future__ import annotations

import re
from datetime import timedelta

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_geomodeling_spark.functions import (parse_percentile_statistic,
                                              statistic_expr)
from dask_geomodeling_spark.raster.base import BaseSingle, RasterBlock

__all__ = ["Snap", "Shift", "TemporalAggregate", "TemporalSum",
           "TemporalFill",
           "Cumulative", "Resample", "normalize_frequency"]

_FREQ_RE = re.compile(r"^(\d*)\s*([a-zA-Z]+)$")
_UNIT = {
    "s": "seconds", "sec": "seconds", "second": "seconds",
    "t": "minutes", "min": "minutes", "minute": "minutes",
    "h": "hours", "hour": "hours",
    "d": "days", "day": "days",
    "w": "weeks", "week": "weeks",
}


def normalize_frequency(frequency):
    """pandas offset alias ('5T', 'H', '2D', ...) → Spark window duration
    ('5 minutes', '1 hours', '2 days')."""
    m = _FREQ_RE.match(frequency.strip())
    if not m:
        raise ValueError(
            "Unsupported frequency '{}'".format(frequency))
    n = int(m.group(1) or 1)
    unit = _UNIT.get(m.group(2).lower())
    if unit is None:
        raise ValueError(
            "Unsupported frequency unit '{}'".format(m.group(2)))
    return "{} {}".format(n, unit)


class Snap(RasterBlock):
    """Take cell values from ``store`` with the time structure of ``index``
    (reference: raster/temporal.py:42 — each index timestamp maps to the
    closest store timestamp).

    Nearest-time matching is an **as-of merge, not a join**: both time
    sets union into one sorted sequence and two running windows carry the
    last store time at-or-before and the first store time after each
    index time; the closer of the two wins (ties -> the earlier store
    time).  That is O(n log n) in the number of distinct timestamps where
    the naive time x time cross join is O(n^2) — a year of 5-minute
    frames is 1e5 distinct times (fine) vs 1e10 pairs (not).  The
    resulting mapping table is tiny, so the final join onto the cell
    table is a broadcast join — no large-side shuffle.
    """

    def __init__(self, store, index):
        for x in (store, index):
            if not isinstance(x, RasterBlock):
                raise TypeError("'{}' object is not allowed".format(type(x)))
        super().__init__(store, index)

    @property
    def store(self):
        return self.args[0]

    @property
    def index(self):
        return self.args[1]

    def _build(self, ctx):
        store = self.store._build(ctx)
        index_times = (self.index._build(ctx)
                       .select(F.col("time").alias("_t")).distinct()
                       .withColumn("_side", F.lit(1)))
        store_times = (store.select(F.col("time").alias("_t")).distinct()
                       .withColumn("_side", F.lit(0)))
        u = index_times.unionByName(store_times)
        # store rows sort before index rows at equal time, so an exact
        # match is picked up by the backward window with diff 0.  The
        # un-partitioned window is over distinct timestamps only — time-
        # dimension-sized, not data-sized.
        order = [F.col("_t").asc(), F.col("_side").asc()]
        wb = (Window.orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wf = (Window.orderBy(*order)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        stime = F.when(F.col("_side") == 0, F.col("_t"))
        cand = (u.withColumn("_prev",
                             F.last(stime, ignorenulls=True).over(wb))
                 .withColumn("_next",
                             F.first(stime, ignorenulls=True).over(wf)))
        prev_diff = (F.col("_t").cast("double")
                     - F.col("_prev").cast("double"))
        next_diff = (F.col("_next").cast("double")
                     - F.col("_t").cast("double"))
        snapped = (F.when(F.col("_next").isNull(), F.col("_prev"))
                   .when(F.col("_prev").isNull(), F.col("_next"))
                   .when(prev_diff <= next_diff, F.col("_prev"))
                   .otherwise(F.col("_next")))
        mapping = (cand.filter(F.col("_side") == 1)
                   .select(F.col("_t").alias("_itime"),
                           snapped.alias("time")))
        out = store.join(F.broadcast(mapping), "time")
        return out.select(F.col("_itime").alias("time"), "y", "x", "value")


class Shift(BaseSingle):
    """Shift a temporal raster by a timedelta (reference:
    raster/temporal.py:185; positive = into the future).  Accepts a
    ``timedelta`` or milliseconds (the reference's unit)."""

    def __init__(self, store, time):
        if isinstance(time, timedelta):
            time = int(time.total_seconds() * 1000)
        if not isinstance(time, int):
            raise TypeError("'{}' object is not allowed".format(type(time)))
        super().__init__(store, time)

    @property
    def time(self):
        return self.args[1]

    def _build(self, ctx):
        df = self.store._build(ctx)
        shifted = (F.col("time").cast("double")
                   + F.lit(self.time / 1000.0)).cast("timestamp")
        return df.select(shifted.alias("time"), "y", "x", "value")


class TemporalAggregate(BaseSingle):
    """Aggregate a raster in time (reference: raster/temporal.py:480).

    frequency None → one statistic over the whole period per cell, stamped
    at the end of the raster period.  Otherwise cells group by
    ``window(time, frequency)``; ``label`` picks the left (default) or
    right window edge.  ``closed='right'`` makes intervals right-closed
    ``(start, end]`` (pandas resample semantics, reference
    raster/temporal.py:480): implemented by shifting times back one
    microsecond (Spark's finest timestamp resolution) before the
    left-closed ``window`` — boundary points fall into the earlier
    bucket, interior points are unaffected.  ``timezone`` evaluates the
    window boundaries on local wall-clock time (``from_utc_timestamp``
    in, ``to_utc_timestamp`` out), so e.g. daily buckets split at local
    midnight.  Statistics: sum count min max mean median std var
    p<percentile> — NULL-skipping by construction.
    """

    STATISTICS = ("sum", "count", "min", "max", "mean", "median", "std",
                  "var")

    def __init__(self, source, frequency, statistic="sum", closed=None,
                 label=None, timezone="UTC"):
        if frequency is not None:
            if not isinstance(frequency, str):
                raise TypeError(
                    "'{}' object is not allowed".format(type(frequency)))
            frequency = normalize_frequency(frequency)
            if closed not in (None, "left", "right"):
                raise ValueError("closed must be None, 'left', or 'right'.")
            if label not in (None, "left", "right"):
                raise ValueError("label must be None, 'left', or 'right'.")
        else:
            closed = label = None
        statistic = statistic.lower()
        if (statistic not in self.STATISTICS
                and parse_percentile_statistic(statistic) is None):
            raise ValueError("Unknown statistic '{}'".format(statistic))
        super().__init__(source, frequency, statistic, closed, label,
                         timezone)

    @property
    def frequency(self):
        return self.args[1]

    @property
    def statistic(self):
        return self.args[2]

    def _build(self, ctx):
        df = self.store._build(ctx)
        stat = statistic_expr(self.statistic)
        if self.frequency is None:
            per_cell = df.groupBy("y", "x").agg(stat.alias("value"))
            end = df.agg(F.max("time").alias("time"))
            return (per_cell.crossJoin(F.broadcast(end))
                    .select("time", "y", "x", "value"))
        closed, label_side, timezone = self.args[3], self.args[4], \
            self.args[5]
        t = F.col("time")
        if timezone and timezone != "UTC":
            t = F.from_utc_timestamp(t, timezone)
        if closed == "right":
            # (start, end]: boundary instants shift into the earlier
            # left-closed bucket; 1 us = Spark timestamp resolution
            t = F.timestamp_micros(F.unix_micros(t) - 1)
        win = F.window(t, self.frequency)
        label = F.col("_w.end") if label_side == "right" else \
            F.col("_w.start")
        if timezone and timezone != "UTC":
            label = F.to_utc_timestamp(label, timezone)
        return (df.groupBy(win.alias("_w"), "y", "x")
                .agg(stat.alias("value"))
                .select(label.alias("time"), "y", "x", "value"))


class TemporalSum(TemporalAggregate):
    """Deprecated alias (reference: raster/temporal.py:239)."""

    def __init__(self, source, frequency=None, timezone="UTC"):
        super().__init__(source, frequency, "sum", None, None, timezone)


class Cumulative(BaseSingle):
    """Running statistic over time per cell (reference:
    raster/temporal.py:775); ``frequency`` restarts the accumulation each
    period.  A per-cell ordered window — partitioned by (y, x, period), so
    it scales with the grid."""

    STATISTICS = ("sum", "count")

    def __init__(self, source, statistic="sum", frequency=None,
                 timezone="UTC"):
        if statistic not in self.STATISTICS:
            raise ValueError("Unknown statistic '{}'".format(statistic))
        if frequency is not None:
            frequency = normalize_frequency(frequency)
        super().__init__(source, statistic, frequency, timezone)

    @property
    def statistic(self):
        return self.args[1]

    @property
    def frequency(self):
        return self.args[2]

    def _build(self, ctx):
        df = self.store._build(ctx)
        keys = ["y", "x"]
        if self.frequency is not None:
            df = df.withColumn("_w", F.window("time", self.frequency))
            keys = keys + ["_w"]
        w = (Window.partitionBy(*keys).orderBy("time")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        agg = F.sum("value") if self.statistic == "sum" else F.count("value")
        out = df.withColumn("value", agg.over(w))
        return out.select("time", "y", "x", "value")


class Resample(TemporalAggregate):
    """Resample a raster in time (reference: raster/temporal.py:1008) —
    the aggregation machinery of TemporalAggregate with resampling
    defaults."""

    def __init__(self, source, frequency, statistic="mean", closed=None,
                 label=None, timezone="UTC"):
        super().__init__(source, frequency, statistic, closed, label,
                         timezone)


class TemporalFill(BaseSingle):
    """Fill each cell's temporal gaps across the stack's band times
    (round 9 — the time-axis gap filler the reference's GDAL stack
    leaves to post-processing): a cell missing at band time t but
    present at an earlier AND a later band takes the LINEAR
    interpolation between its bracketing values (``method='linear'``);
    ``method='ffill'`` carries the last observation forward (gaps
    after the final observation stay absent in both modes, and
    'linear' leaves leading gaps absent while 'ffill' does too).

    Plan shape (scale-safe): the fill domain is (distinct band times)
    × (cells that have ANY data) — built per cell from its OWN
    min/max observed time, never a dense blow-up beyond the stack's
    true extent; the bracketing observations come from per-(y, x)
    windows (partitioned by CELL key — thousands of uniform
    partitions, bounded by bands-per-cell, never a global window) via
    ``last/first(ignorenulls)``.  Epoch arithmetic does the
    interpolation; values are exact where observed."""

    def __init__(self, store, method="linear"):
        if method not in ("linear", "ffill"):
            raise ValueError("method must be 'linear' or 'ffill'")
        super().__init__(store, method)

    def _build(self, ctx):
        method = self.args[1]
        df = self.store._build(ctx).filter(F.col("value").isNotNull())
        times = df.select("time").distinct()
        # per-cell observed span: fill only INSIDE it ('ffill' extends
        # to the stack end)
        span = (df.groupBy("y", "x")
                .agg(F.min("time").alias("_t0"),
                     F.max("time").alias("_t1")))
        if method == "ffill":
            stack_end = times.agg(F.max("time").alias("_te"))
            span = span.crossJoin(F.broadcast(stack_end)) \
                .withColumn("_t1", F.col("_te")).drop("_te")
        domain = (span.join(F.broadcast(times),
                            (F.col("time") >= F.col("_t0"))
                            & (F.col("time") <= F.col("_t1")))
                  .select("time", "y", "x"))
        full = domain.join(df, ["time", "y", "x"], "left")
        cell = Window.partitionBy("y", "x").orderBy("time")
        prev_v = F.last("value", ignorenulls=True).over(
            cell.rowsBetween(Window.unboundedPreceding, 0))
        prev_t = F.last(F.when(F.col("value").isNotNull(),
                               F.col("time")), ignorenulls=True).over(
            cell.rowsBetween(Window.unboundedPreceding, 0))
        if method == "ffill":
            return full.select("time", "y", "x",
                               prev_v.alias("value"))
        next_v = F.first("value", ignorenulls=True).over(
            cell.rowsBetween(0, Window.unboundedFollowing))
        next_t = F.first(F.when(F.col("value").isNotNull(),
                                F.col("time")), ignorenulls=True).over(
            cell.rowsBetween(0, Window.unboundedFollowing))
        frac = (F.unix_micros("time") - F.unix_micros(prev_t)) \
            / F.nullif(F.unix_micros(next_t) - F.unix_micros(prev_t),
                       F.lit(0))
        filled = F.when(F.col("value").isNotNull(), F.col("value")) \
            .otherwise(prev_v + F.coalesce(frac, F.lit(0.0))
                       * (next_v - prev_v))
        return (full.withColumn("value", filled)
                .select("time", "y", "x", "value"))
