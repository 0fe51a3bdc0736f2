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
from dask_geomodeling_spark.raster.base import (BaseSingle, RasterBlock,
                                                raster_statistic_expr)

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

# calendar (non-fixed) aliases — case-SENSITIVE like pandas, so the
# month family never collides with minutes.  'M'/'ME'/'MS' all bin by
# calendar month, 'Q*' by quarter (3 months), 'Y*'/'A*' by year
# (12 months); 'W-MON'..'W-SUN' are weeks whose edges fall on the
# anchor weekday at midnight.  Bins are produced by date arithmetic
# (add_months / epoch-day math), NOT a fixed window() duration.
_CAL_RE = re.compile(
    r"^(\d*)\s*(MS|ME|M|QS|QE|Q|YS|YE|Y|AS|A|B"
    r"|W-(?:MON|TUE|WED|THU|FRI|SAT|SUN))$")
_CAL_MONTHS = {"M": 1, "MS": 1, "ME": 1, "Q": 3, "QS": 3, "QE": 3,
               "Y": 12, "YS": 12, "YE": 12, "A": 12, "AS": 12}
# Monday=0 … Sunday=6; 1970-01-01 (epoch day 0) was a Thursday (3)
_WEEK_ANCHOR = {"MON": 0, "TUE": 1, "WED": 2, "THU": 3,
                "FRI": 4, "SAT": 5, "SUN": 6}


def normalize_frequency(frequency):
    """pandas offset alias → canonical frequency token.

    Fixed-duration aliases ('5T', 'H', '2D', 'W', …) normalize to a
    Spark window duration ('5 minutes', '1 hours', '2 days').
    CALENDAR aliases — months 'M', quarters 'Q', years 'Y'/'A'
    (optional S/E suffix accepted; binning is identical), anchored
    weeks 'W-MON'…'W-SUN', each with an optional multiplier ('3M'),
    and business days 'B' (weekend instants bin to Friday) —
    normalize to a ``CAL:`` token handled by date arithmetic at build
    time (reference raster/temporal.py:298-318 resamples through
    pandas for exactly these non-fixed frequencies).

    Calendar conventions (documented divergence from bare pandas
    'M'): bins are LEFT-labeled by their calendar start by default —
    'M' means pandas 'MS' semantics — and multipliers anchor at the
    epoch (1970-01); ``label='right'`` labels by the next bin start.
    Anchored weeks run [anchor 00:00, next anchor 00:00) local time.
    """
    def multiplier(m):
        # '0M'/'0D' would reach pmod(_, 0) / a zero window at run
        # time — fail at construction like every other bad alias
        n = int(m.group(1) or 1)
        if n < 1:
            raise ValueError(
                "Unsupported frequency '{}': multiplier must be >= 1"
                .format(frequency))
        return n

    s = frequency.strip()
    m = _CAL_RE.match(s)
    if m:
        n = multiplier(m)
        unit = m.group(2)
        if unit == "B":
            # business days: a Friday bin spans Fri 00:00 → Mon
            # 00:00 (weekend instants belong to Friday — the pandas
            # 'B' resample convention); multiples have no anchored
            # pandas meaning, so refuse them
            if n != 1:
                raise ValueError(
                    "Unsupported frequency '{}': business-day "
                    "multiples have no calendar anchor".format(
                        frequency))
            return "CAL:1B"
        if unit.startswith("W-"):
            return "CAL:{}W:{}".format(n, unit[2:])
        return "CAL:{}M".format(n * _CAL_MONTHS[unit])
    m = _FREQ_RE.match(s)
    if not m:
        raise ValueError(
            "Unsupported frequency '{}'".format(frequency))
    n = multiplier(m)
    unit = _UNIT.get(m.group(2).lower())
    if unit is None:
        raise ValueError(
            "Unsupported frequency unit '{}'".format(m.group(2)))
    return "{} {}".format(n, unit)


def _calendar_window(t, token):
    """``CAL:`` token → (start, end) timestamp columns for the bin of
    local wall-clock instant ``t``.

    Months: bucket = floor(months-since-1970 / n)·n via ``pmod`` (sign
    -safe for pre-epoch times) + ``add_months`` — leap years and month
    lengths come from the JVM calendar, never a fixed duration.
    Anchored weeks: epoch-day arithmetic (1970-01-01 = Thursday), bins
    of 7n days starting on the anchor weekday.

    SESSION-timezone independent end to end (the r14 review caught
    ``F.year``/``F.to_date`` ON TIMESTAMPS rendering through
    ``spark.sql.session.timeZone``, which would silently shift the
    binning on an externally configured non-UTC session): epoch DAYS
    come from floor-division of the raw ``unix_micros`` instant, and
    every calendar extraction happens on DATE values (pure civil
    arithmetic, no zone), exactly mirroring the fixed-duration
    ``window()`` path's UTC-micros behavior."""
    from dask_geomodeling_spark.config import utc_epoch_days
    body = token[4:]
    epoch = F.lit("1970-01-01").cast("date")
    days = utc_epoch_days(t)
    d = F.date_add(epoch, days)

    def ts(datecol):
        return F.timestamp_seconds(
            F.unix_date(datecol).cast("bigint") * 86400)

    if body.endswith("M"):
        n = int(body[:-1])
        ms = ((F.year(d) - 1970) * 12 + F.month(d) - 1).cast("int")
        b = (ms - F.pmod(ms, F.lit(n))).cast("int")
        return (ts(F.add_months(epoch, b)),
                ts(F.add_months(epoch, b + n)))
    if body == "1B":
        # weekday index Mon=0 from epoch days (1970-01-01 = Thursday);
        # Sat/Sun roll back to Friday, the bin then runs to the next
        # business day (Fri → +3, else +1)
        dow = F.pmod(days + 3, F.lit(7))
        sd = days - F.when(dow >= 5, dow - 4).otherwise(F.lit(0))
        sdow = F.pmod(sd + 3, F.lit(7))
        ed = sd + F.when(sdow == 4, F.lit(3)).otherwise(F.lit(1))
        return (ts(F.date_add(epoch, sd)), ts(F.date_add(epoch, ed)))
    nw, anchor = body.split("W:")
    per = 7 * int(nw)
    # first anchor weekday at/after the epoch: Thursday=3
    off = (_WEEK_ANCHOR[anchor] - 3) % 7
    sd = days - F.pmod(days - F.lit(off), F.lit(per))
    return (ts(F.date_add(epoch, sd)),
            ts(F.date_add(epoch, sd + per)))


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
    ``window(time, frequency)`` for fixed durations, or by calendar
    date arithmetic for non-fixed frequencies — months 'M', quarters
    'Q', years 'Y', anchored weeks 'W-MON' (round 14; the reference
    resamples ANY pandas alias through ``series.resample``, reference
    raster/temporal.py:272-318 — "monthly rainfall sum" is the
    day-one request this unblocks).  ``label`` picks the left
    (default) or right window edge.  ``closed='right'`` makes intervals right-closed
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
        # raster_statistic_expr: count casts to double (the raster
        # plane's value contract, round 14)
        stat = raster_statistic_expr(self.statistic)
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
        if self.frequency.startswith("CAL:"):
            # calendar bins (months/anchored weeks): date arithmetic,
            # same closed/label/timezone contract as the fixed path
            start, end = _calendar_window(t, self.frequency)
            win = F.struct(start.alias("start"), end.alias("end"))
        else:
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
    period — fixed durations AND calendar frequencies ('M', 'Q', 'Y',
    'W-MON', round 14), with ``timezone`` deciding where the period
    boundary falls (local calendar months restart at local midnight of
    the 1st).  A per-cell ordered window — partitioned by
    (y, x, period), so it scales with the grid."""

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
            timezone = self.args[3]
            t = F.col("time")
            if timezone and timezone != "UTC":
                # period boundaries on LOCAL wall-clock time — the
                # TemporalAggregate contract (round 14: previously the
                # timezone argument was accepted but silently unused)
                t = F.from_utc_timestamp(t, timezone)
            if self.frequency.startswith("CAL:"):
                start, _ = _calendar_window(t, self.frequency)
                df = df.withColumn("_w", start)
            else:
                df = df.withColumn("_w", F.window(t, self.frequency))
            keys = keys + ["_w"]
        w = (Window.partitionBy(*keys).orderBy("time")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        agg = F.sum("value") if self.statistic == "sum" else \
            F.count("value")
        run = agg.over(w)
        if self.statistic == "count":
            run = run.cast("double")   # value is DOUBLE plane-wide
        out = df.withColumn("value", run)
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
