"""Calendar-divergence cross-check vs ACTUAL pandas (round 15, r14
verdict #5): hunt_calendar verified the engine against a stdlib
calendar model; this hunt verifies each DOCUMENTED pandas mapping in
docs/migration.md against real ``Series.resample`` on random sparse
series with boundary-planted instants:

  engine 'M'              == pandas resample('MS')           (exact)
  engine 'M' label=right  == pandas resample('MS', label='right')
  engine 'M' closed=right == pandas resample('MS', closed='right')
  engine 'Q' / 'Y'        == pandas resample('QS') / ('YS')  (exact)
  engine 'W-<DAY>'        == pandas resample('W-<DAY-1>'), labels
                             shifted back 6 days (same bin content:
                             engine weeks START on the anchor, pandas
                             weeks END on it and include its full day)
  engine 'B'              == pandas resample('B') (weekend instants
                             to the Friday bin — agreement)
  engine '3M'             has NO pandas equivalent: multipliers
                             anchor at the epoch (1970-01); pandas
                             'nMS' anchors at the series start (and
                             ignores origin= for calendar freqs) —
                             asserted as a DIVERGENCE on a fixture.

Any mismatch outside these documented rows is a falsifier."""
import os
import random
import sys
from datetime import datetime, timedelta, timezone

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", ".."))
import pandas as pd  # noqa: E402

from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.raster.sources import (  # noqa: E402
    DataFrameRasterSource)
from dask_geomodeling_spark.raster.temporal import (  # noqa: E402
    TemporalAggregate)

rng = random.Random(20150818)
UTC = timezone.utc
fails = 0


def engine_bins(times, values, freq, closed=None, label=None):
    rows = [(t, 0, 0, float(v)) for t, v in zip(times, values)]
    df = spark.createDataFrame(
        rows, "time timestamp, y bigint, x bigint, value double")
    agg = TemporalAggregate(DataFrameRasterSource(df), freq, "sum",
                            closed=closed, label=label)
    return {r["time"].replace(tzinfo=None): r["value"]
            for r in agg.plan(spark).collect()}


def pandas_bins(times, values, freq, closed=None, label=None):
    s = pd.Series(values,
                  index=pd.DatetimeIndex([t.replace(tzinfo=None)
                                          for t in times]))
    r = s.resample(freq, closed=closed, label=label)
    out = r.sum()[r.count() > 0]
    return {k.to_pydatetime(): float(v) for k, v in out.items()}


def rand_series(n=40, span_days=400, plant=None):
    times, values = [], []
    base = datetime(2023, 1, 1, tzinfo=UTC)
    for _ in range(n):
        t = base + timedelta(
            seconds=rng.randrange(span_days * 86400))
        times.append(t)
        values.append(float(rng.randint(1, 9)))
    for t in (plant or []):
        times.append(t)
        values.append(1.0)
    return times, values


BOUNDARIES = [datetime(2023, 2, 1, tzinfo=UTC),
              datetime(2023, 4, 1, tzinfo=UTC),
              datetime(2024, 1, 1, tzinfo=UTC),
              datetime(2023, 7, 3, tzinfo=UTC),   # a Monday
              datetime(2023, 7, 8, tzinfo=UTC)]   # a Saturday

CASES = [
    ("M", "MS", dict(), dict()),
    ("M", "MS", dict(label="right"), dict(label="right")),
    ("M", "MS", dict(closed="right"), dict(closed="right")),
    ("Q", "QS", dict(), dict()),
    ("Y", "YS", dict(), dict()),
    ("B", "B", dict(), dict()),
]
for trial in range(8):
    times, values = rand_series(plant=BOUNDARIES)
    for efreq, pfreq, ekw, pkw in CASES:
        got = engine_bins(times, values, efreq, **ekw)
        want = pandas_bins(times, values, pfreq, **pkw)
        if got != want:
            fails += 1
            diff = {k: (got.get(k), want.get(k))
                    for k in set(got) ^ set(want)
                    | {k for k in got if got.get(k) != want.get(k)}}
            print("MISMATCH", trial, efreq, ekw, "vs pandas", pfreq,
                  pkw, dict(list(diff.items())[:4]))

# anchored weeks: engine W-<day> == pandas W-<day-1>, labels -6 days
PREV = {"MON": "SUN", "TUE": "MON", "WED": "TUE", "THU": "WED",
        "FRI": "THU", "SAT": "FRI", "SUN": "SAT"}
for trial in range(6):
    times, values = rand_series(plant=BOUNDARIES)
    anchor = rng.choice(list(PREV))
    got = engine_bins(times, values, "W-" + anchor)
    praw = pandas_bins(times, values, "W-" + PREV[anchor])
    want = {k - timedelta(days=6): v for k, v in praw.items()}
    if got != want:
        fails += 1
        print("WEEK MISMATCH", trial, anchor,
              sorted(set(got) ^ set(want))[:4])

# epoch-anchored multipliers: assert the documented DIVERGENCE
times = [datetime(1970, 2, 15, tzinfo=UTC),
         datetime(1970, 4, 2, tzinfo=UTC),
         datetime(1970, 7, 10, tzinfo=UTC),
         datetime(1971, 1, 5, tzinfo=UTC)]
values = [1.0, 2.0, 4.0, 8.0]
got = engine_bins(times, values, "3M")
want_engine = {datetime(1970, 1, 1): 1.0, datetime(1970, 4, 1): 2.0,
               datetime(1970, 7, 1): 4.0, datetime(1971, 1, 1): 8.0}
pnd = pandas_bins(times, values, "3MS")
want_pandas = {datetime(1970, 2, 1): 3.0, datetime(1970, 5, 1): 4.0,
               datetime(1970, 11, 1): 8.0}
if got != want_engine:
    fails += 1
    print("MULTIPLIER: engine no longer epoch-anchored!", got)
if pnd != want_pandas:
    fails += 1
    print("MULTIPLIER: pandas series-start anchoring changed!", pnd)
if got == pnd:
    fails += 1
    print("MULTIPLIER: documented divergence vanished — update docs")

print()
if fails:
    print("FALSIFIERS:", fails)
    sys.exit(1)
print("CLEAN: engine calendar bins match the documented pandas "
      "mappings (8x6 alias/closed/label trials + 6 anchored-week "
      "trials vs real Series.resample, pandas {}), and the '3M' "
      "epoch-anchor divergence is exactly as documented".format(
          pd.__version__))
