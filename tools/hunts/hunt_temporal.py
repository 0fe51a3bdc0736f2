"""Temporal family hunt: TemporalAggregate (freq windows, closed/label
variants, stats), Cumulative (restart periods), TemporalFill vs
pure-python models on random sparse series; (y, x) rides as the
test-case axis."""
import os, sys, random, math, statistics
from datetime import datetime, timezone, timedelta
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource
from dask_geomodeling_spark.raster.temporal import (TemporalAggregate,
                                                    Cumulative,
                                                    TemporalFill)

rng = random.Random(808)
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
N_SERIES = 40
rows = []
series = {}
for s in range(N_SERIES):
    times = sorted(rng.sample(range(0, 500), rng.randint(1, 24)))
    pts = []
    for tm in times:
        v = round(rng.uniform(-5, 5), 3)
        pts.append((tm, v))
        rows.append((EPOCH + timedelta(minutes=7 * tm), s, s % 7, v))
    series[s] = pts
df = spark.createDataFrame(rows, "time timestamp, y bigint, x bigint, value double")
src = DataFrameRasterSource(df)

def stat_of(vs, stat):
    if stat == "sum": return sum(vs)
    if stat == "mean": return sum(vs)/len(vs)
    if stat == "min": return min(vs)
    if stat == "max": return max(vs)
    if stat == "count": return float(len(vs))
    if stat == "median": return statistics.median(vs)
    raise ValueError(stat)

fails = []
# --- TemporalAggregate over 1-hour windows, all closed/label combos
for stat in ("sum", "mean", "min", "max", "count", "median"):
    for closed in (None, "right"):
        for label in (None, "right"):
            blk = TemporalAggregate(src, "h", stat, closed=closed,
                                    label=label or "left")
            got = {}
            for r in blk.plan(spark).collect():
                got[(r["y"], r["time"].replace(tzinfo=timezone.utc))] = r["value"]
            want = {}
            for s, pts in series.items():
                buckets = {}
                for tm, v in pts:
                    mins = 7 * tm
                    if closed == "right":
                        # (start, end]: shift 1us earlier before bucketing
                        b = (mins * 60 * 10**6 - 1) // (3600 * 10**6)
                    else:
                        b = mins // 60
                    buckets.setdefault(b, []).append(v)
                for b, vs in buckets.items():
                    lab = EPOCH + timedelta(hours=b + (1 if label == "right" else 0))
                    want[(s, lab)] = stat_of(vs, stat)
            miss = set(got) ^ set(want)
            bad = [k for k in set(got) & set(want)
                   if abs(got[k]-want[k]) > 1e-9*max(1, abs(want[k]))]
            if miss or bad:
                fails.append(("agg", stat, closed, label, len(miss), bad[:2]))

# --- Cumulative sum with hourly restart
blk = Cumulative(src, "sum", frequency="h")
got = {}
for r in blk.plan(spark).collect():
    got[(r["y"], r["time"].replace(tzinfo=timezone.utc))] = r["value"]
want = {}
for s, pts in series.items():
    acc_by_hour = {}
    for tm, v in pts:
        h = (7 * tm) // 60
        acc_by_hour[h] = acc_by_hour.get(h, 0.0) + v
        want[(s, EPOCH + timedelta(minutes=7*tm))] = acc_by_hour[h]
miss = set(got) ^ set(want)
bad = [k for k in set(got) & set(want)
       if abs(got[k]-want[k]) > 1e-9*max(1, abs(want[k]))]
if miss or bad:
    fails.append(("cumulative", len(miss), bad[:3],
                  [(k, got.get(k), want.get(k)) for k in list(miss)[:3]]))

print("temporal hunt fails:", fails if fails else 0)
