"""Contour hunt: the distributed marching squares vs an independent
pure-python marching-squares model (same documented case table and
saddle pairing, independently re-derived) on random grids, grids
riding as time slices."""
import os
import sys, random
from decimal import ROUND_HALF_UP, Decimal

def rhu(v, nd=6):
    """Spark/DuckDB ROUND is HALF_UP; python round() is half-to-even."""
    return float(Decimal(repr(v)).quantize(Decimal("1e-%d" % nd),
                                           rounding=ROUND_HALF_UP))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource
from dask_geomodeling_spark.raster.contour import Contour

rng = random.Random(321)
K, H, W = 20, 7, 8
grids, rows = [], []
for k in range(K):
    g = {}
    for y in range(H):
        for x in range(W):
            if rng.random() < 0.85:
                v = round(rng.uniform(0, 10), 3)
                g[(y, x)] = v
                rows.append((k, y, x, v))
    grids.append(g)
df = spark.createDataFrame(rows, "k int, y bigint, x bigint, value double") \
    .select(F.expr("timestamp_seconds(86400 * k)").alias("time"), "y", "x", "value")
src = DataFrameRasterSource(df)

CASES = {
    1: [("ab", "da")], 2: [("ab", "bc")], 3: [("da", "bc")],
    4: [("bc", "cd")], 5: [("ab", "da"), ("bc", "cd")],
    6: [("ab", "cd")], 7: [("da", "cd")], 8: [("cd", "da")],
    9: [("ab", "cd")], 10: [("ab", "bc"), ("cd", "da")],
    11: [("bc", "cd")], 12: [("bc", "da")], 13: [("ab", "bc")],
    14: [("ab", "da")],
}

def model_segments(g, level, rnd=6):
    out = {}
    for (y, x), c00 in g.items():
        c10 = g.get((y, x+1)); c01 = g.get((y+1, x)); c11 = g.get((y+1, x+1))
        if None in (c10, c01, c11):
            continue
        idx = ((1 if c00 >= level else 0) + (2 if c10 >= level else 0)
               + (4 if c11 >= level else 0) + (8 if c01 >= level else 0))
        if idx not in CASES:
            continue
        pts = {
            "ab": (x + (level - c00) / (c10 - c00), float(y)),
            "bc": (x + 1.0, y + (level - c10) / (c11 - c10)),
            "cd": (x + (level - c01) / (c11 - c01), y + 1.0),
            "da": (float(x), y + (level - c00) / (c01 - c00)),
        }
        for slot, (e1, e2) in enumerate(CASES[idx]):
            p1, p2 = pts[e1], pts[e2]
            out[(y, x, slot)] = (rhu(p1[0], rnd), rhu(p1[1], rnd),
                                 rhu(p2[0], rnd), rhu(p2[1], rnd))
    return out

fails = []
levels = (2.5, 5.0, 7.75)
blk = Contour(src, levels=list(levels))
got = {}
for r in blk.plan(spark).collect():
    k = int(r["time"].timestamp() // 86400)
    got[(k, r["level"], r["y"], r["x"], r["seg"])] = (
        r["x1"], r["y1"], r["x2"], r["y2"])
want = {}
for k, g in enumerate(grids):
    for lv in levels:
        for (y, x, slot), seg in model_segments(g, lv).items():
            want[(k, lv, y, x, slot)] = seg
miss = set(got) ^ set(want)
bad = [c for c in set(got) & set(want)
       if any(abs(a-b) > 1e-9 for a, b in zip(got[c], want[c]))]
if miss or bad:
    fails.append((len(miss), [(c, got.get(c), want.get(c))
                              for c in list(miss)[:3]], bad[:3]))
print("contour hunt fails:", fails if fails else 0)
