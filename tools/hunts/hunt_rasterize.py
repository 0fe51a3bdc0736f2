"""Rasterize hunt: polygon center-burn and polyline supercover vs
pure-python models on random features."""
import os
import sys, random, math
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.raster.misc import Rasterize

rng = random.Random(112358)

def point_in(px, py, rings):
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]; x2, y2 = ring[(i+1) % n]
            if (y1 > py) != (y2 > py):
                xi = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
                if px < xi:
                    inside = not inside
    return inside

fails = []
# --- polygon burn
for trial in range(5):
    feats = []
    for i in range(rng.randint(1, 8)):
        cx, cy = rng.uniform(2, 14), rng.uniform(2, 14)
        npts = rng.randint(3, 7)
        ring = []
        for j in range(npts):
            a = 2*math.pi*j/npts
            r = rng.uniform(1, 4)
            ring.append([round(cx + r*math.cos(a), 4),
                         round(cy + r*math.sin(a), 4)])
        feats.append((i, float(i + 1), ring))
    rows = [(i, v, [r],
             min(p[0] for p in r), min(p[1] for p in r),
             max(p[0] for p in r), max(p[1] for p in r))
            for i, v, r in feats]
    df = spark.createDataFrame(
        rows, "fid bigint, val double, rings array<array<array<double>>>, "
              "xmin double, ymin double, xmax double, ymax double")
    blk = Rasterize(DataFrameSource(df, index_column="fid"),
                    column_name="val")
    got = {(r["y"], r["x"]): r["value"]
           for r in blk.plan(spark).collect()}
    want = {}
    for i, v, ring in feats:
        xs = [p[0] for p in ring]; ys = [p[1] for p in ring]
        for y in range(math.floor(min(ys)), math.floor(max(ys)) + 1):
            for x in range(math.floor(min(xs)), math.floor(max(xs)) + 1):
                if point_in(x + 0.5, y + 0.5, [ring]):
                    key = (y, x)
                    want[key] = max(want.get(key, -1e18), v)
    if got != want:
        diff = {c for c in set(got) | set(want)
                if got.get(c) != want.get(c)}
        fails.append(("poly", trial, len(diff), sorted(diff)[:4]))
        break

# --- polyline supercover
for trial in range(5):
    paths = []
    for i in range(rng.randint(1, 6)):
        paths.append((i, float(i + 1),
                      [[round(rng.uniform(0, 12), 3),
                        round(rng.uniform(0, 12), 3)]
                       for _ in range(rng.randint(2, 5))]))
    df = spark.createDataFrame(
        paths, "fid bigint, val double, path array<array<double>>")
    blk = Rasterize(DataFrameSource(df, index_column="fid"),
                    column_name="val")
    got = {(r["y"], r["x"]): r["value"]
           for r in blk.plan(spark).collect()}
    want = {}
    for i, v, path in paths:
        for (ax, ay), (bx, by) in zip(path, path[1:]):
            if ax == bx and ay == by:
                continue
            ts = {0.0, 1.0}
            for a, b in ((ax, bx), (ay, by)):
                if a != b:
                    lo, hi = min(a, b), max(a, b)
                    k = math.ceil(lo)
                    while k <= math.floor(hi):
                        ts.add((k - a) / (b - a))
                        k += 1
            ts = sorted(ts)
            for t0, t1 in zip(ts, ts[1:]):
                if t1 - t0 > 1e-12:
                    tm = (t0 + t1) / 2
                    cell = (math.floor(ay + tm*(by-ay)),
                            math.floor(ax + tm*(bx-ax)))
                    want[cell] = max(want.get(cell, -1e18), v)
    if got != want:
        diff = {c for c in set(got) | set(want)
                if got.get(c) != want.get(c)}
        fails.append(("path", trial, len(diff),
                      [(c, got.get(c), want.get(c))
                       for c in sorted(diff)[:4]]))
        break
print("rasterize hunt fails:", fails if fails else 0)
