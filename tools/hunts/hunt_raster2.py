"""Second raster hunt: FlowDirection / RasterProximity /
RasterAllocation / IDWInterpolate / TemporalFill vs pure-python
models; random grids ride as time slices (the hunt_raster pattern)."""
import os
import sys, random, math
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource
from dask_geomodeling_spark.raster.hydrology import D8_CODES, FlowDirection
from dask_geomodeling_spark.raster.spatial import (IDWInterpolate,
                                                   RasterAllocation,
                                                   RasterProximity)
from dask_geomodeling_spark.raster.temporal import TemporalFill

rng = random.Random(654321)
K, H, W = 25, 7, 8
grids, rows = [], []
for k in range(K):
    g = {}
    for y in range(H):
        for x in range(W):
            r = rng.random()
            if r < 0.55:
                v = float(rng.randint(-3, 9))  # ints incl. zeros
                g[(y, x)] = v
                rows.append((k, y, x, v))
    grids.append(g)
df = spark.createDataFrame(rows, "k int, y bigint, x bigint, value double") \
    .select(F.expr("timestamp_seconds(86400 * k)").alias("time"), "y", "x", "value")
src = DataFrameRasterSource(df)

def collect(blk):
    out = {}
    for r in blk.plan(spark).collect():
        k = int(r["time"].timestamp() // 86400)
        out[(k, r["y"], r["x"])] = r["value"]
    return out

fails = []

# --- FlowDirection: steepest strictly-downhill D8, ties smallest code
got = collect(FlowDirection(src))
want = {}
for k, g in enumerate(grids):
    for (y, x), z in g.items():
        best = None
        for dy, dx, code in D8_CODES:
            nz = g.get((y+dy, x+dx))
            if nz is None:
                continue
            drop = (z - nz) / math.hypot(dy, dx)
            if drop > 0 and (best is None or (-drop, code) < best):
                best = (-drop, code)
        want[(k, y, x)] = float(best[1]) if best else 0.0
if got != want:
    diff = {c for c in set(got) | set(want) if got.get(c) != want.get(c)}
    fails.append(("flow_direction", len(diff), sorted(diff)[:3]))

# --- RasterProximity d=2.5, values None (non-zero sources)
d = 2.5
got = collect(RasterProximity(src, max_distance=d))
want = {}
for k, g in enumerate(grids):
    srcs = [(y, x) for (y, x), v in g.items() if v != 0]
    for (y, x) in g:
        best = None
        for sy, sx in srcs:
            dist = math.hypot(y-sy, x-sx)
            if dist <= d and (best is None or dist < best):
                best = dist
        want[(k, y, x)] = best
bad = [c for c in set(got) | set(want)
       if (got.get(c) is None) != (want.get(c) is None)
       or (got.get(c) is not None
           and abs(got[c] - want[c]) > 1e-9)]
if bad:
    fails.append(("proximity", len(bad), bad[:3]))

# --- RasterAllocation d=2.5: nearest source VALUE, ties (dist, y, x)
got = collect(RasterAllocation(src, max_distance=d))
want = {}
for k, g in enumerate(grids):
    srcs = [(y, x, v) for (y, x), v in g.items() if v != 0]
    for (y, x) in g:
        best = None
        for sy, sx, v in srcs:
            dist = math.hypot(y-sy, x-sx)
            if dist <= d:
                key = (dist, sy, sx)
                if best is None or key < best[0]:
                    best = (key, v)
        want[(k, y, x)] = best[1] if best else None
bad = [c for c in set(got) | set(want) if got.get(c) != want.get(c)]
if bad:
    fails.append(("allocation", len(bad), bad[:3]))

# --- IDWInterpolate d=2.2 p=2
d, p = 2.2, 2.0
got = collect(IDWInterpolate(src, max_distance=d, power=p))
want = {}
for k, g in enumerate(grids):
    touched = set()
    r = int(math.floor(d))
    for (y, x) in g:
        for dy in range(-r, r+1):
            for dx in range(-r, r+1):
                if 0 < dy*dy+dx*dx <= d*d:
                    touched.add((y+dy, x+dx))
    for (y, x) in touched | set(g):
        if (y, x) in g:
            want[(k, y, x)] = g[(y, x)]
            continue
        num = den = 0.0
        for dy in range(-r, r+1):
            for dx in range(-r, r+1):
                if 0 < dy*dy+dx*dx <= d*d:
                    v = g.get((y+dy, x+dx))
                    if v is not None:
                        w = 1.0 / (dy*dy+dx*dx) ** (p/2.0)
                        num += w*v; den += w
        if den > 0:
            want[(k, y, x)] = num/den
bad = [c for c in set(got) ^ set(want)] + [
    c for c in set(got) & set(want)
    if abs(got[c]-want[c]) > 1e-9*max(1, abs(want[c]))]
if bad:
    fails.append(("idw", len(bad), bad[:3]))

# --- TemporalFill: series per (y, x) ACROSS k (time axis is k here)
ser = {}
for k, g in enumerate(grids):
    for (y, x), v in g.items():
        ser.setdefault((y, x), {})[k] = v
all_times = sorted({k for k in range(K) if grids[k]})
for method in ("linear", "ffill"):
    got = collect(TemporalFill(src, method=method))
    want = {}
    for (y, x), obs in ser.items():
        ks = sorted(obs)
        t0, t1 = ks[0], (max(all_times) if method == "ffill" else ks[-1])
        for t in all_times:
            if t < t0 or t > t1:
                continue
            if t in obs:
                want[(t, y, x)] = obs[t]
            elif method == "ffill":
                prev = max(kk for kk in ks if kk < t)
                want[(t, y, x)] = obs[prev]
            else:
                prev = max(kk for kk in ks if kk < t)
                nxt = min(kk for kk in ks if kk > t)
                frac = (t - prev) / (nxt - prev)
                want[(t, y, x)] = obs[prev] + frac*(obs[nxt]-obs[prev])
    bad = [c for c in set(got) ^ set(want)] + [
        c for c in set(got) & set(want)
        if abs(got[c]-want[c]) > 1e-9*max(1, abs(want[c]))]
    if bad:
        fails.append(("temporal_fill", method, len(bad),
                      [(c, got.get(c), want.get(c)) for c in bad[:3]]))

print("raster2 hunt fails:", fails if fails else 0)
