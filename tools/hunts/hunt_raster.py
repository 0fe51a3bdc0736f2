"""Randomized raster-kernel hunt: MovingMax / FocalStatistic(median) /
Smooth / Slope vs pure-python models; 30 random grids ride as 30 time
slices in ONE frame, so each op is a single Spark job."""
import os, sys, random, math
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource
from dask_geomodeling_spark.raster.spatial import (MovingMax,
                                                   FocalStatistic,
                                                   Smooth, Slope)

rng = random.Random(4242)
K, H, W = 30, 7, 8
grids = []   # grids[k][(y,x)] = value or absent (null)
rows = []
for k in range(K):
    g = {}
    for y in range(H):
        for x in range(W):
            if rng.random() < 0.75:
                v = round(rng.uniform(-5, 5), 3)
                g[(y, x)] = v
                rows.append((k, y, x, v))
    grids.append(g)
df = spark.createDataFrame(rows, "k int, y bigint, x bigint, value double") \
    .select(F.expr("timestamp_seconds(86400 * k)").alias("time"),
            "y", "x", "value", "k")
src = DataFrameRasterSource(df.drop("k"))

def circ_offs(radius):
    lim = (radius + 0.5) ** 2
    return [(dy, dx) for dy in range(-radius, radius+1)
            for dx in range(-radius, radius+1) if dy*dy+dx*dx < lim]

def collect(blk):
    out = {}
    for r in blk.plan(spark).collect():
        k = int(r["time"].timestamp() // 86400)
        out[(k, r["y"], r["x"])] = r["value"]
    return out

fails = []

# --- MovingMax size 3 (dilated domain, max over data in circle)
got = collect(MovingMax(src, 3))
want = {}
offs = circ_offs(1)
for k, g in enumerate(grids):
    for (y, x), v in g.items():
        for dy, dx in offs:
            key = (k, y+dy, x+dx)
            want[key] = max(want.get(key, -1e18), v)
if set(got) != set(want) or any(abs(got[c]-want[c]) > 1e-9 for c in want):
    fails.append(("moving_max", len(set(got) ^ set(want))))

# --- FocalStatistic median size 5 circle
got = collect(FocalStatistic(src, "median", size=5, footprint="circle"))
offs5 = circ_offs(2)
want = {}
import statistics
vals_at = {}
for k, g in enumerate(grids):
    for (y, x), v in g.items():
        for dy, dx in offs5:
            vals_at.setdefault((k, y+dy, x+dx), []).append(v)
want = {c: statistics.median(vs) for c, vs in vals_at.items()}
bad = [c for c in want if abs(got.get(c, 1e18) - want[c]) > 1e-9]
if set(got) != set(want) or bad:
    fails.append(("focal_median", len(set(got) ^ set(want)), bad[:3]))

# --- Smooth size 3 fill 0 (on data cells)
size, fill = 3.0, 0.0
sigma = max(size/3.0, 1e-9); radius = max(int(math.ceil(2*sigma)), 1)
woffs = [(dy, dx, math.exp(-(dy*dy+dx*dx)/(2*sigma*sigma)))
         for dy in range(-radius, radius+1) for dx in range(-radius, radius+1)]
W_tot = sum(w for _,_,w in woffs)
got = collect(Smooth(src, 3, 0))
want = {}
for k, g in enumerate(grids):
    for (y, x) in g:
        swv = sw = 0.0
        for dy, dx, w in woffs:
            v = g.get((y+dy, x+dx))
            if v is not None:
                swv += w*v; sw += w
        want[(k, y, x)] = (swv + fill*(W_tot - sw)) / W_tot
bad = [c for c in want if abs(got.get(c, 1e18) - want[c]) > 1e-9]
if set(got) != set(want) or bad:
    fails.append(("smooth", len(set(got) ^ set(want)), bad[:3]))

# --- Slope z=2 (Horn, missing->center, on data cells)
got = collect(Slope(src, z_factor=2.0))
want = {}
for k, g in enumerate(grids):
    for (y, x), c11 in g.items():
        c = {}
        for dy in (-1,0,1):
            for dx in (-1,0,1):
                c[(dy,dx)] = g.get((y+dy, x+dx), c11)
        gx = ((c[(-1,1)] + 2*c[(0,1)] + c[(1,1)])
              - (c[(-1,-1)] + 2*c[(0,-1)] + c[(1,-1)])) / 8.0
        gy = ((c[(1,-1)] + 2*c[(1,0)] + c[(1,1)])
              - (c[(-1,-1)] + 2*c[(-1,0)] + c[(-1,1)])) / 8.0
        want[(k,y,x)] = math.degrees(math.atan(2.0*math.hypot(gx, gy)))
bad = [c for c in want if abs(got.get(c, 1e18) - want[c]) > 1e-9]
if set(got) != set(want) or bad:
    fails.append(("slope", len(set(got) ^ set(want)), bad[:3]))

print("raster hunt fails:", fails if fails else 0)
