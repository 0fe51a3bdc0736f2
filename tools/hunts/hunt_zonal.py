"""Zonal + partitioning hunt: AggregateRaster stats vs brute force
(box and exact-ring masks), Subdivide area conservation, Overlay
n-ary erase == A - union(B)."""
import os
import sys, random, math, statistics
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.geometry.aggregate import AggregateRaster
from dask_geomodeling_spark.geometry.overlay import Overlay
from dask_geomodeling_spark.geometry.parallelize import Subdivide
from dask_geomodeling_spark.geometry.polyclip import (
    polygon_difference, polygon_union_all, rings_is_valid,
    rings_signed_area)
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource

rng = random.Random(1618)
fails = []

# --- AggregateRaster
H = W = 14
cells = {}
crows = []
for y in range(H):
    for x in range(W):
        if rng.random() < 0.8:
            v = round(rng.uniform(-5, 9), 3)
            cells[(y, x)] = v
            crows.append((y, x, v))
cdf = spark.createDataFrame(crows, "y bigint, x bigint, value double") \
    .select(F.expr("TIMESTAMP '2024-01-01'").alias("time"), "y", "x", "value")
raster = DataFrameRasterSource(cdf)

def point_in(px, py, rings):
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]; x2, y2 = ring[(i+1) % n]
            if (y1 > py) != (y2 > py):
                xi = x1 + (py-y1)/(y2-y1)*(x2-x1)
                if px < xi:
                    inside = not inside
    return inside

feats = []
for i in range(25):
    if rng.random() < 0.5:
        x1 = rng.uniform(0, 10); y1 = rng.uniform(0, 10)
        feats.append((i, x1, y1, x1 + rng.uniform(0.5, 5),
                      y1 + rng.uniform(0.5, 5), None))
    else:
        cx, cy = rng.uniform(3, 11), rng.uniform(3, 11)
        npts = rng.randint(3, 7)
        ring = [[round(cx + rng.uniform(1, 4)*math.cos(2*math.pi*j/npts), 3),
                 round(cy + rng.uniform(1, 4)*math.sin(2*math.pi*j/npts), 3)]
                for j in range(npts)]
        xs = [p[0] for p in ring]; ys = [p[1] for p in ring]
        feats.append((i, min(xs), min(ys), max(xs), max(ys), [ring]))
fdf = spark.createDataFrame(
    feats, "fid bigint, xmin double, ymin double, xmax double, "
           "ymax double, rings array<array<array<double>>>")
src = DataFrameSource(fdf, index_column="fid")
for stat in ("sum", "mean", "count", "min", "max", "median"):
    blk = AggregateRaster(src, raster, statistic=stat)
    got = {r["fid"]: r["agg"] if "agg" in r else r[stat]
           for r in blk.plan(spark)
           .select("fid", F.col(blk.plan(spark).columns[-1]))
           .collect()}
    # find the output column name generically
    out_df = blk.plan(spark)
    vcol = [c for c in out_df.columns
            if c not in ("fid", "xmin", "ymin", "xmax", "ymax",
                         "rings")][0]
    got = {r["fid"]: r[vcol] for r in out_df.collect()}
    want = {}
    for i, x1, y1, x2, y2, rr in feats:
        vs = []
        for (y, x), v in cells.items():
            if x1 <= x <= x2 and y1 <= y <= y2:
                if rr is None or point_in(x, y, rr):
                    vs.append(v)
        if not vs:
            want[i] = None
        elif stat == "sum": want[i] = sum(vs)
        elif stat == "mean": want[i] = sum(vs)/len(vs)
        elif stat == "count": want[i] = float(len(vs))
        elif stat == "min": want[i] = min(vs)
        elif stat == "max": want[i] = max(vs)
        elif stat == "median": want[i] = statistics.median(vs)
    bad = [i for i in want
           if (got.get(i) is None) != (want[i] is None)
           or (want[i] is not None
               and abs(got[i] - want[i]) > 1e-6*max(1, abs(want[i])))]
    if bad:
        fails.append(("agg", stat, [(i, got.get(i), want[i])
                                    for i in bad[:3]]))
        break

# --- Subdivide: piece areas sum to the original (simple rings)
from dask_geomodeling_spark.geometry.geom_operations import rings_area_expr
sub_feats = []
for i in range(15):
    cx, cy = rng.uniform(4, 12), rng.uniform(4, 12)
    npts = rng.randint(3, 8)
    ring = [[round(cx + rng.uniform(1, 5)*math.cos(2*math.pi*j/npts), 3),
             round(cy + rng.uniform(1, 5)*math.sin(2*math.pi*j/npts), 3)]
            for j in range(npts)]
    if rings_is_valid([ring]):
        if rings_signed_area([ring]) < 0:
            ring = ring[::-1]
        sub_feats.append((i, [ring]))
sdf = spark.createDataFrame(
    sub_feats, "fid bigint, rings array<array<array<double>>>")
ssrc = DataFrameSource(sdf, index_column="fid")
sub = Subdivide(ssrc, cell_size=2.0)
pieces = (sub.plan(spark)
          .select("fid", rings_area_expr("rings").alias("a"))
          .groupBy("fid").agg(F.sum("a").alias("total")).collect())
ptot = {r["fid"]: r["total"] for r in pieces}
for i, rr in sub_feats:
    want_a = rings_signed_area(rr)
    if abs(ptot.get(i, 0.0) - want_a) > 1e-6 * max(1.0, want_a):
        fails.append(("subdivide", i, ptot.get(i), want_a))
        break

# --- Overlay erase: per left feature, area == area(A - union(Bs))
lf = [(i, rr) for i, rr in sub_feats[:6]]
rf = []
for j in range(8):
    cx, cy = rng.uniform(4, 12), rng.uniform(4, 12)
    s = rng.uniform(0.5, 3)
    rf.append((j, [[[cx, cy], [cx+s, cy], [cx+s, cy+s], [cx, cy+s]]]))
L = DataFrameSource(spark.createDataFrame(
    lf, "lid bigint, rings array<array<array<double>>>"),
    index_column="lid")
R = DataFrameSource(spark.createDataFrame(
    rf, "rid bigint, rings array<array<array<double>>>"),
    index_column="rid")
ov = Overlay(L, R, cell_size=8.0, how="difference")
got = {r["lid"]: r["a"] for r in
       ov.plan(spark).select(
           "lid", rings_area_expr("rings").alias("a")).collect()}
for i, A in lf:
    U = polygon_union_all([rr for _, rr in rf])
    want_r = polygon_difference(A, U)
    want_a = rings_signed_area(want_r)
    g = got.get(i, 0.0) or 0.0
    if abs(g - want_a) > 1e-6 * max(1.0, want_a):
        fails.append(("overlay_erase", i, g, want_a))
        break
print("zonal hunt fails:", fails if fails else 0)
