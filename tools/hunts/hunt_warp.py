import os, sys, random, math, statistics
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource
from dask_geomodeling_spark.raster.warp import Warp

rng = random.Random(31337)
K, H, W = 12, 9, 10
grids, rows = [], []
for k in range(K):
    g = {}
    for y in range(H):
        for x in range(W):
            if rng.random() < 0.8:
                v = round(rng.uniform(-9, 9), 3)
                g[(y, x)] = v
                rows.append((k, y, x, v))
    grids.append(g)
df = spark.createDataFrame(rows, "k int, y bigint, x bigint, value double") \
    .select(F.expr("timestamp_seconds(86400 * k)").alias("time"), "y", "x", "value")
src = DataFrameRasterSource(df, projection="EPSG:3857")

def cw(frac, sel):
    t = [frac + 1.0, frac, 1.0 - frac, 2.0 - frac][sel]
    if sel in (1, 2):
        return 1.5*t*t*t - 2.5*t*t + 1.0
    return -0.5*t*t*t + 2.5*t*t - 4.0*t + 2.0

fails = []
for trial in range(6):
    x1 = rng.uniform(-3, 3); y1 = rng.uniform(-3, 3)
    width = rng.randint(3, 14); height = rng.randint(3, 12)
    x2 = x1 + width * rng.uniform(0.3, 2.5)
    y2 = y1 + height * rng.uniform(0.3, 2.5)
    bbox = (x1, y1, x2, y2)
    dx = (x2-x1)/width; dy = (y2-y1)/height
    for alg in ("nearest", "bilinear", "cubic", "average", "mode",
                "min", "max", "median", "sum", "count"):
        blk = Warp(src, projection="EPSG:3857", bbox=bbox,
                   width=width, height=height, algorithm=alg)
        # store projection defaults? DataFrameRasterSource projection:
        got = {}
        for r in blk.plan(spark, projection="EPSG:3857").collect():
            kk = int(r["time"].timestamp() // 86400)
            got[(kk, r["y"], r["x"])] = r["value"]
        want = {}
        if alg in ("nearest", "bilinear", "cubic"):
            for j in range(height):
                for i in range(width):
                    cx = x1 + (i+0.5)*dx; cy = y1 + (j+0.5)*dy
                    if alg == "nearest":
                        sx = math.floor(round(cx, 6)); sy = math.floor(round(cy, 6))
                        for k, g in enumerate(grids):
                            if (sy, sx) in g:
                                want[(k, j, i)] = g[(sy, sx)]
                    else:
                        fx = round(cx-0.5, 6); fy = round(cy-0.5, 6)
                        x0 = math.floor(fx); y0 = math.floor(fy)
                        gx = fx-x0; gy = fy-y0
                        taps = []
                        if alg == "bilinear":
                            for kk2 in range(4):
                                sx = x0 + kk2 % 2; sy = y0 + kk2 // 2
                                w = (gx if kk2 % 2 else 1-gx) * (gy if kk2 >= 2 else 1-gy)
                                taps.append((sx, sy, w))
                        else:
                            for kk2 in range(16):
                                sx = x0 + kk2 % 4 - 1; sy = y0 + kk2 // 4 - 1
                                taps.append((sx, sy, cw(gx, kk2 % 4)*cw(gy, kk2 // 4)))
                        for k, g in enumerate(grids):
                            num = den = 0.0
                            for sx, sy, w in taps:
                                v = g.get((sy, sx))
                                if v is not None:
                                    num += w*v; den += w
                            keep = abs(den) > 1e-6 if alg == "cubic" else den > 0
                            if keep:
                                want[(k, j, i)] = num/den
        else:
            bins = {}
            for k, g in enumerate(grids):
                for (y, x), v in g.items():
                    i = math.floor(round((x+0.5-x1)/dx, 6))
                    j = math.floor(round((y+0.5-y1)/dy, 6))
                    if 0 <= i < width and 0 <= j < height:
                        bins.setdefault((k, j, i), []).append(v)
            for c, vs in bins.items():
                if alg == "average": want[c] = sum(vs)/len(vs)
                elif alg == "sum": want[c] = sum(vs)
                elif alg == "min": want[c] = min(vs)
                elif alg == "max": want[c] = max(vs)
                elif alg == "count": want[c] = float(len(vs))
                elif alg == "median": want[c] = statistics.median(vs)
                elif alg == "mode":
                    from collections import Counter
                    cnt = Counter(vs)
                    want[c] = min(cnt.items(), key=lambda t: (-t[1], t[0]))[0]
        miss = set(got) ^ set(want)
        bad = [c for c in (set(got) & set(want))
               if abs(got[c] - want[c]) > 1e-6 * max(1.0, abs(want[c]))]
        if miss or bad:
            fails.append((trial, alg, len(miss), bad[:2],
                          [(c, got.get(c), want.get(c)) for c in list(miss)[:3]]))
print("warp hunt fails:", fails if fails else 0)
