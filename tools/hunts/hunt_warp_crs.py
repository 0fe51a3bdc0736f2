import os, sys, random, math
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource
from dask_geomodeling_spark.raster.warp import Warp

R = 6378137.0
def merc_x(lon): return R * math.radians(lon)
def merc_y(lat): return R * math.log(math.tan(math.pi/4 + math.radians(lat)/2))
def inv_lon(x): return math.degrees(x / R)
def inv_lat(y): return math.degrees(2*math.atan(math.exp(y / R)) - math.pi/2)

rng = random.Random(555)
K, H, W = 8, 8, 9
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
src = DataFrameRasterSource(df, projection="EPSG:4326")

fails = []
for trial in range(4):
    lon1 = rng.uniform(0, 3); lat1 = rng.uniform(0, 3)
    lon2 = lon1 + rng.uniform(2, 6); lat2 = lat1 + rng.uniform(2, 5)
    bbox = (merc_x(lon1), merc_y(lat1), merc_x(lon2), merc_y(lat2))
    width, height = rng.randint(4, 12), rng.randint(4, 10)
    x1, y1, x2, y2 = bbox
    dx = (x2-x1)/width; dy = (y2-y1)/height
    for alg in ("nearest", "bilinear", "average"):
        blk = Warp(src, projection="EPSG:3857", bbox=bbox,
                   width=width, height=height, algorithm=alg)
        got = {}
        for r in blk.plan(spark, projection="EPSG:3857").collect():
            kk = int(r["time"].timestamp() // 86400)
            got[(kk, r["y"], r["x"])] = r["value"]
        want = {}
        if alg in ("nearest", "bilinear"):
            for j in range(height):
                for i in range(width):
                    cx = x1 + (i+0.5)*dx; cy = y1 + (j+0.5)*dy
                    sx = inv_lon(cx); sy = inv_lat(cy)
                    if alg == "nearest":
                        nx = math.floor(round(sx, 6)); ny = math.floor(round(sy, 6))
                        for k, g in enumerate(grids):
                            if (ny, nx) in g:
                                want[(k, j, i)] = g[(ny, nx)]
                    else:
                        fx = round(sx-0.5, 6); fy = round(sy-0.5, 6)
                        x0 = math.floor(fx); y0 = math.floor(fy)
                        gx = fx-x0; gy = fy-y0
                        for k, g in enumerate(grids):
                            num = den = 0.0
                            for kk2 in range(4):
                                nx = x0 + kk2 % 2; ny = y0 + kk2 // 2
                                v = g.get((ny, nx))
                                if v is not None:
                                    w = (gx if kk2 % 2 else 1-gx) * (gy if kk2 >= 2 else 1-gy)
                                    num += w*v; den += w
                            if den > 0:
                                want[(k, j, i)] = num/den
        else:
            bins = {}
            for k, g in enumerate(grids):
                for (y, x), v in g.items():
                    mx = merc_x(x + 0.5); my = merc_y(y + 0.5)
                    i = math.floor(round((mx - x1)/dx, 6))
                    j = math.floor(round((my - y1)/dy, 6))
                    if 0 <= i < width and 0 <= j < height:
                        bins.setdefault((k, j, i), []).append(v)
            want = {c: sum(vs)/len(vs) for c, vs in bins.items()}
        miss = set(got) ^ set(want)
        bad = [c for c in (set(got) & set(want))
               if abs(got[c]-want[c]) > 1e-6*max(1.0, abs(want[c]))]
        if miss or bad:
            fails.append((trial, alg, len(miss), bad[:2],
                          [(c, got.get(c), want.get(c)) for c in list(miss)[:3]]))
print("warp-crs hunt fails:", fails if fails else 0)
