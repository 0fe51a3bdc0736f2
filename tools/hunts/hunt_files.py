"""File-format codec hunt: random feature frames through
GeometryFileSink(shp/gpkg/fgb/kml/gml/geojson) -> matching source ->
value comparison."""
import os, sys, random, tempfile, math
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "2")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.geometry.sinks import GeometryFileSink
from dask_geomodeling_spark.geometry.shapefile import ShapefileGeometrySource
from dask_geomodeling_spark.geometry.geopackage import GeoPackageGeometrySource
from dask_geomodeling_spark.geometry.flatgeobuf import FlatGeobufGeometrySource

rng = random.Random(2468)

def rand_poly(cx, cy, n, r):
    pts = []
    for i in range(n):
        a = 2*math.pi*i/n
        pts.append([round(cx + r*math.cos(a), 6),
                    round(cy + r*math.sin(a), 6)])
    return pts

fails = []
for trial in range(10):
    kind = rng.choice(["point", "poly"])
    nrows = rng.randint(1, 20)
    rows = []
    for i in range(nrows):
        name = "s" + str(rng.randint(0, 10**6))
        val = round(rng.uniform(-1e4, 1e4), 3)
        if kind == "point":
            rows.append((i, name, val,
                         round(rng.uniform(-170, 170), 6),
                         round(rng.uniform(-80, 80), 6), None))
        else:
            rows.append((i, name, val, None, None,
                         [rand_poly(rng.uniform(-50, 50),
                                    rng.uniform(-50, 50),
                                    rng.randint(3, 8),
                                    rng.uniform(0.5, 10))]))
    df = spark.createDataFrame(
        rows, "fid bigint, name string, val double, x double, "
              "y double, rings array<array<array<double>>>")
    if kind == "point":
        df = df.drop("rings")
    else:
        df = df.drop("x", "y")
    src = DataFrameSource(df, index_column="fid")
    for ext, reader in (("shp", ShapefileGeometrySource),
                        ("gpkg", GeoPackageGeometrySource)):
        d = tempfile.mkdtemp()
        try:
            GeometryFileSink(src, d, extension=ext).write(spark)
            fns = [f for f in os.listdir(d) if f.endswith("." + ext)]
            assert fns, (ext, os.listdir(d))
            back = []
            for fn in fns:
                back.extend(reader(os.path.join(d, fn))
                            .plan(spark).collect())
            got = {}
            for r in back:
                rd = r.asDict()
                key = (rd.get("name"), round(rd.get("val"), 3) if rd.get("val") is not None else None)
                got.setdefault(key, []).append(rd)
            for i, name, val, x, y, rr in rows:
                key = (name, val)
                if key not in got:
                    fails.append((trial, ext, "missing row", key))
                    break
                rd = got[key][0]
                if kind == "point":
                    if abs((rd.get("x") or 9e9) - x) > 1e-6 or abs((rd.get("y") or 9e9) - y) > 1e-6:
                        fails.append((trial, ext, "point mismatch", key, rd.get("x"), x))
                        break
                else:
                    rg = rd.get("rings") or ([rd["vertices"]] if rd.get("vertices") else None)
                    if not rg or len(rg[0]) != len(rr[0]):
                        fails.append((trial, ext, "ring count", key, rg and len(rg[0]), len(rr[0])))
                        break
                    ok = all(abs(a[0]-b[0]) < 1e-6 and abs(a[1]-b[1]) < 1e-6
                             for a, b in zip(sorted(map(tuple, rg[0])), sorted(map(tuple, rr[0]))))
                    if not ok:
                        fails.append((trial, ext, "ring coords", key))
                        break
        except Exception as ex:
            fails.append((trial, ext, "EXC", repr(ex)[:160]))
        if len(fails) >= 5:
            break
    if len(fails) >= 5:
        break
print("file-format hunt fails:", fails if fails else 0)
