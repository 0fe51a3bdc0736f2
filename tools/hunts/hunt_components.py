"""RasterComponents vs a python union-find on random speckled grids
(4- and 8-connectivity), grids riding as time slices."""
import os
import sys, random
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.raster.sources import DataFrameRasterSource
from dask_geomodeling_spark.raster.components import RasterComponents

rng = random.Random(31415)
K, H, W = 20, 9, 9
grids, rows = [], []
for k in range(K):
    g = {}
    for y in range(H):
        for x in range(W):
            if rng.random() < 0.7:
                v = float(rng.randint(0, 2))   # few values -> regions
                g[(y, x)] = v
                rows.append((k, y, x, v))
    grids.append(g)
df = spark.createDataFrame(rows, "k int, y bigint, x bigint, value double") \
    .select(F.expr("timestamp_seconds(86400 * k)").alias("time"), "y", "x", "value")
src = DataFrameRasterSource(df)

fails = []
for conn in (4, 8):
    blk = RasterComponents(src, connectivity=conn)
    got = {}
    for r in blk.plan(spark).collect():
        k = int(r["time"].timestamp() // 86400)
        got[(k, r["y"], r["x"])] = r["component"]
    # model: union-find of same-value neighbors
    offs = [(0, 1), (1, 0)] + ([(1, 1), (1, -1)] if conn == 8 else [])
    for k, g in enumerate(grids):
        parent = {c: c for c in g}
        def find(c):
            while parent[c] != c:
                parent[c] = parent[parent[c]]
                c = parent[c]
            return c
        for (y, x), v in g.items():
            for dy, dx in offs:
                n = (y+dy, x+dx)
                if g.get(n) == v:
                    parent[find((y, x))] = find(n)
        comp = {}
        for c in g:
            comp.setdefault(find(c), []).append(c)
        # engine label = '<epoch_us>:<y>:<x>' of the component's
        # canonical cell; we only check the PARTITION (same label <=>
        # same component), not the label text
        by_label = {}
        for c in g:
            by_label.setdefault(got.get((k, c[0], c[1])), set()).add(c)
        want_parts = {frozenset(v) for v in comp.values()}
        got_parts = {frozenset(v) for v in by_label.values()}
        if want_parts != got_parts:
            fails.append((conn, k, len(want_parts), len(got_parts)))
            break
print("components hunt fails:", fails if fails else 0)
