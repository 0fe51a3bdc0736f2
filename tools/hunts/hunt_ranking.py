"""Distributed-ranking hunt: global_row_number / distributed_ntile /
distributed_group_ntile vs exact single-process models on random
frames (with ties broken by the required tiebreaker column)."""
import os
import sys, random, math
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.functions.ranking import (
    distributed_group_ntile, distributed_ntile, global_row_number)

rng = random.Random(424242)
fails = []
for trial in range(6):
    n = rng.randint(1, 4000)
    k = rng.choice([2, 3, 7, 10])
    # heavy ties: values from a small set
    rows = [(i, float(rng.randint(0, 12)), "g%d" % rng.randint(0, 3))
            for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, v double, g string")
    ranked, total = global_row_number(df, ["v", "id"])
    got = {r["id"]: r["_rn"] for r in ranked.collect()}
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {r[0]: i + 1 for i, r in enumerate(order)}
    if total != n or got != want:
        diff = [k2 for k2 in want if got.get(k2) != want[k2]]
        fails.append(("row_number", trial, n, total, diff[:5]))
        break
    nt = distributed_ntile(df, ["v", "id"], k)
    gotb = {r["id"]: r["bucket"] for r in nt.collect()}
    # exact NTILE: first n%k buckets get ceil(n/k)
    wantb = {}
    big = n % k
    size_hi = math.ceil(n / k)
    size_lo = n // k
    pos = 0
    for b in range(1, k + 1):
        sz = size_hi if b <= big else size_lo
        for r in order[pos:pos+sz]:
            wantb[r[0]] = b
        pos += sz
    if gotb != wantb:
        diff = [k2 for k2 in wantb if gotb.get(k2) != wantb[k2]]
        fails.append(("ntile", trial, n, k, diff[:5]))
        break
    # group ntile: per-group independent NTILE
    gn = distributed_group_ntile(df, "g", ["v", "id"], k)
    gotg = {r["id"]: r["bucket"] for r in gn.collect()}
    wantg = {}
    for gname in {r[2] for r in rows}:
        grows = [r for r in order if r[2] == gname]
        m = len(grows)
        big = m % k
        hi = math.ceil(m / k); lo = m // k
        pos = 0
        for b in range(1, k + 1):
            sz = hi if b <= big else lo
            for r in grows[pos:pos+sz]:
                wantg[r[0]] = b
            pos += sz
    if gotg != wantg:
        diff = [k2 for k2 in wantg if gotg.get(k2) != wantg[k2]]
        fails.append(("group_ntile", trial, diff[:5]))
        break
print("ranking hunt fails:", fails if fails else 0)
