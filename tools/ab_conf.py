"""Interleaved A/B of a runtime SQL conf across queries — both arms run
alternately in ONE session so host-load noise hits them equally.

    PYTHONPATH=. python tools/ab_conf.py <conf_key> <valA> <valB> q1,q2,...
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
from dask_geomodeling_spark.config import get_spark

key, va, vb = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4].split(",")
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 4

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark import demos

SF = "/root/testdata/sf0.1"
for name in names:
    try:
        demos.QUERIES[name](spark, "/root/testdata/sf0.001") \
            .write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    ta, tb = [], []
    for rep in range(reps):
        for val, acc in ((va, ta), (vb, tb)):
            spark.conf.set(key, val)
            t0 = time.monotonic()
            demos.QUERIES[name](spark, SF).write.format("noop") \
                .mode("overwrite").save()
            acc.append(time.monotonic() - t0)
    spark.conf.set(key, va)
    print("%-26s A(%s) min %.2f med %.2f | B(%s) min %.2f med %.2f"
          % (name, va, min(ta), sorted(ta)[len(ta) // 2],
             vb, min(tb), sorted(tb)[len(tb) // 2]), flush=True)
