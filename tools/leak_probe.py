"""Controlled probe for in-suite degradation: time one geometry query
fresh, then run N persist-leaking builds at sf0.01, then re-time the
same query at sf0.1 in the SAME session.  Prints the cached-RDD count
before/after so metadata growth is visible.

    PYTHONPATH=. python tools/leak_probe.py
"""
import os
import time

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
from dask_geomodeling_spark.config import get_spark

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

from dask_geomodeling_spark import demos

TARGET = "overlay_intersection"
SF = "/root/testdata/sf0.1"
SMALL = "/root/testdata/sf0.01"

LEAKY = [
    "spatial_join", "spatial_join_intersects", "spatial_join_lines",
    "spatial_join_within", "overlay_union", "overlay_symdiff",
    "overlay_identity", "overlay_erase", "overlay_erase_guarded",
    "overlay_clip_lines", "overlay_erase_lines", "nearest_join",
    "minhash_lsh", "fuzzy_dedup", "ngram_jaccard", "semdedup",
    "dsir_select", "incremental_dedup", "cluster_representative",
    "decontaminate", "knn_classify", "corpus_prep_kn", "bpe_train",
]


def cache_count():
    return len([r for r in sc._jsc.sc().getRDDStorageInfo()])


def run(name, sf):
    t0 = time.monotonic()
    demos.QUERIES[name](spark, sf).write.format("noop") \
        .mode("overwrite").save()
    return time.monotonic() - t0


# warm the target shape
run(TARGET, SMALL)
t_fresh = min(run(TARGET, SF) for _ in range(2))
print("fresh {}: {:.2f}s cached_rdds={}".format(
    TARGET, t_fresh, cache_count()), flush=True)

for rep in range(3):
    for name in LEAKY:
        try:
            run(name, SMALL)
        except Exception as e:
            print("skip", name, type(e).__name__, flush=True)
    print("after {} leaky builds: cached_rdds={}".format(
        (rep + 1) * len(LEAKY), cache_count()), flush=True)
    t_now = min(run(TARGET, SF) for _ in range(2))
    print("{} now: {:.2f}s".format(TARGET, t_now), flush=True)
