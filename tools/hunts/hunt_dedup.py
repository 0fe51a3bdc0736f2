"""Randomized model-parity hunt: NgramJaccard (PPJoin) and SimHash vs
brute-force python models on random small corpora."""
import os, sys, random, itertools
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.pipeline.dedup import NgramJaccard, SimHash

def ngrams(text, n):
    # engine semantics: an empty/short doc shingles to the singleton
    # of its whole (possibly empty) token string — two empty docs are
    # jaccard-1.0 duplicates
    w = text.lower().split()
    if len(w) < n:
        return frozenset([" ".join(w)])
    return frozenset(" ".join(w[i:i+n]) for i in range(len(w)-n+1))

VOCAB = ["apple", "bear", "cat", "dog", "eel", "fox", "gnu", "hen"]
rng = random.Random(2026)
fails = 0
for trial in range(60):
    ndocs = rng.randint(2, 12)
    n = rng.choice([1, 2, 3])
    t = rng.choice([0.1, 0.3, 0.5, 0.8])
    docs = []
    for i in range(ndocs):
        ln = rng.randint(0, 10)
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(ln))))
    # brute force
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        A, B = ngrams(ta, n), ngrams(tb, n)
        inter = len(A & B)
        uni = len(A | B)
        j = inter / uni if uni else 0.0
        if j >= t:
            want[(ia, ib)] = round(j, 9)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    blk = NgramJaccard(DataFrameSource(df, index_column="doc_id"),
                       n=n, threshold=t)
    got = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])):
           round(r["jaccard"], 9) for r in blk.plan(spark).collect()}
    if got != want:
        fails += 1
        print("PPJOIN FAIL", trial, "n=", n, "t=", t)
        print("  docs:", docs)
        print("  want:", sorted(want.items()))
        print("  got :", sorted(got.items()))
        if fails >= 3:
            break
print("ppjoin hunt done, fails:", fails)
