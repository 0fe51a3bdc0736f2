"""MinHashLSH hunt: emitted pairs' jaccard must equal brute force;
emitted set must be a SUBSET of all-pairs above threshold; and with
bands == num_perm (rows-per-band 1) any pair sharing >= 1 minhash is
a candidate, so every pair with jaccard >= threshold that shares a
minhash must be emitted."""
import os
import sys, random, itertools
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.pipeline.dedup import (MinHashLSH,
                                                   _perm_constants)

M = 2147483647

def poly(s, base=257):
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % M
    return h

def shingles(text, size):
    w = text.lower().strip().split()
    if not w and not text.strip():
        w = []
    toks = text.lower().split()
    if len(toks) < size:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i+size]) for i in range(len(toks)-size+1)]
    return set(grams)

VOCAB = ["ant", "bee", "cow", "dog", "elk", "fox", "gnu", "hen"]
rng = random.Random(2025)
fails = 0
for trial in range(25):
    ndocs = rng.randint(2, 14)
    size = rng.choice([1, 2, 3])
    t = rng.choice([0.0, 0.2, 0.5])
    num_perm = rng.choice([8, 16])
    docs = [(i, " ".join(rng.choice(VOCAB)
                         for _ in range(rng.randint(0, 9))))
            for i in range(ndocs)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    blk = MinHashLSH(DataFrameSource(df, index_column="doc_id"),
                     num_perm=num_perm, bands=num_perm,
                     shingle_size=size, verify=True, threshold=t,
                     hash_fn="poly")
    got = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])):
           round(r["jaccard"], 9) for r in blk.plan(spark).collect()}
    # brute force jaccard + model minhash signatures (poly shingle
    # hash -> per-perm min)
    def sig(text):
        sh = shingles(text, size)
        hs = []
        for g in sh:
            # the engine hashes the TOKEN-hash sequence per gram; for
            # the subset/recall argument we only need signature
            # EQUALITY on identical shingle sets, so hash the gram
            hs.append(poly(g))
        out = []
        for a, b in _perm_constants(num_perm):
            out.append(min(((a*h + b) % M) for h in hs) if hs else M)
        return out
    want_exact = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        A, B = shingles(ta, size), shingles(tb, size)
        inter = len(A & B); uni = len(A | B)
        j = inter/uni if uni else 0.0
        if j >= t:
            want_exact[(ia, ib)] = round(j, 9)
    # 1) emitted jaccards correct + subset of above-threshold pairs
    for pair, j in got.items():
        if pair not in want_exact or want_exact[pair] != j:
            fails += 1
            print("JACCARD FAIL", trial, pair, j, want_exact.get(pair))
            break
    # 2) guaranteed recall: identical shingle sets MUST be found
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        if shingles(ta, size) == shingles(tb, size) \
                and want_exact.get((ia, ib), -1) >= t \
                and (ia, ib) not in got:
            fails += 1
            print("RECALL FAIL", trial, (ia, ib), ta, "|", tb)
            break
    if fails >= 3:
        break
print("minhash hunt fails:", fails)
