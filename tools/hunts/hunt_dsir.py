"""DSIRSelect / DSIRScore vs the PAPER's importance weights (Xie et
al. 2023; the reference dsir package computes
log w = features @ (log p_target - log p_raw) with Laplace-smoothed
bucket distributions p[b] = (count_b + 1) / (total + B)) — an
independent pure-python replay of the bag-of-hashed-ngrams model on
random corpora + edge fixtures."""
import math
import os
import random
import sys
from collections import Counter

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource  # noqa
from dask_geomodeling_spark.pipeline.dsir import (DSIRScore,  # noqa
                                                  DSIRSelect,
                                                  fit_dsir_model,
                                                  save_dsir_model)

M = 2147483647


def poly(s):
    h = 0
    for ch in s:
        h = (h * 257 + ord(ch)) % M
    return h


def buckets(text, B):
    """unigram + bigram hashed feature OCCURRENCES (bag, not set);
    one-word doc contributes its word twice (the documented shingle
    fallback); wordless doc -> no features."""
    words = [w for w in text.strip().lower().split() if w]
    wh = [poly(w) for w in words]
    out = [h % B for h in wh]
    if len(wh) >= 2:
        out += [((a * 8191 + b) % M) % B for a, b in zip(wh, wh[1:])]
    elif len(wh) == 1:
        out += [wh[0] % B]
    return out


def model_weights(raw_texts, tgt_texts, B):
    ct, cr = Counter(), Counter()
    for t in tgt_texts:
        ct.update(buckets(t, B))
    for t in raw_texts:
        cr.update(buckets(t, B))
    T, R = sum(ct.values()), sum(cr.values())

    def lw(bk):
        return (math.log((ct[bk] + 1.0) / (T + B))
                - math.log((cr[bk] + 1.0) / (R + B)))
    return lw


VOCAB = ["alpha", "beta", "gamma", "delta", "law", "court", "tort",
         "cat", "dog", "x", "§"]
rng = random.Random(1308)
fails = 0
for trial in range(10):
    B = rng.choice([23, 101, 10007])
    raw = [(i, " ".join(rng.choice(VOCAB)
                        for _ in range(rng.randint(0, 14))))
           for i in range(rng.randint(3, 25))]
    # target skews to the "legal" vocab so weights separate
    tgt = [(i, " ".join(rng.choice(["law", "court", "tort", "the"])
                        for _ in range(rng.randint(1, 10))))
           for i in range(rng.randint(1, 8))]
    # edge fixtures: empty, whitespace, one-word
    raw += [(100, ""), (101, "   "), (102, "law")]
    raw_df = spark.createDataFrame(raw, "doc_id bigint, text string")
    tgt_df = spark.createDataFrame(tgt, "doc_id bigint, text string")
    blk = DSIRSelect(DataFrameSource(raw_df, index_column="doc_id"),
                     DataFrameSource(tgt_df, index_column="doc_id"),
                     num_buckets=B, round_to=9)
    got = {r["doc_id"]: (r["n_grams"], r["logweight"])
           for r in blk.plan(spark).collect()}
    lw = model_weights([t for _, t in raw], [t for _, t in tgt], B)
    for i, t in raw:
        bks = buckets(t, B)
        if not bks:
            if got[i] != (0, None):
                fails += 1
                print("EMPTY FAIL", trial, i, got[i])
            continue
        want = round(sum(lw(bk) for bk in bks), 9)
        if got[i][0] != len(bks) or got[i][1] is None \
                or abs(got[i][1] - want) > 1e-8:
            fails += 1
            print("WEIGHT FAIL", trial, i, repr(t), got[i],
                  (len(bks), want))
            if fails >= 5:
                break
    if fails >= 5:
        break

# DSIRScore against a SAVED model: unseen buckets take the sentinel
# default ln(1/(T+B)) - ln(1/(R+B)), not zero
import tempfile  # noqa: E402
B = 53
raw = [(1, "cat dog cat"), (2, "law court")]
tgt = [(1, "law law court")]
raw_df = spark.createDataFrame(raw, "doc_id bigint, text string")
tgt_df = spark.createDataFrame(tgt, "doc_id bigint, text string")
mdl = fit_dsir_model(DataFrameSource(raw_df, index_column="doc_id")
                     ._build(type("C", (), {"spark": spark,
                                            "request": {}})()),
                     DataFrameSource(tgt_df, index_column="doc_id")
                     ._build(type("C", (), {"spark": spark,
                                            "request": {}})()),
                     num_buckets=B)
url = tempfile.mkdtemp() + "/dsir_model"
save_dsir_model(mdl, url)
probe = [(10, "zebra unseen words here"), (11, "law court"), (12, "")]
probe_df = spark.createDataFrame(probe, "doc_id bigint, text string")
sc = DSIRScore(DataFrameSource(probe_df, index_column="doc_id"),
               url, round_to=9)
got = {r["doc_id"]: (r["n_grams"], r["logweight"])
       for r in sc.plan(spark).collect()}
lw = model_weights([t for _, t in raw], [t for _, t in tgt], B)
for i, t in probe:
    bks = buckets(t, B)
    if not bks:
        if got[i] != (0, None):
            fails += 1
            print("SCORE EMPTY FAIL", i, got[i])
        continue
    want = round(sum(lw(bk) for bk in bks), 9)
    if abs((got[i][1] if got[i][1] is not None else 9e9) - want) > 1e-8:
        fails += 1
        print("SCORE FAIL", i, repr(t), got[i], (len(bks), want))
print("DONE fails:", fails)
