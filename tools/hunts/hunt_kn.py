"""KneserNeyPerplexity vs a textbook pure-python interpolated-KN
bigram model on random corpora."""
import os
import sys, random, math
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.pipeline.lm import KneserNeyPerplexity

VOCAB = ["a", "b", "c", "dd", "ee"]
rng = random.Random(123)
fails = 0
for trial in range(12):
    docs = [(i, " ".join(rng.choice(VOCAB)
                         for _ in range(rng.randint(0, 12))))
            for i in range(rng.randint(2, 15))]
    D = rng.choice([0.25, 0.75])
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    blk = KneserNeyPerplexity(DataFrameSource(df, index_column="doc_id"),
                              discount=D)
    got = {r["doc_id"]: (r["n_bigrams"], r["perplexity"])
           for r in blk.plan(spark).collect()}
    # textbook model over the same corpus (fit == scored corpus)
    from collections import Counter, defaultdict
    big = Counter()
    cont_of = defaultdict(set)   # w1 -> set(w2)
    prec_of = defaultdict(set)   # w2 -> set(w1)
    ctx_cnt = Counter()
    for _, t in docs:
        w = t.lower().split()
        for a, b in zip(w, w[1:]):
            big[(a, b)] += 1
            cont_of[a].add(b)
            prec_of[b].add(a)
            ctx_cnt[a] += 1
    n_types = len(big)
    def p(w1, w2):
        if ctx_cnt[w1] == 0:
            return len(prec_of[w2]) / n_types
        pc = len(prec_of[w2]) / n_types
        return (max(big[(w1, w2)] - D, 0.0) / ctx_cnt[w1]
                + D * len(cont_of[w1]) / ctx_cnt[w1] * pc)
    for i, t in docs:
        w = t.lower().split()
        bgs = list(zip(w, w[1:]))
        if len(bgs) == 0:
            if i in got and got[i][1] is not None:
                fails += 1
                print("NULL FAIL", trial, i, got[i])
            continue
        lp = sum(math.log(p(a, b)) for a, b in bgs) / len(bgs)
        ppl = round(math.exp(-lp), 6)
        if i not in got or got[i][0] != len(bgs) \
                or abs((got[i][1] or 9e9) - ppl) > 1e-4:
            fails += 1
            print("KN FAIL", trial, i, t, got.get(i), (len(bgs), ppl))
            if fails >= 3: break
    if fails >= 3: break
print("kn hunt fails:", fails)
