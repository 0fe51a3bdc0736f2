"""BPETrain merge-order TIE hunt (round 14, r13 verdict #7 — the last
named hunts-backlog candidate): adversarial corpora where many (or
ALL) pair counts are equal, so every merge decision rides on the
tie-break alone, across batched-round sizes 1/4/16.

The canonical Sennrich reference breaks ties by python dict order
(non-deterministic across runs), so the engine documents its own total
rule — pair count DESC, then (lhs, rhs) string ASC — and the model
here replays that documented rule.  What the hunt can falsify:
(a) the engine's tie order differing from the documented rule,
(b) BATCHED rounds colliding with ties (a batch learns several rules
    from one count snapshot; if two tied pairs overlap, applying the
    first invalidates the second's count — the safe-prefix trim must
    cut there),
(c) count-recomputation drift after tie merges on overlap-heavy text
    ('ababab', 'aaaa') where greedy non-overlapping application
    changes successor counts asymmetrically.
"""
import itertools
import os
import random
import sys
from collections import Counter

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", ".."))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import (  # noqa: E402
    DataFrameSource)
from dask_geomodeling_spark.pipeline.text import BPETrain  # noqa: E402


def model_train(texts, n_merges, lowercase=True):
    words = Counter()
    for t in texts:
        tt = t.lower() if lowercase else t
        for w in tt.split():
            words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    rules = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            i = 0
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(),
                   key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        rules.append((a, b, a + b, cnt))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return rules


def engine_train(texts, n_merges, batch):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")
    rows = BPETrain(DataFrameSource(df, index_column="doc_id"),
                    n_merges=n_merges, batch=batch) \
        .plan(spark).orderBy("rank").collect()
    return [(r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in rows]


fails = 0
rng = random.Random(140814)

# --- 1. ALL-TIES corpora: every bigram appears exactly once --------
# (each word is a distinct 2-char bigram over a small alphabet, each
# used once: every pair count == 1, the tie rule decides EVERYTHING)
alph = "abcdef"
allpairs = ["".join(p) for p in itertools.permutations(alph, 2)]
for trial in range(4):
    words = rng.sample(allpairs, rng.randint(6, len(allpairs)))
    texts = [" ".join(words)]
    for batch in (1, 4, 16):
        n = rng.randint(1, 8)
        got = engine_train(texts, n, batch)
        want = model_train(texts, n)
        if got != want:
            fails += 1
            print("ALL-TIES FAIL", trial, batch, got, want, texts)

# --- 2. tied OVERLAPPING pairs inside one batch --------------------
# 'ab bc' twice: ('a','b') and ('b','c') tie at 2; in 'abc'-shaped
# words the first merge would steal the second's 'b'.  Include words
# where both pairs overlap in one token.
for texts in (
        ["ab bc ab bc"],
        ["abc abc"],             # overlapping tie inside one word
        ["abc bca cab abc bca cab"],
        ["xy yz zx xyz yzx zxy"],
        ["aa aa bb bb"],         # tied self-pairs
        ["aaa bbb", "aaa bbb"],  # tied KwK runs across docs
        ["ababab bababa"],       # alternating overlap chains
):
    for batch in (1, 4, 16):
        for n in (1, 2, 3, 6):
            got = engine_train(texts, n, batch)
            want = model_train(texts, n)
            if got != want:
                fails += 1
                print("OVERLAP-TIE FAIL", texts, batch, n,
                      "| got:", got, "| want:", want)

# --- 3. random tie-dense soup: tiny alphabet, uniform word lengths -
for trial in range(6):
    nw = rng.randint(4, 20)
    wl = rng.randint(2, 4)
    texts = [" ".join("".join(rng.choice("ab§")
                              for _ in range(wl))
                      for _ in range(nw))]
    for batch in (1, 4, 16):
        n = rng.randint(2, 10)
        got = engine_train(texts, n, batch)
        want = model_train(texts, n)
        if got != want:
            fails += 1
            print("SOUP FAIL", trial, batch, n, texts,
                  "| got:", got, "| want:", want)

print()
if fails:
    print("FALSIFIERS:", fails)
    sys.exit(1)
print("CLEAN: BPETrain tie-breaking matches the documented "
      "(count DESC, pair ASC) rule on all adversarial corpora, "
      "batch sizes 1/4/16")
