"""BPETrain vs a textbook pure-python BPE trainer (Sennrich et al.
2016) on random corpora — the learned merge TABLE must be
bit-identical under the documented deterministic tie rule (pair count
DESC, pair string ASC) and the greedy left-to-right non-overlapping
merge semantics ('aaaa' learns ('a','a') then applies it twice, never
overlapping).  Random corpora skew toward repeated characters and
multi-char collisions; BPETokenize is then cross-checked by applying
the learned rules with the same python model."""
import os
import random
import sys
from collections import Counter

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource  # noqa
from dask_geomodeling_spark.pipeline.text import BPETokenize, BPETrain  # noqa


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
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # count DESC, pair string ASC (lhs then rhs) — the documented
        # deterministic engine rule
        best = min(pairs.items(),
                   key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        rules.append((a, b, a + b, cnt))
        new = {}
        for syms, c in vocab.items():
            out = []
            i = 0
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


def model_tokenize(text, rules, lowercase=True):
    out = []
    for w in (text.lower() if lowercase else text).split():
        syms = list(w)
        for a, b, _m, _c in rules:
            i, res = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        out.extend(syms)
    return out


ALPH = ["a", "b", "c", "ab", "ba", "§"]
rng = random.Random(1310)
fails = 0
for trial in range(12):
    n_docs = rng.randint(2, 10)
    texts = []
    for _ in range(n_docs):
        words = []
        for _ in range(rng.randint(1, 12)):
            w = "".join(rng.choice("aab" if rng.random() < 0.5
                                   else "abc§")
                        for _ in range(rng.randint(1, 8)))
            words.append(w)
        texts.append(" ".join(words))
    n_merges = rng.randint(1, 10)
    batch = rng.choice([1, 4, 16])
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")
    got = [(r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in BPETrain(DataFrameSource(df, index_column="doc_id"),
                             n_merges=n_merges, batch=batch)
           .plan(spark).orderBy("rank").collect()]
    want = model_train(texts, n_merges)
    if got != want:
        fails += 1
        print("TRAIN FAIL", trial, "batch", batch, "| got:", got,
              "| want:", want, "| corpus:", texts)
        if fails >= 3:
            break
    # tokenize cross-check with the learned rules
    rules = [(a, b) for a, b, _m, _c in want]
    if rules:
        # vocab = every model-produced symbol, id = index
        vocab = sorted({s for t in texts
                        for s in model_tokenize(t, want)})
        tok = {r["doc_id"]: list(r["token_ids"]) for r in BPETokenize(
            DataFrameSource(df, index_column="doc_id"), rules, vocab)
            .plan(spark).collect()}
        for i, t in enumerate(texts):
            want_ids = [vocab.index(s)
                        for s in model_tokenize(t, want)]
            if tok.get(i) != want_ids:
                fails += 1
                print("TOKENIZE FAIL", trial, i, t, tok.get(i),
                      want_ids)
                break
print("DONE fails:", fails)
