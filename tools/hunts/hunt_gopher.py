"""GopherQuality vs the PUBLISHED rule intent (Rae et al. 2021
appendix A1.1) — hand-computed metrics from the paper text on
paper-style fixtures + random docs, NOT via the shared SQL.

Paper wording checked (the independent model follows the paper /
the reference reimplementations, not this repo's code):
 - 50 <= words <= 100,000; 3 <= mean word length <= 10
 - "symbol-to-word ratio greater than 0.1 for either the hash
   symbol or the ellipsis" -> hash ratio and ellipsis ratio are
   checked SEPARATELY (DataTrove/NeMo read it the same way)
 - > 90% lines starting with a bullet / > 30% ending with ellipsis
 - >= 80% of words contain an alphabetic character
 - >= 2 distinct of: the, be, to, of, and, that, have, with
 - duplicate line fraction <= 0.30, duplicate line CHAR fraction
   <= 0.20; top 2/3/4-gram char fraction <= 0.20/0.18/0.16;
   dup 5..10-gram char fraction <= 0.15/0.14/0.13/0.12/0.11/0.10
"""
import os
import random
import sys
from collections import Counter

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource  # noqa
from dask_geomodeling_spark.pipeline.curate import (  # noqa: E402
    DUP_NGRAM_THRESHOLDS, GOPHER_STOPWORDS, TOP_NGRAM_THRESHOLDS,
    GopherQuality)

STOPS = set(GOPHER_STOPWORDS)
BULLETS = ("•", "‣", "▪", "-", "*")


def paper_metrics(text):
    """The INDEPENDENT model: each metric from the paper's wording."""
    words = text.strip().lower().split()
    n = len(words) if text.strip() else 0
    m = {"n_words": n}
    m["mean_word_len"] = (sum(len(w) for w in words) / n) if n else 0.0
    hashes = text.count("#")
    ell = text.count("...") + text.count("…")
    m["hash_ratio"] = hashes / n if n else 0.0
    m["ellipsis_ratio"] = ell / n if n else 0.0
    m["alpha_word_frac"] = (sum(1 for w in words
                                if any(c.isalpha() for c in w)) / n
                            if n else 0.0)
    m["stop_hits"] = len(STOPS & set(words))
    lines = [ln.strip() for ln in text.split("\n")]
    nl = len(lines)
    m["bullet_line_frac"] = (sum(1 for ln in lines
                                 if ln.startswith(BULLETS)) / nl
                             if nl else 0.0)
    m["ellipsis_line_frac"] = (sum(1 for ln in lines
                                   if ln.endswith(("...", "…"))) / nl
                               if nl else 0.0)
    seen, dup_cnt, dup_chars, tot_chars = set(), 0, 0, 0
    for ln in lines:
        tot_chars += len(ln)
        if ln in seen:
            dup_cnt += 1
            dup_chars += len(ln)
        seen.add(ln)
    m["dup_line_frac"] = dup_cnt / nl if nl else 0.0
    m["dup_line_char_frac"] = dup_chars / tot_chars if tot_chars \
        else 0.0
    # n-gram char fractions (the repo's documented occurrence-mass
    # denominator; the top gram is the (count, length)-max)
    for ngr in sorted(list(TOP_NGRAM_THRESHOLDS)
                      + list(DUP_NGRAM_THRESHOLDS)):
        grams = Counter(" ".join(words[i:i + ngr])
                        for i in range(len(words) - ngr + 1))
        mass = sum(c * len(g) for g, c in grams.items())
        if ngr in TOP_NGRAM_THRESHOLDS:
            top = max(((c, len(g)) for g, c in grams.items()),
                      default=(0, 0))
            m["top_{}gram_char_frac".format(ngr)] = \
                (top[0] * top[1] / mass) if mass else 0.0
        else:
            dup = sum(c * len(g) for g, c in grams.items() if c > 1)
            m["dup_{}gram_char_frac".format(ngr)] = \
                (dup / mass) if mass else 0.0
    return m


def paper_pass(m):
    ok = (50 <= m["n_words"] <= 100000
          and 3.0 <= m["mean_word_len"] <= 10.0
          and m["hash_ratio"] <= 0.1
          and m["ellipsis_ratio"] <= 0.1       # SEPARATE ratios
          and m["bullet_line_frac"] <= 0.9
          and m["ellipsis_line_frac"] <= 0.3
          and m["alpha_word_frac"] >= 0.8
          and m["stop_hits"] >= 2
          and m["dup_line_frac"] <= 0.3
          and m["dup_line_char_frac"] <= 0.2)
    for ngr, thr in TOP_NGRAM_THRESHOLDS.items():
        ok = ok and m["top_{}gram_char_frac".format(ngr)] <= thr
    for ngr, thr in DUP_NGRAM_THRESHOLDS.items():
        ok = ok and m["dup_{}gram_char_frac".format(ngr)] <= thr
    return ok


BASE = ("the cat and the dog have gone to the market of this town "
        "that they like with great joy and some apples bananas pears "
        "plums with that basket they have filled entirely today "
        "because the weather of the region was fine and they sang ")


def fixtures():
    out = [("base", BASE)]
    # word-count boundary: exactly 50 words must PASS (inclusive)
    w50 = " ".join((BASE.split())[:50])
    out.append(("exactly-50-words", w50))
    out.append(("49-words", " ".join(BASE.split()[:49])))
    # the either/or symbol rule: hash 0.06 + ellipsis 0.06 -> paper
    # keeps it (each ratio <= 0.1), a combined ratio would kill it
    n = len(BASE.split())
    nh = max(1, int(0.06 * n))
    mix = BASE + " " + "# " * nh + "... " * nh
    out.append(("hash6-ellipsis6", mix))
    out.append(("hash12", BASE + " " + "# " * int(0.12 * n)))
    out.append(("ellipsis12", BASE + " " + "... " * int(0.12 * n)))
    # the paper's own repetition example shape
    out.append(("repeated-phrase",
                ("I am what I am and " * 40) + BASE))
    out.append(("dup-lines", "\n".join([BASE[:60]] * 8
                                       + [BASE])))
    out.append(("bullets", "\n".join("- item %d ok" % i
                                     for i in range(30)) + "\n" + BASE))
    out.append(("no-stopwords",
                " ".join("w%d" % i for i in range(80))))
    out.append(("numeric-words",
                BASE + " " + " ".join("123456" for _ in range(60))))
    return out


rng = random.Random(1306)
VOCAB = (list(STOPS) + ["cat", "dog", "apple", "market", "x1", "#",
                        "...", "banana", "going", "extraordinary"])
docs = list(fixtures())
# long multi-line random docs with varied line lengths (round-13
# review fix: these used to append to a throwaway fixtures() list)
for t in range(60):
    words = [rng.choice(VOCAB) for _ in range(rng.randint(0, 160))]
    lines = []
    i = 0
    while i < len(words):
        k = rng.randint(1, 12)
        lines.append(" ".join(words[i:i + k]))
        i += k
    docs.append(("randlong%d" % t, "\n".join(lines)))
docs += [
    ("rand%d" % t,
     "\n".join(" ".join(rng.choice(VOCAB)
                        for _ in range(rng.randint(1, 9)))
               for _ in range(rng.randint(1, 14))))
    for t in range(60)]

df = spark.createDataFrame(
    [(i, name, text) for i, (name, text) in enumerate(docs)],
    "doc_id bigint, name string, text string")
blk = GopherQuality(DataFrameSource(df, index_column="doc_id"))
rows = {r["doc_id"]: r for r in blk.plan(spark).collect()}

fails = 0
for i, (name, text) in enumerate(docs):
    m = paper_metrics(text)
    r = rows[i]
    # metric-level: everything except the symbol ratio has one
    # unambiguous paper reading
    checks = [
        ("n_words", m["n_words"], r["n_words"], 0),
        ("mean_word_len", m["mean_word_len"], r["mean_word_len"], 1e-9),
        ("alpha_word_frac", m["alpha_word_frac"], r["alpha_word_frac"],
         1e-9),
        ("stop_hits", m["stop_hits"], r["stop_hits"], 0),
        ("bullet_line_frac", m["bullet_line_frac"],
         r["bullet_line_frac"], 1e-9),
        ("ellipsis_line_frac", m["ellipsis_line_frac"],
         r["ellipsis_line_frac"], 1e-9),
        ("dup_line_frac", m["dup_line_frac"], r["dup_line_frac"], 1e-9),
        ("dup_line_char_frac", m["dup_line_char_frac"],
         r["dup_line_char_frac"], 1e-9),
    ]
    for ngr in sorted(TOP_NGRAM_THRESHOLDS):
        k = "top_{}gram_char_frac".format(ngr)
        checks.append((k, m[k], r[k], 1e-9))
    for ngr in sorted(DUP_NGRAM_THRESHOLDS):
        k = "dup_{}gram_char_frac".format(ngr)
        checks.append((k, m[k], r[k], 1e-9))
    for label, want, got, tol in checks:
        if abs(want - got) > tol:
            fails += 1
            print("METRIC FAIL", name, label, "paper:", want,
                  "impl:", got)
    want_pass = paper_pass(m)
    if bool(r["gopher_pass"]) != want_pass:
        fails += 1
        print("PASS-FLAG FAIL", name, "paper:", want_pass,
              "impl:", bool(r["gopher_pass"]),
              "| hash_ratio", round(m["hash_ratio"], 4),
              "ellipsis_ratio", round(m["ellipsis_ratio"], 4),
              "impl symbol_word_ratio", r["symbol_word_ratio"])
print("DONE fails:", fails, "docs:", len(docs))
