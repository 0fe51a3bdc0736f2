"""C4Filter vs the CANONICAL C4 cleaning (tensorflow_datasets
c4_utils.clean_page) — an independent pure-python model of the
published pipeline's line/page rules on adversarial fixtures +
random docs.

Canonical behavior modeled (c4_utils.py, the code that actually
built C4 — the T5 paper prose swaps the 5/3 constants, the code is
5 words/line + 3 sentences/page):
 - line kept iff it ends with . ? ! or " (NO apostrophe), does NOT
   end with the ellipsis '...', has >= 5 words, and contains none of
   the LINE-level banned substrings (javascript + the six policy
   strings: terms of use / privacy policy / cookie policy /
   uses cookies / use of cookies / use cookies);
 - the PAGE is dropped outright when the raw text contains
   'lorem ipsum' (case-insensitive) or a curly bracket '{' — these
   are page rules in c4_utils, not line rules;
 - keep iff >= 1 surviving line and >= 3 sentences in the cleaned
   text (approximated by .!? terminator count, both sides).
"""
import os
import random
import sys

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource  # noqa
from dask_geomodeling_spark.pipeline.curate import C4Filter  # noqa

LINE_BANNED = ("javascript", "terms of use", "privacy policy",
               "cookie policy", "uses cookies", "use of cookies",
               "use cookies")
PAGE_BANNED = ("lorem ipsum", "{")
TERMINALS = (".", "?", "!", '"')


def model(text, min_wpl=5, min_sent=3):
    low = text.lower()
    if any(p in low for p in PAGE_BANNED):
        return {"kept": [], "keep": False}
    lines = [ln.strip() for ln in text.split("\n")]
    kept = [ln for ln in lines
            if ln.endswith(TERMINALS)
            and not ln.endswith("...")
            and len(ln.split()) >= min_wpl
            and not any(p in ln.lower() for p in LINE_BANNED)]
    clean = "\n".join(kept)
    n_sent = sum(clean.count(t) for t in ".!?")
    return {"kept": kept, "keep": bool(kept) and n_sent >= min_sent}


FIXTURES = [
    ("clean", "The cat sat on the red mat today.\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly."),
    # page-level curly bracket: ONE code line must kill the PAGE
    ("curly-page", "The cat sat on the red mat today.\n"
     "function f() { return 1; }\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly."),
    # page-level lorem ipsum
    ("lorem-page", "The cat sat on the red mat today.\n"
     "Lorem ipsum dolor sit amet something here.\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly."),
    # apostrophe is NOT a terminal in c4_utils
    ("apostrophe-line", "The cat sat on the mat said Tom'\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly.\n"
     "The sun rose over the quiet valley today."),
    # an ellipsis line ends with '.', but c4_utils drops it
    ("ellipsis-line", "The story continued on and on and on...\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly.\n"
     "The sun rose over the quiet valley today."),
    # the two policy strings the shipped list was missing
    ("use-cookies-line", "We use cookies to improve your visit.\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly.\n"
     "The sun rose over the quiet valley today."),
    ("use-of-cookies-line", "Our use of cookies is described here.\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly.\n"
     "The sun rose over the quiet valley today."),
    ("javascript-line", "Please enable javascript to continue now.\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly.\n"
     "The sun rose over the quiet valley today."),
    ("four-words", "The cat sat down.\n"
     "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly.\n"
     "The sun rose over the quiet valley today."),
    ("two-sentences", "A dog ran over the green hill quickly.\n"
     "Birds sang in the old tall tree loudly"),
]

rng = random.Random(1307)
PIECES = ["The cat sat on the mat today.", "Enable Javascript now.",
          "Read our privacy policy here first.", "short one.",
          "We use cookies on this site always.", "plain line no end",
          "A tale that never quite ends here...",
          "Numbers rose sharply over the last quarter period.",
          'He said "it will be fine tomorrow" loudly."',
          "The use of cookies enables the best site experience.",
          "if (x) { y(); }", "Lorem ipsum dolor sit amet again.",
          "Is this the right way to go now?"]
docs = FIXTURES + [
    ("rand%d" % t,
     "\n".join(rng.choice(PIECES)
               for _ in range(rng.randint(1, 10))))
    for t in range(80)]

df = spark.createDataFrame(
    [(i, name, text) for i, (name, text) in enumerate(docs)],
    "doc_id bigint, name string, text string")
rows = {r["doc_id"]: r for r in C4Filter(
    DataFrameSource(df, index_column="doc_id"))
    .plan(spark).collect()}

fails = 0
for i, (name, text) in enumerate(docs):
    want = model(text)
    r = rows[i]
    got_kept = r["text_clean"].split("\n") if r["text_clean"] else []
    if got_kept != want["kept"] or bool(r["c4_keep"]) != want["keep"]:
        fails += 1
        print("C4 FAIL", name,
              "| model keep:", want["keep"], "impl:", bool(r["c4_keep"]),
              "| model lines:", want["kept"],
              "| impl lines:", got_kept)
        if fails >= 12:
            break
print("DONE fails:", fails, "docs:", len(docs))
