"""WarcSource vs byte-level ground truth on adversarial WET shards:
CRLF header framing, unicode payloads, payloads containing CRLFCRLF,
empty payloads, absent headers, header-name suffix collisions
("X-WARC-Date:" before the real "WARC-Date:"), case variants,
truncated final record, and the WETSink -> WarcSource roundtrip.

The documented reader trades are honored (not counted as failures):
payload-embedded record magic splits early; ALL trailing CR/LF
framing strips (a payload genuinely ending in newlines loses them)."""
import os
import sys
import tempfile

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.pipeline.warc import WarcSource, WETSink  # noqa
from dask_geomodeling_spark.geometry.sources import DataFrameSource  # noqa

MAGIC = "WARC/1.0\r\n"


def record(uri, text, date="2024-01-02T03:04:05Z", wtype="conversion",
           extra_headers=(), omit=()):
    h = []
    if "type" not in omit:
        h.append("WARC-Type: " + wtype)
    for line in extra_headers:
        h.append(line)
    if "uri" not in omit and uri is not None:
        h.append("WARC-Target-URI: " + uri)
    if "date" not in omit and date is not None:
        h.append("WARC-Date: " + date)
    h.append("WARC-Record-ID: <urn:uuid:%s>" % abs(hash(uri)))
    h.append("Content-Type: text/plain")
    h.append("Content-Length: %d" % len(text.encode("utf-8")))
    return (MAGIC + "\r\n".join(h) + "\r\n\r\n" + text + "\r\n\r\n")


fails = 0
cases = [
    # (name, uri, text) ground truth per record
    ("plain", "http://a.example/1", "hello world"),
    ("unicode", "http://a.example/2", "héllo wörld — § ünïcode 中文"),
    ("inner-crlfcrlf", "http://a.example/3",
     "para one\r\n\r\npara two\r\n\r\npara three"),
    ("empty-payload", "http://a.example/4", ""),
    ("colon-in-text", "http://a.example/5",
     "WARC-Type: fake\nContent-Length: 99\nnot a header block"),
    ("long", "http://a.example/6", "x" * 5000),
]
shard = "".join(record(u, t) for _, u, t in cases)
# header-suffix adversary: a junk X-WARC-Date BEFORE the real one,
# plus an absent date on another record
shard += record("http://a.example/7", "suffix trap",
                extra_headers=("X-WARC-Date: 1999-09-09T09:09:09Z",))
shard += record("http://a.example/8", "no date", date=None,
                omit=("date",))
# case-insensitive field names (ISO 28500): lowercase headers parse
shard += (MAGIC + "warc-type: conversion\r\n"
          "warc-target-uri: http://a.example/10\r\n"
          "content-length: 4\r\n\r\ncase\r\n\r\n")
# truncated final record: header block only, payload cut mid-way
shard += (MAGIC + "WARC-Type: conversion\r\n"
          "WARC-Target-URI: http://a.example/9\r\n"
          "Content-Length: 400\r\n\r\n" + "y" * 10)

tmp = tempfile.mkdtemp()
path = os.path.join(tmp, "shard.wet")
with open(path, "wb") as f:
    f.write(shard.encode("utf-8"))

rows = {r["uri"]: r for r in
        WarcSource(path).plan(spark).collect()}
want_texts = {u: t for _, u, t in cases}
for name, u, t in cases:
    r = rows.get(u)
    if r is None:
        fails += 1
        print("MISSING", name)
        continue
    if r["text"] != t:
        fails += 1
        print("TEXT FAIL", name, repr(r["text"])[:80], "!=",
              repr(t)[:80])
    if r["warc_type"] != "conversion" or r["content_length"] != \
            len(t.encode("utf-8")):
        fails += 1
        print("HDR FAIL", name, r["warc_type"], r["content_length"])
    if str(r["date"]) != "2024-01-02 03:04:05":
        fails += 1
        print("DATE FAIL", name, r["date"])
r7 = rows.get("http://a.example/7")
if r7 is None or str(r7["date"]) != "2024-01-02 03:04:05":
    fails += 1
    print("SUFFIX-TRAP FAIL", None if r7 is None else r7["date"])
r8 = rows.get("http://a.example/8")
if r8 is None or r8["date"] is not None:
    fails += 1
    print("ABSENT-DATE FAIL", None if r8 is None else r8["date"])
r10 = rows.get("http://a.example/10")
if r10 is None or r10["text"] != "case" or r10["content_length"] != 4:
    fails += 1
    print("CASE FAIL", None if r10 is None else
          (r10["text"], r10["content_length"]))
r9 = rows.get("http://a.example/9")
if r9 is None or r9["text"] != "y" * 10:
    fails += 1
    print("TRUNCATED FAIL", None if r9 is None else repr(r9["text"]))

# WETSink roundtrip: unicode + multi-line payloads survive
docs = [(i, "http://b.example/%d" % i, t)
        for i, (_, _, t) in enumerate(cases) if t]
df = spark.createDataFrame(docs, "doc_id bigint, uri string, "
                           "text string")
out = os.path.join(tmp, "out_wet")
WETSink(DataFrameSource(df, index_column="doc_id"), out).write(spark)
back = {r["uri"]: r["text"] for r in WarcSource(out + "/*.txt")
        .plan(spark).collect()}
for i, u, t in docs:
    # documented trade: trailing CR/LF of the payload strips
    if back.get(u) != t.rstrip("\r\n"):
        fails += 1
        print("ROUNDTRIP FAIL", u, repr(back.get(u))[:60],
              repr(t)[:60])
print("DONE fails:", fails, "records:", len(rows))
