"""Streaming watermark edges: multi-micro-batch runs (one file per
trigger) with PLANTED late data, against a python model of Spark's
watermark semantics — the committed tests only drain availableNow
single batches, so late-data handling across batches was never
exercised.

Measured Spark semantics this hunt CONFORMS to (established with a
block-free minimal repro — the beyond-watermark drop is BEST-EFFORT,
exactly as the Spark guide words it):
 - the reported watermark of batch N = max event time over batches
   < N minus the delay (never decreasing);
 - a window is evicted+emitted at the END of the FIRST batch whose
   reported watermark >= window end;
 - a late row is ABSORBED iff it arrives in a batch <= that eviction
   batch (so a row later than the watermark can still land if it
   arrives in the eviction batch itself); rows arriving after the
   eviction batch are dropped — the guaranteed-drop case this hunt
   plants;
 - append mode emits each window at most once;
 - StreamingDedup drops a duplicate key arriving within the
   watermark."""
import os
import sys
import time
from datetime import datetime

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
import tempfile  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from dask_geomodeling_spark.core.blocks import Block  # noqa: E402
from dask_geomodeling_spark.streaming.events import (  # noqa: E402
    EventAggregate, StreamingCountMin, StreamingDedup)

tmp = tempfile.mkdtemp()
src_dir = os.path.join(tmp, "stream_in")
os.makedirs(src_dir)

H = 3600


def ts(hour, minute=0):
    return datetime(2024, 1, 1, hour, minute)


SCHEMA = "event_id bigint, ts timestamp, event_type string, value double"
# batch files (processed one per trigger, in name order via mtime):
# f1: hours 10 and 11 -> after f1, watermark = 11:30 - 1h = 10:30
#     (window [10,11) NOT yet closed at 10:30? it is: end 11:00 >
#     10:30 -> still open)
# f2: late row in hour 10 at 10:05 (window [10,11) end 11:00 >
#     watermark 10:30 -> INCLUDED), plus a fresh row at 13:00
#     -> after f2, watermark = 12:00; windows [10,11) and [11,12)
#     close and emit
# f3: late row at 10:10 — watermark 12:00 has passed end 11:00,
#     but b2 IS the eviction batch for [10,11), so the row is still
#     ABSORBED (the measured best-effort contract); fresh 14:30
#     advances the watermark to 13:30
# f4: the 10:15 row arrives AFTER [10,11)'s eviction batch and is
#     the guaranteed DROP; fresh 16:00 -> watermark 15:00 closes
#     [13,14) and [14,15)
# wm(N) = max ts of batches < N, minus 1h:
# b0: wm 1970; b1: wm 10:30; b2: wm 12:00 -> [10,11) and [11,12)
# evict at END of b2, so b2's late 10:10 row is still ABSORBED
# (Spark's best-effort bound); b3: wm 13:30 -> the 10:15 row arrives
# AFTER [10,11)'s eviction batch and MUST drop; final empty batch:
# wm 15:00 -> [13,14) and [14,15) emit.
batches = [
    [(1, ts(10, 10), "a", 1.0), (2, ts(10, 40), "a", 2.0),
     (3, ts(11, 30), "a", 4.0)],
    [(4, ts(10, 5), "a", 8.0), (5, ts(13, 0), "a", 16.0)],
    [(6, ts(10, 10), "a", 32.0), (7, ts(14, 30), "a", 64.0)],
    [(8, ts(16, 0), "a", 128.0), (10, ts(10, 15), "a", 256.0)],
]
for i, rows in enumerate(batches):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.parquet(os.path.join(tmp, "b%d" % i))
    import glob
    import shutil
    part = glob.glob(os.path.join(tmp, "b%d" % i, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(src_dir, "f%02d.parquet" % i))
    time.sleep(1.1)  # distinct mtimes -> deterministic file order


class RawStream(Block):
    """Hand-built streaming source: one file per trigger."""

    def __init__(self, url, watermark):
        super().__init__(url, watermark)

    def _build(self, ctx):
        url, watermark = self.args
        df = (ctx.spark.readStream.format("parquet")
              .schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .load(url))
        return df.withWatermark("ts", watermark)


fails = 0


def run(block, out_name):
    out = os.path.join(tmp, out_name)
    q = (block.plan(spark).writeStream.outputMode("append")
         .option("checkpointLocation", out + "_ckpt")
         .trigger(availableNow=True)
         .start(out))
    q.awaitTermination(180)
    return spark.read.parquet(out).collect()


# ---- EventAggregate: include-late-open, drop-late-closed ----------
agg = EventAggregate(RawStream(src_dir, "1 hour"),
                     frequency="1 hour", keys=("event_type",),
                     value_column="value", statistic="sum")
rows = run(agg, "agg_out")
got = {str(r["window_start"]): r["value"] for r in rows}
# model: [10,11) evicts at end of b2 (first wm >= 11:00), so it
# absorbs 1+2+8+32 = 43 (the b2 late row rides the eviction batch)
# and MUST NOT absorb b3's 256 (guaranteed drop after eviction);
# [11,12) = 4; [13,14) = 16 and [14,15) = 64 emit at wm 15:00
want = {"2024-01-01 10:00:00": 43.0, "2024-01-01 11:00:00": 4.0,
        "2024-01-01 13:00:00": 16.0, "2024-01-01 14:00:00": 64.0}
for w, v in want.items():
    if got.get(w) != v:
        fails += 1
        print("AGG FAIL", w, "got", got.get(w), "want", v, "| all:",
              sorted(got.items()))
extra = {w for w in got if w not in want
         and w != "2024-01-01 16:00:00"}
if extra:
    fails += 1
    print("AGG EXTRA FAIL", sorted(extra), sorted(got.items()))
if len(rows) != len({str(r["window_start"]) for r in rows}):
    fails += 1
    print("AGG DUP-EMIT FAIL", sorted(got.items()))

# ---- StreamingCountMin: same include/drop rule --------------------
cms = StreamingCountMin(RawStream(src_dir, "1 hour"), "event_id",
                        frequency="1 hour", depth=2, width=64)
crows = run(cms, "cms_out")
per_win = {}
for r in crows:
    k = str(r["window_start"])
    per_win.setdefault(k, 0)
    if r["row_idx"] == 0:
        per_win[k] += r["counter"]  # row 0's counters sum = n rows
# [10,11) absorbed 4 distinct ids (1,2,4,6) and NOT the post-
# eviction id 10 — row 0's counters sum to the absorbed row count
cwant = {"2024-01-01 10:00:00": 4, "2024-01-01 11:00:00": 1,
         "2024-01-01 13:00:00": 1, "2024-01-01 14:00:00": 1}
for w, n in cwant.items():
    if per_win.get(w) != n:
        fails += 1
        print("CMS FAIL", w, "got", per_win.get(w), "want", n,
              "| all:", sorted(per_win.items()))

# ---- StreamingDedup: duplicate within watermark drops -------------
dup_dir = os.path.join(tmp, "dup_in")
os.makedirs(dup_dir)
dbatches = [
    [(1, ts(10, 0), "a", 1.0), (2, ts(10, 10), "a", 2.0)],
    [(1, ts(10, 20), "a", 1.0),   # dup id within watermark -> drop
     (9, ts(10, 30), "a", 3.0)],
]
for i, rows_ in enumerate(dbatches):
    df = spark.createDataFrame(rows_, SCHEMA)
    df.coalesce(1).write.parquet(os.path.join(tmp, "db%d" % i))
    import glob
    import shutil
    part = glob.glob(os.path.join(tmp, "db%d" % i,
                                  "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(dup_dir, "f%02d.parquet" % i))
    time.sleep(1.1)
ded = StreamingDedup(RawStream(dup_dir, "1 hour"), keys=("event_id",))
drows = run(ded, "dedup_out")
ids = sorted(r["event_id"] for r in drows)
if ids != [1, 2, 9]:
    fails += 1
    print("DEDUP FAIL", ids)

print("DONE fails:", fails)
