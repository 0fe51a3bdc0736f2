"""Event-family hunt: SessionizeEvents (gap windows) and
RollingEventAggregate (trailing interval) vs brute-force models."""
import os
import sys, random
from datetime import datetime, timezone, timedelta
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.core.blocks import Block
from dask_geomodeling_spark.streaming.events import (
    RollingEventAggregate, SessionizeEvents)

class Frame(Block):
    def __init__(self, df, tag):
        self._df = df
        super().__init__(tag)
    def _build(self, ctx):
        return self._df

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
rng = random.Random(99999)
fails = []
for trial in range(6):
    nusers = rng.randint(1, 6)
    rows = []
    eid = 0
    for _ in range(rng.randint(10, 120)):
        eid += 1
        rows.append((eid, rng.randint(0, nusers-1),
                     EPOCH + timedelta(seconds=rng.randint(0, 20000)),
                     round(rng.uniform(-5, 5), 3)))
    # unique ts per user for a deterministic model (ties in the rolling
    # range frame are included either way; sessions don't care)
    seen = set()
    rows = [r for r in rows
            if (r[1], r[2]) not in seen and not seen.add((r[1], r[2]))]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double")

    gap_s = rng.choice([600, 1800])
    blk = SessionizeEvents(Frame(df, "S%d" % trial),
                           gap="{} minutes".format(gap_s // 60))
    got = {(r["user_id"], r["session_start"].replace(tzinfo=timezone.utc)):
           (r["n_events"], round(r["total_value"], 6))
           for r in blk.plan(spark).collect()}
    want = {}
    by_user = {}
    for _, u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, v))
    for u, evs in by_user.items():
        evs.sort()
        cur = [evs[0]]
        for e in evs[1:]:
            if (e[0] - cur[-1][0]).total_seconds() < gap_s:
                cur.append(e)
            else:
                want[(u, cur[0][0])] = (len(cur),
                                        round(sum(v for _, v in cur), 6))
                cur = [e]
        want[(u, cur[0][0])] = (len(cur),
                                round(sum(v for _, v in cur), 6))
    if got != want:
        diff = {k for k in set(got) | set(want)
                if got.get(k) != want.get(k)}
        fails.append(("sessionize", trial, gap_s,
                      [(k, got.get(k), want.get(k))
                       for k in list(diff)[:3]]))

    # RollingEventAggregate: trailing-interval sum per event
    iv_s = rng.choice([600, 3600])
    rblk = RollingEventAggregate(Frame(df, "R%d" % trial),
                                 interval="{} minutes".format(iv_s // 60),
                                 statistic="sum")
    rgot = {r["event_id"]: round(r["rolling"], 6)
            for r in rblk.plan(spark).collect()}
    rwant = {}
    for eid2, u, ts, v in rows:
        tot = sum(v2 for e2, u2, t2, v2 in rows
                  if u2 == u and timedelta(0) <= ts - t2
                  and (ts - t2).total_seconds() <= iv_s)
        rwant[eid2] = round(tot, 6)
    if rgot != rwant:
        diff = {k for k in set(rgot) | set(rwant)
                if rgot.get(k) != rwant.get(k)}
        fails.append(("rolling", trial, iv_s,
                      [(k, rgot.get(k), rwant.get(k))
                       for k in list(diff)[:3]]))
    if fails:
        break
print("events hunt fails:", fails if fails else 0)
