"""AsofJoin / IntervalJoin batch semantics vs brute force on random
event sets."""
import os, sys, random
from datetime import datetime, timezone, timedelta
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.core.blocks import Block
from dask_geomodeling_spark.streaming.events import AsofJoin, IntervalJoin

class Frame(Block):
    def __init__(self, df, tag):
        self._df = df
        super().__init__(tag)
    def _build(self, ctx):
        return self._df

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
rng = random.Random(1357)
fails = []
for trial in range(8):
    nkeys = rng.randint(1, 5)
    lrows, rrows = [], []
    eid = 0
    for _ in range(rng.randint(5, 60)):
        eid += 1
        lrows.append((eid, rng.randint(0, nkeys-1),
                      EPOCH + timedelta(seconds=rng.randint(0, 4000)), 1.0))
    for _ in range(rng.randint(5, 60)):
        eid += 1
        rrows.append((eid, rng.randint(0, nkeys-1),
                      EPOCH + timedelta(seconds=rng.randint(0, 4000)), 2.0))
    ldf = spark.createDataFrame(lrows, "event_id bigint, user_id bigint, ts timestamp, value double")
    rdf = spark.createDataFrame(rrows, "event_id bigint, user_id bigint, ts timestamp, value double")
    horizon = rng.choice([None, "10 minutes", "1 hours"])
    blk = AsofJoin(Frame(ldf, "L%d" % trial), Frame(rdf, "R%d" % trial),
                   horizon=horizon)
    got = {(r["l_id"]): (r["r_id"], r["gap_us"])
           for r in blk.plan(spark).collect()}
    hus = None if horizon is None else AsofJoin._horizon_us(horizon)
    want = {}
    for lid, lk, lts, _ in lrows:
        best = None
        for rid, rk, rts, _ in rrows:
            if rk != lk or rts > lts:
                continue
            # ties: right-before-left then larger right id
            cand = (rts, rid)
            if best is None or cand > best:
                best = cand
        if best is not None:
            gap = int((lts - best[0]).total_seconds() * 10**6)
            if hus is None or gap <= hus:
                want[lid] = (best[1], gap)
    if got != want:
        fails.append((trial, horizon,
                      {k: (got.get(k), want.get(k))
                       for k in set(got) ^ set(want) | set(
                           k for k in set(got) & set(want)
                           if got[k] != want[k])}))
        if len(fails) >= 2: break

    # IntervalJoin: right events of same key in [l_ts, l_ts + within]
    within = rng.choice(["5 minutes", "30 minutes"])
    iblk = IntervalJoin(Frame(ldf, "IL%d" % trial),
                        Frame(rdf, "IR%d" % trial), within=within)
    got2 = set()
    for r in iblk.plan(spark).collect():
        got2.add((r["event_id_l"], r["event_id_r"]))
    wus = AsofJoin._horizon_us(within)
    want2 = set()
    for lid, lk, lts, _ in lrows:
        for rid, rk, rts, _ in rrows:
            if rk == lk and 0 <= (rts - lts).total_seconds() * 10**6 <= wus:
                want2.add((lid, rid))
    if got2 != want2:
        fails.append((trial, "interval", within,
                      list(got2 ^ want2)[:5]))
        if len(fails) >= 2: break
print("asof/interval hunt fails:", fails if fails else 0)
