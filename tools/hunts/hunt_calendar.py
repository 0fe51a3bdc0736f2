"""Calendar-frequency hunt (round 14): TemporalAggregate with
M/Q/Y/multiplier/W-anchor/B aliases × closed × label × timezone vs a
pure-python calendar model (stdlib datetime + zoneinfo — fully
independent of the engine's add_months/epoch-day SQL arithmetic), on
random sparse series spanning 1968–2030 (pre-epoch bins included) with
instants planted ON bin boundaries so the closed rule is load-bearing.
"""
import os
import random
import sys
from datetime import date, datetime, timedelta, timezone

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", ".."))
from zoneinfo import ZoneInfo  # noqa: E402

from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.raster.sources import (  # noqa: E402
    DataFrameRasterSource)
from dask_geomodeling_spark.raster.temporal import (  # noqa: E402
    TemporalAggregate)

rng = random.Random(14114)
UTC = timezone.utc


def month_bucket(d, n):
    ms = (d.year - 1970) * 12 + d.month - 1
    b = ms - ms % n
    def md(k):
        y, m = divmod(k, 12)
        return date(1970 + y, m + 1, 1)
    return md(b), md(b + n)


def week_bucket(d, n, anchor):
    days = (d - date(1970, 1, 1)).days
    off = (anchor - 3) % 7
    per = 7 * n
    sd = days - (days - off) % per
    e = date(1970, 1, 1)
    return e + timedelta(days=sd), e + timedelta(days=sd + per)


def bday_bucket(d):
    wd = d.weekday()
    s = d - timedelta(days=max(wd - 4, 0))
    e = s + timedelta(days=3 if s.weekday() == 4 else 1)
    return s, e


def model(pts, alias, closed, label, tz):
    """pts: [(utc_naive_datetime, value)] → {utc label: [values]}"""
    z = ZoneInfo(tz)
    out = {}
    for t, v in pts:
        loc = t.replace(tzinfo=UTC).astimezone(z).replace(tzinfo=None)
        if closed == "right":
            loc = loc - timedelta(microseconds=1)
        d = loc.date()
        if alias.endswith(("M", "Q", "Y")):
            n = int(alias[:-1] or 1) * {"M": 1, "Q": 3, "Y": 12}[
                alias[-1]]
            s, e = month_bucket(d, n)
        elif alias == "B":
            s, e = bday_bucket(d)
        else:                      # W-XXX
            anchor = ["MON", "TUE", "WED", "THU", "FRI", "SAT",
                      "SUN"].index(alias[2:])
            s, e = week_bucket(d, 1, anchor)
        lb = e if label == "right" else s
        lab = datetime(lb.year, lb.month, lb.day)
        # label converts back through the LABEL's own offset
        lab = lab.replace(tzinfo=z).astimezone(UTC).replace(tzinfo=None)
        out.setdefault(lab, []).append(v)
    return {k: float(max(vs)) for k, vs in out.items()}


fails = 0
ALIASES = ["M", "2M", "3M", "Q", "2Q", "Y", "B",
           "W-MON", "W-WED", "W-SUN"]
for trial in range(10):
    alias = rng.choice(ALIASES)
    closed = rng.choice([None, "left", "right"])
    label = rng.choice([None, "left", "right"])
    tz = rng.choice(["UTC", "America/New_York", "Asia/Tokyo",
                     "Australia/Adelaide"])
    pts = []
    for _ in range(rng.randint(5, 40)):
        # random instants 1968..2030, half planted exactly on local
        # midnight boundaries so closed='right' actually moves them
        day = rng.randint(-700, 22000)
        if rng.random() < 0.5:
            t = datetime(1970, 1, 1) + timedelta(days=day)
            if tz != "UTC":
                # local midnight of that date
                loc = datetime(1970, 1, 1) + timedelta(days=day)
                t = loc.replace(tzinfo=ZoneInfo(tz)) \
                    .astimezone(UTC).replace(tzinfo=None)
        else:
            t = (datetime(1970, 1, 1)
                 + timedelta(days=day, seconds=rng.randint(0, 86399)))
        pts.append((t, round(rng.uniform(-9, 9), 3)))
    # dedupe times (MAX makes collisions order-free anyway)
    df = spark.createDataFrame(
        [(t.replace(tzinfo=UTC), 0, 0, v) for t, v in pts],
        "time timestamp, y bigint, x bigint, value double")
    blk = TemporalAggregate(DataFrameRasterSource(df), alias, "max",
                            closed=closed, label=label, timezone=tz)
    got = {r["time"]: r["value"] for r in blk.plan(spark).collect()}
    want = model(pts, alias, closed, label, tz)
    if got != want:
        fails += 1
        diff = {k: (got.get(k), want.get(k))
                for k in set(got) | set(want)
                if got.get(k) != want.get(k)}
        print("FAIL", trial, alias, closed, label, tz,
              sorted(diff.items())[:4])

print()
if fails:
    print("FALSIFIERS:", fails)
    sys.exit(1)
print("CLEAN: calendar bins match the independent stdlib model "
      "across aliases x closed x label x timezone, pre-epoch "
      "included")
