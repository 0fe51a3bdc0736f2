"""String-time request-bound hunt (round 15, r14 verdict #4 — the
last named candidate family): the feature plane's start/stop bounds
against STRING and DATE time columns, and the raster plane's string
bound parsing, cross-checked against a pure stdlib-datetime model
under a hostile (non-UTC) session timezone.

Covered edge shapes: 'T' separators, trailing 'Z', bare dates, 1-6
digit fractional seconds, DATE-typed columns vs instant bounds,
bounds with/without microseconds, aware bounds with UTC offsets, and
bound strings in every accepted ISO flavor."""
import datetime
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", ".."))
from dask_geomodeling_spark.config import get_spark  # noqa: E402
from dask_geomodeling_spark.geometry.base import (  # noqa: E402
    apply_feature_request)
from dask_geomodeling_spark.utils import request_instant_us  # noqa

UTC = datetime.timezone.utc
rng = random.Random(20150817)
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
saved_tz = spark.conf.get("spark.sql.session.timeZone")
spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
fails = 0


def rand_instant():
    base = datetime.datetime(1995, 1, 1, tzinfo=UTC)
    us = rng.randrange(0, 40 * 86400 * 10 ** 6)
    return base + datetime.timedelta(microseconds=us)


def render(inst, style):
    """One of the wild string shapes for a UTC instant."""
    if style == "date":       # bare date == midnight of that day
        return inst.strftime("%Y-%m-%d")
    s = inst.strftime("%Y-%m-%d %H:%M:%S")
    if style == "frac":
        # incl. EXPLICIT ZERO fractions (r15 review falsifier class)
        digits = rng.randint(1, 6)
        frac = "{:06d}".format(inst.microsecond)[:digits]
        s += "." + frac
    if style == "tsep":
        s = s.replace(" ", "T")
    if style == "zulu":
        s = s.replace(" ", "T") + "Z"
    return s


def model_instant(s):
    """stdlib parse of the wild string shapes (the ground truth)."""
    t = s.replace("T", " ").rstrip("Z")
    if len(t) == 10:
        t += " 00:00:00"
    frac = t.split(".")[1] if "." in t else "0"
    return datetime.datetime.strptime(
        t.split(".")[0], "%Y-%m-%d %H:%M:%S").replace(tzinfo=UTC) \
        + datetime.timedelta(microseconds=int(frac.ljust(6, "0")[:6]))


# ---- 1. feature plane, STRING column -------------------------------
for trial in range(20):
    rows = []
    for i in range(60):
        inst = rand_instant()
        style = rng.choice(["plain", "date", "frac", "tsep", "zulu"])
        if style == "date":
            inst = inst.replace(hour=0, minute=0, second=0,
                                microsecond=0)
        if style != "frac":
            inst = inst.replace(microsecond=0)
        elif rng.random() < 0.3:
            inst = inst.replace(microsecond=0)   # zero fraction
        rows.append((i, render(inst, style)))
    sdf = spark.createDataFrame(rows, "id bigint, t string")
    start = rand_instant().replace(
        microsecond=rng.choice([0, rng.randrange(10 ** 6)]))
    stop = start + datetime.timedelta(
        days=rng.randint(1, 20), seconds=rng.randrange(86400))
    req = {}
    if rng.random() < 0.85:
        req["start"] = start.replace(tzinfo=None)
    if rng.random() < 0.85:
        req["stop"] = stop.replace(tzinfo=None)
    got = sorted(r["id"] for r in apply_feature_request(
        sdf, req, time_column="t").collect())
    want = []
    for i, s in rows:
        inst = model_instant(s)
        if "start" in req and inst < start:
            continue
        if "stop" in req and inst > stop:
            continue
        want.append(i)
    if got != want:
        fails += 1
        print("STRING-COLUMN FAIL", trial, req,
              sorted(set(got) ^ set(want)),
              [rows[i] for i in sorted(set(got) ^ set(want))][:4])

# ---- 2. feature plane, DATE column ---------------------------------
for trial in range(10):
    rows = [(i, (datetime.date(1995, 1, 1)
                 + datetime.timedelta(days=rng.randrange(40))))
            for i in range(50)]
    sdf = spark.createDataFrame(rows, "id bigint, t date")
    start = rand_instant()
    stop = start + datetime.timedelta(days=rng.randint(1, 15),
                                      seconds=rng.randrange(86400))
    got = sorted(r["id"] for r in apply_feature_request(
        sdf, {"start": start.replace(tzinfo=None),
              "stop": stop.replace(tzinfo=None)},
        time_column="t").collect())
    want = [i for i, d in rows
            if start <= datetime.datetime(
                d.year, d.month, d.day, tzinfo=UTC) <= stop]
    if got != want:
        fails += 1
        print("DATE-COLUMN FAIL", trial, start, stop,
              sorted(set(got) ^ set(want)))

# ---- 3. bound-string parsing (both planes share it) ----------------
for trial in range(60):
    inst = rand_instant()
    style = rng.choice(["plain", "tsep", "zulu", "frac", "offset",
                        "date"])
    if style == "offset":
        inst = inst.replace(microsecond=0)   # rendered without frac
        off = rng.choice([1, -1]) * rng.randint(1, 12)
        local = inst + datetime.timedelta(hours=off)
        s = local.strftime("%Y-%m-%d %H:%M:%S") + "{:+03d}:00".format(off)
        want_us = request_instant_us(inst.replace(tzinfo=None))
    elif style == "date":
        d = inst.date()
        s = d.strftime("%Y-%m-%d")
        want_us = (d - datetime.date(1970, 1, 1)).days * 86400000000
    else:
        if style != "frac":
            inst = inst.replace(microsecond=0)
        s = inst.strftime("%Y-%m-%d %H:%M:%S")
        if style == "frac":
            s += ".{:06d}".format(inst.microsecond)
        if style in ("tsep", "zulu"):
            s = s.replace(" ", "T")
        if style == "zulu":
            # fromisoformat accepts 'Z' on 3.11+
            s += "Z" if rng.random() < 0.5 else "+00:00"
        epoch = datetime.datetime(1970, 1, 1, tzinfo=UTC)
        want_us = (inst - epoch) // datetime.timedelta(microseconds=1)
    got_us = request_instant_us(s)
    if got_us != want_us:
        fails += 1
        print("BOUND-PARSE FAIL", trial, style, s, got_us, want_us)

spark.conf.set("spark.sql.session.timeZone", saved_tz)
print()
if fails:
    print("FALSIFIERS:", fails)
    sys.exit(1)
print("CLEAN: 20 randomized string-column trials + 10 DATE-column "
      "trials + 60 bound-string parses match the stdlib-datetime "
      "model under Asia/Tokyo session timezone")
