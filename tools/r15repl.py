"""Interactive profiling helpers for the r15 optimization round.

    tmux:  python -i tools/r15repl.py

Exposes ``spark``, ``t(name)`` (min-of-2 noop-sink wall seconds +
job count for a demos.QUERIES entry), ``plan(name, path=None)``
(explain formatted), and ``dfjobs(fn)`` for ad-hoc frames.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

from dask_geomodeling_spark import demos  # noqa: E402


def _run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def _jobs_between(fn):
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    group = "prof-{}".format(time.time())
    sc.setJobGroup(group, "profiling")
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    jobs = len(tracker.getJobIdsForGroup(group) or [])
    sc.setJobGroup(None, None)
    return out, dt, jobs


def t(name, n=2, sf_dir=None):
    """min-of-n build+noop seconds (bench.py's exact timed span) +
    job count."""
    best, jobs = None, None
    for _ in range(n):
        def run():
            df = demos.QUERIES[name](spark, sf_dir or SF_DIR)
            _run_noop(df)
        _, dt, j = _jobs_between(run)
        if best is None or dt < best:
            best, jobs = dt, j
    print("{:30s} {:6.3f}s  jobs={}".format(name, best, jobs))
    return best


def plan(name, path=None, sf_dir=None):
    df = demos.QUERIES[name](spark, sf_dir or SF_DIR)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    if path:
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)
    else:
        print(txt)
    return txt


def dfjobs(fn):
    """Time an arbitrary thunk returning a DataFrame; noop-sink it."""
    df = fn()
    _, dt, j = _jobs_between(lambda: _run_noop(df))
    print("{:6.3f}s  jobs={}".format(dt, j))
    return dt


print("r15repl ready: t(name), plan(name, path), dfjobs(fn); SF_DIR=",
      SF_DIR)
