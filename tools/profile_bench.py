"""Per-query bench profile: wall seconds (bench.py's min-of-2 noop
convention) + SPARK JOB COUNT per query (the scheduling-floor
multiplier — guide §1: measure first, know where the time goes) +
optional .explain("formatted") dumps.

    PYTHONPATH=. python tools/profile_bench.py [sf_dir] [--plans DIR]
                                               [--only name1,name2]

Writes one JSON line per query to stdout and a summary at the end.
Job counts come from the status tracker via a per-query job group —
no UI needed.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    plans_dir = None
    only = None
    suffix = "before"
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--only":
            only = set(args[i + 1].split(","))
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            sf_dir = args[i]
            i += 1

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from dask_geomodeling_spark.config import get_spark
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from dask_geomodeling_spark import demos

    # reuse bench.py's headline list verbatim (parsed from its source)
    headline = _headline_names(demos)
    if only:
        headline = [n for n in headline if n in only]

    # warmup at sf0.001 (same convention as bench.py)
    warm_dir = "/root/testdata/sf0.001"
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for name in headline:
        try:
            demos.QUERIES[name](spark, warm_dir) \
                .write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    results = {}
    for name in headline:
        fn = demos.QUERIES[name]
        best, best_jobs = None, None
        for rep in range(2):
            group = "{}#{}".format(name, rep)
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.monotonic() - t0
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            if best is None or dt < best:
                best, best_jobs = dt, jobs
        results[name] = {"sec": round(best, 3), "jobs": best_jobs}
        print(json.dumps({"query": name, **results[name]}), flush=True)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            try:
                df = fn(spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                import contextlib
                import io
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    fn(spark, sf_dir).explain("formatted")
                txt = buf.getvalue()
            with open(os.path.join(
                    plans_dir, "{}_{}.txt".format(name, suffix)),
                    "w") as f:
                f.write(txt)

    total = round(sum(r["sec"] for r in results.values()), 3)
    jobs_total = sum(r["jobs"] or 0 for r in results.values())
    print(json.dumps({
        "metric": "profile_total", "value": total, "unit": "sec",
        "n_queries": len(results), "jobs_total": jobs_total,
        "sf_dir": sf_dir,
        "queries": {k: v["sec"] for k, v in results.items()},
        "jobs": {k: v["jobs"] for k, v in results.items()},
    }))


def _headline_names(demos):
    """Extract the same headline list bench.py uses, by executing its
    list-building fragment (kept in sync by reading bench.py source)."""
    import re
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "bench.py")).read()
    names = re.findall(r'"([a-z0-9_]+)"', src.split("headline = [")[1]
                       .split("# warm the JVM")[0])
    seen, out = set(), []
    for n in names:
        if n in demos.QUERIES and n not in seen:
            seen.add(n)
            out.append(n)
    return out


if __name__ == "__main__":
    sys.exit(main())
