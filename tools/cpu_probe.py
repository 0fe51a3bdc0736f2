"""Load-insensitive per-query measurement: executor CPU time summed
over stages (AppStatusStore), plus job count, for ONE cold
materialization per query (cache cleared first).  Wall clock on this
host swings 3-5x with neighbor load; CPU time and job counts are the
stable signals.

    PYTHONPATH=. python tools/cpu_probe.py q1,q2,... [reps]
"""
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
from dask_geomodeling_spark.config import get_spark

names = sys.argv[1].split(",")
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
from dask_geomodeling_spark import demos


_JVM_PID = None


def total_cpu_ms():
    # local mode: driver + executors are ONE JVM — its /proc cpu
    # counters are the total engine work (Python workers excluded)
    global _JVM_PID
    if _JVM_PID is None:
        _JVM_PID = sc._jvm.java.lang.ProcessHandle.current().pid()
    with open("/proc/{}/stat".format(_JVM_PID)) as f:
        parts = f.read().rsplit(")", 1)[1].split()
    hz = os.sysconf("SC_CLK_TCK")
    return (int(parts[11]) + int(parts[12])) * 1000.0 / hz


SF = "/root/testdata/sf0.1"
for name in names:
    demos.QUERIES[name](spark, "/root/testdata/sf0.001") \
        .write.format("noop").mode("overwrite").save()
    best = None
    for rep in range(reps):
        spark.catalog.clearCache()
        g = "{}#{}".format(name, rep)
        sc.setJobGroup(g, name)
        c0 = total_cpu_ms()
        t0 = time.monotonic()
        demos.QUERIES[name](spark, SF).write.format("noop") \
            .mode("overwrite").save()
        wall = time.monotonic() - t0
        cpu = total_cpu_ms() - c0
        jobs = len(sc.statusTracker().getJobIdsForGroup(g))
        sc.setJobGroup(None, None)
        if best is None or cpu < best[0]:
            best = (cpu, wall, jobs)
    print("%-24s cpu %7.0f ms  wall %6.2f s  jobs %d"
          % (name, best[0], best[1], best[2]), flush=True)
