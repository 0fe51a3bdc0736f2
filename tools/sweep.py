"""Full-registry oracle sweep: run EVERY demos.QUERIES entry on Spark
AND its DuckDB oracle at a given scale factor, comparing with the
bit-sensitive comparator tests/test_oracle_parity.py uses (the
driver's t2 gate semantics).  Round close runs this at sf0.01.

    PYTHONPATH=. python tools/sweep.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import duckdb  # noqa: E402

from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

import test_oracle_parity as top  # noqa: E402

top.SF_DIR = SF_DIR
con = duckdb.connect()
for t in top.TABLES:
    con.execute("CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'"
                .format(t=t, d=SF_DIR))

from dask_geomodeling_spark.demos import ORACLES, QUERIES  # noqa: E402

fails, t0 = [], time.time()
names = sorted(QUERIES)
for i, name in enumerate(names):
    tq = time.time()
    try:
        if name in ORACLES:
            top.assert_parity(spark, con, name)
        else:
            assert QUERIES[name](spark, SF_DIR).count() >= 0
        status = "ok"
    except Exception as exc:  # noqa: BLE001
        fails.append(name)
        status = "FAIL: {}".format(str(exc)[:200])
    print("[{:3d}/{}] {:40s} {:6.1f}s {}".format(
        i + 1, len(names), name, time.time() - tq, status),
        flush=True)

print()
print("SWEEP {}: {}/{} green in {:.0f}s{}".format(
    SF_DIR, len(names) - len(fails), len(names), time.time() - t0,
    "" if not fails else "; FAILS: {}".format(fails)))
sys.exit(1 if fails else 0)
