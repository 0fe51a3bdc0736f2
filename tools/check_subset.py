"""Oracle-parity check of a named subset of demos.QUERIES at sf0.01.

    PYTHONPATH=. python tools/check_subset.py name1 name2 ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests"))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

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

names = sys.argv[1:]
fails = []
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
        status = "FAIL: {}".format(str(exc)[:300])
    print("[{:3d}/{}] {:40s} {:6.1f}s {}".format(
        i + 1, len(names), name, time.time() - tq, status),
        flush=True)

print("SUBSET: {}/{} green{}".format(
    len(names) - len(fails), len(names),
    "" if not fails else "; FAILS: {}".format(fails)))
sys.exit(1 if fails else 0)
