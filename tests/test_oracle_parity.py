"""Mirror of the driver's t2 gate: run every demo query on Spark AND its
DuckDB oracle on the same sf0.001 parquet, compare row counts, column
names, and (order-insensitively) values."""

import math
import struct

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute("CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'"
                    .format(t=t, d=SF_DIR))
    return con


def normalize(df):
    """Sort columns by name and sort rows by a 6-decimal-rounded key,
    but KEEP raw float values: the driver hashes raw bits (0.0 and
    -0.0 hash apart), so the comparator must see the raw doubles too
    (round 9 — this is what lets the suite catch the signed-zero class
    the old round-then-compare version was blind to)."""
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    key = {}
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == "object":
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        key[c] = df[c].round(6) if df[c].dtype == "float64" else df[c]
    frame = pd.DataFrame(key)
    # raw floats as SECONDARY keys: rows tying on the rounded key
    # would otherwise align in engine-arrival order and fail the
    # bit-level compare spuriously (round-9 review fix); genuinely
    # differing bits still land on the assert, as they must
    raws = []
    for c in df.columns:
        if df[c].dtype == "float64":
            rc = "_raw_" + c
            frame[rc] = df[c]
            raws.append(rc)
    order = frame.sort_values(by=list(df.columns) + raws).index
    return df.loc[order].reset_index(drop=True)


def assert_parity(spark, con, name):
    from dask_geomodeling_spark.demos import ORACLES, QUERIES
    mine = QUERIES[name](spark, SF_DIR).toPandas()
    oracle = con.execute(ORACLES[name]).df()
    assert len(mine) == len(oracle), (
        "{}: row count {} != oracle {}".format(name, len(mine), len(oracle)))
    assert sorted(mine.columns) == sorted(oracle.columns), (
        "{}: columns {} != {}".format(name, sorted(mine.columns),
                                      sorted(oracle.columns)))
    a, b = normalize(mine), normalize(oracle)
    for c in a.columns:
        # the driver's hash is dtype-sensitive (3 vs 3.0 hash apart):
        # int-vs-float disagreement is a real gate failure even when
        # values compare equal loosely
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        num = {"i", "u", "f"}
        if ka in num or kb in num:
            assert (ka in "iu") == (kb in "iu"), (
                "{}.{}: dtype {} != oracle {}".format(
                    name, c, a[c].dtype, b[c].dtype))
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                # bit-sensitive, like the driver's value hash: -0.0
                # vs 0.0 must fail here exactly as it fails there
                assert struct.pack("<d", x) == struct.pack("<d", y), (
                    "{}.{}[{}]: {!r} != {!r} (bit-level)".format(
                        name, c, i, x, y))
            else:
                assert (x == y) or (x is None and y is None) or (
                    x != x and y != y), (
                    "{}.{}[{}]: {!r} != {!r}".format(name, c, i, x, y))


def all_oracle_names():
    from dask_geomodeling_spark.demos import ORACLES
    return sorted(ORACLES)


@pytest.mark.parametrize("name", all_oracle_names())
def test_parity(spark, con, name):
    assert_parity(spark, con, name)


def test_all_queries_run(spark):
    """Queries without oracles still must execute and return rows."""
    from dask_geomodeling_spark.demos import ORACLES, QUERIES
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        assert fn(spark, SF_DIR).count() >= 0, name
