"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pricing-summary query at sf0.001;
``queries``/``oracle_sql`` expose the full demo catalog from
``dask_geomodeling_spark.demos`` (one entry per implemented operator
from SURVEY.md §2, each paired with a DuckDB-runnable ANSI-SQL oracle
where SQL can express the semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dask_geomodeling_spark import demos
    return demos.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dask_geomodeling_spark import demos
    return dict(demos.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    from dask_geomodeling_spark import demos
    return dict(demos.ORACLES)
