"""Engine configuration (reference analogue: dask_geomodeling/config.py,
which uses dask.config). Holds the shared SparkSession and scale-oriented
defaults (AQE, shuffle partitions, Arrow)."""

from __future__ import annotations

import os

_spark = None

DEFAULTS = {
    # AQE re-plans shuffles at runtime (skew joins, partition coalescing)
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all pandas-UDF exchange
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # sized for local test SFs; a real cluster overrides via spark-submit
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def set_spark(spark):
    global _spark
    _spark = spark


def get_spark():
    """Return the configured SparkSession, creating a local one if needed."""
    global _spark
    if _spark is not None:
        return _spark
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        _spark = active
        return _spark
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (SparkSession.builder.master(f"local[{cpus}]")
               .appName("dask-geomodeling-spark"))
    for k, v in DEFAULTS.items():
        builder = builder.config(k, v)
    _spark = builder.getOrCreate()
    return _spark
