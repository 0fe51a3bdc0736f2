"""Labeled-region measurements (reference: measurements.py — a
scipy.ndimage-style ``percentile`` over labeled regions).

Spark-first shape: the value raster and the label raster are aligned
cell tables, so a labeled measurement is one inner join on
``(time, y, x)`` followed by one grouped percentile — the join
broadcasts when the label raster is small, and both sides can be
bucketed by ``(y, x)`` at scale for a shuffle-free join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.core.blocks import Block
from dask_geomodeling_spark.raster.base import RasterBlock

__all__ = ["PercentileOverLabels", "percentile"]


class PercentileOverLabels(Block):
    """Percentile of raster values over labeled regions (reference:
    measurements.py:18 ``percentile(data, qval, labels, index)``).

    - ``labels=None``: one percentile over all data cells
      (output label = NULL);
    - ``labels`` given, ``index=None``: one percentile over cells whose
      label is non-zero (output label = NULL);
    - ``index=[...]``: one row per requested label.

    Output columns: ``label`` (bigint, NULL for the scalar forms),
    ``value`` (double).
    """

    def __init__(self, data, qval, labels=None, index=None):
        if not isinstance(data, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(data)))
        qval = float(qval)
        if not 0 <= qval <= 100:
            raise ValueError("qval must be between 0 and 100")
        if labels is not None and not isinstance(labels, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(labels)))
        if index is not None:
            index = [int(i) for i in index]
        super().__init__(data, qval, labels, index)

    def _build(self, ctx):
        data, qval, labels, index = self.args
        df = (data._build(ctx)
              .filter(F.col("value").isNotNull()))
        pct = F.percentile(F.col("value"), qval / 100.0)
        if labels is None:
            return df.agg(pct.alias("value")).select(
                F.lit(None).cast("bigint").alias("label"), "value")
        lab = (labels._build(ctx)
               .filter(F.col("value").isNotNull())
               .select("time", "y", "x",
                       F.col("value").cast("bigint").alias("label")))
        joined = df.join(lab, ["time", "y", "x"])
        if index is None:
            return (joined.filter(F.col("label") != 0)
                    .agg(pct.alias("value"))
                    .select(F.lit(None).cast("bigint").alias("label"),
                            "value"))
        return (joined.filter(F.col("label").isin(index))
                .groupBy("label").agg(pct.alias("value")))


def percentile(data, qval, labels=None, index=None):
    """Functional entry point mirroring the reference signature."""
    return PercentileOverLabels(data, qval, labels, index)
