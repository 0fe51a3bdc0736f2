"""Raster stack reduction (reference: raster/reduction.py).

``reduce_rasters`` (reference :38) applies a nan-ignoring statistic across
a stack of rasters.  Spark-first: union all cell tables + ONE grouped
aggregation on (time, y, x) — a single shuffle regardless of stack depth
(the join-chain alternative would shuffle n-1 times), with map-side
partial aggregation for the algebraic statistics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.functions import check_statistic, statistic_expr
from dask_geomodeling_spark.raster.base import (BaseSingle,
                                                RasterBlock,
                                                raster_statistic_expr)

__all__ = ["BaseReduction", "Max", "Min", "Sum", "Count", "Mean", "Median",
           "Std", "Var", "Percentile", "reduce_rasters"]


class BaseReduction(RasterBlock):
    """Reduce 2+ rasters elementwise, ignoring no-data (reference:
    raster/reduction.py:122)."""

    statistic = None

    def __init__(self, *args):
        for a in args:
            if not isinstance(a, RasterBlock):
                raise TypeError("'{}' object is not allowed".format(type(a)))
        if len(args) < 1:
            raise TypeError("need at least one raster")
        super().__init__(*args)

    def _build(self, ctx):
        union = self.args[0]._build(ctx).select("time", "y", "x", "value")
        for block in self.args[1:]:
            union = union.unionByName(
                block._build(ctx).select("time", "y", "x", "value"))
        return (union.filter(F.col("value").isNotNull())
                .groupBy("time", "y", "x")
                .agg(raster_statistic_expr(self.statistic)
                     .alias("value")))


class Max(BaseReduction):
    """Maximum of rasters, ignoring no-data (reference:
    raster/reduction.py:215)."""
    statistic = "max"


class Min(BaseReduction):
    statistic = "min"


class Sum(BaseReduction):
    statistic = "sum"


class Count(BaseReduction):
    statistic = "count"


class Mean(BaseReduction):
    statistic = "mean"


class Median(BaseReduction):
    statistic = "median"


class Std(BaseReduction):
    statistic = "std"


class Var(BaseReduction):
    statistic = "var"


class Percentile(RasterBlock):
    """p<q> across the stack (reference reduce_rasters percentile path)."""

    def __init__(self, percentile, *args):
        for a in args:
            if not isinstance(a, RasterBlock):
                raise TypeError("'{}' object is not allowed".format(type(a)))
        if len(args) < 1:
            raise TypeError("need at least one raster")
        super().__init__(float(percentile), *args)

    def _build(self, ctx):
        blocks = self.args[1:]
        union = blocks[0]._build(ctx).select("time", "y", "x", "value")
        for block in blocks[1:]:
            union = union.unionByName(
                block._build(ctx).select("time", "y", "x", "value"))
        q = self.args[0]
        return (union.filter(F.col("value").isNotNull())
                .groupBy("time", "y", "x")
                .agg(F.percentile(F.col("value"), q / 100.0).alias("value")))


def reduce_rasters(blocks, statistic):
    """Functional entry point (reference: raster/reduction.py:38)."""
    check_statistic(statistic)
    from dask_geomodeling_spark.functions import parse_percentile_statistic
    q = parse_percentile_statistic(statistic)
    if q is not None:
        return Percentile(q, *blocks)
    cls = {"max": Max, "min": Min, "sum": Sum, "count": Count,
           "mean": Mean, "median": Median, "std": Std, "var": Var}
    if statistic not in cls:
        raise ValueError('Unknown statistic "{}"'.format(statistic))
    return cls[statistic](*blocks)


class RasterHistogram(BaseSingle):
    """Global value histogram of a raster stack (round 9 — the
    whole-raster companion of the zonal
    ``AggregateRasterHistogram``): one row per (time, bin) with the
    cell count.  ``bin_size`` buckets values by
    ``floor(value / bin_size)`` (bin left edges in ``bin_start``);
    ``bin_size=None`` counts DISTINCT values (categorical rasters).
    ONE grouped count — map-side partials, no window, no collect."""

    def __init__(self, store, bin_size=None):
        if bin_size is not None and not float(bin_size) > 0:
            raise ValueError("bin_size must be > 0")
        super().__init__(store, None if bin_size is None
                         else float(bin_size))

    def _build(self, ctx):
        bs = self.args[1]
        df = self.store._build(ctx).filter(F.col("value").isNotNull())
        if bs is None:
            key = F.col("value").alias("bin_start")
        else:
            key = (F.floor(F.col("value") / F.lit(bs))
                   * F.lit(bs)).alias("bin_start")
        return (df.groupBy("time", key)
                .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
