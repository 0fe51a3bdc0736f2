"""Shared column/aggregation helpers.

``statistic_expr`` maps the reference's statistic strings (raster/
reduction.py:13 STATISTICS, raster/temporal.py TemporalAggregate.STATISTICS,
geometry/aggregate.py:310) to Spark aggregate expressions.  Notes:

- NULL is no-data, and Spark aggregates skip NULLs — exactly the
  reference's nan-ignoring statistics.
- ``std``/``var`` are population moments (np.nanstd ddof=0) →
  ``stddev_pop``/``var_pop``.
- ``p<q>`` / ``median`` use exact ``percentile`` (linear interpolation,
  matching np.nanpercentile).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

__all__ = ["statistic_expr", "parse_percentile_statistic", "STATISTICS"]

PERCENTILE_RE = re.compile(r"^p([\d.]+)$")

STATISTICS = ("first", "last", "count", "sum", "mean", "min", "max",
              "argmin", "argmax", "product", "std", "var", "median")


def parse_percentile_statistic(statistic):
    """'p75' -> 75.0 (reference: utils.parse_percentile_statistic)."""
    m = PERCENTILE_RE.match(statistic)
    if m:
        q = float(m.group(1))
        if 0 <= q <= 100:
            return q
    return None


def statistic_expr(statistic, col="value"):
    """Spark aggregate Column for a reference statistic string."""
    c = F.col(col)
    q = parse_percentile_statistic(statistic)
    if q is not None:
        return F.percentile(c, q / 100.0)
    simple = {
        "sum": F.sum(c),
        "count": F.count(c),
        "min": F.min(c),
        "max": F.max(c),
        "mean": F.avg(c),
        "median": F.percentile(c, 0.5),
        "std": F.stddev_pop(c),
        "var": F.var_pop(c),
        "product": F.product(c),
        "first": F.first(c, ignorenulls=True),
        "last": F.last(c, ignorenulls=True),
    }
    if statistic not in simple:
        raise ValueError('Unknown statistic "{}"'.format(statistic))
    return simple[statistic]


def check_statistic(statistic):
    """reference: raster/reduction.py:31"""
    q = parse_percentile_statistic(statistic)
    if q is None and statistic not in (
            "sum", "count", "min", "max", "mean", "median", "std", "var",
            "product", "first", "last", "argmin", "argmax"):
        raise ValueError('Unknown statistic "{}"'.format(statistic))
