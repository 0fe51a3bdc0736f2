"""Dissolve — merge features sharing an attribute value into one
feature per group (the geopandas ``dissolve`` / OGR ``ST_Union`` by
attribute).  No reference analogue (the reference has no
geometry-geometry aggregation); semantics documented precisely:

- ``rings`` inputs, ``union='concat'`` (default): the group's
  geometry is the MULTIPART collection of all member rings (flat
  concat).  For DISJOINT members this IS the exact geometric union
  (area/containment/rasterize all agree — the even-odd machinery
  treats extra parts as more rings); overlapping members CANCEL
  where they overlap under even-odd filling (a user dissolving
  overlapping parcels gets holes at the overlaps) — cheap, one hash
  agg, but only correct for disjoint members.
- ``rings`` inputs, ``union='exact'`` (round 8): the true geometric
  union of the members through the boundary-classification kernel
  (geometry/polyclip.py) — overlaps resolve, shared edges merge,
  the reference's shapely ``unary_union`` semantics.  Same single
  hash agg (collect the member ring lists) plus one Arrow-batched
  map over the GROUP rows; per-group cost is quadratic in the
  group's total segment count, so keep exact unions for
  feature-count-bounded groups (admin zones, parcels per key), not
  million-member ones.
- box inputs (``xmin``..``ymax``): the group geometry is the
  ENVELOPE (bounding box of the union).

Aggregates for the non-geometry columns come from ``agg`` — a
``{out_col: (in_col, stat)}`` mapping using the shared statistic
vocabulary (sum/count/min/max/mean/...).

Scale: ONE hash aggregation on the dissolve key; ring concat uses
``collect_list`` + ``flatten`` ordered by member id (sorted for
determinism), so group geometry size is bounded by the group's total
ring count — the same contract as any groupBy payload.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import GeometryBlock

__all__ = ["Dissolve"]


class Dissolve(GeometryBlock):
    """Merge features by attribute value.

    Args:
      source: GeometryBlock with ``rings`` and/or box columns.
      by: grouping column.
      agg: optional ``{out_col: (in_col, stat)}`` attribute
        aggregations (stat from the shared vocabulary).

    Output: ``by`` (the new index), ``n_parts`` (member count),
    the dissolved geometry columns, and the requested aggregates.
    """

    def __init__(self, source, by, agg=None, union="concat"):
        if not isinstance(source, GeometryBlock):
            raise TypeError("source must be a GeometryBlock")
        if union not in ("concat", "exact"):
            raise ValueError("union must be 'concat' or 'exact', got "
                             "{!r}".format(union))
        agg = {str(k): (str(v[0]), str(v[1]))
               for k, v in dict(agg or {}).items()}
        super().__init__(source, str(by), agg, union)

    @property
    def source(self):
        return self.args[0]

    @property
    def index_column(self):
        return self.args[1]

    @property
    def columns(self):
        cols = {self.args[1], "n_parts"} | set(self.args[2])
        src = set(self.source.columns)
        if "rings" in src:
            cols.add("rings")
        if {"xmin", "ymin", "xmax", "ymax"} <= src:
            cols |= {"xmin", "ymin", "xmax", "ymax"}
        return cols

    def _build(self, ctx):
        from dask_geomodeling_spark.functions import statistic_expr
        _, by, agg, union = self.args
        df = self.source._build(ctx)
        cols = set(df.columns)
        aggs = [F.count(F.lit(1)).cast("bigint").alias("n_parts")]
        exact = union == "exact" and "rings" in cols
        if exact:
            # exact union: collect the member ring LISTS (sorted for
            # determinism) and resolve overlaps through the
            # boundary-classification kernel after the agg — one map
            # over the (small) group rows, no extra shuffle
            aggs.append(F.expr("array_sort(collect_list(rings))")
                        .alias("_members"))
        elif "rings" in cols:
            # deterministic member order: sort the collected ring
            # lists (collect_list order is partition-dependent)
            aggs.append(F.expr(
                "flatten(array_sort(collect_list(rings)))")
                .alias("rings"))
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            aggs += [F.min("xmin").alias("xmin"),
                     F.min("ymin").alias("ymin"),
                     F.max("xmax").alias("xmax"),
                     F.max("ymax").alias("ymax")]
        if len(aggs) == 1:
            raise ValueError(
                "source needs 'rings' or xmin/ymin/xmax/ymax")
        for out, (col, stat) in agg.items():
            aggs.append(statistic_expr(stat, col).alias(out))
        out = df.groupBy(by).agg(*aggs)
        if exact:
            from dask_geomodeling_spark.geometry.polyclip import (
                kernel_parallelism, map_rings_unary)
            out = map_rings_unary(
                kernel_parallelism(out, ctx.spark), "_members",
                _union_members)
            out = (out.withColumn("rings", F.col("_members"))
                   .drop("_members"))
        return out


def _union_members(members):
    """Per-group kernel for ``union='exact'`` (runs inside the
    Arrow-batched map)."""
    from dask_geomodeling_spark.geometry.polyclip import (
        polygon_union_all)
    if not members:
        return None
    return polygon_union_all([m for m in members if m]) or None
