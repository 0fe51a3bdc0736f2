"""Layer-vs-layer polygon overlay — the geopandas ``overlay``
counterpart (no reference analogue; the reference's per-index
``Difference`` is the view-level cousin, set_operations.py:12).

Execution shape, built for scale: candidate (left, right) pairs come
from the shared grid-bucketed cell join with canonical-cell dedup
(spatial_join.SpatialJoin._candidate_pairs — one equi-join, never a
cartesian, exact intersects test in the join condition); the geometry
math runs through the boundary-classification kernel
(geometry/polyclip.py) in the engine's Arrow-batched map contract:

- ``how='intersection'``: one output row per intersecting pair —
  left attributes + ``right_columns`` + the EXACT pairwise
  intersection geometry (a binary kernel op per pair);
- ``how='difference'`` (the ArcGIS Erase): one output row per LEFT
  feature — its geometry minus the union of ALL intersecting right
  features, computed as ONE n-ary kernel evaluation
  ``keep = inA and not any(inB_i)`` over the group's collected ring
  sets (no iterated pairwise differences, no drift); left features
  with no intersecting right rows pass through unchanged.

The per-group payload for 'difference' is the intersecting right
geometries only (grid-bounded), not the whole right layer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import GeometryBlock

__all__ = ["Overlay"]


def _pair_intersection(lr, rr):
    from dask_geomodeling_spark.geometry.polyclip import (
        polygon_intersection)
    if lr is None or rr is None:
        return None
    return polygon_intersection(lr, rr) or None


def _erase_rings(lr, others):
    from dask_geomodeling_spark.geometry.polyclip import polygon_boolean
    if lr is None:
        return None
    polys = [lr] + [o for o in (others or []) if o]
    if len(polys) == 1:
        return [list(r) for r in lr]
    return polygon_boolean(
        polys, lambda f: f[0] and not any(f[1:])) or None


class Overlay(GeometryBlock):
    """Overlay two polygon layers.

    Args:
      left: GeometryBlock with polygon geometry (``rings``, or
        ``vertices``/box columns — synthesized like SpatialJoin).
        Its index is the output index.
      right: GeometryBlock with polygon geometry.
      cell_size: candidate grid bucket size (see SpatialJoin).
      how: ``'intersection'`` or ``'difference'``.
      right_columns: right columns carried into 'intersection' output
        (default: right's index).  Ignored for 'difference' (output
        rows are left features).
    """

    def __init__(self, left, right, cell_size, how="intersection",
                 right_columns=None):
        if not isinstance(left, GeometryBlock) \
                or not isinstance(right, GeometryBlock):
            raise TypeError("left/right must be GeometryBlocks")
        if how not in ("intersection", "difference"):
            raise ValueError(
                "how must be 'intersection' or 'difference'")
        cs = float(cell_size)
        if not cs > 0:
            raise ValueError("cell_size must be > 0")
        if right_columns is None:
            right_columns = [right.index_column]
        super().__init__(left, right, cs, how, tuple(right_columns))

    @property
    def left(self):
        return self.args[0]

    @property
    def index_column(self):
        return self.left.index_column

    @property
    def columns(self):
        cols = set(self.left.columns) | {"rings"}
        if self.args[3] == "intersection":
            cols |= set(self.args[4])
        return cols

    def _build(self, ctx):
        from dask_geomodeling_spark.geometry.polyclip import (
            kernel_parallelism, map_rings_binary)
        from dask_geomodeling_spark.geometry.spatial_join import (
            SpatialJoin)
        _, _, cs, how, rcols = self.args
        rcols = list(rcols)
        L = self.left._build(ctx)
        R = self.args[1]._build(ctx)
        pairs = SpatialJoin._candidate_pairs(
            L, R, cs, rcols, keep_geoms=True)
        if how == "intersection":
            out = map_rings_binary(
                kernel_parallelism(pairs, ctx.spark), "_lr", "_rr",
                _pair_intersection)
            out = (out.withColumn("rings", F.col("_lr"))
                   if "rings" not in L.columns
                   else out.withColumn("rings", F.col("_lr")))
            return out.drop("_lr", "_rr")
        # difference: group the intersecting right geometries per left
        # feature (sorted for determinism), ONE n-ary kernel op, and
        # re-join so non-intersected left features pass through
        idc = self.left.index_column
        grouped = (pairs.groupBy(idc)
                   .agg(F.expr("array_sort(collect_list(_rr))")
                        .alias("_others")))
        df = L.join(grouped, idc, "left")
        lr = SpatialJoin._ring_expr(set(L.columns), "_lr0")
        df = kernel_parallelism(df.withColumn("_lr", lr), ctx.spark)
        df = map_rings_binary(df, "_lr", "_others", _erase_rings)
        return (df.withColumn("rings", F.col("_lr"))
                .drop("_lr", "_others"))
