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
- ``how='union'`` (geopandas ``overlay(how='union')``): the full
  planar decomposition — every intersection piece (pair rows, both
  sides' attributes) PLUS every left residual (left minus the union
  of intersecting rights) PLUS every right residual (mirrored).  The
  output index is a synthesized deterministic string key ``oid``
  (``B:<lid>:<rid>`` / ``L:<lid>`` / ``R:<rid>``); attribute columns
  of the absent side are typed NULLs; empty pieces keep their row
  with NULL ``rings`` (geopandas drops them — filter on
  ``rings IS NOT NULL`` for that behavior).
- ``how='symmetric_difference'``: the two residual branches only.
- ``how='identity'`` (the ArcGIS Identity): the left layer's planar
  decomposition — intersection pieces plus left residuals, no
  right-only parts.

A POLYLINE left layer (a ``path`` column, no ``rings``/``vertices``)
clips (``'intersection'``) or erases (``'difference'``) through the
open-chain split kernel (``polyclip.path_boolean``): each surviving
maximal sub-chain becomes one output row with a ``piece`` ordinal
and the chain in ``path``; zero-length touches emit nothing, and
erase groups ALL intersecting polygons per line into ONE n-ary
evaluation (untouched lines pass through whole).

The candidate pair frame is computed ONCE and persisted when more
than one branch consumes it; the per-group payload for the residual
branches is the intersecting other-side geometries only
(grid-bounded), not the whole other layer.
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


def _pair_clip_path(pr, rr):
    from dask_geomodeling_spark.geometry.polyclip import path_boolean
    if pr is None or rr is None:
        return None
    return path_boolean(pr, [rr], True) or None


def _erase_path(pr, others):
    from dask_geomodeling_spark.geometry.polyclip import path_boolean
    if pr is None:
        return None
    return path_boolean(pr, others or [], False) or None


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
    """Overlay two geometry layers (see module docstring).

    Args:
      left: GeometryBlock with polygon geometry (``rings``, or
        ``vertices``/box columns — synthesized like SpatialJoin), or
        polyline geometry (``path``).  Its index is the output index
        (planar-decomposition modes synthesize ``oid``).
      right: GeometryBlock with polygon geometry.
      cell_size: candidate grid bucket size (see SpatialJoin).
      how: ``'intersection'``, ``'difference'``, ``'union'``,
        ``'symmetric_difference'`` or ``'identity'`` (polyline lefts:
        the first two only).
      right_columns: right columns carried into pair-piece output
        rows (default: right's index).  Ignored for 'difference'
        (output rows are left features).
      max_group_rings: skew guard for the residual (erase) branches.
        The n-ary erase collects ALL intersecting other-side ring
        stacks per feature — correct, but a continent-sized feature
        intersecting millions of rights becomes one giant group row.
        When set, features whose collected ring count would exceed
        this threshold are grid-subdivided (cell_size cells, the
        Subdivide decomposition) and each piece erases against only
        the rights overlapping its cell; the disjoint piece results
        concatenate back into ONE row per feature.  Same coverage and
        area, but the output ring DECOMPOSITION of guarded features
        follows the cell grid (seams on cell edges).  Alternatively,
        pre-split hot layers explicitly with ``Subdivide`` upstream.
    """

    def __init__(self, left, right, cell_size, how="intersection",
                 right_columns=None, max_group_rings=None):
        if not isinstance(left, GeometryBlock) \
                or not isinstance(right, GeometryBlock):
            raise TypeError("left/right must be GeometryBlocks")
        if max_group_rings is not None:
            max_group_rings = int(max_group_rings)
            if max_group_rings < 1:
                raise ValueError("max_group_rings must be >= 1")
        if how not in ("intersection", "difference", "union",
                       "symmetric_difference", "identity"):
            raise ValueError(
                "how must be 'intersection', 'difference', 'union', "
                "'symmetric_difference' or 'identity'")
        cs = float(cell_size)
        if not cs > 0:
            raise ValueError("cell_size must be > 0")
        lc = set(left.columns)
        is_path = "path" in lc and not ({"rings", "vertices"} & lc)
        if is_path and how not in ("intersection", "difference"):
            raise ValueError(
                "a polyline (path) left layer supports only "
                "how='intersection' (clip) and how='difference' "
                "(erase)")
        if is_path and max_group_rings is not None:
            # the subdivided guard is a POLYGON decomposition; a
            # silently ignored parameter would hide the unguarded
            # group row (round-9 review fix)
            raise ValueError(
                "max_group_rings is not supported for polyline (path) "
                "left layers — pre-split hot polylines with "
                "PathSubstring/GeometryTiler instead")
        # synthesized output names must not collide with inputs
        reserved = ({"piece"} if is_path else
                    {"oid"} if how in ("union", "symmetric_difference",
                                       "identity") else set())
        clash = reserved & (lc | set(right.columns)
                            | set(right_columns or ()))
        if clash:
            raise ValueError(
                "column(s) {} collide with Overlay's synthesized "
                "output columns for how={!r}; rename them upstream"
                .format(sorted(clash), how))
        if right_columns is None:
            right_columns = [right.index_column]
        if how in ("union", "symmetric_difference", "identity") \
                and right.index_column not in right_columns:
            right_columns = [right.index_column] + list(right_columns)
        super().__init__(left, right, cs, how, tuple(right_columns),
                         max_group_rings)

    @property
    def left(self):
        return self.args[0]

    @property
    def index_column(self):
        if self.args[3] in ("union", "symmetric_difference",
                            "identity"):
            return "oid"
        return self.left.index_column

    @property
    def _left_is_path(self):
        lc = set(self.left.columns)
        return "path" in lc and not ({"rings", "vertices"} & lc)

    @property
    def columns(self):
        if self._left_is_path:
            cols = set(self.left.columns) | {"piece"}
            if self.args[3] == "intersection":
                cols |= set(self.args[4])
            return cols
        cols = set(self.left.columns) | {"rings"}
        if self.args[3] == "intersection":
            cols |= set(self.args[4])
        elif self.args[3] in ("union", "symmetric_difference",
                              "identity"):
            cols |= set(self.args[4]) | {"oid"}
        return cols

    @staticmethod
    def _residual(side, pairs, idc, other_geom, own_cols, spark,
                  cell_size=None, max_group_rings=None):
        """``side`` minus the union of its intersecting other-side
        geometries: group the pair frame's ``other_geom`` ring stacks
        per ``idc`` (sorted for determinism), ONE n-ary kernel op,
        re-joined so non-intersected features pass through.

        With ``max_group_rings`` set, features whose collected payload
        would exceed it take the SUBDIVIDED path instead (see the
        class docstring) — the giant group row is never built."""
        from dask_geomodeling_spark.geometry.polyclip import (
            kernel_parallelism, map_rings_binary)
        from dask_geomodeling_spark.geometry.spatial_join import (
            SpatialJoin)
        gr = SpatialJoin._ring_expr(set(own_cols), "_g0")

        def erase_grouped(frame, grouped):
            df = frame.join(grouped, idc, "left").withColumn("_g", gr)
            if "rings" in df.columns:
                # 'rings' is rebuilt from _g after the kernel — don't
                # ship the original through Python too (guide §4.1)
                df = df.drop("rings")
            df = kernel_parallelism(df, spark)
            df = map_rings_binary(df, "_g", "_others", _erase_rings,
                                  drop_b=True)
            return (df.withColumn("rings", F.col("_g"))
                    .drop("_g", "_others"))

        if max_group_rings is None:
            grouped = (pairs.groupBy(idc)
                       .agg(F.expr("array_sort(collect_list({}))"
                                   .format(other_geom))
                            .alias("_others")))
            return erase_grouped(side, grouped)

        # Adaptive skew guard (round 9): a feature intersecting so
        # many other-side geometries that its collected ring payload
        # exceeds the threshold never builds the giant group row.
        # It subdivides into cell_size grid pieces (the Subdivide
        # decomposition: exact S-H clip per covered cell), each piece
        # erases against ONLY the rights whose bbox overlaps its cell,
        # and the disjoint piece results concatenate back into one
        # row.  Exact: difference distributes over a disjoint
        # decomposition of the left operand, and a geometry missing a
        # piece's cell cannot remove anything from that piece.
        from pyspark import StorageLevel

        from dask_geomodeling_spark.geometry.geom_operations import (
            clip_rings_box_cols_expr, rings_area_expr)
        t = int(max_group_rings)
        # the guarded path consumes the pair frame three times (load
        # census, cold group, hot right-sides) — persist so the grid
        # join runs once (no-op when the union branch already did)
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        loads = (pairs.groupBy(idc)
                 .agg(F.sum(F.expr("size({})".format(other_geom)))
                      .alias("_load")))
        hot_ids = loads.filter(F.col("_load") > t).select(idc)
        # cold features: the standard single-group path, hot ids
        # excluded BEFORE collect_list
        cold = erase_grouped(
            side.join(F.broadcast(hot_ids), idc, "left_anti"),
            pairs.join(F.broadcast(hot_ids), idc, "left_anti")
            .groupBy(idc)
            .agg(F.expr("array_sort(collect_list({}))"
                        .format(other_geom)).alias("_others")))

        csl = "CAST({!r} AS DOUBLE)".format(float(cell_size))
        hotL = side.join(F.broadcast(hot_ids), idc, "left_semi")
        p = hotL.withColumn("_g", gr).select(idc, "_g")
        pts = "flatten(_g)"
        p = (p.withColumn("_cx", F.explode(F.expr(
                 "sequence(CAST(FLOOR(array_min(transform({p}, "
                 "q -> q[0])) / {cs}) AS BIGINT), "
                 "CAST(FLOOR(array_max(transform({p}, "
                 "q -> q[0])) / {cs}) AS BIGINT))"
                 .format(p=pts, cs=csl))))
             .withColumn("_cy", F.explode(F.expr(
                 "sequence(CAST(FLOOR(array_min(transform({p}, "
                 "q -> q[1])) / {cs}) AS BIGINT), "
                 "CAST(FLOOR(array_max(transform({p}, "
                 "q -> q[1])) / {cs}) AS BIGINT))"
                 .format(p=pts, cs=csl)))))
        p = (p.withColumn("_g", clip_rings_box_cols_expr(
                 "CAST(_cx AS DOUBLE) * {cs}".format(cs=csl),
                 "CAST(_cy AS DOUBLE) * {cs}".format(cs=csl),
                 "(CAST(_cx AS DOUBLE) + 1) * {cs}".format(cs=csl),
                 "(CAST(_cy AS DOUBLE) + 1) * {cs}".format(cs=csl),
                 rings_col="_g"))
             .filter(F.expr("size(_g) > 0")
                     & (rings_area_expr("_g") > 0)))
        hp = (pairs.join(F.broadcast(hot_ids), idc, "left_semi")
              .select(F.col(idc).alias("_hid"),
                      F.col(other_geom).alias("_o"))
              .withColumn("_ob", F.expr(
                  "array(array_min(transform(flatten(_o), "
                  "q -> q[0])), "
                  "array_min(transform(flatten(_o), q -> q[1])), "
                  "array_max(transform(flatten(_o), q -> q[0])), "
                  "array_max(transform(flatten(_o), q -> q[1])))")))
        cond = (
            (p[idc] == hp["_hid"])
            & (hp["_ob"][0] <= F.expr(
                "(CAST(_cx AS DOUBLE) + 1) * " + csl))
            & (hp["_ob"][2] >= F.expr("CAST(_cx AS DOUBLE) * " + csl))
            & (hp["_ob"][1] <= F.expr(
                "(CAST(_cy AS DOUBLE) + 1) * " + csl))
            & (hp["_ob"][3] >= F.expr("CAST(_cy AS DOUBLE) * " + csl)))
        # left join: pieces untouched by any right survive whole
        pj = p.join(hp, cond, "left")
        hot_grouped = (pj.groupBy(idc, "_cx", "_cy")
                       .agg(F.first("_g").alias("_g"),
                            F.expr("array_sort(collect_list(_o))")
                            .alias("_others")))
        erased = map_rings_binary(
            kernel_parallelism(hot_grouped, spark), "_g", "_others",
            _erase_rings, drop_b=True)
        hot_rings = (erased.groupBy(idc)
                     .agg(F.expr(
                         "nullif(flatten(array_sort("
                         "collect_list(_g))), array())").alias("_g")))
        hot = (hotL.join(hot_rings, idc, "left")
               .withColumn("rings", F.col("_g")).drop("_g"))
        return cold.unionByName(hot)

    def _build(self, ctx):
        from pyspark import StorageLevel

        from dask_geomodeling_spark.geometry.polyclip import (
            kernel_parallelism, map_rings_binary)
        from dask_geomodeling_spark.geometry.spatial_join import (
            SpatialJoin)
        _, _, cs, how, rcols, _mgr = self.args
        rcols = list(rcols)
        L = self.left._build(ctx)
        R = self.args[1]._build(ctx)
        pairs = SpatialJoin._candidate_pairs(
            L, R, cs, rcols, keep_geoms=True)
        idc = self.left.index_column
        if self._left_is_path:
            # polyline left layer: clip / erase through the open-chain
            # kernel; each surviving maximal sub-chain becomes one row
            # ('piece', 'path') — zero-length touches vanish
            # the original 'path' column is rebuilt from the kernel
            # output after the stage — don't ship it through Python
            # (guide §4.1); _rr is consumed by the kernel and dropped
            # in Python so it never crosses the return hop
            if how == "intersection":
                out = map_rings_binary(
                    kernel_parallelism(pairs.drop("path"), ctx.spark),
                    "_lr", "_rr", _pair_clip_path, drop_b=True)
                keep = [c for c in out.columns
                        if c not in ("_lr", "_rr", "path")]
                return out.select(
                    *keep, F.posexplode("_lr").alias("piece", "path")
                ).withColumn("piece", F.col("piece").cast("bigint"))
            grouped = (pairs.groupBy(idc)
                       .agg(F.expr("array_sort(collect_list(_rr))")
                            .alias("_others")))
            df = L.join(grouped, idc, "left")
            df = kernel_parallelism(
                df.withColumn("_g", F.col("path")).drop("path"),
                ctx.spark)
            df = map_rings_binary(df, "_g", "_others", _erase_path,
                                  drop_b=True)
            keep = [c for c in df.columns
                    if c not in ("_g", "_others", "path")]
            return df.select(
                *keep, F.posexplode("_g").alias("piece", "path")
            ).withColumn("piece", F.col("piece").cast("bigint"))
        if how == "intersection":
            # 'rings' is replaced by the kernel output below — drop
            # the original before the Python stage (guide §4.1)
            pre = pairs.drop("rings") if "rings" in L.columns else pairs
            out = map_rings_binary(
                kernel_parallelism(pre, ctx.spark), "_lr", "_rr",
                _pair_intersection, drop_b=True)
            return (out.withColumn("rings", F.col("_lr"))
                    .drop("_lr", "_rr"))
        if how == "difference":
            return self._residual(L, pairs, idc, "_rr", L.columns,
                                  ctx.spark, cs, self.args[5])
        # union / symmetric_difference / identity: >1 branch consumes
        # the pair frame — persist it so the grid join runs once
        ridc = self.args[1].index_column
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        lattr = [c for c in L.columns if c != "rings"]
        ltypes = {f.name: f.dataType for f in L.schema.fields}
        rsel = R.select(*rcols,
                        SpatialJoin._ring_expr(set(R.columns), "_rg"))
        rtypes = {f.name: f.dataType for f in rsel.schema.fields}

        def skey(prefix, *cols):
            parts = [F.lit(prefix)]
            for i, c in enumerate(cols):
                if i:
                    parts.append(F.lit(":"))
                parts.append(F.col(c).cast("string"))
            return F.concat(*parts).alias("oid")

        lres = self._residual(L, pairs, idc, "_rr", L.columns,
                              ctx.spark, cs, self.args[5])
        lres = lres.select(
            skey("L:", idc), *lattr,
            *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols],
            "rings")
        out = lres
        if how in ("union", "symmetric_difference"):
            rres = self._residual(
                rsel.withColumnRenamed("_rg", "rings"), pairs, ridc,
                "_lr", set(rcols) | {"rings"}, ctx.spark, cs,
                self.args[5])
            rres = rres.select(
                skey("R:", ridc),
                *[F.lit(None).cast(ltypes[c]).alias(c)
                  for c in lattr],
                *rcols, "rings")
            out = out.unionByName(rres)
        if how in ("union", "identity"):
            pre = (pairs.drop("rings") if "rings" in L.columns
                   else pairs)
            inter = map_rings_binary(
                kernel_parallelism(pre, ctx.spark), "_lr", "_rr",
                _pair_intersection, drop_b=True)
            inter = (inter.withColumn("rings", F.col("_lr"))
                     .select(skey("B:", idc, ridc), *lattr, *rcols,
                             "rings"))
            out = out.unionByName(inter)
        return out
