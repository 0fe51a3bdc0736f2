"""Connected-component labeling of a raster — the core of GDAL's
``polygonize`` (no reference analogue; the reference leaves
vectorization to GDAL).  Adjacent same-value data cells within a time
slice form one component; every cell gets the component's canonical
(minimum) cell key as its label.

Scale shape: the adjacency edges build from TWO (or four, for
8-connectivity) shuffle-free-keyed equi-joins of the cell table with
itself — neighbor offsets are join keys, never a cross join — and the
labels come from the alternating large-star/small-star rounds shared
with ``pipeline.dedup.DedupClusters(algorithm='star')``: O(log²)
convergence regardless of component diameter (a river snaking across
a continent-sized raster converges in ~20 rounds, where naive
propagation needs its length).  The driver only ever sees
converged-or-not counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import BaseSingle

__all__ = ["RasterComponents"]


class RasterComponents(BaseSingle):
    """Label connected same-value regions.

    Args:
      store: source RasterBlock.
      connectivity: 4 (edge-adjacent, default — GDAL polygonize's
        default) or 8 (corners too).
      max_iter: star-round bound (20 covers ~10⁶-diameter components).

    Output: ``time, y, x, value, component`` — ``component`` is the
    canonical cell key ``'<epoch_us>:<y>:<x>'`` of the component's
    lexicographically-smallest member (a total order; any consistent
    order works for labeling, and the string form keys uniquely
    across time slices without bounding the coordinate range).
    """

    def __init__(self, store, connectivity=4, max_iter=20):
        if connectivity not in (4, 8):
            raise ValueError("connectivity must be 4 or 8")
        super().__init__(store, int(connectivity), int(max_iter))

    @property
    def columns(self):
        return {"time", "y", "x", "value", "component"}

    def _build(self, ctx):
        from dask_geomodeling_spark.pipeline.dedup import DedupClusters
        _, conn, max_iter = self.args
        cells = (self.store._build(ctx)
                 .filter(F.col("value").isNotNull()))
        key = F.concat_ws(
            ":", F.expr("unix_micros(time)"), F.col("y"), F.col("x"))
        nodes = cells.select("time", "y", "x", "value",
                             key.alias("_id"))
        offsets = [(0, 1), (1, 0)]
        if conn == 8:
            offsets += [(1, 1), (1, -1)]
        edges = None
        b = nodes.select(F.col("time").alias("_tb"),
                         F.col("y").alias("_yb"),
                         F.col("x").alias("_xb"),
                         F.col("value").alias("_vb"),
                         F.col("_id").alias("_idb"))
        for dy, dx in offsets:
            e = (nodes.join(
                b,
                (F.col("time") == F.col("_tb"))
                & (F.col("_yb") == F.col("y") + dy)
                & (F.col("_xb") == F.col("x") + dx)
                & (F.col("_vb") == F.col("value")))
                .select(F.least("_id", "_idb").alias("_lo"),
                        F.greatest("_id", "_idb").alias("_hi")))
            edges = e if edges is None else edges.unionByName(e)
        und = edges.distinct()
        labels = DedupClusters._star_labels(und, max_iter)
        return (nodes.join(labels, "_id", "left")
                .select("time", "y", "x", "value",
                        F.coalesce("_lbl", "_id").alias("component")))
