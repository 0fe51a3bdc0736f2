"""Raster combination (reference: raster/combine.py).

``Group`` (reference :143) combines rasters into one; cells present in
multiple sources take the value of the **last** contributing raster.
Implementation mirrors FillNoData: one union + one grouped ``max_by`` —
a single shuffle regardless of input count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import RasterBlock

__all__ = ["Group"]


class Group(RasterBlock):
    """Combine multiple rasters into a single one (reference:
    raster/combine.py:143)."""

    def __init__(self, *args):
        if not args:
            raise TypeError("Group requires at least one source")
        for a in args:
            if not isinstance(a, RasterBlock):
                raise TypeError("'{}' object is not allowed".format(type(a)))
        super().__init__(*args)

    def _build(self, ctx):
        parts = []
        for prio, block in enumerate(self.args):
            parts.append(block._build(ctx)
                         .select("time", "y", "x", "value",
                                 F.lit(prio).alias("_prio")))
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        return (union.filter(F.col("value").isNotNull())
                .groupBy("time", "y", "x")
                .agg(F.expr("max_by(value, _prio)").alias("value")))
