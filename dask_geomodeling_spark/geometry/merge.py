"""Merge blocks (reference: geometry/merge.py).

``MergeGeometryBlocks`` is the reference's index-aligned pandas merge; in
Spark it is an equi-join on the index column.  The join is declarative so
Catalyst/AQE picks the physical strategy (broadcast-hash when one side is
small, sort-merge otherwise, skew-split under AQE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import GeometryBlock

__all__ = ["MergeGeometryBlocks"]


class MergeGeometryBlocks(GeometryBlock):
    """Merge two GeometryBlocks by index (reference: geometry/merge.py:12).

    how: left | right | inner | outer; suffixes applied to overlapping
    column names, pandas-style.
    """

    allow_how_joins = ("left", "right", "outer", "inner")

    def __init__(self, left, right, how="inner", suffixes=("", "_right")):
        if not isinstance(left, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(left)))
        if not isinstance(right, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(right)))
        if how not in self.allow_how_joins:
            raise KeyError("'{}' is not part of the list of operations: "
                           "{}".format(how, self.allow_how_joins))
        suffixes = tuple(suffixes)
        if (len(suffixes) != 2 or not isinstance(suffixes[0], str)
                or not isinstance(suffixes[1], str)):
            raise TypeError("'{}' object is not allowed".format(type(suffixes)))
        super().__init__(left, right, how, suffixes)

    @property
    def left(self):
        return self.args[0]

    @property
    def right(self):
        return self.args[1]

    @property
    def how(self):
        return self.args[2]

    @property
    def suffixes(self):
        return self.args[3]

    @property
    def columns(self):
        lcols, rcols = set(self.left.columns), set(self.right.columns)
        overlap = lcols & rcols
        out = (lcols - overlap) | (rcols - overlap)
        for c in overlap:
            out.add(c + self.suffixes[0])
            out.add(c + self.suffixes[1])
        return out

    @property
    def index_column(self):
        return self.left.index_column

    def _build(self, ctx):
        how = {"outer": "full"}.get(self.how, self.how)
        lidx = self.left.index_column
        ridx = self.right.index_column
        ldf = self.left._build(ctx)
        rdf = self.right._build(ctx)
        overlap = (set(ldf.columns) - {lidx}) & (set(rdf.columns) - {ridx})
        for c in overlap:
            if self.suffixes[0]:
                ldf = ldf.withColumnRenamed(c, c + self.suffixes[0])
            if self.suffixes[1]:
                rdf = rdf.withColumnRenamed(c, c + self.suffixes[1])
        # coalesced join key so outer joins keep a single index column
        joined = ldf.join(rdf, on=ldf[lidx] == rdf[ridx], how=how)
        key = F.coalesce(ldf[lidx], rdf[ridx]).alias(lidx)
        keep = [c for c in joined.columns if c not in (lidx, ridx)]
        return joined.select(key, *keep)
