"""Geometry measurement operations (reference: geometry/geom_operations.py).

``Area`` (reference :15) computes feature area in the requested projection.
Boxes are exact column math; points have zero area.  General polygons
(``vertices`` array<struct<x,y>> column) use the shoelace formula via
``aggregate`` over the array — still JVM-side, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import GeometryBlock, SeriesBlock

__all__ = ["Area", "Length"]


class Area(SeriesBlock):
    """Area of each feature (reference: geometry/geom_operations.py:15)."""

    def __init__(self, source, projection="EPSG:4326"):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, projection)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        cols = set(df.columns)
        if "vertices" in cols:
            # shoelace over array<struct<x:double,y:double>> — JVM-side
            return F.abs(F.expr(
                "aggregate(zip_with(vertices, "
                " concat(slice(vertices, 2, size(vertices)-1), "
                "        slice(vertices, 1, 1)), "
                " (a, b) -> a.x * b.y - b.x * a.y), "
                "cast(0.0 as double), (acc, v) -> acc + v)") / 2)
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            return ((F.col("xmax") - F.col("xmin"))
                    * (F.col("ymax") - F.col("ymin")))
        if {"x", "y"} <= cols:
            return F.lit(0.0)
        raise ValueError("Area requires geometry columns")


class Length(SeriesBlock):
    """Perimeter/length companion measurement (box perimeter; 0 for
    points)."""

    def __init__(self, source, projection="EPSG:4326"):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, projection)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        cols = set(df.columns)
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            return 2 * ((F.col("xmax") - F.col("xmin"))
                        + (F.col("ymax") - F.col("ymin")))
        return F.lit(0.0)
