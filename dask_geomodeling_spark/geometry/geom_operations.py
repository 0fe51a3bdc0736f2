"""Geometry measurement operations (reference: geometry/geom_operations.py).

``Area`` (reference :15) computes feature area in the requested projection.
Boxes are exact column math; points have zero area.  General polygons
(``vertices`` ``array<array<double>>`` column: the outer ring without
the closing vertex) use the shoelace formula via ``aggregate`` over the
array, and ``point_in_polygon_expr`` gives the exact even-odd ray-cast
containment test — both JVM-side, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import GeometryBlock, SeriesBlock

__all__ = ["Area", "Length", "point_in_polygon_expr", "shoelace_expr"]


def _edges_sql(verts_col):
    """SQL pairing each ring vertex with its successor (wrapping)."""
    return ("zip_with({v}, concat(slice({v}, 2, size({v}) - 1), "
            "slice({v}, 1, 1)), (a, b) -> {{expr}})").format(v=verts_col)


def shoelace_expr(verts_col="vertices"):
    """Exact polygon area of a ``vertices`` ring column (shoelace)."""
    edges = _edges_sql(verts_col).format(
        expr="a[0] * b[1] - b[0] * a[1]")
    return F.abs(F.expr(
        "aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
        .format(e=edges))) / 2


def point_in_polygon_expr(px, py, verts_col="vertices"):
    """Even-odd ray-cast containment of point (``px``, ``py``) — SQL
    expression strings — in the ``vertices`` ring: one crossing counted
    per edge whose y-span straddles the point and whose x-intercept at
    ``py`` lies right of ``px``.  ``nullif`` guards the horizontal-edge
    division (the straddle test is already false there, and NULL AND
    false = false under eager vectorized evaluation).  Pure column
    math — runs inside the scan, broadcastable, oracle-reproducible."""
    cross = ("CASE WHEN ((a[1] > {py}) != (b[1] > {py})) AND "
             "({px} < a[0] + (b[0] - a[0]) * ({py} - a[1]) / "
             "nullif(b[1] - a[1], cast(0.0 as double))) "
             "THEN 1 ELSE 0 END").format(px=px, py=py)
    edges = _edges_sql(verts_col).format(expr=cross)
    return F.expr(
        "pmod(aggregate({e}, 0, (acc, v) -> acc + v), 2) = 1"
        .format(e=edges))


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
            # exact shoelace over the ring; bbox fallback for rows
            # without a ring (mixed frames)
            if {"xmin", "ymin", "xmax", "ymax"} <= cols:
                box = ((F.col("xmax") - F.col("xmin"))
                       * (F.col("ymax") - F.col("ymin")))
                return F.when(F.col("vertices").isNotNull(),
                              shoelace_expr()).otherwise(box)
            return shoelace_expr()
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
