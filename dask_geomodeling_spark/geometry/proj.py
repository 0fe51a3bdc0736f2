"""Native reprojection for the web CRS pair (reference: utils.get_sr /
shapely_transform, which delegate to GDAL/pyproj — unavailable here).

EPSG:4326 (lon/lat degrees) ↔ EPSG:3857 (spherical web-mercator
meters) is pure closed-form math on the typed geometry columns, fully
inside whole-stage codegen:

    x3857 = R · radians(lon)
    y3857 = R · ln(tan(π/4 + radians(lat)/2))

with R = 6378137.  Other CRS pairs raise (documented gap: a full PROJ
pipeline needs pyproj, which this environment does not ship).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle

__all__ = ["Reproject", "WEB_MERCATOR_RADIUS"]

WEB_MERCATOR_RADIUS = 6378137.0

_SUPPORTED = {("EPSG:4326", "EPSG:3857"), ("EPSG:3857", "EPSG:4326")}


def _fwd_x(c):
    return F.lit(WEB_MERCATOR_RADIUS) * F.radians(c)


def _fwd_y(c):
    return F.lit(WEB_MERCATOR_RADIUS) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(c) / 2.0))


def _inv_x(c):
    return F.degrees(c / F.lit(WEB_MERCATOR_RADIUS))


def _inv_y(c):
    return F.degrees(
        2.0 * F.atan(F.exp(c / F.lit(WEB_MERCATOR_RADIUS)))
        - F.lit(math.pi / 2.0))


class Reproject(BaseSingle):
    """Transform geometry columns between EPSG:4326 and EPSG:3857.

    Args:
      source: GeometryBlock whose geometry columns are in ``src_crs``.
      src_crs / dst_crs: "EPSG:4326" or "EPSG:3857".
    """

    def __init__(self, source, src_crs="EPSG:4326",
                 dst_crs="EPSG:3857"):
        src_crs, dst_crs = str(src_crs).upper(), str(dst_crs).upper()
        if src_crs != dst_crs and (src_crs, dst_crs) not in _SUPPORTED:
            raise NotImplementedError(
                "only EPSG:4326 <-> EPSG:3857 are supported natively; "
                "other CRS pairs need pyproj/GDAL (reference: "
                "utils.get_transform_func)")
        super().__init__(source, src_crs, dst_crs)

    def _build(self, ctx):
        df = self.source._build(ctx)
        src_crs, dst_crs = self.args[1], self.args[2]
        if src_crs == dst_crs:
            return df
        fx, fy = (_fwd_x, _fwd_y) if src_crs == "EPSG:4326" else \
            (_inv_x, _inv_y)
        cols = set(df.columns)
        mapping = {}
        for xc, yc in (("x", "y"), ("xmin", "ymin"), ("xmax", "ymax")):
            if {xc, yc} <= cols:
                mapping[xc] = fx(F.col(xc))
                mapping[yc] = fy(F.col(yc))
        if not mapping:
            raise ValueError("Reproject requires geometry columns")
        return df.withColumns(mapping)
