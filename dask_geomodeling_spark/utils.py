"""GDAL-free parity for the reference's user-facing utils
(reference: dask_geomodeling/utils.py).

The reference's utils module mixes three things: (1) small numpy/dtype
helpers its operators and its USERS call, (2) the ``Extent`` /
``GeoTransform`` spatial value types that appear throughout its public
signatures, and (3) GDAL/osr/shapely plumbing (``Dataset``,
``create_dataset``, ``get_sr``, ``rasterize_geoseries``) that this
engine's cell-table data model supersedes (rasters are DataFrames, not
in-memory GDAL datasets — see raster/base.py).

This module re-expresses (1) and (2) without GDAL so reference user
code keeps importing the same names:

- coordinate transformation in ``Extent.transformed`` routes through
  the engine's own closed-form projection registry
  (geometry/proj.py:412 ``transform_extent``) instead of osr;
- ``Extent.as_geometry`` (an ogr.Geometry factory) becomes
  ``Extent.as_wkt`` — the WKT text is what every consumer of the ogr
  object ultimately extracted;
- CRS inputs are the engine's "EPSG:xxxx" strings (``get_projection``
  normalizes case/int inputs; arbitrary OGC WKT spatial references are
  out of scope, as for the rest of the engine).

Category (3) is intentionally absent; the migration guide
(docs/migration.md) lists each superseded name and its replacement.
"""

from __future__ import annotations

import datetime
import math
import os
import re

__all__ = [
    "Extent", "GeoTransform", "TransformException", "WKTReadingError",
    "get_index", "get_dtype_max", "get_dtype_min", "get_int_dtype",
    "get_uint_dtype", "get_rounded_repr", "get_footprint",
    "get_projection", "get_epsg_or_wkt", "safe_abspath",
    "safe_file_url", "dt_to_ms", "filter_none",
    "parse_percentile_statistic", "dtype_for_statistic",
]


class TransformException(Exception):
    """Raised when a coordinate transformation cannot be performed
    (reference: utils.py:437)."""


class WKTReadingError(Exception):
    """Raised when WKT geometry text cannot be parsed
    (reference: utils.py:484)."""


# ---------------------------------------------------------------- numpy

def get_index(values, no_data_value):
    """Boolean mask of the DATA cells in ``values`` (reference:
    utils.py:61 — float nodata compares with isclose, ints exactly)."""
    import numpy as np
    equal = np.isclose if values.dtype.kind == "f" else np.equal
    return np.logical_not(equal(values, no_data_value))


def get_dtype_max(dtype):
    """Maximum representable value of ``dtype`` as a python scalar
    (reference: utils.py:67)."""
    import numpy as np
    d = np.dtype(dtype)
    if d.kind == "f":
        return np.finfo(d).max.item()
    return np.iinfo(d).max


def get_dtype_min(dtype):
    """Minimum representable value of ``dtype`` as a python scalar
    (reference: utils.py:79)."""
    import numpy as np
    d = np.dtype(dtype)
    if d.kind == "f":
        return np.finfo(d).min.item()
    return np.iinfo(d).min


def get_int_dtype(n):
    """Smallest signed int dtype that holds ``n`` values plus a nodata
    slot (reference: utils.py:91)."""
    import numpy as np
    for dtype in ("i1", "i2", "i4", "i8"):
        if n - 1 <= np.iinfo(dtype).max and n >= np.iinfo(dtype).min:
            return np.dtype(dtype)
    raise ValueError("Value does not fit in int dtype ({})".format(n))


def get_uint_dtype(n):
    """Smallest unsigned int dtype that holds ``n`` values plus a
    nodata slot (reference: utils.py:100)."""
    import numpy as np
    if n < 0:
        raise ValueError(
            "Value does not fit in uint dtype ({})".format(n))
    for dtype in ("u1", "u2", "u4", "u8"):
        if n - 1 <= np.iinfo(dtype).max:
            return np.dtype(dtype)
    raise ValueError("Value does not fit in uint dtype ({})".format(n))


def get_footprint(size):
    """Circular boolean footprint of diameter ``size`` (coerced to the
    next odd value; reference: utils.py:536) — the structuring element
    of the focal operators."""
    import numpy as np
    s = size // 2 * 2 + 1
    o = (s - 1) // 2
    x, y = np.indices((s, s)) - o
    return (x ** 2 + y ** 2) < (s / 2) ** 2


def get_rounded_repr(obj, significant=4, fmt="{} (rounded)"):
    """repr of a numeric tuple rounded to ``significant`` digits,
    flagged when rounding changed it (reference: utils.py:111)."""
    digits = (
        None if not n else -int(math.floor(math.log10(abs(n))))
        + (significant - 1) for n in obj)
    rounded = obj.__class__(
        round(n, d) if n else n for n, d in zip(obj, digits))
    if obj == rounded:
        return repr(obj)
    return fmt.format(repr(rounded))


# ------------------------------------------------------------------ crs

_EPSG_RE = re.compile(r"^(epsg)[:]([0-9]+)$", re.IGNORECASE)


def get_projection(sr):
    """Normalize a CRS user input to the engine's 'EPSG:xxxx' form
    (reference: utils.py:508 extracts the authority from an osr
    SpatialReference; here inputs are already authority strings)."""
    if isinstance(sr, int):
        return "EPSG:{}".format(sr)
    m = _EPSG_RE.match(str(sr).strip())
    if m:
        return "EPSG:{}".format(m.group(2))
    raise TransformException(
        "Cannot interpret {!r} as a spatial reference; this engine "
        "uses 'EPSG:xxxx' strings".format(sr))


def get_epsg_or_wkt(text):
    """'EPSG:<code>' where recognizable (reference: utils.py:520;
    the osr WKT fallback is out of scope — unknown inputs raise)."""
    return get_projection(text)


# --------------------------------------------------------------- extent

class Extent:
    """Spatially aware (x1, y1, x2, y2) extent (reference:
    utils.py:128).  ``transformed`` routes through the engine's
    closed-form projection registry."""

    def __init__(self, bbox, sr):
        self.bbox = tuple(float(v) for v in bbox)
        self.srs = get_projection(sr)

    @property
    def sr(self):
        return self.srs

    def __repr__(self):
        return "<{}: {} / {}>".format(
            self.__class__.__name__, self.srs,
            get_rounded_repr(self.bbox))

    def __eq__(self, other):
        return (isinstance(other, Extent) and self.bbox == other.bbox
                and self.srs == other.srs)

    @property
    def width(self):
        return self.bbox[2] - self.bbox[0]

    @property
    def height(self):
        return self.bbox[3] - self.bbox[1]

    def as_wkt(self):
        """POLYGON WKT of the box (replaces the reference's
        ``as_geometry`` ogr factory, utils.py:162)."""
        x1, y1, x2, y2 = self.bbox
        return ("POLYGON (({x1} {y1}, {x2} {y1}, {x2} {y2}, "
                "{x1} {y2}, {x1} {y1}))").format(x1=x1, y1=y1,
                                                 x2=x2, y2=y2)

    def buffered(self, size):
        x1, y1, x2, y2 = self.bbox
        return self.__class__(
            (x1 - size, y1 - size, x2 + size, y2 + size), self.srs)

    def transformed(self, sr):
        """Reproject through the engine's registry (reference:
        utils.py:183 via osr); corner-envelope semantics match
        geometry/proj.py:412."""
        from dask_geomodeling_spark.geometry.proj import (
            transform_extent)
        srs = get_projection(sr)
        if self.srs.upper() == srs.upper():
            return self
        try:
            bbox = transform_extent(self.bbox, self.srs, srs)
        except ValueError as exc:
            raise TransformException(str(exc)) from exc
        return Extent(bbox, srs)

    def union(self, other):
        """Union of self and other, in the SRS of self."""
        a, b = self.bbox, other.transformed(self.srs).bbox
        return Extent((min(a[0], b[0]), min(a[1], b[1]),
                       max(a[2], b[2]), max(a[3], b[3])), self.srs)

    def intersection(self, other):
        """Intersection in the SRS of self; None when it has no
        area."""
        a, b = self.bbox, other.transformed(self.srs).bbox
        result = Extent((max(a[0], b[0]), max(a[1], b[1]),
                         min(a[2], b[2]), min(a[3], b[3])), self.srs)
        if result.width > 0 and result.height > 0:
            return result
        return None


# --------------------------------------------------------- geotransform

class GeoTransform(tuple):
    """The GDAL geo_transform 6-tuple ``(p, a, b, q, c, d)`` mapping
    array indices (i, j) to projected coordinates ``x = p + a*j + b*i``,
    ``y = q + c*j + d*i`` (reference: utils.py:208).  Tilted transforms
    (b, c nonzero) are rejected, as in the reference."""

    @classmethod
    def from_bbox(cls, bbox, height, width):
        x1, y1, x2, y2 = bbox
        return cls((x1, (x2 - x1) / width, 0.0,
                    y2, 0.0, (y1 - y2) / height))

    def __init__(self, tpl):
        if len(tpl) != 6:
            raise ValueError(
                "GeoTransform expected an iterable of length 6")
        if not all(math.isclose(tpl[i], 0.0, abs_tol=1e-7)
                   for i in (2, 4)):
            raise ValueError("Tilted geo_transforms are not supported")
        if any(math.isclose(tpl[i], 0.0, abs_tol=1e-7)
               for i in (1, 5)):
            raise ValueError("Pixel size should not be zero")

    def __repr__(self):
        return get_rounded_repr(tuple(self))

    @property
    def cell_area(self):
        p, a, b, q, c, d = self
        return abs(a * d - b * c)

    @property
    def origin(self):
        """(x, y) of pixel (0, 0)."""
        return self[0], self[3]

    @property
    def origin_normalized(self):
        """(x, y) of the grid line closest to the coordinate origin —
        the alignment fingerprint."""
        return self[0] % self[1], self[3] % self[5]

    def get_inverse(self):
        """2x2 inverse of the pixel matrix [[a, b], [c, d]]."""
        _, a, b, _, c, d = self
        det = 1.0 / (a * d - b * c)
        return d * det, -b * det, -c * det, a * det

    def scale(self, x, y):
        """Multiply pixel width by ``x`` and height by ``y``."""
        p, a, b, q, c, d = self
        return self.__class__([p, a * x, b * x, q, c * y, d * y])

    def shift(self, origin):
        """Re-anchor at integer pixel ``origin`` = (i, j)."""
        p, a, b, q, c, d = self
        i, j = origin
        return self.__class__(
            [p + a * j + b * i, a, b, q + c * j + d * i, c, d])

    def get_indices(self, points):
        """(i, j) int64 arrays for an N x 2 point array."""
        import numpy as np
        p, _, _, q, _, _ = self
        e, f, g, h = self.get_inverse()
        x, y = np.asarray(points).transpose()
        return (np.floor(g * (x - p) + h * (y - q)).astype(np.int64),
                np.floor(e * (x - p) + f * (y - q)).astype(np.int64))

    def get_points(self, indices):
        """N x 2 coordinate array for an N x 2 (i, j) index array."""
        import numpy as np
        p, a, b, q, c, d = self
        i, j = indices.transpose()
        points = np.empty(indices.shape)
        points[:, 0] = p + a * j + b * i
        points[:, 1] = q + c * j + d * i
        return points

    def get_bbox(self, offset, shape):
        """(west, south, east, north) of the subarray at ``offset``
        with ``shape``."""
        p, a, b, q, c, d = self
        i, j = offset
        m, n = shape
        west = p + a * j + b * i
        north = q + c * j + d * i
        return west, north + c * n + d * m, west + a * n + b * m, north

    def get_indices_for_bbox(self, bbox):
        """((i1, i2), (j1, j2)) array coordinate pairs for ``bbox``,
        sorted so flipped transforms still give increasing ranges."""
        x1, y1, x2, y2 = bbox
        p, _, _, q, _, _ = self
        e, f, g, h = self.get_inverse()
        j_a = int(math.floor(e * (x1 - p) + f * (y2 - q)))
        i_a = int(math.floor(g * (x1 - p) + h * (y2 - q)))
        j_b = int(math.floor(e * (x2 - p) + f * (y1 - q)))
        i_b = int(math.floor(g * (x2 - p) + h * (y1 - q)))
        return (tuple(sorted((i_a, i_b))), tuple(sorted((j_a, j_b))))

    def aligns_with(self, other):
        """True when two transforms share resolution and grid-line
        phase (rasters can combine cell-for-cell)."""
        if not isinstance(other, GeoTransform):
            other = GeoTransform(other)
        if abs(self[1]) != abs(other[1]) \
                or abs(self[5]) != abs(other[5]):
            return False
        return self.origin_normalized == other.origin_normalized


# ---------------------------------------------------------------- paths

def safe_file_url(url, start=None):
    """Resolve ``url`` to an absolute file:// URL (reference:
    utils.py:767): only the file protocol is accepted, relative paths
    resolve against the 'geomodeling.root' option (or ``start``), and
    with 'geomodeling.strict-file-paths' set the result must stay
    inside the root."""
    from dask_geomodeling_spark.config import get_option
    try:
        protocol, path = url.split("://")
    except ValueError:
        protocol, path = "file", url
    else:
        if protocol != "file":
            raise NotImplementedError(
                'Unknown protocol: "{}"'.format(protocol))
    root = start if start is not None \
        else get_option("geomodeling.root")
    if not os.path.isabs(path):
        if root is None:
            raise IOError(
                "Relative path '{}' provided but 'geomodeling.root' "
                "is not set".format(path))
        abspath = os.path.abspath(os.path.join(root, path))
    else:
        abspath = os.path.abspath(path)
    if get_option("geomodeling.strict-file-paths") \
            and (root is None or not abspath.startswith(root)):
        raise IOError(
            "'{}' is not contained in '{}'".format(path, root))
    return "://".join([protocol, abspath])


def safe_abspath(url, start=None):
    """The path half of :func:`safe_file_url` (reference:
    utils.py:759)."""
    return safe_file_url(url, start).split("://")[1]


# ----------------------------------------------------------------- misc

def dt_to_ms(dt):
    """datetime → POSIX milliseconds; naive datetimes are UTC
    (reference: utils.py:918)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * 1000)


def request_instant_us(v):
    """Request time bound → epoch MICROseconds, ONE interpretation
    for every accepted form (r14 review: a naive-datetime literal
    renders through ``spark.sql.session.timeZone`` while the date
    prune assumed UTC — half-fixed tz hazards are worse than none):
    naive datetimes are UTC (the ``dt_to_ms`` convention), aware
    datetimes are honored, ISO strings parse then follow the same
    rules, plain dates are UTC midnight.  Exact integer arithmetic
    (timedelta division), no float timestamps."""
    if isinstance(v, str):
        v = datetime.datetime.fromisoformat(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        epoch = datetime.datetime(1970, 1, 1,
                                  tzinfo=datetime.timezone.utc)
        return (v - epoch) // datetime.timedelta(microseconds=1)
    if isinstance(v, datetime.date):
        return ((v - datetime.date(1970, 1, 1)).days
                * 86400000000)
    raise TypeError(
        "'{}' is not a valid time bound".format(type(v)))


def request_utc_date(v):
    """Request time bound → its UTC calendar date (the floor of
    :func:`request_instant_us` to epoch days) — the driver-side
    counterpart of ``config.utc_date`` for partition-prune bounds."""
    us = request_instant_us(v)
    return (datetime.date(1970, 1, 1)
            + datetime.timedelta(days=us // 86400000000))


def filter_none(lst):
    """Drop the Nones (reference: utils.py:925)."""
    return [x for x in lst if x is not None]


def parse_percentile_statistic(statistic):
    """'p75' → 75.0, anything else → None (the engine-native form
    from functions/__init__.py, re-exported here because reference
    user code imports it from utils; reference utils.py:813 returns a
    ('percentile', q) pair — callers here test the float directly)."""
    from dask_geomodeling_spark.functions import (
        parse_percentile_statistic as _p)
    return _p(statistic)


def dtype_for_statistic(dtype, statistic):
    """Result dtype of an aggregation statistic (reference:
    utils.py:826): min/max/first/last keep the input dtype, count is
    int32, and everything continuous (mean/percentiles/std/var/sum)
    is float64 at this engine's cell-value precision."""
    import numpy as np
    d = np.dtype(dtype)
    if statistic in ("min", "max", "first", "last", "median", "mode"):
        return d
    if statistic == "count":
        return np.dtype("int32")
    return np.dtype("float64")
