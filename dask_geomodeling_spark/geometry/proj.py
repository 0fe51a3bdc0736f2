"""Native reprojection (reference: utils.get_sr / shapely_transform,
which delegate to GDAL/pyproj — unavailable here; all transforms below
are public closed forms).

Supported natively, all pure column math inside whole-stage codegen:

- EPSG:4326 (lon/lat degrees) ↔ EPSG:3857 (spherical web-mercator):
    x3857 = R · radians(lon); y3857 = R · ln(tan(π/4 + radians(lat)/2))
- EPSG:4326 ↔ UTM zones EPSG:326xx (N) / 327xx (S): the Snyder /
  Redfearn transverse-Mercator series (USGS "Map Projections — A
  Working Manual", eqs. 8-9..8-15 forward, 8-18..8-25 inverse via the
  footpoint latitude) on the WGS84 ellipsoid.  Each transform is
  generated as ONE SQL expression string valid in both Spark SQL and
  DuckDB — identical text, identical evaluation order, so external
  oracles reproduce it bit-for-bit.  Round-trip error ~1e-9 degrees.
- EPSG:4326 ↔ EPSG:4087 (spherical equidistant cylindrical / plate
  carrée): x = R · radians(lon), y = R · radians(lat).
- EPSG:4326 ↔ EPSG:28992 (RD New / Amersfoort, the reference's home
  CRS — 87 occurrences across its code and tests, e.g. utils.get_sr /
  shapely_transform at reference utils.py:53–116): the public Kadaster
  approximation polynomials (Schreutelkamp & Strang van Hees,
  "Benaderingsformules voor de transformatie tussen RD- en
  GPS-coördinaten", Geodesia 2001) — plain bivariate polynomial
  arithmetic, ~cm agreement with RDNAPTRANS inside the Netherlands,
  < 2 mm round-trip closure over the full RD validity grid.
- Any other pair where BOTH legs through EPSG:4326 exist composes by
  textual pivot (e.g. EPSG:28992 → EPSG:3857, UTM → web-mercator):
  the lon/lat SQL of the inverse leg substitutes into the forward
  leg — still one shared expression string, still oracle-exact.

Remaining CRS pairs raise (a full PROJ pipeline needs pyproj, which
this environment does not ship).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle

__all__ = ["Reproject", "WEB_MERCATOR_RADIUS", "utm_sql",
           "utm_inverse_sql", "equirect_sql", "rd_sql",
           "rd_inverse_sql", "point_transform_sql", "reproject_mapping",
           "apply_reproject",
           "transform_extent", "validate_crs_pair"]

WEB_MERCATOR_RADIUS = 6378137.0

#: WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996

_UTM_RE = re.compile(r"^EPSG:32([67])(\d\d)$")


def utm_sql(lat, lon, zone, south=False):
    """(easting, northing) SQL expression strings for the WGS84 UTM
    forward transform of textual degree expressions ``lat``/``lon``.
    The text parses identically in Spark SQL and DuckDB (radians, sin,
    cos, tan, sqrt and explicit multiplication only), which is what
    makes the oracle exact."""
    if not 1 <= zone <= 60:
        raise ValueError("UTM zone must be in [1, 60]")
    lon0 = math.radians(zone * 6 - 183)
    e2, ep2 = _E2, _EP2
    e4, e6 = e2 * e2, e2 * e2 * e2
    m0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    m1 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    m2 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    m3 = 35.0 * e6 / 3072.0
    p = "radians({})".format(lat)
    A = "((radians({}) - {!r}) * cos({p}))".format(lon, lon0, p=p)
    T = "(tan({p}) * tan({p}))".format(p=p)
    C = "({!r} * cos({p}) * cos({p}))".format(ep2, p=p)
    NU = "({!r} / sqrt(1.0 - {!r} * sin({p}) * sin({p})))".format(
        _A, e2, p=p)
    M = ("({!r} * ({!r} * {p} - {!r} * sin(2.0 * {p}) "
         "+ {!r} * sin(4.0 * {p}) - {!r} * sin(6.0 * {p})))").format(
        _A, m0, m1, m2, m3, p=p)
    A2 = "({A} * {A})".format(A=A)
    A3 = "({A} * {A} * {A})".format(A=A)
    A4 = "({A2} * {A2})".format(A2=A2)
    A5 = "({A4} * {A})".format(A4=A4, A=A)
    A6 = "({A4} * {A2})".format(A4=A4, A2=A2)
    easting = (
        "(500000.0 + {k0!r} * {NU} * ({A} + (1.0 - {T} + {C}) * {A3} / 6.0"
        " + (5.0 - 18.0 * {T} + {T} * {T} + 72.0 * {C} - {c58!r}) "
        "* {A5} / 120.0))"
    ).format(k0=_K0, NU=NU, A=A, T=T, C=C, A3=A3, A5=A5, c58=58.0 * ep2)
    n0 = 10000000.0 if south else 0.0
    northing = (
        "({n0!r} + {k0!r} * ({M} + {NU} * tan({p}) * ({A2} / 2.0"
        " + (5.0 - {T} + 9.0 * {C} + 4.0 * {C} * {C}) * {A4} / 24.0"
        " + (61.0 - 58.0 * {T} + {T} * {T} + 600.0 * {C} - {c330!r}) "
        "* {A6} / 720.0)))"
    ).format(n0=n0, k0=_K0, M=M, NU=NU, p=p, A2=A2, T=T, C=C, A4=A4,
             A6=A6, c330=330.0 * ep2)
    return easting, northing


def utm_inverse_sql(easting, northing, zone, south=False):
    """(lon, lat) SQL expression strings for the WGS84 UTM inverse
    transform (Snyder eqs. 8-18..8-25: footpoint latitude from the
    rectifying series, then the lat/lon series).  Same shared-text
    dialect rules as ``utm_sql``."""
    if not 1 <= zone <= 60:
        raise ValueError("UTM zone must be in [1, 60]")
    lon0 = math.radians(zone * 6 - 183)
    a, e2, ep2, k0 = _A, _E2, _EP2, _K0
    e4, e6 = e2 * e2, e2 * e2 * e2
    m0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    e1 = (1.0 - math.sqrt(1.0 - e2)) / (1.0 + math.sqrt(1.0 - e2))
    j1 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    j2 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    j3 = 151.0 * e1 ** 3 / 96.0
    j4 = 1097.0 * e1 ** 4 / 512.0
    n0 = 10000000.0 if south else 0.0
    MU = "((({n} - {n0!r}) / {k0!r}) / {am0!r})".format(
        n=northing, n0=n0, k0=k0, am0=a * m0)
    P1 = ("({mu} + {j1!r} * sin(2.0 * {mu}) + {j2!r} * sin(4.0 * {mu})"
          " + {j3!r} * sin(6.0 * {mu}) + {j4!r} * sin(8.0 * {mu}))"
          ).format(mu=MU, j1=j1, j2=j2, j3=j3, j4=j4)
    T1 = "(tan({p}) * tan({p}))".format(p=P1)
    C1 = "({ep2!r} * cos({p}) * cos({p}))".format(ep2=ep2, p=P1)
    Q = "(1.0 - {e2!r} * sin({p}) * sin({p}))".format(e2=e2, p=P1)
    N1 = "({a!r} / sqrt({q}))".format(a=a, q=Q)
    R1 = "({ae!r} / ({q} * sqrt({q})))".format(ae=a * (1.0 - e2), q=Q)
    D = "((({e} - 500000.0) / {n1}) / {k0!r})".format(
        e=easting, n1=N1, k0=k0)
    D2 = "({d} * {d})".format(d=D)
    D3 = "({d2} * {d})".format(d2=D2, d=D)
    D4 = "({d2} * {d2})".format(d2=D2)
    D5 = "({d4} * {d})".format(d4=D4, d=D)
    D6 = "({d4} * {d2})".format(d4=D4, d2=D2)
    lat = ("degrees({p} - ({n1} * tan({p}) / {r1}) * ({d2} / 2.0"
           " - (5.0 + 3.0 * {t1} + 10.0 * {c1} - 4.0 * {c1} * {c1}"
           " - {c9!r}) * {d4} / 24.0"
           " + (61.0 + 90.0 * {t1} + 298.0 * {c1} + 45.0 * {t1} * {t1}"
           " - {c252!r} - 3.0 * {c1} * {c1}) * {d6} / 720.0))"
           ).format(p=P1, n1=N1, r1=R1, d2=D2, d4=D4, d6=D6, t1=T1,
                    c1=C1, c9=9.0 * ep2, c252=252.0 * ep2)
    lon = ("degrees({lon0!r} + ({d} - (1.0 + 2.0 * {t1} + {c1}) * {d3}"
           " / 6.0 + (5.0 - 2.0 * {c1} + 28.0 * {t1} - 3.0 * {c1} * {c1}"
           " + {c8!r} + 24.0 * {t1} * {t1}) * {d5} / 120.0) / cos({p}))"
           ).format(lon0=lon0, d=D, d3=D3, d5=D5, t1=T1, c1=C1,
                    c8=8.0 * ep2, p=P1)
    return lon, lat


def equirect_sql(lat, lon):
    """(x, y) SQL strings for spherical equidistant cylindrical
    (EPSG:4087 with φ1 = 0): linear in radians, trivially exact."""
    return ("({!r} * radians({}))".format(WEB_MERCATOR_RADIUS, lon),
            "({!r} * radians({}))".format(WEB_MERCATOR_RADIUS, lat))


#: RD New (EPSG:28992) base point (Onze Lieve Vrouwetoren, Amersfoort)
#: and the Kadaster approximation polynomial coefficients
#: (Schreutelkamp & Strang van Hees 2001 — PUBLIC closed forms).
#: Term order is the paper's (descending magnitude) and is part of the
#: determinism contract: the SQL text fixes the evaluation order, so
#: Spark and any external oracle agree bit-for-bit.
_RD_PHI0, _RD_LAM0 = 52.15517440, 5.38720621
_RD_X0, _RD_Y0 = 155000.0, 463000.0
# RD -> WGS84: Δφ'' = Σ K_pq·dX^p·dY^q over dX = 1e-5(X-X0) etc.
_RD_K = ((0, 1, 3235.65389), (2, 0, -32.58297), (0, 2, -0.24750),
         (2, 1, -0.84978), (0, 3, -0.06550), (2, 2, -0.01709),
         (1, 0, -0.00738), (4, 0, 0.00530), (2, 3, -0.00039),
         (4, 1, 0.00033), (1, 1, -0.00012))
_RD_L = ((1, 0, 5260.52916), (1, 1, 105.94684), (1, 2, 2.45656),
         (3, 0, -0.81885), (1, 3, 0.05594), (3, 1, -0.05607),
         (0, 1, 0.01199), (3, 2, -0.00256), (1, 4, 0.00128),
         (0, 2, 0.00022), (2, 0, -0.00022), (5, 0, 0.00026))
# WGS84 -> RD: ΔX = Σ R_pq·dφ^p·dλ^q over dφ = 0.36(φ-φ0) etc.
_RD_R = ((0, 1, 190094.945), (1, 1, -11832.228), (2, 1, -114.221),
         (0, 3, -32.391), (1, 0, -0.705), (3, 1, -2.340),
         (1, 3, -0.608), (0, 2, -0.008), (2, 3, 0.148))
_RD_S = ((1, 0, 309056.544), (0, 2, 3638.893), (2, 0, 73.077),
         (1, 2, -157.984), (3, 0, 59.788), (0, 1, 0.433),
         (2, 2, -6.439), (1, 1, -0.032), (0, 4, 0.092),
         (1, 4, -0.054))


def _poly_sql(terms, u, v):
    """``Σ k·u^p·v^q`` as one SQL string with explicit left-to-right
    multiplication (no pow(): repeated products parse and evaluate
    identically in Spark SQL and DuckDB)."""
    parts = []
    for p, q, k in terms:
        factors = ["{!r}".format(k)] + [u] * p + [v] * q
        parts.append("(" + " * ".join(factors) + ")")
    return "(" + " + ".join(parts) + ")"


def rd_sql(lat, lon):
    """(x_rd, y_rd) SQL expression strings: WGS84 degrees → RD New
    meters via the Kadaster forward polynomials.  ~cm agreement with
    RDNAPTRANS within the Netherlands."""
    dp = "(0.36 * (({}) - {!r}))".format(lat, _RD_PHI0)
    dl = "(0.36 * (({}) - {!r}))".format(lon, _RD_LAM0)
    x = "({!r} + {})".format(_RD_X0, _poly_sql(_RD_R, dp, dl))
    y = "({!r} + {})".format(_RD_Y0, _poly_sql(_RD_S, dp, dl))
    return x, y


def rd_inverse_sql(x, y):
    """(lon, lat) SQL expression strings: RD New meters → WGS84 degrees
    via the Kadaster inverse polynomials (arcsecond corrections around
    the Amersfoort base point)."""
    dx = "(1e-05 * (({}) - {!r}))".format(x, _RD_X0)
    dy = "(1e-05 * (({}) - {!r}))".format(y, _RD_Y0)
    lat = "({!r} + {} / 3600.0)".format(_RD_PHI0,
                                        _poly_sql(_RD_K, dx, dy))
    lon = "({!r} + {} / 3600.0)".format(_RD_LAM0,
                                        _poly_sql(_RD_L, dx, dy))
    return lon, lat


_RD_CRS = "EPSG:28992"
_WGS = "EPSG:4326"
_SUPPORTED = {("EPSG:4326", "EPSG:3857"), ("EPSG:3857", "EPSG:4326"),
              ("EPSG:4326", "EPSG:4087"), ("EPSG:4087", "EPSG:4326"),
              ("EPSG:4326", _RD_CRS), (_RD_CRS, "EPSG:4326")}


def _direct_pair(src_crs, dst_crs):
    """Whether ONE closed form covers the pair (no pivot needed)."""
    from dask_geomodeling_spark.geometry.proj_ext import projected_crs
    if src_crs == dst_crs:
        return True
    if _UTM_RE.match(dst_crs) or projected_crs(dst_crs):
        return src_crs == _WGS
    if _UTM_RE.match(src_crs) or projected_crs(src_crs):
        return dst_crs == _WGS
    return (src_crs, dst_crs) in _SUPPORTED


def _point_sql(src_crs, dst_crs, x_sql, y_sql):
    """(x', y') SQL expression strings transforming the textual
    coordinate expressions ``x_sql``/``y_sql`` — shared by column
    mappings and the ``vertices``-array lambda.  Pairs without a
    direct closed form pivot through EPSG:4326 by substituting the
    inverse leg's lon/lat text into the forward leg."""
    if src_crs == dst_crs:
        return x_sql, y_sql
    if not _direct_pair(src_crs, dst_crs):
        lon, lat = _point_sql(src_crs, _WGS, x_sql, y_sql)
        return _point_sql(_WGS, dst_crs, lon, lat)
    from dask_geomodeling_spark.geometry.proj_ext import projected_crs
    ext_dst, ext_src = projected_crs(dst_crs), projected_crs(src_crs)
    if ext_dst is not None:
        return ext_dst.forward(y_sql, x_sql)
    if ext_src is not None:
        return ext_src.inverse(x_sql, y_sql)
    utm = _UTM_RE.match(dst_crs)
    utm_src = _UTM_RE.match(src_crs)
    if utm:
        e, n = utm_sql(y_sql, x_sql, int(utm.group(2)),
                       south=utm.group(1) == "7")
        return e, n
    if utm_src:
        lon, lat = utm_inverse_sql(x_sql, y_sql, int(utm_src.group(2)),
                                   south=utm_src.group(1) == "7")
        return lon, lat
    if dst_crs == _RD_CRS:
        return rd_sql(y_sql, x_sql)
    if src_crs == _RD_CRS:
        return rd_inverse_sql(x_sql, y_sql)
    r = repr(WEB_MERCATOR_RADIUS)
    if dst_crs == "EPSG:4087":
        xe, ye = equirect_sql(y_sql, x_sql)
        return xe, ye
    if src_crs == "EPSG:4087":
        return ("degrees(({}) / {})".format(x_sql, r),
                "degrees(({}) / {})".format(y_sql, r))
    if dst_crs == "EPSG:3857":
        return ("({} * radians({}))".format(r, x_sql),
                "({} * ln(tan(pi() / 4 + radians({}) / 2)))"
                .format(r, y_sql))
    # EPSG:3857 -> EPSG:4326
    return ("degrees(({}) / {})".format(x_sql, r),
            "degrees(2 * atan(exp(({}) / {})) - pi() / 2)"
            .format(y_sql, r))


def _nearest_supported(code, k=6):
    """The ``k`` numerically nearest supported EPSG codes to an
    unsupported one — the error-message hint (round 15): a user
    holding an unknown state-plane/grid code usually wants a sibling
    zone that IS bundled."""
    import re

    from dask_geomodeling_spark.geometry.epsg_table import EPSG_PROJ4
    from dask_geomodeling_spark.geometry.proj_ext import _REGISTRY
    known = set(EPSG_PROJ4) | set(_REGISTRY) | set(
        c for pair in _SUPPORTED for c in pair)
    m = re.match(r"^EPSG:(\d+)$", str(code).upper())
    if not m:
        return sorted(known)[:k]
    n = int(m.group(1))

    def num(c):
        mm = re.match(r"^EPSG:(\d+)$", c)
        return int(mm.group(1)) if mm else 10 ** 9
    return sorted(known, key=lambda c: (abs(num(c) - n), c))[:k]


def validate_crs_pair(src_crs, dst_crs):
    """Raise NotImplementedError unless the pair has a closed form —
    direct, or composed through EPSG:4326 (both legs must exist)."""
    src_crs, dst_crs = str(src_crs).upper(), str(dst_crs).upper()
    if _direct_pair(src_crs, dst_crs):
        return src_crs, dst_crs
    if _direct_pair(src_crs, _WGS) and _direct_pair(_WGS, dst_crs):
        return src_crs, dst_crs
    unknown = [c for c in (src_crs, dst_crs)
               if c != _WGS and not _direct_pair(c, _WGS)
               and not _direct_pair(_WGS, c)]
    hints = "; ".join(
        "nearest supported to {}: {}".format(
            c, ", ".join(_nearest_supported(c))) for c in unknown)
    raise NotImplementedError(
        "supported natively: EPSG:4326 <-> EPSG:3857/4087/28992, "
        "UTM EPSG:326xx/327xx, the registered conic/azimuthal grids "
        "plus the bundled EPSG table (state-plane NAD83, European/"
        "ANZ national grids, UTM-on-datum — geometry/epsg_table.py), "
        "any pair composed through EPSG:4326.  {}  Other LCC/Albers/"
        "stereographic/LAEA/TM/omerc/Krovak CRS register at runtime "
        "via proj_ext.register_crs_from_proj4('<code>', '<+proj "
        "string>'); anything else needs pyproj/GDAL (reference: "
        "utils.get_transform_func)".format(hints))


def point_transform_sql(src_crs, dst_crs, x_sql, y_sql):
    """Public (x', y') SQL-text transform between any two supported
    CRS — the exact strings the Reproject plan evaluates, exposed so
    external oracles can replay them verbatim."""
    src_crs, dst_crs = validate_crs_pair(src_crs, dst_crs)
    return _point_sql(src_crs, dst_crs, x_sql, y_sql)


def _transform_stages(src_crs, dst_crs):
    """The transform as a list of callables ``f(x_sql, y_sql) ->
    (x'_sql, y'_sql)``, one per PLAN STAGE.  Single-stage for every
    pure-projection pair (the textual-substitution contract the
    oracles replay).  Datum-shifted CRSs (proj_ext._Datum) split into
    [shift, inner-projection] / [inner-inverse, shift-back]: the
    Molodensky correction and the TM series each reference their
    inputs ~20×, so composing them TEXTUALLY multiplies the tree
    ~400× and whole-stage codegen spends half a minute compiling the
    generated Java — materializing the shifted geodetic coordinates
    as an intermediate projection keeps every stage's tree small
    while computing the IDENTICAL arithmetic (stage boundaries don't
    change FP evaluation order)."""
    if src_crs == dst_crs:
        return []
    if not _direct_pair(src_crs, dst_crs):
        return (_transform_stages(src_crs, _WGS)
                + _transform_stages(_WGS, dst_crs))
    from dask_geomodeling_spark.geometry.proj_ext import projected_crs
    ext_dst, ext_src = projected_crs(dst_crs), projected_crs(src_crs)
    if ext_dst is not None and getattr(ext_dst, "inner", None) is not None:
        def shift(x, y, d=ext_dst):
            lat2, lon2 = d._shift(y, x, d.fwd, d.src, d.dst)
            return lon2, lat2

        def fwd(x, y, d=ext_dst):
            return d.inner.forward(y, x)
        return [shift, fwd]
    if ext_src is not None and getattr(ext_src, "inner", None) is not None:
        def inv(x, y, d=ext_src):
            return d.inner.inverse(x, y)

        def shift_back(x, y, d=ext_src):
            lat3, lon3 = d._shift(y, x, d.inv, d.dst, d.src)
            return lon3, lat3
        return [inv, shift_back]
    return [lambda x, y: _point_sql(src_crs, dst_crs, x, y)]


def _stage_mapping(columns, stage):
    """{column -> Column} applying one transform stage to every
    geometry column present."""
    mapping = {}
    cols = set(columns)
    for xc, yc in (("x", "y"), ("xmin", "ymin"), ("xmax", "ymax")):
        if not {xc, yc} <= cols:
            continue
        x_sql, y_sql = stage("`{}`".format(xc), "`{}`".format(yc))
        mapping[xc] = F.expr(x_sql)
        mapping[yc] = F.expr(y_sql)
    if "vertices" in cols:
        vx, vy = stage("v[0]", "v[1]")
        mapping["vertices"] = F.expr(
            "transform(vertices, v -> array({}, {}))".format(vx, vy))
    if "rings" in cols:
        vx, vy = stage("v[0]", "v[1]")
        mapping["rings"] = F.expr(
            "transform(rings, r -> transform(r, v -> array({}, {})))"
            .format(vx, vy))
    return mapping


def apply_reproject(df, src_crs, dst_crs, strict=True):
    """Reproject every geometry column of ``df`` — one ``withColumns``
    projection per transform stage (see ``_transform_stages``).
    Returns ``df`` unchanged when the CRSs coincide; when a transform
    is requested but no geometry column is present, raises
    (``strict``) or passes the frame through (request-path
    behavior)."""
    src_crs, dst_crs = validate_crs_pair(src_crs, dst_crs)
    stages = _transform_stages(src_crs, dst_crs)
    applied = False
    for stage in stages:
        mapping = _stage_mapping(df.columns, stage)
        if mapping:
            df = df.withColumns(mapping)
            applied = True
    if strict and stages and not applied:
        raise ValueError("Reproject requires geometry columns")
    return df


def reproject_mapping(columns, src_crs, dst_crs):
    """{column -> transformed Column} for every geometry column present
    (point x/y, bbox corners, polygon ``vertices`` rings) as ONE
    textual composition — kept for single-stage callers and oracle
    parity; plan-building goes through ``apply_reproject`` (staged)."""
    src_crs, dst_crs = validate_crs_pair(src_crs, dst_crs)
    if src_crs == dst_crs:
        return {}
    return _stage_mapping(
        columns, lambda x, y: _point_sql(src_crs, dst_crs, x, y))


def transform_extent(extent, src_crs, dst_crs):
    """Transform an (x1, y1, x2, y2) extent: transform the four box
    corners and take the envelope (the reference transforms the extent
    geometry and takes its envelope — utils.Extent.transform)."""
    src_crs, dst_crs = validate_crs_pair(src_crs, dst_crs)
    if src_crs == dst_crs or extent is None or extent[0] is None:
        return extent
    x1, y1, x2, y2 = extent
    corners = [(x1, y1), (x1, y2), (x2, y1), (x2, y2)]
    # evaluate the shared SQL closed forms on literal corners, ONE
    # STAGE AT A TIME (numeric outputs feed the next stage as new
    # literals): the fully substituted inverse of a datum-shifted CRS
    # is a megabyte of SQL text and OOMs expression canonicalization
    from dask_geomodeling_spark import config
    spark = config.get_spark()
    for stage in _transform_stages(src_crs, dst_crs):
        vx, vy = stage("v[0]", "v[1]")
        rows = spark.sql(
            "SELECT transform(array({}), v -> array({}, {})) AS pts"
            .format(", ".join(
                "array({!r}D, {!r}D)".format(float(cx), float(cy))
                for cx, cy in corners), vx, vy)).first()
        corners = [(float(p[0]), float(p[1])) for p in rows[0]]
    xs = [p[0] for p in corners]
    ys = [p[1] for p in corners]
    return (min(xs), min(ys), max(xs), max(ys))


class Reproject(BaseSingle):
    """Transform geometry columns between supported CRS (module
    docstring lists the closed-form pairs).

    Args:
      source: GeometryBlock whose geometry columns are in ``src_crs``.
      src_crs / dst_crs: any of "EPSG:4326", "EPSG:3857", "EPSG:4087",
        "EPSG:28992" (RD New), or a UTM zone "EPSG:326xx"/"EPSG:327xx"
        — both directions; pairs not involving EPSG:4326 compose
        through it as one shared expression string.
    """

    def __init__(self, source, src_crs="EPSG:4326",
                 dst_crs="EPSG:3857"):
        src_crs, dst_crs = validate_crs_pair(src_crs, dst_crs)
        declared = getattr(source, "projection", None)
        if declared is not None and str(declared).upper() != src_crs:
            raise ValueError(
                "source block carries projection {!r} but Reproject was"
                " given src_crs={!r}".format(declared, src_crs))
        super().__init__(source, src_crs, dst_crs)

    @property
    def projection(self):
        """The block's OUTPUT CRS (dst_crs) — without this override the
        base-class walk would report the source CRS and a request-level
        ``projection=`` would re-transform already-projected data."""
        return self.args[2]

    def _build(self, ctx):
        df = self.source._build(ctx)
        src_crs, dst_crs = self.args[1], self.args[2]
        return apply_reproject(df, src_crs, dst_crs)
