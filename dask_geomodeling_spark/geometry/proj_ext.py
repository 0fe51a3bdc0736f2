"""Parameterized projected-CRS registry: Lambert Conformal Conic,
Albers Equal-Area, Polar Stereographic, Lambert Azimuthal Equal-Area.

The reference delegates every CRS pair to pyproj/GDAL (reference
utils.py:53–116 get_sr/shapely_transform); this environment has
neither, so round 5 shipped the closed-form set (web-mercator, UTM,
RD New).  This module generalizes that: the four conic/azimuthal
families above cover most national grids (Lambert-93, Canada LCC,
US Albers, the EU LAEA grid, the polar science grids), and each is a
PUBLIC closed form (Snyder, "Map Projections — A Working Manual",
USGS PP 1395: eqs. 15-x LCC, 14-x Albers, 21-x/22-x stereographic,
24-x LAEA).  Inverses avoid Snyder's fixed-point iteration by using
the conformal/authalic latitude SERIES (eqs. 3-5 and 3-18), so every
transform is ONE SQL expression string — identical text in Spark SQL
and DuckDB, identical evaluation order, oracle-exact, and pure
column math inside whole-stage codegen at any scale.

Built-in registrations: EPSG:2154 (RGF93 / Lambert-93),
EPSG:3978 (NAD83 / Canada Atlas Lambert), EPSG:5070 (NAD83 / CONUS
Albers), EPSG:3035 (ETRS89 / LAEA Europe), EPSG:3413 / EPSG:3976
(WGS84 NSIDC polar stereographic north/south).  Any other CRS of
these families registers at runtime from its projection parameters
via ``register_projected_crs`` — the escape hatch that makes
"arbitrary CRS" a parameter lookup instead of a native dependency.
(NAD83/ETRS89/RGF93 are treated as coincident with WGS84 — the
standard sub-meter approximation.)
"""

from __future__ import annotations

import math

__all__ = ["register_projected_crs", "register_crs_from_proj4",
           "projected_crs", "ELLIPSOIDS"]

#: (a, f) by name — semi-major axis and FLATTENING (not e²; _ellipsoid
#: derives e² = f·(2−f)).  clarke1866 stores None: it is defined via its
#: semi-minor axis b inside _ellipsoid/_a_f.
ELLIPSOIDS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "clarke1866": (6378206.4, None),  # defined via b below
    "intl1924": (6378388.0, 1.0 / 297.0),
    "airy1830": (6377563.396, 1.0 / 299.3249646),
    # modified Airy (Ireland): a scaled by the OSI factor, same 1/f
    "airy_mod": (6377340.189, 1.0 / 299.3249646),
    "bessel1841": (6377397.155, 1.0 / 299.1528128),
}


def _a_f(name):
    """(a, flattening) — resolves clarke1866's b-defined flattening."""
    a, f = ELLIPSOIDS[name]
    if f is None:  # clarke1866: defined via b
        b = 6356583.8
        f = 1.0 - b / a
    return a, f


def _ellipsoid(name):
    a, f = ELLIPSOIDS[name]
    if name == "clarke1866":
        b = 6356583.8
        e2 = 1.0 - (b / a) ** 2
    else:
        e2 = f * (2.0 - f)
    return a, e2


# ---- numeric helpers (projection constants, driver-side) -----------------

def _m_num(phi, e):
    return math.cos(phi) / math.sqrt(1.0 - (e * math.sin(phi)) ** 2)


def _t_num(phi, e):
    return (math.tan(math.pi / 4.0 - phi / 2.0)
            * ((1.0 + e * math.sin(phi))
               / (1.0 - e * math.sin(phi))) ** (e / 2.0))


def _q_num(phi, e):
    s = math.sin(phi)
    return (1.0 - e * e) * (s / (1.0 - (e * s) ** 2)
                            - (1.0 / (2.0 * e)) * math.log(
                                (1.0 - e * s) / (1.0 + e * s)))


# ---- SQL text builders ---------------------------------------------------

def _t_sql(p, e):
    """Snyder 15-9 isometric t(φ) for a radians SQL text ``p``."""
    es = "({e!r} * sin({p}))".format(e=e, p=p)
    return ("(tan(pi() / 4 - {p} / 2) * exp({eh!r} * "
            "ln((1 + {es}) / (1 - {es}))))").format(
        p=p, eh=e / 2.0, es=es)


def _q_sql(p, e):
    """Snyder 3-12 authalic q(φ) for a radians SQL text ``p``."""
    s = "sin({p})".format(p=p)
    return ("({c!r} * ({s} / (1 - {e2!r} * {s} * {s}) - {h!r} * "
            "ln((1 - {e!r} * {s}) / (1 + {e!r} * {s}))))").format(
        c=1.0 - e * e, s=s, e2=e * e, h=1.0 / (2.0 * e), e=e)


def _conformal_lat_sql(chi, e2):
    """Snyder 3-5: φ from the conformal latitude χ (series — no
    iteration), as degrees SQL."""
    e4, e6, e8 = e2 * e2, e2 ** 3, e2 ** 4
    c2 = e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0
    c4 = 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0
    c6 = 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0
    c8 = 4279.0 * e8 / 161280.0
    return ("degrees({x} + {c2!r} * sin(2 * {x}) + {c4!r} * sin(4 * {x})"
            " + {c6!r} * sin(6 * {x}) + {c8!r} * sin(8 * {x}))").format(
        x=chi, c2=c2, c4=c4, c6=c6, c8=c8)


def _authalic_lat_sql(beta, e2):
    """Snyder 3-18: φ from the authalic latitude β (series), degrees."""
    e4, e6 = e2 * e2, e2 ** 3
    c2 = e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0
    c4 = 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0
    c6 = 761.0 * e6 / 45360.0
    return ("degrees({x} + {c2!r} * sin(2 * {x}) + {c4!r} * sin(4 * {x})"
            " + {c6!r} * sin(6 * {x}))").format(x=beta, c2=c2, c4=c4,
                                                c6=c6)


class _Lcc:
    """Lambert Conformal Conic 2SP (Snyder 15-1..15-11)."""

    def __init__(self, lat0, lon0, lat1, lat2, x0, y0, ellipsoid):
        a, e2 = _ellipsoid(ellipsoid)
        e = math.sqrt(e2)
        p0, p1, p2 = (math.radians(v) for v in (lat0, lat1, lat2))
        m1, m2 = _m_num(p1, e), _m_num(p2, e)
        t0, t1, t2 = _t_num(p0, e), _t_num(p1, e), _t_num(p2, e)
        if lat1 == lat2:
            n = math.sin(p1)
        else:
            n = math.log(m1 / m2) / math.log(t1 / t2)
        big_f = m1 / (n * t1 ** n)
        self.a, self.e, self.e2 = a, e, e2
        self.n, self.aF = n, a * big_f
        self.rho0 = a * big_f * t0 ** n
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0

    def forward(self, lat, lon):
        t = _t_sql("radians({})".format(lat), self.e)
        rho = "({aF!r} * exp({n!r} * ln({t})))".format(
            aF=self.aF, n=self.n, t=t)
        th = "({n!r} * (radians({lon}) - {l0!r}))".format(
            n=self.n, lon=lon, l0=self.lon0)
        x = "({x0!r} + {rho} * sin({th}))".format(x0=self.x0, rho=rho,
                                                  th=th)
        y = "({y0!r} + {r0!r} - {rho} * cos({th}))".format(
            y0=self.y0, r0=self.rho0, rho=rho, th=th)
        return x, y

    def inverse(self, x, y):
        sgn = 1.0 if self.n >= 0 else -1.0
        dx = "({sg!r} * (({x}) - {x0!r}))".format(sg=sgn, x=x, x0=self.x0)
        dy = "({sg!r} * ({r0!r} - (({y}) - {y0!r})))".format(
            sg=sgn, r0=self.rho0, y=y, y0=self.y0)
        rho = "sqrt({dx} * {dx} + {dy} * {dy})".format(dx=dx, dy=dy)
        tp = "exp(ln({rho} / {aF!r}) / {n!r})".format(rho=rho, aF=self.aF,
                                                      n=self.n)
        chi = "(pi() / 2 - 2 * atan({t}))".format(t=tp)
        lon = "degrees({l0!r} + atan2({dx}, {dy}) / {n!r})".format(
            l0=self.lon0, dx=dx, dy=dy, n=self.n)
        return lon, _conformal_lat_sql(chi, self.e2)


class _Albers:
    """Albers Equal-Area Conic 2SP (Snyder 14-1..14-11)."""

    def __init__(self, lat0, lon0, lat1, lat2, x0, y0, ellipsoid):
        a, e2 = _ellipsoid(ellipsoid)
        e = math.sqrt(e2)
        p0, p1, p2 = (math.radians(v) for v in (lat0, lat1, lat2))
        m1, m2 = _m_num(p1, e), _m_num(p2, e)
        q0, q1, q2 = (_q_num(p, e) for p in (p0, p1, p2))
        if lat1 == lat2:
            n = math.sin(p1)
        else:
            n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.a, self.e, self.e2, self.n = a, e, e2, n
        self.c = m1 * m1 + n * q1
        self.rho0 = a * math.sqrt(self.c - n * q0) / n
        self.qp = _q_num(math.pi / 2.0, e)
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0

    def forward(self, lat, lon):
        q = _q_sql("radians({})".format(lat), self.e)
        rho = "({an!r} * sqrt({c!r} - {n!r} * {q}))".format(
            an=self.a / self.n, c=self.c, n=self.n, q=q)
        th = "({n!r} * (radians({lon}) - {l0!r}))".format(
            n=self.n, lon=lon, l0=self.lon0)
        x = "({x0!r} + {rho} * sin({th}))".format(x0=self.x0, rho=rho,
                                                  th=th)
        y = "({y0!r} + {r0!r} - {rho} * cos({th}))".format(
            y0=self.y0, r0=self.rho0, rho=rho, th=th)
        return x, y

    def inverse(self, x, y):
        sgn = 1.0 if self.n >= 0 else -1.0
        dx = "({sg!r} * (({x}) - {x0!r}))".format(sg=sgn, x=x, x0=self.x0)
        dy = "({sg!r} * ({r0!r} - (({y}) - {y0!r})))".format(
            sg=sgn, r0=self.rho0, y=y, y0=self.y0)
        rho2 = "({dx} * {dx} + {dy} * {dy})".format(dx=dx, dy=dy)
        qp = "(({c!r} - {rho2} * {k!r}) / {n!r})".format(
            c=self.c, rho2=rho2, k=(self.n / self.a) ** 2, n=self.n)
        beta = "asin({q} / {qp!r})".format(q=qp, qp=self.qp)
        lon = "degrees({l0!r} + atan2({dx}, {dy}) / {n!r})".format(
            l0=self.lon0, dx=dx, dy=dy, n=self.n)
        return lon, _authalic_lat_sql(beta, self.e2)


class _PolarStereo:
    """Polar Stereographic variant B — standard parallel ``lat_ts``
    (Snyder 21-33..21-41; EPSG 9829)."""

    def __init__(self, lat_ts, lon0, x0, y0, ellipsoid, south):
        a, e2 = _ellipsoid(ellipsoid)
        e = math.sqrt(e2)
        pts = math.radians(abs(lat_ts))
        self.a, self.e, self.e2 = a, e, e2
        #: ρ = a·m_c·t/t_c  (variant B scaling)
        self.k = a * _m_num(pts, e) / _t_num(pts, e)
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0
        self.south = south

    def forward(self, lat, lon):
        s = -1.0 if self.south else 1.0
        p = "({s!r} * radians({lat}))".format(s=s, lat=lat)
        t = _t_sql(p, self.e)
        rho = "({k!r} * {t})".format(k=self.k, t=t)
        dl = "({s!r} * (radians({lon}) - {l0!r}))".format(
            s=s, lon=lon, l0=self.lon0)
        x = "({x0!r} + {s!r} * {rho} * sin({dl}))".format(
            x0=self.x0, s=s, rho=rho, dl=dl)
        y = "({y0!r} - {s!r} * {rho} * cos({dl}))".format(
            y0=self.y0, s=s, rho=rho, dl=dl)
        return x, y

    def inverse(self, x, y):
        s = -1.0 if self.south else 1.0
        dx = "({s!r} * (({x}) - {x0!r}))".format(s=s, x=x, x0=self.x0)
        dy = "({s!r} * ({y0!r} - ({y})))".format(s=s, y0=self.y0, y=y)
        rho = "sqrt({dx} * {dx} + {dy} * {dy})".format(dx=dx, dy=dy)
        tp = "({rho} / {k!r})".format(rho=rho, k=self.k)
        chi = "(pi() / 2 - 2 * atan({t}))".format(t=tp)
        lat = "({s!r} * {phi})".format(
            s=s, phi=_conformal_lat_sql(chi, self.e2))
        # all longitudes occur around a pole: wrap into [-180, 180)
        lon = ("((degrees({l0!r} + {s!r} * atan2({dx}, {dy})) + 540.0) "
               "% 360.0 - 180.0)").format(l0=self.lon0, s=s, dx=dx,
                                          dy=dy)
        return lon, lat


class _Laea:
    """Lambert Azimuthal Equal-Area, oblique aspect (Snyder
    24-2..24-14 / 3-11..3-18; EPSG 9820 — the ETRS89-LAEA grid)."""

    def __init__(self, lat0, lon0, x0, y0, ellipsoid):
        a, e2 = _ellipsoid(ellipsoid)
        e = math.sqrt(e2)
        p0 = math.radians(lat0)
        self.a, self.e, self.e2 = a, e, e2
        self.qp = _q_num(math.pi / 2.0, e)
        self.b0 = math.asin(_q_num(p0, e) / self.qp)
        self.rq = a * math.sqrt(self.qp / 2.0)
        self.d = a * _m_num(p0, e) / (self.rq * math.cos(self.b0))
        self.lon0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0

    def forward(self, lat, lon):
        q = _q_sql("radians({})".format(lat), self.e)
        beta = "asin({q} / {qp!r})".format(q=q, qp=self.qp)
        dl = "(radians({lon}) - {l0!r})".format(lon=lon, l0=self.lon0)
        den = ("(1 + {sb0!r} * sin({b}) + {cb0!r} * cos({b}) * cos({dl}))"
               ).format(sb0=math.sin(self.b0), cb0=math.cos(self.b0),
                        b=beta, dl=dl)
        bb = "({rq!r} * sqrt(2 / {den}))".format(rq=self.rq, den=den)
        x = "({x0!r} + {bb} * {d!r} * cos({b}) * sin({dl}))".format(
            x0=self.x0, bb=bb, d=self.d, b=beta, dl=dl)
        y = ("({y0!r} + ({bb} / {d!r}) * ({cb0!r} * sin({b}) - "
             "{sb0!r} * cos({b}) * cos({dl})))").format(
            y0=self.y0, bb=bb, d=self.d, cb0=math.cos(self.b0),
            sb0=math.sin(self.b0), b=beta, dl=dl)
        return x, y

    def inverse(self, x, y):
        dx = "((({x}) - {x0!r}) / {d!r})".format(x=x, x0=self.x0, d=self.d)
        dy = "({d!r} * (({y}) - {y0!r}))".format(d=self.d, y=y, y0=self.y0)
        rho = "sqrt({dx} * {dx} + {dy} * {dy})".format(dx=dx, dy=dy)
        ce = "(2 * asin({rho} / {r2!r}))".format(rho=rho, r2=2.0 * self.rq)
        # β' = asin(cos(ce)·sinβ0 + dy·sin(ce)·cosβ0/ρ); ρ→0 guard
        # collapses to the origin latitude
        beta = ("asin(cos({ce}) * {sb0!r} + IF({rho} = 0, 0, "
                "{dy} * sin({ce}) * {cb0!r} / {rho}))").format(
            ce=ce, sb0=math.sin(self.b0), rho=rho, dy=dy,
            cb0=math.cos(self.b0))
        lon = ("degrees({l0!r} + atan2({dx} * sin({ce}), "
               "{rho} * {cb0!r} * cos({ce}) - {dy} * {sb0!r} * sin({ce})))"
               ).format(l0=self.lon0, dx=dx, ce=ce, rho=rho,
                        cb0=math.cos(self.b0), dy=dy,
                        sb0=math.sin(self.b0))
        return lon, _authalic_lat_sql(beta, self.e2)


class _Tmerc:
    """Transverse Mercator, arbitrary ellipsoid and origin (Snyder
    8-9..8-13 forward, 8-18..8-25 inverse — the generalized form of
    the engine's built-in WGS84 UTM zones; covers the national TM
    grids: OSGB, Irish TM, Gauss–Krüger, ETRS89 UTM)."""

    def __init__(self, lat0, lon0, k0, x0, y0, ellipsoid):
        a, e2 = _ellipsoid(ellipsoid)
        self.a, self.e2 = a, e2
        self.ep2 = e2 / (1.0 - e2)
        e4, e6 = e2 * e2, e2 ** 3
        self.m0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
        self.m1 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
        self.m2 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
        self.m3 = 35.0 * e6 / 3072.0
        p0 = math.radians(lat0)
        self.big_m0 = a * (self.m0 * p0 - self.m1 * math.sin(2.0 * p0)
                           + self.m2 * math.sin(4.0 * p0)
                           - self.m3 * math.sin(6.0 * p0))
        self.lon0 = math.radians(lon0)
        self.k0, self.x0, self.y0 = float(k0), x0, y0

    def forward(self, lat, lon):
        e2, ep2 = self.e2, self.ep2
        p = "radians({})".format(lat)
        A = "((radians({}) - {!r}) * cos({p}))".format(lon, self.lon0,
                                                      p=p)
        T = "(tan({p}) * tan({p}))".format(p=p)
        C = "({!r} * cos({p}) * cos({p}))".format(ep2, p=p)
        NU = "({!r} / sqrt(1.0 - {!r} * sin({p}) * sin({p})))".format(
            self.a, e2, p=p)
        M = ("({!r} * ({!r} * {p} - {!r} * sin(2.0 * {p}) "
             "+ {!r} * sin(4.0 * {p}) - {!r} * sin(6.0 * {p})))").format(
            self.a, self.m0, self.m1, self.m2, self.m3, p=p)
        A2 = "({A} * {A})".format(A=A)
        A3 = "({A} * {A} * {A})".format(A=A)
        A4 = "({A2} * {A2})".format(A2=A2)
        A5 = "({A4} * {A})".format(A4=A4, A=A)
        A6 = "({A4} * {A2})".format(A4=A4, A2=A2)
        x = ("({x0!r} + {k0!r} * {NU} * ({A} + (1.0 - {T} + {C}) "
             "* {A3} / 6.0 + (5.0 - 18.0 * {T} + {T} * {T} "
             "+ 72.0 * {C} - {c58!r}) * {A5} / 120.0))").format(
            x0=self.x0, k0=self.k0, NU=NU, A=A, T=T, C=C, A3=A3,
            A5=A5, c58=58.0 * ep2)
        y = ("({y0!r} + {k0!r} * ({M} - {M0!r} + {NU} * tan({p}) "
             "* ({A2} / 2.0 + (5.0 - {T} + 9.0 * {C} + 4.0 * {C} * {C})"
             " * {A4} / 24.0 + (61.0 - 58.0 * {T} + {T} * {T} "
             "+ 600.0 * {C} - {c330!r}) * {A6} / 720.0)))").format(
            y0=self.y0, k0=self.k0, M=M, M0=self.big_m0, NU=NU, p=p,
            A2=A2, T=T, C=C, A4=A4, A6=A6, c330=330.0 * ep2)
        return x, y

    def inverse(self, x, y):
        a, e2, ep2, k0 = self.a, self.e2, self.ep2, self.k0
        e1 = ((1.0 - math.sqrt(1.0 - e2))
              / (1.0 + math.sqrt(1.0 - e2)))
        j1 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
        j2 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
        j3 = 151.0 * e1 ** 3 / 96.0
        j4 = 1097.0 * e1 ** 4 / 512.0
        MU = ("(((({n}) - {y0!r}) / {k0!r} + {M0!r}) / {am0!r})"
              ).format(n=y, y0=self.y0, k0=k0, M0=self.big_m0,
                       am0=a * self.m0)
        P1 = ("({mu} + {j1!r} * sin(2.0 * {mu}) + {j2!r} "
              "* sin(4.0 * {mu}) + {j3!r} * sin(6.0 * {mu}) "
              "+ {j4!r} * sin(8.0 * {mu}))").format(
            mu=MU, j1=j1, j2=j2, j3=j3, j4=j4)
        T1 = "(tan({p}) * tan({p}))".format(p=P1)
        C1 = "({ep2!r} * cos({p}) * cos({p}))".format(ep2=ep2, p=P1)
        Q = "(1.0 - {e2!r} * sin({p}) * sin({p}))".format(e2=e2, p=P1)
        N1 = "({a!r} / sqrt({q}))".format(a=a, q=Q)
        R1 = "({ae!r} / ({q} * sqrt({q})))".format(ae=a * (1.0 - e2),
                                                   q=Q)
        D = "(((({e}) - {x0!r}) / {n1}) / {k0!r})".format(
            e=x, x0=self.x0, n1=N1, k0=k0)
        D2 = "({d} * {d})".format(d=D)
        D3 = "({d2} * {d})".format(d2=D2, d=D)
        D4 = "({d2} * {d2})".format(d2=D2)
        D5 = "({d4} * {d})".format(d4=D4, d=D)
        D6 = "({d4} * {d2})".format(d4=D4, d2=D2)
        lat = ("degrees({p} - ({n1} * tan({p}) / {r1}) * ({d2} / 2.0"
               " - (5.0 + 3.0 * {t1} + 10.0 * {c1} - 4.0 * {c1} * {c1}"
               " - {c9!r}) * {d4} / 24.0"
               " + (61.0 + 90.0 * {t1} + 298.0 * {c1} + 45.0 * {t1} "
               "* {t1} - {c252!r} - 3.0 * {c1} * {c1}) * {d6} / 720.0))"
               ).format(p=P1, n1=N1, r1=R1, d2=D2, d4=D4, d6=D6,
                        t1=T1, c1=C1, c9=9.0 * ep2, c252=252.0 * ep2)
        lon = ("degrees({lon0!r} + ({d} - (1.0 + 2.0 * {t1} + {c1}) "
               "* {d3} / 6.0 + (5.0 - 2.0 * {c1} + 28.0 * {t1} "
               "- 3.0 * {c1} * {c1} + {c8!r} + 24.0 * {t1} * {t1}) "
               "* {d5} / 120.0) / cos({p}))").format(
            lon0=self.lon0, d=D, d3=D3, d5=D5, t1=T1, c1=C1,
            c8=8.0 * ep2, p=P1)
        return lon, lat


class _Omerc:
    """Hotine Oblique Mercator, azimuth at projection center (EPSG
    method 9815, Snyder eqs. 9-6..9-39) — the Swiss LV95 grid, Borneo
    RSO, Alaska zone 1 family.  All projection constants evaluate
    driver-side; the per-point transform is one shared SQL string, the
    registry's standard contract."""

    def __init__(self, lat0, lonc, alpha, gamma, k0, x0, y0,
                 ellipsoid):
        a, e2 = _ellipsoid(ellipsoid)
        e = math.sqrt(e2)
        p0 = math.radians(lat0)
        ac = math.radians(alpha)
        gc = math.radians(gamma)
        cos0 = math.cos(p0)
        big_b = math.sqrt(1.0 + e2 * cos0 ** 4 / (1.0 - e2))
        big_a = (a * big_b * k0 * math.sqrt(1.0 - e2)
                 / (1.0 - e2 * math.sin(p0) ** 2))
        t0 = _t_num(p0, e)
        big_d = (big_b * math.sqrt(1.0 - e2)
                 / (cos0 * math.sqrt(1.0 - e2 * math.sin(p0) ** 2)))
        d2 = max(big_d * big_d, 1.0)
        big_f = big_d + math.copysign(math.sqrt(d2 - 1.0), p0)
        big_e = big_f * t0 ** big_b
        big_g = (big_f - 1.0 / big_f) / 2.0
        self.g0 = math.asin(math.sin(ac) / big_d)
        self.l0 = (math.radians(lonc)
                   - math.asin(big_g * math.tan(self.g0)) / big_b)
        #: u-offset of the projection center (variant B)
        self.uc = math.copysign(
            (big_a / big_b) * math.atan2(math.sqrt(d2 - 1.0),
                                         math.cos(ac)), p0)
        self.a, self.e, self.e2 = a, e, e2
        self.B, self.A, self.E = big_b, big_a, big_e
        self.k0, self.x0, self.y0 = float(k0), x0, y0
        self.sin_gc, self.cos_gc = math.sin(gc), math.cos(gc)

    def forward(self, lat, lon):
        # plain textual composition (engine-portable, no HOFs): the
        # repeated sub-expressions are SCALAR, so each extra reference
        # costs one more per-row evaluation (~10x the isometric-t
        # chain), never the per-element re-expansion arrays suffer
        p = "radians({})".format(lat)
        t = _t_sql(p, self.e)
        q = "({E!r} / power({t}, {B!r}))".format(E=self.E, t=t,
                                                 B=self.B)
        dl = "({B!r} * (radians({lon}) - {l0!r}))".format(
            B=self.B, lon=lon, l0=self.l0)
        cg0, sg0 = math.cos(self.g0), math.sin(self.g0)
        s = "(({q} - 1.0 / {q}) / 2.0)".format(q=q)
        bigt = "(({q} + 1.0 / {q}) / 2.0)".format(q=q)
        u_cap = ("(((0.0 - sin({dl})) * {cg0!r} + {s} * {sg0!r}) "
                 "/ {t})").format(dl=dl, cg0=cg0, s=s, sg0=sg0,
                                  t=bigt)
        v = "({c!r} * ln((1 - {u}) / (1 + {u})))".format(
            c=self.A / (2.0 * self.B), u=u_cap)
        u = ("({c!r} * atan2({s} * {cg0!r} + sin({dl}) * {sg0!r}, "
             "cos({dl})) - {uc!r})").format(
            c=self.A / self.B, s=s, cg0=cg0, dl=dl, sg0=sg0,
            uc=self.uc)
        x = "({x0!r} + {v} * {cgc!r} + {u} * {sgc!r})".format(
            x0=self.x0, v=v, u=u, cgc=self.cos_gc, sgc=self.sin_gc)
        y = "({y0!r} + {u} * {cgc!r} - {v} * {sgc!r})".format(
            y0=self.y0, v=v, u=u, cgc=self.cos_gc, sgc=self.sin_gc)
        return x, y

    def inverse(self, x, y):
        dx = "(({x}) - {x0!r})".format(x=x, x0=self.x0)
        dy = "(({y}) - {y0!r})".format(y=y, y0=self.y0)
        v = "({dx} * {cgc!r} - {dy} * {sgc!r})".format(
            dx=dx, dy=dy, cgc=self.cos_gc, sgc=self.sin_gc)
        u = "({dy} * {cgc!r} + {dx} * {sgc!r} + {uc!r})".format(
            dx=dx, dy=dy, cgc=self.cos_gc, sgc=self.sin_gc,
            uc=self.uc)
        qp = "exp(0.0 - {BoA!r} * {v})".format(BoA=self.B / self.A,
                                               v=v)
        w = "({BoA!r} * {u})".format(BoA=self.B / self.A, u=u)
        cg0, sg0 = math.cos(self.g0), math.sin(self.g0)
        s = "(({q} - 1.0 / {q}) / 2.0)".format(q=qp)
        bigt = "(({q} + 1.0 / {q}) / 2.0)".format(q=qp)
        up = "((sin({w}) * {cg0!r} + {s} * {sg0!r}) / {t})".format(
            w=w, cg0=cg0, s=s, sg0=sg0, t=bigt)
        chi = ("(pi() / 2 - 2 * atan(power({E!r} "
               "/ sqrt((1 + {up}) / (1 - {up})), {invB!r})))").format(
            E=self.E, up=up, invB=1.0 / self.B)
        lat = _conformal_lat_sql(chi, self.e2)
        lon = ("degrees({l0!r} - atan2({s} * {cg0!r} - sin({w}) "
               "* {sg0!r}, cos({w})) / {B!r})").format(
            l0=self.l0, s=s, w=w, B=self.B, cg0=cg0, sg0=sg0)
        return lon, lat


class _Merc:
    """Ellipsoidal Mercator (EPSG 9804 variant A / 9805 variant B via
    ``lat_ts`` — Snyder 7-6..7-8): World Mercator EPSG:3395 and the
    marine-chart grids.  y = −a·k·ln t(φ); inverse via the conformal
    series."""

    def __init__(self, lat_ts, lon0, k0, x0, y0, ellipsoid):
        a, e2 = _ellipsoid(ellipsoid)
        e = math.sqrt(e2)
        pts = math.radians(lat_ts)
        k = k0 * math.cos(pts) / math.sqrt(
            1.0 - e2 * math.sin(pts) ** 2)
        self.a, self.e, self.e2 = a, e, e2
        self.ak = a * k
        self.l0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0

    def forward(self, lat, lon):
        x = "({x0!r} + {ak!r} * (radians({lon}) - {l0!r}))".format(
            x0=self.x0, ak=self.ak, lon=lon, l0=self.l0)
        t = _t_sql("radians({})".format(lat), self.e)
        y = "({y0!r} - {ak!r} * ln({t}))".format(y0=self.y0,
                                                 ak=self.ak, t=t)
        return x, y

    def inverse(self, x, y):
        lon = "degrees({l0!r} + (({x}) - {x0!r}) / {ak!r})".format(
            l0=self.l0, x=x, x0=self.x0, ak=self.ak)
        t = "exp((({y0!r}) - ({y})) / {ak!r})".format(y0=self.y0, y=y,
                                                      ak=self.ak)
        chi = "(pi() / 2 - 2 * atan({t}))".format(t=t)
        return lon, _conformal_lat_sql(chi, self.e2)


class _Krovak:
    """Krovak oblique conformal conic (EPSG method 9819; the
    ``east_north`` variant 1041 flips signs so the axes point
    east/north) — S-JTSK, the Czech/Slovak national grid.  Inverse
    avoids EPSG's latitude iteration through the conformal-latitude
    series (the U↔φ relation is the same isometric form the other
    conformal projections use)."""

    def __init__(self, latc, lon0, alpha, lat_p, k0, x0, y0,
                 ellipsoid, east_north=True):
        a, e2 = _ellipsoid(ellipsoid)
        e = math.sqrt(e2)
        pc = math.radians(latc)
        self.a, self.e, self.e2 = a, e, e2
        self.A = (a * math.sqrt(1.0 - e2)
                  / (1.0 - e2 * math.sin(pc) ** 2))
        self.B = math.sqrt(1.0 + e2 * math.cos(pc) ** 4 / (1.0 - e2))
        self.g0 = math.asin(math.sin(pc) / self.B)
        #: t0 relates U to the isometric latitude: tan(π/4+γ0/2) =
        #: t0 · tan^B(π/4+φC/2) / [(1+e sinφC)/(1−e sinφC)]^(eB/2)
        self.t0 = (math.tan(math.pi / 4.0 + self.g0 / 2.0)
                   * ((1.0 + e * math.sin(pc))
                      / (1.0 - e * math.sin(pc))) ** (e * self.B / 2.0)
                   / math.tan(math.pi / 4.0 + pc / 2.0) ** self.B)
        pp = math.radians(lat_p)
        self.n = math.sin(pp)
        self.r0 = k0 * self.A / math.tan(pp)
        self.rtan = math.tan(math.pi / 4.0 + pp / 2.0) ** self.n
        self.ac = math.radians(alpha)
        self.l0 = math.radians(lon0)
        self.x0, self.y0 = x0, y0
        self.sign = -1.0 if east_north else 1.0

    def forward(self, lat, lon):
        e, B = self.e, self.B
        p = "radians({})".format(lat)
        # U = 2(atan(t0·tan^B(φ/2+π/4)/[(1+e sinφ)/(1−e sinφ)]^(eB/2))−π/4)
        u = ("(2.0 * (atan({t0!r} * power(tan({p} / 2.0 + pi() / 4.0), "
             "{B!r}) / power((1 + {e!r} * sin({p})) "
             "/ (1 - {e!r} * sin({p})), {eB2!r})) - pi() / 4.0))"
             ).format(t0=self.t0, p=p, B=B, e=e, eB2=e * B / 2.0)
        v = "({B!r} * ({l0!r} - radians({lon})))".format(
            B=B, l0=self.l0, lon=lon)
        t_cap = ("asin({cac!r} * sin({u}) + {sac!r} * cos({u}) "
                 "* cos({v}))").format(cac=math.cos(self.ac),
                                       sac=math.sin(self.ac),
                                       u=u, v=v)
        d = "asin(cos({u}) * sin({v}) / cos({t}))".format(
            u=u, v=v, t=t_cap)
        theta = "({n!r} * {d})".format(n=self.n, d=d)
        r = ("({c!r} / power(tan({t} / 2.0 + pi() / 4.0), {n!r}))"
             ).format(c=self.r0 * self.rtan, t=t_cap, n=self.n)
        xp = "({r} * cos({th}))".format(r=r, th=theta)   # southing
        yp = "({r} * sin({th}))".format(r=r, th=theta)   # westing
        x = "({x0!r} + {s!r} * {yp})".format(x0=self.x0, s=self.sign,
                                             yp=yp)
        y = "({y0!r} + {s!r} * {xp})".format(y0=self.y0, s=self.sign,
                                             xp=xp)
        return x, y

    def inverse(self, x, y):
        yp = "({s!r} * (({x}) - {x0!r}))".format(s=self.sign, x=x,
                                                 x0=self.x0)
        xp = "({s!r} * (({y}) - {y0!r}))".format(s=self.sign, y=y,
                                                 y0=self.y0)
        rp = "sqrt({xp} * {xp} + {yp} * {yp})".format(xp=xp, yp=yp)
        dp = "(atan2({yp}, {xp}) / {n!r})".format(yp=yp, xp=xp,
                                                  n=self.n)
        t_cap = ("(2.0 * (atan(power({c!r} / {rp}, {invn!r})) "
                 "- pi() / 4.0))").format(c=self.r0 * self.rtan,
                                          rp=rp, invn=1.0 / self.n)
        # careful: tan(π/4+φP/2)^n folded into c — invert r relation:
        # tan(T/2+π/4) = (r0·rtan/r')^(1/n)
        u = ("asin({cac!r} * sin({t}) - {sac!r} * cos({t}) "
             "* cos({d}))").format(cac=math.cos(self.ac),
                                   sac=math.sin(self.ac),
                                   t=t_cap, d=dp)
        v = "asin(cos({t}) * sin({d}) / cos({u}))".format(
            t=t_cap, d=dp, u=u)
        lon = "degrees({l0!r} - {v} / {B!r})".format(
            l0=self.l0, v=v, B=self.B)
        # t(φ) = (t0 / tan(U/2+π/4))^(1/B) → χ → conformal series
        t = "power({t0!r} / tan({u} / 2.0 + pi() / 4.0), {invB!r})" \
            .format(t0=self.t0, u=u, invB=1.0 / self.B)
        chi = "(pi() / 2 - 2 * atan({t}))".format(t=t)
        return lon, _conformal_lat_sql(chi, self.e2)


class _Datum:
    """7-parameter datum shift in the geodetic domain (linearized
    Molodensky with the rotation/scale differentials of the
    position-vector Helmert, EPSG 9606 small-angle convention),
    wrapped around an inner projection whose datum is not WGS84.

    Forward: WGS84 (φ, λ) gains the correction (dφ, dλ) computed from
    the Cartesian differential dX = t + (s−1)·X + R·X evaluated at
    X(φ, λ, h=0), projected back through dφ = (−sinφcosλ·dX −
    sinφsinλ·dY + cosφ·dZ + (a·df + f·da)·sin2φ)/M and dλ = (−sinλ·dX
    + cosλ·dY)/(N·cosφ) — then the inner forward runs on the shifted
    coordinates.  Inverse applies the negated parameters after the
    inner inverse.  Why not exact XYZ→Helmert→Bowring: these SQL
    transforms compose TEXTUALLY (the shared-string oracle contract),
    and the Bowring chain re-expands its inputs ~180×, which explodes
    megabyte-scale once nested inside a TM series; the linearized
    form differs from the exact Helmert by CENTIMETERS for real
    national parameter sets (measured vs an exact geocentric model,
    tools/hunts/hunt_datum.py: OSGB36 0.06 m, ED50 0.04 m) and stays
    under 0.5 m across the whole ±500 m / ±5″ / ±10 ppm parameter
    envelope — far under the ~2-5 m accuracy class of any
    grid-file-free national-datum shift (the reference's pyproj
    without NTv2/OSTN grids is in the same class)."""

    def __init__(self, inner, helmert, ellipsoid):
        tx, ty, tz, rx, ry, rz, ppm = (float(v) for v in helmert)
        arc = math.pi / (180.0 * 3600.0)
        self.inner = inner
        self.fwd = (tx, ty, tz, rx * arc, ry * arc, rz * arc,
                    ppm * 1e-6)
        self.inv = tuple(-v for v in self.fwd)
        a1, f1 = _a_f("WGS84")
        a2, f2 = _a_f(ellipsoid)
        self.src = (a1, f1 * (2.0 - f1), f1)
        self.dst = (a2, f2 * (2.0 - f2), f2)

    @staticmethod
    def _shift(lat, lon, params, src, dst):
        """Degrees-SQL (lat', lon') on the ``dst`` datum after the
        linearized shift ``params`` applied on the ``src`` datum."""
        a1, e21, f1 = src
        a2, e22, f2 = dst
        tx, ty, tz, rx, ry, rz, ds = params
        da, df = a2 - a1, f2 - f1
        p = "radians({})".format(lat)
        l = "radians({})".format(lon)
        w = "sqrt(1.0 - {e2!r} * sin({p}) * sin({p}))".format(
            e2=e21, p=p)
        nu = "({a!r} / {w})".format(a=a1, w=w)
        rho = "({c!r} / ({w} * {w} * {w}))".format(c=a1 * (1.0 - e21),
                                                   w=w)
        X = "({nu} * cos({p}) * cos({l}))".format(nu=nu, p=p, l=l)
        Y = "({nu} * cos({p}) * sin({l}))".format(nu=nu, p=p, l=l)
        Z = "({c!r} * {nu} * sin({p}))".format(c=1.0 - e21, nu=nu, p=p)
        dX = "({tx!r} + {ds!r} * {X} - {rz!r} * {Y} + {ry!r} * {Z})" \
            .format(tx=tx, ds=ds, X=X, Y=Y, Z=Z, rz=rz, ry=ry)
        dY = "({ty!r} + {rz!r} * {X} + {ds!r} * {Y} - {rx!r} * {Z})" \
            .format(ty=ty, ds=ds, X=X, Y=Y, Z=Z, rz=rz, rx=rx)
        dZ = "({tz!r} - {ry!r} * {X} + {rx!r} * {Y} + {ds!r} * {Z})" \
            .format(tz=tz, ds=ds, X=X, Y=Y, Z=Z, rx=rx, ry=ry)
        dphi = ("((0.0 - sin({p}) * cos({l}) * {dX} - sin({p}) "
                "* sin({l}) * {dY} + cos({p}) * {dZ} + {c!r} "
                "* sin(2.0 * {p})) / {rho})").format(
            p=p, l=l, dX=dX, dY=dY, dZ=dZ,
            c=a1 * df + f1 * da, rho=rho)
        dlam = ("((0.0 - sin({l}) * {dX} + cos({l}) * {dY}) "
                "/ ({nu} * cos({p})))").format(l=l, dX=dX, dY=dY,
                                              nu=nu, p=p)
        return ("({} + degrees({}))".format(lat, dphi),
                "({} + degrees({}))".format(lon, dlam))

    def forward(self, lat, lon):
        lat2, lon2 = self._shift(lat, lon, self.fwd, self.src, self.dst)
        return self.inner.forward(lat2, lon2)

    def inverse(self, x, y):
        lon2, lat2 = self.inner.inverse(x, y)
        lat3, lon3 = self._shift(lat2, lon2, self.inv, self.dst,
                                 self.src)
        return lon3, lat3


class _Unit:
    """Axis-unit wrapper (``+units=`` / ``+to_meter=``, round 15):
    grids whose published axes are in feet (every US state-plane ftUS
    code).  PROJ semantics: the false easting/northing apply in
    METERS, then the whole output divides by ``to_meter`` — so the
    scale wraps the complete metric projection, forward dividing and
    inverse multiplying.  Datum staging passes through: ``inner``
    re-wraps the datum's inner projection so ``_transform_stages``
    still splits shift and projection into separate plan stages."""

    def __init__(self, base, to_meter):
        self.base = base
        self.to_meter = float(to_meter)

    @property
    def inner(self):
        inner = getattr(self.base, "inner", None)
        if inner is None:
            return None
        return _Unit(inner, self.to_meter)

    def __getattr__(self, name):
        # the datum-staging attributes (_shift/fwd/inv/src/dst) and
        # anything else forward to the wrapped projection
        return getattr(self.base, name)

    def forward(self, lat, lon):
        x, y = self.base.forward(lat, lon)
        k = repr(1.0 / self.to_meter)
        return ("(({}) * {})".format(x, k),
                "(({}) * {})".format(y, k))

    def inverse(self, x, y):
        m = repr(self.to_meter)
        return self.base.inverse("(({}) * {})".format(x, m),
                                 "(({}) * {})".format(y, m))


_REGISTRY = {}

_KINDS = {"lcc": _Lcc, "albers": _Albers, "stereographic": _PolarStereo,
          "laea": _Laea, "tmerc": _Tmerc, "omerc": _Omerc,
          "krovak": _Krovak, "merc": _Merc}


def register_projected_crs(code, kind, *, lat0=0.0, lon0=0.0, lat1=None,
                           lat2=None, lat_ts=None, x0=0.0, y0=0.0,
                           k0=1.0, alpha=None, gamma=None,
                           ellipsoid="WGS84", south=False,
                           helmert=None, to_meter=None):
    """Register a projected CRS of a supported family so the engine's
    closed-form SQL machinery (Reproject, raster warp, request
    projection) covers it — parameters straight off the EPSG/proj
    definition.  kind: 'lcc' | 'albers' | 'stereographic' | 'laea' |
    'tmerc' | 'omerc' (Hotine azimuth-center, 9815 — ``lon0`` is the
    center longitude, ``alpha`` the center azimuth, ``gamma`` the
    rectified grid angle, default ``alpha``).  ``helmert=(tx, ty, tz,
    rx", ry", rz", ppm)`` wraps the projection in a WGS84→datum
    7-parameter shift (position-vector convention) for grids whose
    datum is not WGS84-coincident (OSGB36, the Bessel grids).

    Accuracy envelope (measured by a randomized forward∘inverse hunt
    over 20 random registrations x 8 points per family, round 12):
    within ±3° of the projection center/meridian every family
    round-trips below 5 mm; tmerc's truncated inverse series grows to
    ~2.5 cm at ±6° from the central meridian — use the proper zone
    (UTM zones are ±3°) or a neighboring registration for wider
    extents."""
    code = str(code).upper()
    if kind in ("lcc", "albers"):
        if lat1 is None:
            raise ValueError("{} needs lat1/lat2".format(kind))
        proj = _KINDS[kind](lat0, lon0, lat1,
                            lat2 if lat2 is not None else lat1,
                            x0, y0, ellipsoid)
    elif kind == "stereographic":
        proj = _PolarStereo(lat_ts if lat_ts is not None else lat0,
                            lon0, x0, y0, ellipsoid, south)
    elif kind == "laea":
        proj = _Laea(lat0, lon0, x0, y0, ellipsoid)
    elif kind == "tmerc":
        proj = _Tmerc(lat0, lon0, k0, x0, y0, ellipsoid)
    elif kind == "omerc":
        if alpha is None:
            raise ValueError("omerc needs alpha (center azimuth)")
        proj = _Omerc(lat0, lon0, alpha,
                      gamma if gamma is not None else alpha,
                      k0, x0, y0, ellipsoid)
    elif kind == "merc":
        proj = _Merc(lat_ts if lat_ts is not None else 0.0, lon0, k0,
                     x0, y0, ellipsoid)
    elif kind == "krovak":
        if alpha is None or lat1 is None:
            raise ValueError("krovak needs alpha (cone-axis azimuth) "
                             "and lat1 (pseudo standard parallel)")
        proj = _Krovak(lat0, lon0, alpha, lat1, k0, x0, y0, ellipsoid)
    else:
        raise ValueError("unknown projection kind {!r}".format(kind))
    if helmert is not None:
        proj = _Datum(proj, helmert, ellipsoid)
    if to_meter is not None and float(to_meter) != 1.0:
        proj = _Unit(proj, to_meter)
    _REGISTRY[code] = proj
    return proj


def projected_crs(code):
    """The registered projection for ``code``, or None.  Codes absent
    from the runtime registry fall back to the BUNDLED public EPSG
    parameter table (epsg_table.py, round 15) and auto-register on
    first use through the proj4 path — the high-traffic state-plane/
    national-grid codes work out of the box, exactly like the
    reference's get_sr accepts any EPSG input (reference
    utils.py:397)."""
    code = str(code).upper()
    proj = _REGISTRY.get(code)
    if proj is None:
        from dask_geomodeling_spark.geometry.epsg_table import (
            EPSG_PROJ4)
        p4 = EPSG_PROJ4.get(code)
        if p4 is not None:
            proj = register_crs_from_proj4(code, p4)
    return proj


#: +ellps= name → ELLIPSOIDS key
_PROJ4_ELLPS = {"WGS84": "WGS84", "GRS80": "GRS80", "airy": "airy1830",
                "mod_airy": "airy_mod", "bessel": "bessel1841",
                "intl": "intl1924", "clrk66": "clarke1866"}

#: +proj= name → registry kind
_PROJ4_KINDS = {"lcc": "lcc", "aea": "albers", "stere": "stereographic",
                "laea": "laea", "tmerc": "tmerc", "utm": "tmerc",
                "omerc": "omerc", "somerc": "omerc",
                "krovak": "krovak", "merc": "merc"}


def register_crs_from_proj4(code, proj4):
    """Register a CRS from its proj4/PROJ parameter string — the
    definition format users actually carry around (``+proj=lcc
    +lat_1=… +ellps=GRS80 +towgs84=…``).  Supports the closed-form
    families of this registry (+proj= lcc | aea | stere | laea |
    tmerc | utm); +towgs84 (datum→WGS84, position-vector) becomes the
    linearized-Molodensky datum wrapper with the parameters negated
    (our shift runs WGS84→datum).  Raises NotImplementedError for an
    unsupported +proj and ValueError for an unknown +ellps."""
    params = {}
    for tok in str(proj4).split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            params[k] = v
        else:
            params[tok] = True
    proj = params.get("proj")
    if proj not in _PROJ4_KINDS:
        raise NotImplementedError(
            "+proj={} is not a supported closed-form family "
            "(supported: {})".format(proj, sorted(_PROJ4_KINDS)))
    ellps = params.get("ellps", params.get("datum", "WGS84"))
    if ellps not in _PROJ4_ELLPS:
        raise ValueError("unknown +ellps={} (supported: {})".format(
            ellps, sorted(_PROJ4_ELLPS)))
    kw = {"ellipsoid": _PROJ4_ELLPS[ellps]}

    def num(name, default=None):
        v = params.get(name)
        return default if v is None else float(v)

    if proj == "utm":
        zone = int(params["zone"])
        kw.update(lat0=0.0, lon0=zone * 6 - 183, k0=0.9996,
                  x0=500000.0,
                  y0=10000000.0 if params.get("south") else 0.0)
    else:
        kw.update(lat0=num("lat_0", 0.0), lon0=num("lon_0", 0.0),
                  x0=num("x_0", 0.0), y0=num("y_0", 0.0))
        if proj in ("lcc", "aea"):
            kw.update(lat1=num("lat_1"), lat2=num("lat_2"))
        if proj == "stere":
            kw.update(lat_ts=num("lat_ts", num("lat_0", 90.0)),
                      south=num("lat_0", 90.0) < 0)
        if proj == "tmerc":
            kw.update(k0=num("k_0", num("k", 1.0)))
        if proj in ("omerc", "somerc"):
            # somerc (Swiss) = Hotine 9815 with azimuth 90
            kw.update(lon0=num("lonc", num("lon_0", 0.0)),
                      alpha=num("alpha", 90.0),
                      gamma=num("gamma", num("alpha", 90.0)),
                      k0=num("k_0", num("k", 1.0)))
        if proj == "merc":
            kw.update(lat_ts=num("lat_ts", 0.0),
                      k0=num("k_0", num("k", 1.0)))
        if proj == "krovak":
            kw.update(lat0=num("lat_0", 49.5),
                      lon0=num("lon_0", 24.0 + 50.0 / 60),
                      alpha=num("alpha",
                                30.0 + 17.0 / 60 + 17.3031 / 3600),
                      lat1=num("lat_1", 78.5),
                      k0=num("k_0", num("k", 0.9999)))
    if "towgs84" in params:
        vals = [float(v) for v in str(params["towgs84"]).split(",")]
        vals += [0.0] * (7 - len(vals))
        if any(vals):
            kw["helmert"] = tuple(-v for v in vals)
    if "to_meter" in params:
        kw["to_meter"] = float(params["to_meter"])
    elif "units" in params and params["units"] is not True:
        unit = str(params["units"])
        to_m = {"m": 1.0, "us-ft": 1200.0 / 3937.0,
                "ft": 0.3048}.get(unit)
        if to_m is None:
            raise NotImplementedError(
                "+units={} not supported (m, ft, us-ft)".format(unit))
        kw["to_meter"] = to_m
    return register_projected_crs(code, _PROJ4_KINDS[proj], **kw)


# ---- built-in registrations (parameters from the EPSG registry) ----------

register_projected_crs("EPSG:2154", "lcc", lat0=46.5, lon0=3.0,
                       lat1=49.0, lat2=44.0, x0=700000.0, y0=6600000.0,
                       ellipsoid="GRS80")  # RGF93 / Lambert-93
register_projected_crs("EPSG:3978", "lcc", lat0=49.0, lon0=-95.0,
                       lat1=49.0, lat2=77.0, ellipsoid="GRS80"
                       )  # NAD83 / Canada Atlas Lambert
register_projected_crs("EPSG:5070", "albers", lat0=23.0, lon0=-96.0,
                       lat1=29.5, lat2=45.5, ellipsoid="GRS80"
                       )  # NAD83 / CONUS Albers
register_projected_crs("EPSG:3035", "laea", lat0=52.0, lon0=10.0,
                       x0=4321000.0, y0=3210000.0, ellipsoid="GRS80"
                       )  # ETRS89-extended / LAEA Europe
register_projected_crs("EPSG:3413", "stereographic", lat_ts=70.0,
                       lon0=-45.0, ellipsoid="WGS84"
                       )  # WGS84 / NSIDC Sea Ice Polar Stereo North
register_projected_crs("EPSG:3976", "stereographic", lat_ts=-70.0,
                       lon0=0.0, ellipsoid="WGS84", south=True
                       )  # WGS84 / NSIDC Sea Ice Polar Stereo South
register_projected_crs("EPSG:27700", "tmerc", lat0=49.0, lon0=-2.0,
                       k0=0.9996012717, x0=400000.0, y0=-100000.0,
                       ellipsoid="airy1830",
                       helmert=(-446.448, 125.157, -542.060, -0.1502,
                                -0.2470, -0.8421, 20.4894)
                       )  # OSGB36 / British National Grid (Helmert
                          # class, ~2-5 m vs the OSTN15 grid solution)
register_projected_crs("EPSG:25832", "tmerc", lat0=0.0, lon0=9.0,
                       k0=0.9996, x0=500000.0, y0=0.0,
                       ellipsoid="GRS80"
                       )  # ETRS89 / UTM zone 32N (the German-Nordic
                          # standard grid; ETRS89 ≈ WGS84)
register_projected_crs("EPSG:3395", "merc"
                       )  # WGS84 / World Mercator (ellipsoidal)
register_projected_crs("EPSG:5514", "krovak", lat0=49.5,
                       lon0=24.0 + 50.0 / 60,  # 42°30' E of Ferro
                       alpha=30.0 + 17.0 / 60 + 17.3031 / 3600,
                       lat1=78.5, k0=0.9999, ellipsoid="bessel1841",
                       helmert=(-589.0, -76.0, -480.0, 0.0, 0.0, 0.0,
                                0.0)
                       )  # S-JTSK / Krovak East North (EPSG method
                          # 1041 axes; GN7-2 worked example to the cm)
register_projected_crs("EPSG:2056", "omerc",
                       lat0=46.0 + 57.0 / 60 + 8.66 / 3600,
                       lon0=7.0 + 26.0 / 60 + 22.5 / 3600,
                       alpha=90.0, gamma=90.0, k0=1.0,
                       x0=2600000.0, y0=1200000.0,
                       ellipsoid="bessel1841",
                       helmert=(-674.374, -15.056, -405.346,
                                0.0, 0.0, 0.0, 0.0)
                       )  # CH1903+ / LV95 (Swiss national grid —
                          # EPSG models it as Hotine 9815 on Bessel;
                          # towgs84 674.374,15.056,405.346 negated to
                          # the WGS84->CH1903+ direction)
