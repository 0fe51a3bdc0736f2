"""The 7-parameter datum shift (_Datum: linearized Molodensky with
position-vector Helmert differentials) vs the EXACT geocentric path
(geodetic -> XYZ on WGS84 -> exact Helmert -> iterative Bowring on the
target ellipsoid) in pure python — random realistic parameters
(translations to ±500 m, rotations to ±5", scale to ±10 ppm) over
random points at |lat| <= 80.  The class docstring claims the
linearized form 'differs from the exact Helmert by centimeters'; the
hunt measures the actual envelope and fails past 0.5 m.  Also checks
forward∘inverse of the datum-wrapped projection returns the input to
the same class."""
import math
import os
import random
import sys

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.proj_ext import (  # noqa: E402
    _a_f, _Datum)

ARC = math.pi / (180.0 * 3600.0)


def exact_shift(lat, lon, helmert, dst_name):
    """WGS84 (lat, lon, h=0) -> exact position-vector Helmert ->
    geodetic on dst (iterative Bowring-style)."""
    tx, ty, tz, rxs, rys, rzs, ppm = helmert
    rx, ry, rz = rxs * ARC, rys * ARC, rzs * ARC
    s = 1.0 + ppm * 1e-6
    a1, f1 = _a_f("WGS84")
    e21 = f1 * (2.0 - f1)
    p, l = math.radians(lat), math.radians(lon)
    nu = a1 / math.sqrt(1.0 - e21 * math.sin(p) ** 2)
    X = nu * math.cos(p) * math.cos(l)
    Y = nu * math.cos(p) * math.sin(l)
    Z = nu * (1.0 - e21) * math.sin(p)
    # position-vector convention (EPSG 9606)
    X2 = tx + s * (X - rz * Y + ry * Z)
    Y2 = ty + s * (rz * X + Y - rx * Z)
    Z2 = tz + s * (-ry * X + rx * Y + Z)
    a2, f2 = _a_f(dst_name)
    e22 = f2 * (2.0 - f2)
    lon2 = math.atan2(Y2, X2)
    pr = math.hypot(X2, Y2)
    lat2 = math.atan2(Z2, pr * (1.0 - e22))
    for _ in range(8):
        nu2 = a2 / math.sqrt(1.0 - e22 * math.sin(lat2) ** 2)
        lat2 = math.atan2(Z2 + e22 * nu2 * math.sin(lat2), pr)
    return math.degrees(lat2), math.degrees(lon2)


class _Identity:
    def forward(self, lat, lon):
        return lon, lat       # emit (x, y) = (lon', lat')

    def inverse(self, x, y):
        return x, y


rng = random.Random(1311)
cases = []
for trial in range(40):
    helm = (rng.uniform(-500, 500), rng.uniform(-500, 500),
            rng.uniform(-500, 500), rng.uniform(-5, 5),
            rng.uniform(-5, 5), rng.uniform(-5, 5),
            rng.uniform(-10, 10))
    dst = rng.choice(["airy1830", "bessel1841", "intl1924",
                      "clarke1866", "GRS80"])
    lat = rng.uniform(-80, 80)
    lon = rng.uniform(-179, 179)
    cases.append((helm, dst, lat, lon))
# classic real parameter sets
cases.append(((-446.448, 125.157, -542.060, -0.1502, -0.2470,
               -0.8421, 20.4894), "airy1830", 52.0, -1.5))   # OSGB36
cases.append(((-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0),
              "intl1924", 48.0, 7.0))                        # ED50ish

fails = 0
worst = 0.0
for helm, dst, lat, lon in cases:
    d = _Datum(_Identity(), helm, dst)
    xs, ys = d.forward(repr(lat), repr(lon))
    row = spark.sql("SELECT {} AS x, {} AS y".format(xs, ys)).first()
    lat_i, lon_i = row["y"], row["x"]
    lat_e, lon_e = exact_shift(lat, lon, helm, dst)
    a2, f2 = _a_f(dst)
    dlat_m = abs(lat_i - lat_e) * math.pi / 180.0 * a2
    dlon_m = (abs(lon_i - lon_e) * math.pi / 180.0 * a2
              * math.cos(math.radians(lat)))
    err = math.hypot(dlat_m, dlon_m)
    worst = max(worst, err)
    if err > 0.5:
        fails += 1
        print("DATUM FAIL", dst, helm, (lat, lon), "err_m",
              round(err, 3))
        if fails >= 5:
            break
    # roundtrip: forward then inverse returns the input (same class)
    xs2, ys2 = d.inverse(xs, ys)
    r2 = spark.sql("SELECT {} AS lon, {} AS lat".format(xs2, ys2)) \
        .first()
    rt = math.hypot((r2["lat"] - lat) * math.pi / 180 * a2,
                    (r2["lon"] - lon) * math.pi / 180 * a2
                    * math.cos(math.radians(lat)))
    if rt > 0.5:
        fails += 1
        print("ROUNDTRIP FAIL", dst, helm, (lat, lon), "err_m",
              round(rt, 3))
print("DONE fails:", fails, "worst linearization error:",
      round(worst, 4), "m over", len(cases), "cases")
