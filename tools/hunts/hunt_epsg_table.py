"""Bundled-EPSG-table hunt (round 15): every code in
geometry/epsg_table.py auto-registers and forward∘inverse round-trips
through the STAGED transform path (one DuckDB evaluation per stage —
the same plan shape Reproject runs), at 5 points around each
projection's own center.  Bounds: non-datum codes < 5 mm; datum
(Helmert-shifted) codes < 10 cm — the linearized-Molodensky
misclosure class for the large DHDN/CH1903/NGI translations (the
engine's documented datum accuracy envelope)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", ".."))
import duckdb  # noqa: E402

from dask_geomodeling_spark.geometry.epsg_table import EPSG_PROJ4  # noqa
from dask_geomodeling_spark.geometry.proj import _transform_stages  # noqa

con = duckdb.connect()


def ev(stages, x, y):
    for st in stages:
        sx, sy = st("CAST({!r} AS DOUBLE)".format(float(x)),
                    "CAST({!r} AS DOUBLE)".format(float(y)))
        x, y = con.execute(
            "SELECT ({}), ({})".format(sx, sy)).fetchone()
    return x, y


fails = 0
for code, p4 in sorted(EPSG_PROJ4.items()):
    params = dict(t.lstrip("+").split("=", 1)
                  for t in p4.split() if "=" in t)
    if "zone" in params:
        z = int(params["zone"])
        lon0 = z * 6 - 183
        lat0 = -30.0 if "south" in p4 else 40.0
    else:
        lon0 = float(params.get("lon_0", 0))
        lat0 = float(params.get("lat_0", 0))
        if "lat_1" in params:
            lat0 = (float(params["lat_1"])
                    + float(params.get("lat_2",
                                       params["lat_1"]))) / 2
        if "lat_ts" in params:
            lat0 = float(params["lat_ts"])
        if abs(lat0) > 85:
            lat0 = 75.0 if lat0 > 0 else -75.0
    bound = 0.10 if "towgs84" in params else 0.005
    fwd = _transform_stages("EPSG:4326", code)
    inv = _transform_stages(code, "EPSG:4326")
    worst = 0.0
    for dlat, dlon in [(0, 0), (1, 1), (-1, 2), (0.5, -2),
                       (-1.5, -1)]:
        lat, lon = lat0 + dlat, lon0 + dlon
        if abs(lat) > 89:
            continue
        px, py = ev(fwd, lon, lat)
        lon2, lat2 = ev(inv, px, py)
        worst = max(worst,
                    max(abs(lon2 - lon), abs(lat2 - lat)) * 111320.0)
    if worst >= bound:
        fails += 1
        print("ROUNDTRIP FAIL", code, round(worst, 4), "m (bound",
              bound, ")")

print()
if fails:
    print("FALSIFIERS:", fails)
    sys.exit(1)
print("CLEAN: {} bundled EPSG codes round-trip through the staged "
      "path (< 5 mm projection-only, < 10 cm datum class)".format(
          len(EPSG_PROJ4)))
