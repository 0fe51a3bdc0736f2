"""Classic-NetCDF codec hunt (round 15): randomized roundtrips
through write_netcdf → decode_netcdf_grid across
{CDF-1, CDF-2} × {record, fixed time dim} × {short, int, float,
double} × {raw, CF-packed scale/offset} × {no fill, fill} × random
sizes and time units — exact value recovery (packed values compare as
raw*scale+offset in double), time axis to the microsecond."""
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", ".."))
import tempfile  # noqa: E402

from dask_geomodeling_spark.raster.netcdf import (  # noqa: E402
    cf_time_to_us, decode_netcdf_grid, write_netcdf)

rng = random.Random(20150815)
fails = 0
d = tempfile.mkdtemp(prefix="hunt_netcdf_")
UNITS = ["hours since 1970-01-01 00:00:00",
         "seconds since 2001-02-03 04:05:06",
         "days since 1990-06-15",
         "minutes since 2020-12-31T23:59:00Z"]

for trial in range(60):
    w, h = rng.randint(1, 24), rng.randint(1, 18)
    nt = rng.randint(1, 5)
    version = rng.choice([1, 2])
    record = rng.choice([True, False])
    nc_type = rng.choice([3, 4, 5, 6])
    packed = nc_type in (3, 4) and rng.random() < 0.7
    scale = rng.choice([0.5, 0.25, 0.1]) if packed else None
    offset = rng.choice([0.0, 100.0, -40.0]) if packed else None
    fill = rng.choice([None, -32768 if nc_type == 3 else -99999])
    units = rng.choice(UNITS)
    tvals = sorted(rng.sample(range(0, 500), nt))
    bands = []
    lim = 30000 if nc_type == 3 else 10 ** 6
    for t in range(nt):
        b = []
        for i in range(w * h):
            if fill is not None and rng.random() < 0.15:
                b.append(fill)
            elif nc_type >= 5:
                # float32-exact by quantization for nc_type 5
                v = rng.uniform(-lim, lim)
                if nc_type == 5:
                    import struct
                    v = struct.unpack("f", struct.pack("f", v))[0]
                b.append(v)
            else:
                b.append(rng.randint(-lim, lim))
        bands.append(b)
    p = os.path.join(d, "t%d.nc" % trial)
    write_netcdf(p, w, h, bands, version=version, record_time=record,
                 nc_type=nc_type, scale=scale, offset=offset,
                 fill=fill, time_units=units,
                 time_vals=[float(v) for v in tvals])
    times_us, hh, ww, got, xs, ys = decode_netcdf_grid(
        open(p, "rb").read())
    want_t = cf_time_to_us([float(v) for v in tvals], units)
    ok = (hh, ww) == (h, w) and times_us == want_t
    for t in range(nt):
        for i in range(w * h):
            raw = bands[t][i]
            if fill is not None and raw == fill:
                want = None
            elif scale is not None or offset is not None:
                want = raw * (scale or 1.0) + (offset or 0.0)
            else:
                want = float(raw)
            if got[t][i] != want:
                ok = False
                break
    if not ok:
        fails += 1
        print("ROUNDTRIP FAIL", trial, dict(
            w=w, h=h, nt=nt, version=version, record=record,
            nc_type=nc_type, scale=scale, offset=offset, fill=fill,
            units=units))

print()
if fails:
    print("FALSIFIERS:", fails)
    sys.exit(1)
print("CLEAN: 60 randomized classic-NetCDF roundtrips (versions x "
      "record layouts x types x CF packing x fills x time units) "
      "value- and time-exact")
