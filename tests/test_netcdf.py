"""Classic-NetCDF (CDF-1/CDF-2) source tests (round 15, r14 verdict
#2): codec roundtrips across versions x record layouts x types x CF
packing, CF time-axis parsing, the Spark source block, and the compat
routing."""
import os

import pytest


def _bands(w, h, nt, nc_type, fill=None, plus=0.0):
    out = []
    for t in range(nt):
        b = []
        for i in range(w * h):
            v = t * 100 + i
            if fill is not None and i % 7 == 0:
                b.append(fill)
            else:
                b.append(float(v) + plus if nc_type >= 5 else v)
        out.append(b)
    return out


def test_netcdf_codec_roundtrips(tmp_path):
    from dask_geomodeling_spark.raster.netcdf import (
        decode_netcdf_grid, write_netcdf)
    w, h, nt = 6, 4, 3
    cases = [
        dict(version=1, record_time=True, nc_type=5),
        dict(version=2, record_time=True, nc_type=6),
        dict(version=1, record_time=False, nc_type=4),
        dict(version=2, record_time=False, nc_type=3,
             scale=0.5, offset=100.0, fill=-32768),
        dict(version=1, record_time=True, nc_type=3,
             scale=0.25, offset=-10.0, fill=-999,
             time_units="days since 2020-01-01"),
    ]
    for case, kw in enumerate(cases):
        bands = _bands(w, h, nt, kw["nc_type"], kw.get("fill"))
        p = str(tmp_path / ("c%d.nc" % case))
        write_netcdf(p, w, h, bands, **kw)
        times_us, hh, ww, got, xs, ys = decode_netcdf_grid(
            open(p, "rb").read())
        assert (hh, ww) == (h, w), case
        sc, off, fill = (kw.get("scale"), kw.get("offset"),
                         kw.get("fill"))
        for t in range(nt):
            for i in range(w * h):
                raw = bands[t][i]
                if fill is not None and raw == fill:
                    want = None
                elif sc is not None or off is not None:
                    want = raw * (sc or 1.0) + (off or 0.0)
                else:
                    want = float(raw)
                assert got[t][i] == want, (case, t, i)
        assert xs == [x + 0.5 for x in range(w)]
        assert ys == [y + 0.5 for y in range(h)]
        assert len(times_us) == nt


def test_netcdf_cf_time_axis():
    from dask_geomodeling_spark.raster.netcdf import cf_time_to_us
    assert cf_time_to_us([0, 1], "hours since 1970-01-01") == [
        0, 3600000000]
    # 2000-01-01 12:00 UTC = 946728000 s; +1.5 days = +129600 s
    assert cf_time_to_us([1.5], "days since 2000-01-01 12:00:00") == [
        (946728000 + 129600) * 1000000]
    # T/Z-separated reference instants parse
    a = cf_time_to_us([0], "seconds since 2020-01-01T06:30:00Z")[0]
    b = cf_time_to_us([0], "seconds since 2020-01-01 06:30:00")[0]
    assert a == b
    with pytest.raises(ValueError, match="interval"):
        cf_time_to_us([0], "months since 2020-01-01")
    with pytest.raises(ValueError, match="units"):
        cf_time_to_us([0], "furlongs per fortnight")


def test_netcdf_refusals(tmp_path):
    from dask_geomodeling_spark.raster.netcdf import (
        decode_netcdf_grid, parse_netcdf, write_netcdf)
    with pytest.raises(ValueError, match="NetCDF-4"):
        parse_netcdf(b"\x89HDF\r\n\x1a\n" + b"\0" * 64)
    with pytest.raises(ValueError, match="not a classic"):
        parse_netcdf(b"PK\x03\x04" + b"\0" * 64)
    p = str(tmp_path / "v.nc")
    write_netcdf(p, 4, 3, [[float(i) for i in range(12)]])
    blob = open(p, "rb").read()
    with pytest.raises(ValueError, match="not in file"):
        decode_netcdf_grid(blob, "nope")


def test_netcdf_spark_source(spark, tmp_path):
    """The Spark block: multi-file glob, per-file CF time axes, fill
    -> NULL, packed unpacking, wx/wy from coordinate variables."""
    from dask_geomodeling_spark.raster.netcdf import (
        NetCDFRasterSource, write_netcdf)
    w, h = 5, 3
    write_netcdf(str(tmp_path / "a.nc"), w, h,
                 _bands(w, h, 2, 3, fill=-1), nc_type=3, fill=-1,
                 scale=2.0, offset=1.0)
    write_netcdf(str(tmp_path / "b.nc"), w, h,
                 _bands(w, h, 1, 6, plus=0.5), version=2,
                 nc_type=6, time_vals=[48.0],
                 xs=[10.0 + i for i in range(w)],
                 ys=[20.0 + i for i in range(h)])
    df = NetCDFRasterSource(str(tmp_path) + "/*.nc").plan(spark)
    rows = df.collect()
    assert len(rows) == 3 * w * h
    times = sorted({r["time"].isoformat() for r in rows})
    assert [t[:13] for t in times] == [
        "1970-01-01T00", "1970-01-01T01", "1970-01-03T00"]
    a0 = {(r["y"], r["x"]): r for r in rows
          if r["time"].hour == 0 and r["time"].day == 1}
    assert a0[(0, 0)]["value"] is None          # fill
    assert a0[(0, 1)]["value"] == 1 * 2.0 + 1.0  # packed
    assert a0[(0, 1)]["wx"] == 1.5               # default coords
    b0 = {(r["y"], r["x"]): r for r in rows if r["time"].day == 3}
    assert b0[(1, 2)]["value"] == float(1 * w + 2) + 0.5
    assert b0[(1, 2)]["wx"] == 12.0 and b0[(1, 2)]["wy"] == 21.0
    # time request bounds prune bands
    got = NetCDFRasterSource(str(tmp_path) + "/*.nc").plan(
        spark, start="1970-01-01 00:30:00").collect()
    assert len(got) == 2 * w * h


def test_netcdf_compat_routing(spark, tmp_path):
    """Reference RasterFileSource graphs pointing at .nc construct
    through compat and read via the classic-NetCDF block."""
    from dask_geomodeling_spark.core import construct
    from dask_geomodeling_spark.raster.netcdf import write_netcdf
    p = str(tmp_path / "r.nc")
    write_netcdf(p, 4, 2, [[float(i) for i in range(8)]])
    graph = {"source": ["dask_geomodeling.raster.RasterFileSource",
                        p, 0, 3600000]}
    block = construct(graph, "source")
    assert block.plan(spark).count() == 8


def test_netcdf_nan_fill_and_offset_instants(tmp_path):
    """r15 review: NaN _FillValue matches via isnan (xarray's float
    default), and CF reference instants with numeric UTC offsets
    (the CF document's own udunits example) parse."""
    import math

    from dask_geomodeling_spark.raster.netcdf import (cf_time_to_us,
                                                      decode_netcdf_grid,
                                                      write_netcdf)
    nan = float("nan")
    vals = [1.0, nan, 3.0, 4.0, nan, 6.0]
    p = str(tmp_path / "n.nc")
    write_netcdf(p, 3, 2, [vals], nc_type=6, fill=nan)
    _, _, _, got, _, _ = decode_netcdf_grid(open(p, "rb").read())
    assert got[0] == [1.0, None, 3.0, 4.0, None, 6.0]
    import datetime
    utc = datetime.timezone.utc
    want = int(datetime.datetime(1992, 10, 8, 21, 15, 42, 500000,
                                 tzinfo=utc).timestamp() * 1e6)
    got_us = cf_time_to_us(
        [0.0], "seconds since 1992-10-8 15:15:42.5 -6:00")[0]
    assert got_us == want
    assert not math.isnan(got_us)


def test_netcdf_band_meta_and_global_fallback(spark, tmp_path):
    """r15 review: files WITHOUT a CF time axis get a GLOBAL band
    index over (path, band) — two axis-less files must not collide on
    identical timestamps; netcdf_band_meta reads only the header."""
    from datetime import timedelta

    from dask_geomodeling_spark.raster.netcdf import (
        NetCDFRasterSource, netcdf_band_meta, write_netcdf)
    from dask_geomodeling_spark.raster.sources import _open_seekable
    w, h = 4, 2
    for name, nt in (("a.nc", 2), ("b.nc", 3)):
        write_netcdf(str(tmp_path / name), w, h,
                     [[float(k * 10 + i) for i in range(w * h)]
                      for k in range(nt)],
                     time_units=None)   # no CF axis
    with _open_seekable(str(tmp_path / "b.nc")) as f:
        assert netcdf_band_meta(f) == (3, False)
    rows = NetCDFRasterSource(
        str(tmp_path) + "/*.nc",
        time_delta=timedelta(hours=1)).plan(spark).collect()
    assert len(rows) == 5 * w * h
    times = sorted({r["time"] for r in rows})
    assert len(times) == 5   # 2 + 3 distinct bands, no collisions
    # a.nc bands come first (sorted path), each band 1 h apart
    hours = [t.hour + 24 * (t.day - 1) for t in times]
    assert hours == [0, 1, 2, 3, 4]
    # mixed case: one file WITH an axis keeps its own times
    write_netcdf(str(tmp_path / "c.nc"), w, h,
                 [[9.0] * (w * h)], time_vals=[100.0])
    rows = NetCDFRasterSource(
        str(tmp_path) + "/*.nc",
        time_delta=timedelta(hours=1)).plan(spark).collect()
    assert len({r["time"] for r in rows}) == 6
    assert any(r["time"].hour == 4 and r["time"].day == 5
               for r in rows)   # 100 h from the axis
