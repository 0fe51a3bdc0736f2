"""Arc/Info ASCII Grid source tests (round 15 — the next container
off the reference's GDAL ingest list after classic NetCDF)."""
import pytest


def test_aaigrid_codec_roundtrip(tmp_path):
    from dask_geomodeling_spark.raster.aaigrid import (parse_aaigrid,
                                                       write_aaigrid)
    vals = [float(i) if i % 5 else -9999.0 for i in range(12)]
    p = str(tmp_path / "a.asc")
    write_aaigrid(p, 4, 3, vals, xllcorner=100.0, yllcorner=200.0,
                  cellsize=2.0, nodata=-9999.0)
    w, h, got, nd, gt = parse_aaigrid(open(p).read())
    assert (w, h, nd) == (4, 3, -9999.0)
    assert got == vals
    # geotransform: top-left origin (yll + nrows*cellsize)
    assert gt == (100.0, 2.0, 206.0, 2.0)
    # center-flavor header shifts by half a cell to the same corner
    write_aaigrid(p, 4, 3, vals, xllcorner=100.0, yllcorner=200.0,
                  cellsize=2.0, center=True)
    w, h, got2, nd2, gt2 = parse_aaigrid(open(p).read())
    assert gt2 == gt and got2 == vals and nd2 is None
    # case-insensitive header keys (wild files mix cases)
    txt = ("NCOLS 2\nNROWS 1\nXLLCORNER 0\nYLLCORNER 0\n"
           "CELLSIZE 1\nNODATA_VALUE -1\n3 -1\n")
    assert parse_aaigrid(txt) == (2, 1, [3.0, -1.0], -1.0,
                                  (0.0, 1.0, 1.0, 1.0))


def test_aaigrid_refusals():
    from dask_geomodeling_spark.raster.aaigrid import parse_aaigrid
    with pytest.raises(ValueError, match="missing header"):
        parse_aaigrid("1 2 3 4")
    with pytest.raises(ValueError, match="promises"):
        parse_aaigrid("ncols 3\nnrows 2\nxllcorner 0\nyllcorner 0\n"
                      "cellsize 1\n1 2 3 4 5\n")


def test_aaigrid_spark_source(spark, tmp_path):
    """Multi-file time bands by sorted path, nodata -> NULL, world
    coordinates from the header geotransform; time request bounds
    prune bands."""
    from datetime import timedelta

    from dask_geomodeling_spark.raster.aaigrid import (
        AAIGridRasterSource, write_aaigrid)
    w, h = 5, 3
    for band in range(3):
        vals = [float(band * 100 + i) if i % 7 else -1.0
                for i in range(w * h)]
        write_aaigrid(str(tmp_path / ("b%d.asc" % band)), w, h, vals,
                      xllcorner=10.0, yllcorner=20.0, cellsize=0.5,
                      nodata=-1.0)
    src = AAIGridRasterSource(str(tmp_path) + "/*.asc",
                              time_delta=timedelta(hours=1))
    rows = src.plan(spark).collect()
    assert len(rows) == 3 * w * h
    assert len({r["time"] for r in rows}) == 3
    b1 = {(r["y"], r["x"]): r for r in rows if r["time"].hour == 1}
    assert b1[(0, 0)]["value"] is None          # i=0 nodata
    assert b1[(0, 1)]["value"] == 101.0
    assert b1[(0, 1)]["wx"] == 10.0 + 1.5 * 0.5
    assert b1[(0, 1)]["wy"] == 20.0 + (3 - 0.5) * 0.5
    got = src.plan(spark, start="1970-01-01 01:00:00").collect()
    assert len(got) == 2 * w * h


def test_aaigrid_compat_routing(spark, tmp_path):
    from dask_geomodeling_spark.core import construct
    from dask_geomodeling_spark.raster.aaigrid import write_aaigrid
    p = str(tmp_path / "r.asc")
    write_aaigrid(p, 4, 2, [float(i) for i in range(8)])
    blk = construct({"s": ["dask_geomodeling.raster.RasterFileSource",
                           p, 0, 3600000]}, "s")
    assert blk.plan(spark).count() == 8
