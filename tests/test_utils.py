"""GDAL-free utils parity (round 9): Extent/GeoTransform value types,
dtype/footprint helpers, safe path resolution — the reference's
utils.py surface users import directly."""

import math

import numpy as np
import pytest

from dask_geomodeling_spark.utils import (
    Extent, GeoTransform, TransformException, dt_to_ms, dtype_for_statistic,
    filter_none, get_dtype_max, get_dtype_min, get_footprint, get_index,
    get_int_dtype, get_projection, get_rounded_repr, get_uint_dtype,
    parse_percentile_statistic, safe_abspath, safe_file_url)


def test_dtype_helpers():
    assert get_dtype_max("u1") == 255
    assert get_dtype_min("i2") == -32768
    assert get_dtype_max("f4") == np.finfo("f4").max.item()
    assert get_int_dtype(127) == np.dtype("i1")
    assert get_int_dtype(129) == np.dtype("i2")
    assert get_uint_dtype(255) == np.dtype("u1")
    assert get_uint_dtype(257) == np.dtype("u2")
    with pytest.raises(ValueError):
        get_uint_dtype(-1)


def test_get_index_float_vs_int():
    f = np.array([1.0, -9999.0, 3.0])
    assert get_index(f, -9999.0).tolist() == [True, False, True]
    i = np.array([1, 255, 3], dtype="u1")
    assert get_index(i, 255).tolist() == [True, False, True]


def test_footprint_shape_and_symmetry():
    fp = get_footprint(5)
    assert fp.shape == (5, 5)
    assert fp[2, 2] and not fp[0, 0]
    assert (fp == fp[::-1]).all() and (fp == fp[:, ::-1]).all()
    assert get_footprint(4).shape == (5, 5)  # coerced odd


def test_rounded_repr():
    assert get_rounded_repr((1.0, 2.0)) == repr((1.0, 2.0))
    assert "rounded" in get_rounded_repr((1.23456789, 0.0))


def test_extent_basic_ops():
    e = Extent((0, 0, 4, 2), "epsg:4326")
    assert e.srs == "EPSG:4326"
    assert e.width == 4 and e.height == 2
    assert e.buffered(1).bbox == (-1, -1, 5, 3)
    assert "POLYGON ((0.0 0.0, 4.0 0.0" in e.as_wkt()
    o = Extent((2, 1, 9, 9), 4326)
    assert e.union(o).bbox == (0, 0, 9, 9)
    assert e.intersection(o).bbox == (2, 1, 4, 2)
    assert e.intersection(Extent((10, 10, 11, 11), 4326)) is None
    with pytest.raises(TransformException):
        Extent((0, 0, 1, 1), "not-a-crs")


def test_extent_transformed_roundtrip(spark):
    e = Extent((4.0, 52.0, 5.0, 53.0), "EPSG:4326")
    m = e.transformed("EPSG:3857")
    assert m.srs == "EPSG:3857"
    assert m.bbox[0] == pytest.approx(445277.963, abs=1e-2)
    back = m.transformed(4326)
    assert back.bbox == pytest.approx(e.bbox, abs=1e-6)
    assert e.transformed("EPSG:4326") is e  # same-crs short-circuit


def test_geotransform_contract():
    gt = GeoTransform.from_bbox((0.0, 0.0, 8.0, 4.0), height=4, width=8)
    assert tuple(gt) == (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    assert gt.cell_area == 1.0
    assert gt.origin == (0.0, 4.0)
    assert gt.get_bbox((0, 0), (4, 8)) == (0.0, 0.0, 8.0, 4.0)
    assert gt.shift((1, 2)).origin == (2.0, 3.0)
    assert gt.scale(2, 2).cell_area == 4.0
    i, j = gt.get_indices(np.array([[0.5, 3.5], [7.5, 0.5]]))
    assert i.tolist() == [0, 3] and j.tolist() == [0, 7]
    pts = gt.get_points(np.array([[0, 0], [3, 7]]))
    assert pts.tolist() == [[0.0, 4.0], [7.0, 1.0]]
    (i1, i2), (j1, j2) = gt.get_indices_for_bbox((1.0, 1.0, 3.0, 3.0))
    assert (i1, i2) == (1, 3) and (j1, j2) == (1, 3)
    assert gt.aligns_with(GeoTransform((100.0, 1.0, 0.0, 7.0, 0.0, -1.0)))
    assert not gt.aligns_with(GeoTransform((0.5, 1.0, 0.0, 4.0, 0.0, -1.0)))
    assert not gt.aligns_with((0.0, 2.0, 0.0, 4.0, 0.0, -2.0))
    with pytest.raises(ValueError, match="length 6"):
        GeoTransform((0, 1, 0, 0, -1))
    with pytest.raises(ValueError, match="Tilted"):
        GeoTransform((0, 1, 0.5, 0, 0.5, -1))
    with pytest.raises(ValueError, match="zero"):
        GeoTransform((0, 0, 0, 0, 0, -1))
    inv = gt.get_inverse()
    assert inv == (1.0, 0.0, 0.0, -1.0)


def test_safe_paths_and_options():
    from dask_geomodeling_spark.config import get_option, set_option
    assert safe_file_url("/a/b.txt") == "file:///a/b.txt"
    assert safe_abspath("file:///a/b.txt") == "/a/b.txt"
    with pytest.raises(NotImplementedError):
        safe_file_url("s3://bucket/key")
    with pytest.raises(IOError):
        safe_file_url("rel/path.txt")  # no root set
    old = set_option("geomodeling.root", "/data")
    try:
        assert safe_abspath("rel/path.txt") == "/data/rel/path.txt"
        set_option("geomodeling.strict-file-paths", True)
        with pytest.raises(IOError):
            safe_file_url("/etc/passwd")
        assert safe_file_url("inside.txt") == "file:///data/inside.txt"
    finally:
        set_option("geomodeling.root", old)
        set_option("geomodeling.strict-file-paths", False)
    with pytest.raises(KeyError):
        get_option("geomodeling.nonsense")


def test_misc_helpers():
    import datetime
    naive = datetime.datetime(1970, 1, 2)
    assert dt_to_ms(naive) == 86400000
    aware = datetime.datetime(1970, 1, 1,
                              tzinfo=datetime.timezone.utc)
    assert dt_to_ms(aware) == 0
    assert filter_none([1, None, 2]) == [1, 2]
    assert parse_percentile_statistic("p75") == 75.0
    assert parse_percentile_statistic("mean") is None
    assert dtype_for_statistic("u1", "max") == np.dtype("u1")
    assert dtype_for_statistic("u1", "count") == np.dtype("int32")
    assert dtype_for_statistic("u1", "mean") == np.dtype("float64")
    assert dtype_for_statistic("f4", "p50") == np.dtype("float64")
    assert get_projection(28992) == "EPSG:28992"


def test_reference_utils_paths_resolve():
    """The compat layer resolves dask_geomodeling.utils imports onto
    this module."""
    from dask_geomodeling_spark.compat import resolve_import_path
    for name in ("Extent", "GeoTransform", "TransformException",
                 "WKTReadingError"):
        cls = resolve_import_path("dask_geomodeling.utils." + name)
        import dask_geomodeling_spark.utils as u
        assert cls is getattr(u, name)
