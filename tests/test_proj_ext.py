"""Parameterized projected-CRS registry (geometry/proj_ext.py).

Reference delegates all CRS to pyproj (utils.py:53–116); these pin
the closed-form conic/azimuthal families against Snyder's published
worked examples (USGS PP 1395), known landmark coordinates, origin
invariants, and roundtrip closure through the Reproject operator.
"""

import math

import pytest

from dask_geomodeling_spark.geometry.proj import (point_transform_sql,
                                                  validate_crs_pair)
from dask_geomodeling_spark.geometry.proj_ext import (
    projected_crs, register_projected_crs)


def _ev(spark, pair):
    return tuple(spark.sql("SELECT CAST({} AS DOUBLE), CAST({} AS "
                           "DOUBLE)".format(*pair)).first())


def _lit(v):
    return "CAST({!r} AS DOUBLE)".format(v)


def test_snyder_lcc_worked_example(spark):
    # Snyder p.296: Clarke 1866, phi1=33, phi2=45, phi0=23, lon0=-96,
    # point (35N, 75W) -> E=1894410.9, N=1564649.5
    p = register_projected_crs("TEST:LCCX", "lcc", lat0=23, lon0=-96,
                               lat1=33, lat2=45, ellipsoid="clarke1866")
    x, y = _ev(spark, p.forward(_lit(35.0), _lit(-75.0)))
    assert abs(x - 1894410.9) < 0.5 and abs(y - 1564649.5) < 0.5
    lon, lat = _ev(spark, p.inverse(_lit(x), _lit(y)))
    assert abs(lon + 75.0) < 1e-7 and abs(lat - 35.0) < 1e-6


def test_snyder_albers_worked_example(spark):
    # Snyder p.292: Clarke 1866, phi1=29.5, phi2=45.5, phi0=23,
    # lon0=-96, point (35N, 75W) -> E=1885472.7, N=1535925.0
    p = register_projected_crs("TEST:ALBX", "albers", lat0=23, lon0=-96,
                               lat1=29.5, lat2=45.5,
                               ellipsoid="clarke1866")
    x, y = _ev(spark, p.forward(_lit(35.0), _lit(-75.0)))
    assert abs(x - 1885472.7) < 0.5 and abs(y - 1535925.0) < 0.5
    lon, lat = _ev(spark, p.inverse(_lit(x), _lit(y)))
    assert abs(lon + 75.0) < 1e-7 and abs(lat - 35.0) < 1e-6


def test_snyder_polar_stereo_worked_example(spark):
    # Snyder p.315: International 1924, lat_ts=-71, lon0=-100,
    # point (75S, 150E) -> x=-1540033.6, y=-560526.4
    p = register_projected_crs("TEST:PSX", "stereographic",
                               lat_ts=-71.0, lon0=-100.0,
                               ellipsoid="intl1924", south=True)
    x, y = _ev(spark, p.forward(_lit(-75.0), _lit(150.0)))
    assert abs(x + 1540033.6) < 0.5 and abs(y + 560526.4) < 0.5
    lon, lat = _ev(spark, p.inverse(_lit(x), _lit(y)))
    assert abs(lon - 150.0) < 1e-6 and abs(lat + 75.0) < 1e-6


def test_lambert93_paris(spark):
    # published Lambert-93 coordinate of Notre-Dame-ish Paris
    x, y = _ev(spark, point_transform_sql(
        "EPSG:4326", "EPSG:2154", _lit(2.3522), _lit(48.8566)))
    assert abs(x - 652469.02) < 0.05 and abs(y - 6862035.26) < 0.05


def test_laea_origin_maps_to_false_origin(spark):
    x, y = _ev(spark, point_transform_sql(
        "EPSG:4326", "EPSG:3035", _lit(10.0), _lit(52.0)))
    assert abs(x - 4321000.0) < 1e-6 and abs(y - 3210000.0) < 1e-6


def test_polar_central_meridian(spark):
    # 75N on the 45W central meridian: x = 0 exactly, y < 0
    x, y = _ev(spark, point_transform_sql(
        "EPSG:4326", "EPSG:3413", _lit(-45.0), _lit(75.0)))
    assert abs(x) < 1e-9 and y < -1.6e6


@pytest.mark.parametrize("crs,lon,lat", [
    ("EPSG:2154", 2.3522, 48.8566),
    ("EPSG:3978", -106.3, 56.1),
    ("EPSG:5070", -104.99, 39.74),
    ("EPSG:3035", 13.405, 52.52),
    ("EPSG:3413", 120.0, 80.0),
    ("EPSG:3976", 10.0, -75.0),
])
def test_roundtrip_closure(spark, crs, lon, lat):
    x, y = _ev(spark, point_transform_sql(
        "EPSG:4326", crs, _lit(lon), _lit(lat)))
    lo, la = _ev(spark, point_transform_sql(
        crs, "EPSG:4326", _lit(x), _lit(y)))
    assert abs(lo - lon) < 1e-7 and abs(la - lat) < 1e-7


def test_pivot_composition_through_wgs84(spark):
    # registered grid <-> web mercator composes textually via 4326
    validate_crs_pair("EPSG:2154", "EPSG:3857")
    x, y = _ev(spark, point_transform_sql(
        "EPSG:2154", "EPSG:3857", _lit(652469.02), _lit(6862035.26)))
    # Paris web-mercator ~ (261848, 6250566)
    assert abs(x - 261848) < 20 and abs(y - 6250566) < 20


def test_reproject_operator_and_rings(spark):
    from dask_geomodeling_spark.geometry.proj import Reproject
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    df = spark.createDataFrame(
        [(1, [[2.0, 48.0], [2.1, 48.0], [2.1, 48.1], [2.0, 48.1]])],
        "id long, vertices array<array<double>>")
    block = Reproject(DataFrameSource(df), "EPSG:4326", "EPSG:2154")
    ring = block.plan(spark).first()["vertices"]
    assert all(500000 < p[0] < 900000 and 6000000 < p[1] < 7200000
               for p in ring)


def test_registration_validation():
    with pytest.raises(ValueError, match="lat1"):
        register_projected_crs("TEST:BAD", "lcc", lat0=0, lon0=0)
    with pytest.raises(ValueError, match="kind"):
        register_projected_crs("TEST:BAD2", "mercator-oblique")
    assert projected_crs("epsg:2154") is not None
    assert projected_crs("EPSG:9999") is None


def test_unsupported_crs_still_raises():
    with pytest.raises(NotImplementedError, match="register_projected"):
        validate_crs_pair("EPSG:4326", "EPSG:27200")


def test_tmerc_osgb_worked_example(spark):
    """The OS 'worked example': OSGB36 geodetic 52°39'27.2531"N,
    1°43'4.5177"E -> BNG (651409.903, 313177.270) — tests the pure
    Airy TM series without the datum shift."""
    from dask_geomodeling_spark.geometry.proj_ext import _Tmerc
    tm = _Tmerc(49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
                "airy1830")
    lat = 52.0 + 39.0 / 60 + 27.2531 / 3600
    lon = 1.0 + 43.0 / 60 + 4.5177 / 3600
    x, y = _ev(spark, tm.forward(_lit(lat), _lit(lon)))
    assert abs(x - 651409.903) < 2e-3
    assert abs(y - 313177.270) < 2e-3
    # true origin -> false origin by construction
    x0, y0 = _ev(spark, tm.forward(_lit(49.0), _lit(-2.0)))
    assert abs(x0 - 400000.0) < 1e-6 and abs(y0 + 100000.0) < 1e-6


def test_osgb_datum_shift_magnitude_and_closure(spark):
    """Full EPSG:27700 (Helmert-class datum shift): the WGS84->OSGB36
    correction is O(100 m), and forward+inverse closes to centimeters
    (the linearized-Molodensky asymmetry)."""
    p = projected_crs("EPSG:27700")
    tm = p.inner
    xw, yw = _ev(spark, p.forward(_lit(51.4778), _lit(-0.0015)))
    xn, yn = _ev(spark, tm.forward(_lit(51.4778), _lit(-0.0015)))
    shift = math.hypot(xw - xn, yw - yn)
    assert 50 < shift < 200  # the London-area OSGB36 offset ~ 110 m
    lon_b, lat_b = p.inverse(_lit(xw), _lit(yw))
    lon2, lat2 = _ev(spark, (lon_b, lat_b))
    assert abs(lon2 - (-0.0015)) < 1e-6
    assert abs(lat2 - 51.4778) < 1e-6


def test_etrs_utm_matches_builtin_utm(spark):
    """EPSG:25832 (tmerc on GRS80) vs the built-in WGS84 EPSG:32632
    closed form: sub-millimeter agreement."""
    from dask_geomodeling_spark.geometry.proj import utm_sql
    p = projected_crs("EPSG:25832")
    x1, y1 = _ev(spark, p.forward(_lit(50.5), _lit(10.2)))
    x2, y2 = _ev(spark, utm_sql(_lit(50.5), _lit(10.2), 32))
    assert abs(x1 - x2) < 1e-3 and abs(y1 - y2) < 1e-3


def test_datum_crs_reprojects_in_stages(spark):
    """The 27700 plan must materialize the datum shift as its own
    projection (two chained Projects), not one substituted mega
    expression — the codegen-blowup guard."""
    from dask_geomodeling_spark.geometry.proj import (Reproject,
                                                      _transform_stages)
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    assert len(_transform_stages("EPSG:4326", "EPSG:27700")) == 2
    assert len(_transform_stages("EPSG:27700", "EPSG:4326")) == 2
    assert len(_transform_stages("EPSG:4326", "EPSG:25832")) == 1
    df = spark.createDataFrame([(1, -0.1, 51.5)], "id long, x double, y double")
    out = Reproject(DataFrameSource(df), "EPSG:4326", "EPSG:27700") \
        .plan(spark)
    row = out.first()
    assert 520000 < row["x"] < 560000 and 160000 < row["y"] < 200000


def test_proj4_string_registration(spark):
    """register_crs_from_proj4: the proj-string front-end produces
    BIT-identical SQL to the parameter registrations."""
    from dask_geomodeling_spark.geometry.proj_ext import (
        register_crs_from_proj4)
    register_crs_from_proj4(
        "TEST:OSGB4",
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
        "+y_0=-100000 +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894 "
        "+units=m +no_defs")
    a = projected_crs("TEST:OSGB4").forward("51.5", "-0.1")
    b = projected_crs("EPSG:27700").forward("51.5", "-0.1")
    assert a == b  # identical SQL text, not just identical values
    register_crs_from_proj4("TEST:U32",
                            "+proj=utm +zone=32 +ellps=GRS80")
    assert (projected_crs("TEST:U32").forward("50.5", "10.2")
            == projected_crs("EPSG:25832").forward("50.5", "10.2"))


def test_proj4_unsupported_family_raises():
    from dask_geomodeling_spark.geometry.proj_ext import (
        register_crs_from_proj4)
    with pytest.raises(NotImplementedError, match="nzmg"):
        register_crs_from_proj4("TEST:BAD3", "+proj=nzmg +lat_0=-41")
    with pytest.raises(ValueError, match="ellps"):
        register_crs_from_proj4("TEST:BAD4",
                                "+proj=tmerc +ellps=plessis")


def test_omerc_swiss_rigi_reference(spark):
    """swisstopo's published CH1903 reference point (Rigi): geodetic
    47°03'28.95659233"N 8°29'11.11127154"E -> LV95 (2679520.05,
    1212273.44) through the inner Hotine projection (no datum leg —
    the input is already CH1903 geodetic)."""
    inner = projected_crs("EPSG:2056").inner
    rlat = 47 + 3.0 / 60 + 28.95659233 / 3600
    rlon = 8 + 29.0 / 60 + 11.11127154 / 3600
    x, y = _ev(spark, inner.forward(_lit(rlat), _lit(rlon)))
    assert abs(x - 2679520.05) < 0.05
    assert abs(y - 1212273.44) < 0.05
    # projection center -> false origin exactly
    x0, y0 = _ev(spark, inner.forward(
        _lit(46 + 57.0 / 60 + 8.66 / 3600),
        _lit(7 + 26.0 / 60 + 22.5 / 3600)))
    assert abs(x0 - 2600000.0) < 1e-6 and abs(y0 - 1200000.0) < 1e-6


def test_omerc_roundtrip_closure(spark):
    p = projected_crs("EPSG:2056")
    x, y = _ev(spark, p.forward(_lit(47.3769), _lit(8.5417)))
    lon, lat = _ev(spark, p.inverse(_lit(x), _lit(y)))
    assert abs(lon - 8.5417) < 1e-6 and abs(lat - 47.3769) < 1e-6


def test_somerc_proj4_registration(spark):
    from dask_geomodeling_spark.geometry.proj_ext import (
        register_crs_from_proj4)
    register_crs_from_proj4(
        "TEST:LV95",
        "+proj=somerc +lat_0=46.95240555555556 "
        "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 "
        "+ellps=bessel +towgs84=674.374,15.056,405.346,0,0,0,0 "
        "+units=m +no_defs")
    a = _ev(spark, projected_crs("TEST:LV95").forward(
        _lit(47.0), _lit(8.0)))
    b = _ev(spark, projected_crs("EPSG:2056").forward(
        _lit(47.0), _lit(8.0)))
    assert abs(a[0] - b[0]) < 1e-4 and abs(a[1] - b[1]) < 1e-4


def test_krovak_epsg_worked_example(spark):
    """EPSG GN7-2's Krovak worked example (S-JTSK geodetic on Bessel):
    50°12'32.442"N 16°50'59.179"E -> Southing 1050538.63, Westing
    568991.00 — through the inner projection (no datum leg)."""
    from dask_geomodeling_spark.geometry.proj_ext import _Krovak
    k = _Krovak(49.5, 24.0 + 50.0 / 60,
                30.0 + 17.0 / 60 + 17.3031 / 3600, 78.5, 0.9999,
                0.0, 0.0, "bessel1841", east_north=False)
    lat = 50 + 12.0 / 60 + 32.442 / 3600
    lon = 16 + 50.0 / 60 + 59.179 / 3600
    w, s = _ev(spark, k.forward(_lit(lat), _lit(lon)))
    assert abs(w - 568991.00) < 0.05
    assert abs(s - 1050538.63) < 0.05
    # 5514 (east-north axes) negates both
    en = projected_crs("EPSG:5514").inner
    x, y = _ev(spark, en.forward(_lit(lat), _lit(lon)))
    assert abs(x + w) < 1e-6 and abs(y + s) < 1e-6


def test_krovak_roundtrip_closure(spark):
    p = projected_crs("EPSG:5514")
    x, y = _ev(spark, p.forward(_lit(50.0755), _lit(14.4378)))
    assert -760000 < x < -720000 and -1060000 < y < -1030000
    lon, lat = _ev(spark, p.inverse(_lit(x), _lit(y)))
    assert abs(lon - 14.4378) < 1e-6 and abs(lat - 50.0755) < 1e-6


def test_world_mercator_vs_web_mercator(spark):
    """EPSG:3395 (ellipsoidal) easting equals the EPSG worked value at
    51N 3E; northing differs from spherical web-mercator by the
    expected ~33 km at that latitude; closure is machine-precision."""
    p = projected_crs("EPSG:3395")
    x, y = _ev(spark, p.forward(_lit(51.0), _lit(3.0)))
    assert abs(x - 333958.47) < 0.01
    web_y = _ev(spark, point_transform_sql(
        "EPSG:4326", "EPSG:3857", _lit(3.0), _lit(51.0)))[1]
    assert 30000 < web_y - y < 36000
    lon, lat = _ev(spark, p.inverse(_lit(x), _lit(y)))
    assert abs(lon - 3.0) < 1e-9 and abs(lat - 51.0) < 1e-9


def test_clrk66_towgs84_registration(spark):
    """NAD27-family proj strings (clrk66 + towgs84) must register:
    clarke1866 stores None for the flattening (b-defined), so the
    datum wrapper derives f through _a_f instead of indexing
    ELLIPSOIDS raw (round-6 ADVICE)."""
    from dask_geomodeling_spark.geometry.proj_ext import (
        _a_f, register_crs_from_proj4)
    a, f = _a_f("clarke1866")
    assert abs(1.0 / f - 294.9786982) < 1e-4  # published 1/f
    register_crs_from_proj4(
        "TEST:NAD27LCC",
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 "
        "+x_0=0 +y_0=0 +ellps=clrk66 +towgs84=-8,160,176,0,0,0,0")
    x, y = _ev(spark, projected_crs("TEST:NAD27LCC").forward(
        _lit(35.0), _lit(-75.0)))
    # Snyder p.296 worked example is on the NAD27 datum; the WGS84
    # input shifts by the Helmert legs, so assert to the ~200 m class
    assert abs(x - 1894410.9) < 500 and abs(y - 1564649.5) < 500
    # roundtrip closes through both datum legs
    lon, lat = _ev(spark, projected_crs("TEST:NAD27LCC").inverse(
        _lit(x), _lit(y)))
    assert abs(lon + 75.0) < 1e-6 and abs(lat - 35.0) < 1e-6
