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
    with pytest.raises(NotImplementedError,
                       match="register_crs_from_proj4"):
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


# ---- round 15: the bundled EPSG parameter table + axis units ----------

def test_epsg_table_autoregistration():
    """High-traffic codes resolve via the bundled table on first use;
    genuinely unknown codes still return None."""
    from dask_geomodeling_spark.geometry.epsg_table import EPSG_PROJ4
    assert len(EPSG_PROJ4) >= 100
    assert projected_crs("EPSG:26985") is not None   # Maryland SP
    assert projected_crs("EPSG:3006") is not None    # SWEREF99 TM
    assert projected_crs("EPSG:99999") is None


def test_stateplane_ftus_central_meridian(spark):
    """EPSG:2263 (NY Long Island ftUS): the central meridian at the
    latitude of origin maps to EXACTLY the published false origin in
    US survey feet — FE 984250.00 ftUS (= 300000.0000000001 m x
    3937/1200), FN 0 — pinning both the LCC parameters and the
    +units=us-ft wrapper's PROJ semantics."""
    p = projected_crs("EPSG:2263")
    x, y = _ev(spark, p.forward(
        _lit(40.0 + 10.0 / 60.0), _lit(-74.0)))
    assert abs(x - 984250.0) < 1e-4, x
    assert abs(y - 0.0) < 1e-4, y
    # 100 m north along the CM is ~328.08 ftUS of northing (to the
    # ~0.1% LCC scale distortion below the standard parallels)
    x2, y2 = _ev(spark, p.forward(
        _lit(40.0 + 10.0 / 60.0 + 100.0 / 111132.95), _lit(-74.0)))
    assert abs((y2 - y) - 100.0 * 3937.0 / 1200.0) < 0.5


def test_stateplane_tm_ftus_florida(spark):
    """EPSG:2236 (Florida East, TM ftUS): CM at lat_0 maps to the
    published FE 656166.667 ftUS; roundtrip closes sub-mm."""
    p = projected_crs("EPSG:2236")
    lat0 = 24.0 + 20.0 / 60.0
    x, y = _ev(spark, p.forward(_lit(lat0), _lit(-81.0)))
    assert abs(x - 656166.667) < 2e-3, x
    assert abs(y) < 1e-4
    lon, lat = _ev(spark, p.inverse(_lit(x + 1000.0), _lit(y + 2000.0)))
    x3, y3 = _ev(spark, p.forward(_lit(lat), _lit(lon)))
    assert abs(x3 - (x + 1000.0)) < 1e-3
    assert abs(y3 - (y + 2000.0)) < 1e-3


def test_nad83_utm_matches_builtin_wgs84_utm(spark):
    """EPSG:26917 (bundled NAD83 / UTM 17N) vs the built-in WGS84
    EPSG:32617 closed form: < 0.5 mm everywhere sampled (GRS80 vs
    WGS84 differ in the 8th ellipsoid digit)."""
    from dask_geomodeling_spark.geometry.proj import utm_sql
    p = projected_crs("EPSG:26917")
    for lon, lat in ((-81.0, 40.0), (-79.3, 35.2), (-83.5, 44.8)):
        x1, y1 = _ev(spark, p.forward(_lit(lat), _lit(lon)))
        x2, y2 = _ev(spark, utm_sql(_lit(lat), _lit(lon), 17))
        assert abs(x1 - x2) < 5e-4 and abs(y1 - y2) < 5e-4, (lon, lat)


def test_nztm_false_origin(spark):
    """EPSG:2193 (NZTM2000): (173E, 0) maps to exactly
    (1600000, 10000000)."""
    p = projected_crs("EPSG:2193")
    x, y = _ev(spark, p.forward(_lit(0.0), _lit(173.0)))
    assert abs(x - 1600000.0) < 1e-6 and abs(y - 10000000.0) < 1e-6


def test_sweref_northing_vs_numeric_meridian_arc(spark):
    """Independent cross-check (no shared series): SWEREF99 TM
    northing ON the central meridian equals k0 x the meridian arc
    length M(lat), numerically integrated with Simpson's rule on
    GRS80 — agreement < 1 mm at three latitudes."""
    p = projected_crs("EPSG:3006")
    a, invf = 6378137.0, 298.257222101
    f = 1.0 / invf
    e2 = f * (2.0 - f)

    def meridian_arc(lat_deg, n=20000):
        import math
        phi = math.radians(lat_deg)
        h = phi / n

        def integrand(t):
            return (a * (1.0 - e2)
                    / (1.0 - e2 * math.sin(t) ** 2) ** 1.5)
        s = integrand(0.0) + integrand(phi)
        for i in range(1, n):
            s += integrand(i * h) * (4 if i % 2 else 2)
        return s * h / 3.0

    for lat in (55.0, 60.0, 67.5):
        x, y = _ev(spark, p.forward(_lit(lat), _lit(15.0)))
        assert abs(x - 500000.0) < 1e-6
        assert abs(y - 0.9996 * meridian_arc(lat)) < 1e-3, lat


def test_belgian_polar_origin_lcc(spark):
    """EPSG:31370 (Belgian Lambert 72): lat_0 = 90 puts rho0 at 0 —
    the conic's polar edge; forward of Brussels lands in the
    published coordinate neighbourhood (~149-160 km E, ~160-175 km N)
    and the roundtrip closes under the datum-class bound."""
    from dask_geomodeling_spark.geometry.proj import (
        _transform_stages)

    def ev_stages(stages, x, y):
        for st in stages:
            x, y = _ev(spark, st(_lit(x), _lit(y)))
        return x, y

    bx, by = ev_stages(_transform_stages("EPSG:4326", "EPSG:31370"),
                       4.3517, 50.8466)   # Brussels Grand-Place
    assert 148000 < bx < 152000 and 166000 < by < 172000, (bx, by)
    lon, lat = ev_stages(_transform_stages("EPSG:31370", "EPSG:4326"),
                         bx, by)
    assert abs(lon - 4.3517) * 111320 < 0.2
    assert abs(lat - 50.8466) * 111320 < 0.2


def test_unit_wrapper_roundtrip_scale(spark):
    """The _Unit wrapper scales the WHOLE metric output (PROJ
    +units semantics): a ftUS grid's easting is 3937/1200 x the
    same grid registered in meters."""
    from dask_geomodeling_spark.geometry.proj_ext import (
        register_crs_from_proj4)
    base = ("+proj=lcc +lat_0=40 +lon_0=-74 +lat_1=41 +lat_2=40.5 "
            "+x_0=300000 +y_0=100000 +ellps=GRS80")
    pm = register_crs_from_proj4("TEST:UNITM", base)
    pf = register_crs_from_proj4("TEST:UNITF", base + " +units=us-ft")
    xm, ym = _ev(spark, pm.forward(_lit(40.7), _lit(-73.5)))
    xf, yf = _ev(spark, pf.forward(_lit(40.7), _lit(-73.5)))
    k = 3937.0 / 1200.0
    assert abs(xf - xm * k) < 1e-6 and abs(yf - ym * k) < 1e-6
    lon, lat = _ev(spark, pf.inverse(_lit(xf), _lit(yf)))
    assert abs(lon + 73.5) < 1e-9 and abs(lat - 40.7) < 1e-9


def test_unknown_code_error_names_nearest_options():
    """The unsupported-CRS error now lists the numerically nearest
    bundled codes — a user with an unlisted state-plane code sees the
    sibling zones."""
    with pytest.raises(NotImplementedError) as ei:
        validate_crs_pair("EPSG:4326", "EPSG:2264")  # NC ftUS, unlisted
    msg = str(ei.value)
    assert "nearest supported to EPSG:2264" in msg
    assert "EPSG:2263" in msg
