"""Reprojection tests: closed-form transforms + request-projection
handling in get_data (reference: every geometry request carries a
projection — geometry/base.py:33+)."""

import math

import pytest

from dask_geomodeling_spark.geometry.proj import (Reproject,
                                                  WEB_MERCATOR_RADIUS,
                                                  transform_extent)
from dask_geomodeling_spark.geometry.sources import LiteralGeometrySource


@pytest.fixture(scope="module")
def pts():
    return LiteralGeometrySource([
        {"id": 1, "x": 0.0, "y": 0.0},
        {"id": 2, "x": 45.0, "y": 45.0},
    ])


def test_request_projection_reprojects_features(spark, pts):
    out = pts.get_data(spark, projection="EPSG:3857")
    assert out["projection"] == "EPSG:3857"
    rows = {r.id: r for r in out["features"].collect()}
    assert rows[1].x == 0.0 and rows[1].y == pytest.approx(0.0, abs=1e-6)
    assert rows[2].x == pytest.approx(
        WEB_MERCATOR_RADIUS * math.radians(45.0))
    assert rows[2].y == pytest.approx(
        WEB_MERCATOR_RADIUS * math.log(math.tan(
            math.pi / 4 + math.radians(45.0) / 2)))


def test_request_projection_default_is_native(spark, pts):
    out = pts.get_data(spark)
    assert out["projection"] == "EPSG:4326"
    assert {r.x for r in out["features"].collect()} == {0.0, 45.0}


def test_request_projection_extent_mode(spark, pts):
    out = pts.get_data(spark, mode="extent", projection="EPSG:4087")
    r = WEB_MERCATOR_RADIUS
    assert out["extent"][0] == pytest.approx(0.0)
    assert out["extent"][2] == pytest.approx(r * math.radians(45.0))
    assert out["projection"] == "EPSG:4087"


def test_request_projection_unsupported_raises(spark, pts):
    # EPSG:27200 (New Zealand Map Grid, complex-series) is not a
    # supported projection family and has no proj_ext registration
    with pytest.raises(NotImplementedError):
        pts.get_data(spark, projection="EPSG:27200")


def test_reproject_rd_known_point(spark):
    """RD New (EPSG:28992) against the published validation point
    (Westertoren, Amsterdam): RD (120700.723, 487525.501) ↔ WGS84
    (52.37453253, 4.88352559) — the Kadaster polynomials reproduce it
    to ~3e-9 degrees / sub-mm; assert with 100× margin."""
    src = LiteralGeometrySource([
        {"id": 1, "x": 4.88352559, "y": 52.37453253}])
    out = Reproject(src, "EPSG:4326", "EPSG:28992").plan(spark).first()
    assert out.x == pytest.approx(120700.723, abs=0.05)
    assert out.y == pytest.approx(487525.501, abs=0.05)
    back_src = LiteralGeometrySource(
        [{"id": 1, "x": 120700.723, "y": 487525.501}],
        projection="EPSG:28992")
    back = Reproject(back_src, "EPSG:28992",
                     "EPSG:4326").plan(spark).first()
    assert back.x == pytest.approx(4.88352559, abs=3e-7)
    assert back.y == pytest.approx(52.37453253, abs=3e-7)


def test_reproject_rd_roundtrip_closure(spark):
    """Forward+inverse RD closes to < 2 mm anywhere in the validity
    area (measured 2 mm worst-case on a 20 km grid over the NL)."""
    rows = [{"id": i * 100 + j,
             "x": 3.3 + i * 0.45, "y": 50.8 + j * 0.3}
            for i in range(8) for j in range(9)]
    src = LiteralGeometrySource(rows)
    fwd = Reproject(src, "EPSG:4326", "EPSG:28992")
    back = Reproject(fwd, "EPSG:28992", "EPSG:4326")
    out = {r.id: r for r in back.plan(spark).collect()}
    for row in rows:
        got = out[row["id"]]
        assert got.x == pytest.approx(row["x"], abs=3e-7)
        assert got.y == pytest.approx(row["y"], abs=3e-7)


def test_reproject_rd_to_web_mercator_pivots(spark):
    """EPSG:28992 → EPSG:3857 has no direct closed form: the composed
    text must equal chaining two Reprojects through EPSG:4326."""
    rows = [{"id": 1, "x": 155000.0, "y": 463000.0},
            {"id": 2, "x": 120700.723, "y": 487525.501}]
    src = LiteralGeometrySource(rows, projection="EPSG:28992")
    direct = {r.id: r for r in
              Reproject(src, "EPSG:28992", "EPSG:3857")
              .plan(spark).collect()}
    via = Reproject(Reproject(src, "EPSG:28992", "EPSG:4326"),
                    "EPSG:4326", "EPSG:3857")
    chained = {r.id: r for r in via.plan(spark).collect()}
    for i in direct:
        assert direct[i].x == pytest.approx(chained[i].x, abs=1e-9)
        assert direct[i].y == pytest.approx(chained[i].y, abs=1e-9)


def test_reproject_vertices_ring(spark):
    src = LiteralGeometrySource([
        {"id": 1, "x": 0.5, "y": 0.5,
         "vertices": [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]},
    ])
    out = Reproject(src, "EPSG:4326", "EPSG:4087").plan(spark).first()
    r = WEB_MERCATOR_RADIUS
    assert out.vertices[1][0] == pytest.approx(r * math.radians(1.0))
    assert out.vertices[2][1] == pytest.approx(r * math.radians(1.0))
    assert out.x == pytest.approx(r * math.radians(0.5))


def test_transform_extent_envelope():
    ext = transform_extent((0.0, 0.0, 1.0, 1.0), "EPSG:4326", "EPSG:4087")
    r = WEB_MERCATOR_RADIUS
    assert ext[2] == pytest.approx(r * math.radians(1.0))
    assert ext[1] == pytest.approx(0.0)


def test_reproject_roundtrip_utm(spark):
    src = LiteralGeometrySource([{"id": 1, "x": 5.3, "y": 52.1}])
    fwd = Reproject(src, "EPSG:4326", "EPSG:32631")
    back = Reproject(fwd, "EPSG:32631", "EPSG:4326").plan(spark).first()
    assert back.x == pytest.approx(5.3, abs=1e-8)
    assert back.y == pytest.approx(52.1, abs=1e-8)


def test_reproject_reports_destination_crs(spark, pts):
    block = Reproject(pts, "EPSG:4326", "EPSG:3857")
    assert block.projection == "EPSG:3857"
    # a request in the block's own CRS must NOT re-transform the data
    out = block.get_data(spark, projection="EPSG:3857")
    assert out["projection"] == "EPSG:3857"
    rows = {r.id: r for r in out["features"].collect()}
    assert rows[2].x == pytest.approx(
        WEB_MERCATOR_RADIUS * math.radians(45.0))


def test_reproject_rejects_mismatched_source_crs(pts):
    fwd = Reproject(pts, "EPSG:4326", "EPSG:3857")
    with pytest.raises(ValueError, match="projection"):
        Reproject(fwd, "EPSG:4326", "EPSG:4087")


def test_rasterize_wkt_reports_projection():
    from dask_geomodeling_spark.raster.misc import RasterizeWKT
    block = RasterizeWKT("POINT (2 3)", "EPSG:3857")
    assert block.projection == "EPSG:3857"
