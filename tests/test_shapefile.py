"""Shapefile codec + distributed source (geometry/shapefile.py).

Reference reads shapefiles via fiona/OGR (geometry/sources.py:18);
here the published format spec is parsed directly — these tests pin
the codec roundtrip (ring orientation flip, dbf typing, null shapes)
and the Spark source's join/filter behavior.
"""

import datetime
import os

import pytest

from dask_geomodeling_spark.geometry.shapefile import (
    ShapefileGeometrySource, dbf_ddl, parse_dbf, parse_shp,
    write_shapefile)
from dask_geomodeling_spark.geometry.sources import _ring_signed_area

FIELDS = [("name", "C", 8, 0), ("val", "N", 10, 0),
          ("score", "N", 12, 4), ("flag", "L", 1, 0),
          ("when", "D", 8, 0)]


def _donut(x0=0.0, y0=0.0, w=4.0, h=3.0):
    return [[[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]],
            [[x0 + 1, y0 + 1], [x0 + 1, y0 + 2], [x0 + 2, y0 + 2],
             [x0 + 2, y0 + 1]]]


def test_polygon_roundtrip_orientation(tmp_path):
    stem = str(tmp_path / "poly")
    write_shapefile(stem, [{"rings": _donut(), "name": "donut",
                            "val": 1, "score": 0.5, "flag": True,
                            "when": datetime.date(2020, 1, 2)}], FIELDS)
    with open(stem + ".shp", "rb") as f:
        geoms = parse_shp(f.read())
    assert len(geoms) == 1
    rings = geoms[0]["rings"]
    # engine contract: outer CCW (positive), hole CW (negative)
    assert _ring_signed_area(rings[0]) == 12.0
    assert _ring_signed_area(rings[1]) == -1.0
    assert geoms[0]["vertices"] == rings[0]
    assert (geoms[0]["xmin"], geoms[0]["ymax"]) == (0.0, 3.0)
    # on disk the outer ring must be CW (shapefile convention)
    with open(stem + ".shp", "rb") as f:
        buf = f.read()
    import struct
    npoints = struct.unpack_from("<i", buf, 108 + 40)[0]
    assert npoints == 10  # two closed rings, 5 points each


def test_point_and_null_and_dbf_types(tmp_path):
    stem = str(tmp_path / "mix")
    rows = [{"x": 1.5, "y": 2.5, "name": "pt", "val": 7,
             "score": 1.25, "flag": False,
             "when": datetime.date(1999, 12, 31)},
            {"name": "void", "val": None, "score": None, "flag": None,
             "when": None}]
    write_shapefile(stem, rows, FIELDS)
    with open(stem + ".shp", "rb") as f:
        geoms = parse_shp(f.read())
    assert geoms[0]["x"] == 1.5 and geoms[0]["ymax"] == 2.5
    assert all(v is None for v in geoms[1].values())
    with open(stem + ".dbf", "rb") as f:
        fields, recs = parse_dbf(f.read())
    assert dbf_ddl(fields) == ("name STRING, val BIGINT, score DOUBLE,"
                               " flag BOOLEAN, when DATE")
    assert recs[0] == {"name": "pt", "val": 7, "score": 1.25,
                       "flag": False, "when": datetime.date(1999, 12, 31)}
    assert recs[1]["name"] == "void"
    assert all(recs[1][k] is None for k in ("val", "score", "flag",
                                            "when"))


def test_infer_schema(tmp_path):
    stem = str(tmp_path / "s")
    write_shapefile(stem, [{"x": 0.0, "y": 0.0, "name": "a", "val": 1,
                            "score": 2.0, "flag": True,
                            "when": datetime.date(2000, 1, 1)}], FIELDS)
    ddl = ShapefileGeometrySource.infer_schema(stem + ".shp")
    assert ddl == ("name STRING, val BIGINT, score DOUBLE, "
                   "flag BOOLEAN, when DATE")
    assert ShapefileGeometrySource.infer_schema(str(tmp_path)) == ddl


def test_unsupported_shape_type(tmp_path):
    import struct
    header = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, 54)
    header += struct.pack("<2i", 1000, 13) + struct.pack("<8d", *[0.0] * 8)
    rec = struct.pack(">2i", 1, 2) + struct.pack("<i", 13)
    with pytest.raises(NotImplementedError, match="shape type 13"):
        parse_shp(header + rec)


def test_source_multifile_join_and_filters(spark, tmp_path):
    d = str(tmp_path)
    for i in range(3):
        rows = [{"rings": _donut(x0=float(j)), "name": "r{}".format(j),
                 "val": i * 10 + j, "score": 0.5, "flag": True,
                 "when": datetime.date(2020, 1, 1)} for j in range(4)]
        write_shapefile(os.path.join(d, "part{}".format(i)), rows, FIELDS)
    src = ShapefileGeometrySource(d, id_field="val")
    df = src.plan(spark)
    assert df.count() == 12
    rows = df.filter("val = 21").collect()
    assert len(rows) == 1 and rows[0]["name"] == "r1"
    assert rows[0]["xmin"] == 1.0 and rows[0]["xmax"] == 5.0
    # request filters apply to dbf attribute columns
    assert src.plan(spark, filters={"val__gte": 20}).count() == 4
    # bbox request intersects the donut bboxes
    assert src.plan(
        spark, geometry=(0.0, 0.0, 0.5, 0.5)).count() == 3


def test_compat_shp_path(spark, tmp_path):
    from dask_geomodeling_spark import compat
    stem = str(tmp_path / "layer")
    write_shapefile(stem, [{"x": 3.0, "y": 4.0, "name": "a", "val": 5,
                            "score": 0.0, "flag": True,
                            "when": datetime.date(2020, 1, 1)}], FIELDS)
    src = compat.GeometryFileSource(stem + ".shp")
    assert isinstance(src, ShapefileGeometrySource)
    row = src.plan(spark).collect()[0]
    assert row["x"] == 3.0 and row["val"] == 5
