"""FlatGeobuf codec + distributed source (geometry/flatgeobuf.py).

Reference reads .fgb via fiona/OGR (geometry/sources.py:18); here the
published FlatBuffers wire format walks with struct arithmetic.
Pins: property typing (incl. absent/NULL), ring normalization,
multi-ring encoding, index skipping, schema inference, Spark source
behavior, compat routing.
"""

import struct

import pytest

from dask_geomodeling_spark.geometry.flatgeobuf import (
    FlatGeobufGeometrySource, _index_size, read_fgb, write_fgb)
from dask_geomodeling_spark.geometry.sources import _ring_signed_area

FIELDS = [("name", "STRING"), ("val", "BIGINT"), ("score", "DOUBLE"),
          ("flag", "BOOLEAN")]


def _rows():
    return [
        {"rings": [[[0, 0], [4, 0], [4, 3], [0, 3]],
                   [[1, 1], [1, 2], [2, 2], [2, 1]]],
         "name": "donut", "val": 7, "score": 1.5, "flag": True},
        {"x": 4.5, "y": 52.1, "name": "pt", "val": 8, "score": None,
         "flag": False},
    ]


def test_roundtrip_codec(tmp_path):
    p = str(tmp_path / "t.fgb")
    write_fgb(p, _rows(), FIELDS)
    with open(p, "rb") as f:
        ddl, recs = read_fgb(f.read())
    assert ddl == FIELDS
    donut, pt = recs
    rings = donut["__geom__"]["rings"]
    assert _ring_signed_area(rings[0]) == 12.0
    assert _ring_signed_area(rings[1]) == -1.0
    assert donut["name"] == "donut" and donut["flag"] is True
    assert pt["__geom__"]["x"] == 4.5
    assert "score" not in pt  # NULL property is simply absent
    assert pt["flag"] is False


def test_magic_and_unsupported_type(tmp_path):
    with pytest.raises(ValueError, match="magic"):
        read_fgb(b"NOPE1234" + b"\x00" * 20)


def test_index_size_formula():
    # 100 leaves at node_size 16: 100 + 7 + 1 = 108 nodes * 40 bytes
    assert _index_size(100, 16) == 108 * 40
    assert _index_size(1, 16) == 40


def test_infer_schema(tmp_path):
    p = str(tmp_path / "s.fgb")
    write_fgb(p, _rows(), FIELDS)
    ddl = "name STRING, val BIGINT, score DOUBLE, flag BOOLEAN"
    assert FlatGeobufGeometrySource.infer_schema(p) == ddl
    assert FlatGeobufGeometrySource.infer_schema(str(tmp_path)) == ddl


def test_source_multifile_and_requests(spark, tmp_path):
    import os
    for i in range(2):
        rows = [{"rings": [[[j, 0], [j + 2, 0], [j + 2, 2], [j, 2]]],
                 "name": "r{}".format(j), "val": i * 10 + j,
                 "score": 0.5, "flag": True} for j in range(3)]
        write_fgb(os.path.join(str(tmp_path), "p{}.fgb".format(i)),
                  rows, FIELDS)
    src = FlatGeobufGeometrySource(str(tmp_path), id_field="val")
    assert src.plan(spark).count() == 6
    assert src.plan(spark, filters={"val__gte": 10}).count() == 3
    assert src.plan(spark, geometry=(0.0, 0.0, 0.5, 0.5)).count() == 2
    row = src.plan(spark, filters={"val": 11}).collect()[0]
    assert row["name"] == "r1" and row["xmax"] == 3.0


def test_compat_fgb_path(spark, tmp_path):
    from dask_geomodeling_spark import compat
    p = str(tmp_path / "layer.fgb")
    write_fgb(p, _rows(), FIELDS)
    src = compat.GeometryFileSource(p)
    assert isinstance(src, FlatGeobufGeometrySource)
    out = {r["name"]: r for r in src.plan(spark).collect()}
    assert out["pt"]["x"] == 4.5 and out["donut"]["val"] == 7
