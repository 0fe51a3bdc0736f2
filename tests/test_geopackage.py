"""GeoPackage codec + distributed source (geometry/geopackage.py).

Reference reads .gpkg via fiona/OGR (geometry/sources.py:18); here
stdlib sqlite3 opens the container and the WKB codec decodes the GP
geometry blobs.  These tests pin the blob header handling, catalog
layer selection, schema inference, and the Spark source behavior.
"""

import os
import struct

import pytest

from dask_geomodeling_spark.geometry.geopackage import (
    GeoPackageGeometrySource, _decode_gp_blob, read_gpkg_bytes,
    write_gpkg)

FIELDS = [("name", "TEXT"), ("val", "INTEGER"), ("score", "REAL")]


def _rows():
    return [
        {"rings": [[[0, 0], [4, 0], [4, 3], [0, 3]],
                   [[1, 1], [1, 2], [2, 2], [2, 1]]],
         "name": "donut", "val": 1, "score": 1.5},
        {"x": 7.0, "y": 8.0, "name": "pt", "val": 2, "score": None},
    ]


def test_roundtrip_bytes(tmp_path):
    p = str(tmp_path / "z.gpkg")
    write_gpkg(p, "zones", _rows(), FIELDS)
    with open(p, "rb") as f:
        props, recs = read_gpkg_bytes(f.read())
    assert props == ["fid", "name", "val", "score"]
    assert recs[0]["__geom__"]["xmax"] == 4.0
    assert len(recs[0]["__geom__"]["rings"]) == 2
    assert recs[1]["__geom__"]["x"] == 7.0
    assert recs[1]["score"] is None


def test_blob_envelope_and_empty():
    # flags 0x03: little-endian + envelope indicator 1 (4 doubles)
    wkb = b"\x01" + struct.pack("<Idd", 1, 2.0, 3.0)
    blob = (b"GP\x00\x03" + struct.pack("<i", 4326)
            + struct.pack("<4d", 0, 0, 9, 9) + wkb)
    assert _decode_gp_blob(blob)["x"] == 2.0
    empty = b"GP\x00\x11" + struct.pack("<i", 4326)
    assert _decode_gp_blob(empty) is None
    with pytest.raises(ValueError, match="not a GeoPackage"):
        _decode_gp_blob(b"XX\x00\x01\x00\x00\x00\x00")


def test_layer_selection(tmp_path):
    p = str(tmp_path / "multi.gpkg")
    write_gpkg(p, "only", _rows(), FIELDS)
    with open(p, "rb") as f:
        content = f.read()
    assert read_gpkg_bytes(content, "only")[0] == ["fid", "name", "val",
                                                  "score"]
    with pytest.raises(ValueError, match="layer 'nope'"):
        read_gpkg_bytes(content, "nope")


def test_infer_schema(tmp_path):
    p = str(tmp_path / "s.gpkg")
    write_gpkg(p, "zones", _rows(), FIELDS)
    ddl = "fid BIGINT, name STRING, val BIGINT, score DOUBLE"
    assert GeoPackageGeometrySource.infer_schema(p) == ddl
    assert GeoPackageGeometrySource.infer_schema(str(tmp_path)) == ddl


def test_source_multifile_and_requests(spark, tmp_path):
    for i in range(2):
        rows = [{"rings": [[[j, 0], [j + 2, 0], [j + 2, 2], [j, 2]]],
                 "name": "r{}".format(j), "val": i * 10 + j,
                 "score": 0.5} for j in range(3)]
        write_gpkg(os.path.join(str(tmp_path), "p{}.gpkg".format(i)),
                   "zones", rows, FIELDS)
    src = GeoPackageGeometrySource(str(tmp_path), id_field="val")
    df = src.plan(spark)
    assert df.count() == 6
    assert src.plan(spark, filters={"val__gte": 10}).count() == 3
    assert src.plan(spark, geometry=(0.0, 0.0, 0.5, 0.5)).count() == 2


def test_compat_gpkg_path(spark, tmp_path):
    from dask_geomodeling_spark import compat
    p = str(tmp_path / "layer.gpkg")
    write_gpkg(p, "zones", _rows(), FIELDS)
    src = compat.GeometryFileSource(p, layer="zones")
    assert isinstance(src, GeoPackageGeometrySource)
    rows = src.plan(spark).orderBy("fid").collect()
    assert rows[0]["name"] == "donut" and rows[1]["x"] == 7.0
