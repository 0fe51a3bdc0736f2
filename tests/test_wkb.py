"""WKB geometry-column interchange (reference: GeometryFileSource via
fiona/OGR, geometry/sources.py:18 — here the GeoParquet-style binary
column path, pure-spec struct codec in Arrow-batched mapInPandas)."""

import struct

import pytest

from dask_geomodeling_spark.geometry.wkb import (DecodeWKB, EncodeWKB,
                                                 WKBGeometrySource,
                                                 decode_wkb, encode_wkb)


def test_point_roundtrip():
    d = decode_wkb(encode_wkb({"x": 1.5, "y": -2.25}))
    assert d["x"] == 1.5 and d["y"] == -2.25
    assert (d["xmin"], d["ymax"]) == (1.5, -2.25)
    assert d["rings"] is None


def test_polygon_with_hole_roundtrip():
    rings = [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]],
             [[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0]]]
    b = encode_wkb({"rings": rings})
    assert b[1:5] == struct.pack("<I", 3)  # single polygon, two rings
    d = decode_wkb(b)
    assert d["rings"] == rings
    assert d["vertices"] == rings[0]
    assert (d["xmin"], d["xmax"]) == (0.0, 10.0)


def test_multipolygon_regroups_by_orientation():
    rings = [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]],
             [[5.0, 5.0], [9.0, 5.0], [9.0, 9.0], [5.0, 9.0]],
             [[6.0, 6.0], [6.0, 8.0], [8.0, 8.0], [8.0, 6.0]]]
    b = encode_wkb({"rings": rings})
    assert b[1:5] == struct.pack("<I", 6)  # two CCW outers -> multi
    assert decode_wkb(b)["rings"] == rings


def test_big_endian_and_ewkb_srid_decode():
    raw = (b"\x00" + struct.pack(">I", 0x20000001)
           + struct.pack(">I", 4326) + struct.pack(">2d", 3.0, 4.0))
    d = decode_wkb(raw)
    assert (d["x"], d["y"]) == (3.0, 4.0)


def test_unsupported_type_raises():
    with pytest.raises(NotImplementedError):
        decode_wkb(b"\x01" + struct.pack("<I", 7))  # GeometryCollection


def test_linestring_roundtrip():
    """Round 12 (codec hunt): WKB LINESTRING decodes to the ``path``
    column with a derived bbox, and a path encodes back byte-for-byte
    (open chain, no closure, EncodeWKT's precedence slot)."""
    path = [[1.0, 2.0], [3.0, 4.5], [5.0, -1.0]]
    buf = (b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 3)
           + struct.pack("<6d", 1.0, 2.0, 3.0, 4.5, 5.0, -1.0))
    out = decode_wkb(buf)
    assert out["path"] == path and out["rings"] is None
    assert (out["xmin"], out["ymin"], out["xmax"], out["ymax"]) == \
        (1.0, -1.0, 5.0, 4.5)
    fields = dict.fromkeys(out)
    fields["path"] = path
    assert bytes(encode_wkb(fields)) == buf
    # big-endian reads too
    be = (b"\x00" + struct.pack(">I", 2) + struct.pack(">I", 2)
          + struct.pack(">4d", 0.0, 0.0, 1.0, 1.0))
    assert decode_wkb(be)["path"] == [[0.0, 0.0], [1.0, 1.0]]
    with pytest.raises(ValueError):
        decode_wkb(b"\x01" + struct.pack("<I", 2)
                   + struct.pack("<I", 1) + struct.pack("<2d", 0, 0))


def test_null_passthrough():
    assert decode_wkb(None) is None
    assert encode_wkb({}) is None


def test_spark_encode_decode_blocks(spark, tmp_path):
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.geom_operations import Area
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    df = spark.range(1, 6).select(
        F.col("id"),
        F.expr("array(array(array(CAST(id AS DOUBLE), 0.0D), "
               "array(CAST(id + 3 AS DOUBLE), 0.0D), "
               "array(CAST(id + 3 AS DOUBLE), 2.0D), "
               "array(CAST(id AS DOUBLE), 2.0D)))").alias("rings"))
    enc = EncodeWKB(DataFrameSource(df, index_column="id"),
                    column="geometry")
    url = str(tmp_path / "wkb")
    enc.plan(spark).select("id", "geometry").write.parquet(url)
    src = WKBGeometrySource(url, wkb_column="geometry", id_field="id")
    rows = {r.id: r for r in
            src.set("area", Area(src)).plan(spark).collect()}
    assert len(rows) == 5
    for i, r in rows.items():
        assert r.area == pytest.approx(6.0)
        assert r.xmin == pytest.approx(float(i))
    # filters reach the raw scan BEFORE the Python decode
    plan = src.plan(spark, filters={"id__lte": 2})
    assert plan.count() == 2
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), LessThanOrEqual(id,2)]" in \
        physical or "LessThanOrEqual(id,2)" in physical


def test_decode_block_on_existing_frame(spark):
    from dask_geomodeling_spark.geometry.sources import (
        LiteralGeometrySource)
    raw = encode_wkb({"x": 7.0, "y": 8.0})
    src = LiteralGeometrySource([{"id": 1, "geometry": bytearray(raw)}])
    out = DecodeWKB(src, column="geometry").plan(spark).first()
    assert (out.x, out.y) == (7.0, 8.0)
    assert "geometry" not in out.asDict()


def test_wkb_sink_roundtrip_through_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sinks import GeometryFileSink
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    df = spark.range(1, 5).select(
        F.col("id"),
        (F.col("id") * 1.0).alias("x"), (F.col("id") * 2.0).alias("y"))
    sink = GeometryFileSink(DataFrameSource(df, index_column="id"),
                            str(tmp_path / "out"), extension="wkb")
    url = sink.write(spark)
    out = spark.read.parquet(url)
    assert set(out.columns) == {"id", "geometry"}
    src = WKBGeometrySource(url, wkb_column="geometry", id_field="id")
    rows = {r.id: (r.x, r.y) for r in src.plan(spark).collect()}
    assert rows == {i: (i * 1.0, i * 2.0) for i in range(1, 5)}


def test_encode_wkt_all_geometry_kinds(spark):
    """EncodeWKT: rings -> MULTIPOLYGON with outer/hole grouping by
    orientation; box rows -> POLYGON boundary; point rows -> POINT;
    and encode(parse(wkt)) round-trips through the engine's own
    parser."""
    from pyspark.sql import functions as F  # noqa: F401

    from dask_geomodeling_spark.geometry.polyclip import (
        rings_signed_area)
    from dask_geomodeling_spark.geometry.sources import (
        DataFrameSource, parse_point_or_box_wkt)
    from dask_geomodeling_spark.geometry.wkb import EncodeWKT
    rings = [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]],
             [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0]],
             [[8.0, 8.0], [9.0, 8.0], [9.0, 9.0], [8.0, 9.0]]]
    df = spark.createDataFrame(
        [(1, rings)], "fid bigint, rings array<array<array<double>>>")
    wkt = EncodeWKT(DataFrameSource(df, index_column="fid")) \
        .plan(spark).first()["wkt"]
    assert wkt.startswith("MULTIPOLYGON (((")
    back = parse_point_or_box_wkt(wkt)
    assert len(back["rings"]) == 3
    assert abs(rings_signed_area(back["rings"]) - 16.0) < 1e-9

    box = spark.createDataFrame(
        [(1, 0.0, 0.0, 2.0, 3.0)],
        "fid bigint, xmin double, ymin double, xmax double, "
        "ymax double")
    w2 = EncodeWKT(DataFrameSource(box, index_column="fid")) \
        .plan(spark).first()["wkt"]
    assert w2 == ("POLYGON ((0.0 0.0, 2.0 0.0, 2.0 3.0, 0.0 3.0, "
                  "0.0 0.0))")
    f2 = parse_point_or_box_wkt(w2)
    assert (f2["xmin"], f2["ymax"]) == (0.0, 3.0)

    pts = spark.createDataFrame([(1, 1.5, 2.5)],
                                "fid bigint, x double, y double")
    w3 = EncodeWKT(DataFrameSource(pts, index_column="fid")) \
        .plan(spark).first()["wkt"]
    assert w3 == "POINT (1.5 2.5)"


def test_parse_wkt_column(spark):
    """Round 9: ParseWKT decodes a WKT string column — point/line/
    polygon/multipolygon + hole orientation, closing-vertex drop,
    tolerant NULL on garbage, encode(parse()) roundtrip."""
    import pytest

    from dask_geomodeling_spark.geometry.sources import (
        DataFrameSource, _ring_signed_area)
    from dask_geomodeling_spark.geometry.wkb import EncodeWKT, ParseWKT
    rows = [
        (1, "POINT (3 4)"),
        (2, "LINESTRING (0 0, 2 0, 2 2)"),
        (3, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
            "(4 4, 4 6, 6 6, 6 4, 4 4))"),
        (4, "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
            "((5 5, 9 5, 9 9, 5 9, 5 5), (6 6, 6 8, 8 8, 8 6, 6 6)))"),
        (5, "not a geometry"), (6, None),
        (7, "  polygon ((0 0, 1 0, 1 1, 0 1, 0 0))"),  # case/space
        (8, "POINT (-1.5 2.25e1)"),                    # signs/sci
    ]
    df = spark.createDataFrame(rows, "fid bigint, wkt string")
    blk = ParseWKT(DataFrameSource(df, index_column="fid"), "wkt")
    out = {r["fid"]: r for r in blk.plan(spark).collect()}
    assert (out[1]["x"], out[1]["y"]) == (3.0, 4.0)
    assert out[1]["xmin"] == 3.0 and out[1]["ymax"] == 4.0
    assert out[2]["path"] == [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0]]
    r3 = out[3]["rings"]
    assert len(r3) == 2 and len(r3[0]) == 4          # closing dropped
    assert _ring_signed_area(r3[0]) > 0 > _ring_signed_area(r3[1])
    assert out[3]["vertices"] == r3[0]
    signs = [_ring_signed_area(r) for r in out[4]["rings"]]
    assert signs[0] > 0 and signs[1] > 0 and signs[2] < 0
    assert out[5]["rings"] is None and out[5]["xmin"] is None
    assert out[6]["x"] is None
    assert len(out[7]["rings"][0]) == 4              # case-insensitive
    assert (out[8]["x"], out[8]["y"]) == (-1.5, 22.5)
    # parse(encode(parse(wkt))) is a fixpoint: re-encoding the
    # decoded donut and decoding again yields identical rings
    enc = EncodeWKT(blk, column_name="back")
    again = ParseWKT(
        DataFrameSource(
            enc.plan(spark).select("fid", "back"),
            index_column="fid"), "back")
    r3b = {r["fid"]: r["rings"] for r in again.plan(spark).collect()}
    assert r3b[3] == r3
    with pytest.raises(ValueError, match="already exist"):
        ParseWKT(blk, "wkt")


def test_point_reencodes_as_point_not_box(spark):
    """Round-11 property-test regression (pinned explicitly —
    hypothesis seeds rotate): decode_wkb emits x/y WITH the derived
    bbox for a POINT, so point must outrank bbox in both codecs or
    encode∘decode turns points into degenerate box polygons."""
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.geometry.wkb import (EncodeWKT,
                                                     ParseWKT,
                                                     decode_wkb,
                                                     encode_wkb)
    buf = encode_wkb({"x": 0.0, "y": 0.0})
    assert encode_wkb(decode_wkb(buf)) == buf
    assert buf[1:5] == b"\x01\x00\x00\x00"  # stays a POINT
    df = spark.createDataFrame([(1, "POINT (0.0 0.0)")],
                               "id bigint, wkt string")
    out = EncodeWKT(ParseWKT(DataFrameSource(df, index_column="id"),
                             column="wkt"), column_name="wkt2")
    row = out.plan(spark).collect()[0]
    assert row["wkt2"] == "POINT (0.0 0.0)"


def test_encode_wkb_partial_geometry_falls_through(spark):
    """Round-11 second-pass review: a stray x with NULL y must fall
    through to the bbox branch (matching EncodeWKT); a partial bbox
    falls through to None instead of crashing struct.pack."""
    from dask_geomodeling_spark.geometry.wkb import encode_wkb
    box = encode_wkb({"x": 1.0, "y": None, "xmin": 0.0, "ymin": 0.0,
                      "xmax": 2.0, "ymax": 2.0})
    assert box is not None and box[1:5] == b"\x03\x00\x00\x00"
    assert encode_wkb({"xmin": 1.0, "ymin": None, "xmax": 2.0,
                       "ymax": 2.0}) is None
    assert encode_wkb({"x": 1.0, "y": None}) is None


def test_encode_wkb_degenerate_path_falls_through():
    """Round-13 ADVICE fix: _read_geometry rejects sub-2-point
    LINESTRINGs, so encode_wkb must never emit one — a 1-point path
    falls through to point/bbox/None like other degenerate cases,
    keeping encode -> decode total."""
    from dask_geomodeling_spark.geometry.wkb import (decode_wkb,
                                                     encode_wkb)
    assert encode_wkb({"path": [[1.0, 2.0]]}) is None
    buf = encode_wkb({"path": [[1.0, 2.0]], "x": 1.0, "y": 2.0})
    d = decode_wkb(buf)
    assert (d["x"], d["y"]) == (1.0, 2.0) and d.get("path") is None
    two = encode_wkb({"path": [[1.0, 2.0], [3.0, 4.0]]})
    assert decode_wkb(two)["path"] == [[1.0, 2.0], [3.0, 4.0]]


def test_encode_wkt_degenerate_path_falls_through(spark):
    """Round-13 review fix: EncodeWKT mirrors encode_wkb — a 1-point
    path is not a legal LINESTRING (the engine's own parsers reject
    it), so it falls through to the point representation."""
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.geometry.wkb import EncodeWKT
    df = spark.createDataFrame(
        [(1, [[1.0, 2.0]], 1.0, 2.0),
         (2, [[1.0, 2.0], [3.0, 4.0]], 1.0, 2.0)],
        "fid bigint, path array<array<double>>, x double, y double")
    rows = {r["fid"]: r["wkt"] for r in EncodeWKT(
        DataFrameSource(df, index_column="fid")).plan(spark).collect()}
    assert rows[1] == "POINT (1.0 2.0)"
    assert rows[2] == "LINESTRING (1.0 2.0, 3.0 4.0)"
