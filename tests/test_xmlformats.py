"""KML/GML sources over Spark's native XML reader
(geometry/xmlformats.py).

Reference reads both via fiona/OGR (geometry/sources.py:18); here the
JVM XML source splits row-tag records and coordinate strings parse as
pure column math.  Pins: ring orientation normalization, hole
handling, single-vs-repeated element schema shapes, property typing,
request filters, compat routing.
"""

import os

from dask_geomodeling_spark.geometry.xmlformats import (
    GMLGeometrySource, KMLGeometrySource, write_gml, write_kml)

DONUT = [[[0, 0], [4, 0], [4, 3], [0, 3]],
         [[1, 1], [1, 2], [2, 2], [2, 1]]]
TWO_HOLES = [[[0, 0], [10, 0], [10, 10], [0, 10]],
             [[1, 1], [1, 2], [2, 2], [2, 1]],
             [[5, 5], [5, 7], [7, 7], [7, 5]]]


def _rows():
    return [
        {"name": "donut", "val": 7, "rings": DONUT},
        {"name": "pt", "val": 8, "x": 4.5, "y": 52.1},
        # CW outer ring: a non-compliant writer; must normalize
        {"name": "cw", "val": 9,
         "rings": [[[10, 0], [10, 2], [12, 2], [12, 0]]]},
        {"name": "holes", "val": 10, "rings": TWO_HOLES},
    ]


def _area_by_name(spark, src):
    from dask_geomodeling_spark.geometry.geom_operations import Area
    view = src.set("area", Area(src))
    return {r["name"]: r for r in view.plan(spark).collect()}


def test_kml_geometry_and_props(spark, tmp_path):
    write_kml(str(tmp_path / "a.kml"), _rows(), ["val"])
    src = KMLGeometrySource(str(tmp_path))
    out = _area_by_name(spark, src)
    assert out["donut"]["area"] == 11.0
    assert out["cw"]["area"] == 4.0
    assert out["holes"]["area"] == 100.0 - 1.0 - 4.0
    assert out["pt"]["x"] == 4.5 and out["pt"]["xmin"] == 4.5
    assert out["donut"]["val"] == 7  # XML-inferred numeric type
    assert src.plan(spark, filters={"val__gte": 9}).count() == 2


def test_kml_explicit_schema(spark, tmp_path):
    write_kml(str(tmp_path / "a.kml"), _rows(), ["val"])
    src = KMLGeometrySource(str(tmp_path), schema="val DOUBLE")
    row = src.plan(spark, filters={"name": "pt"}).collect()[0]
    assert row["val"] == 8.0 and isinstance(row["val"], float)


def test_gml_geometry_and_props(spark, tmp_path):
    write_gml(str(tmp_path / "a.gml"), _rows(), ["name", "val"])
    src = GMLGeometrySource(str(tmp_path))
    out = _area_by_name(spark, src)
    assert out["donut"]["area"] == 11.0
    assert out["cw"]["area"] == 4.0
    assert out["holes"]["area"] == 95.0
    assert out["pt"]["y"] == 52.1
    assert out["donut"]["val"] == 7
    assert src.plan(spark, geometry=(4.4, 52.0, 4.6, 52.2)).count() == 1


def test_gml_single_hole_schema_shape(spark, tmp_path):
    # one interior ring infers as a STRUCT (not array); must still read
    write_gml(str(tmp_path / "one.gml"),
              [{"name": "d", "val": 1, "rings": DONUT}], ["name", "val"])
    src = GMLGeometrySource(str(tmp_path / "one.gml"))
    out = _area_by_name(spark, src)
    assert out["d"]["area"] == 11.0
    assert len(out["d"]["rings"]) == 2


def test_compat_kml_gml(spark, tmp_path):
    from dask_geomodeling_spark import compat
    write_kml(str(tmp_path / "l.kml"),
              [{"name": "a", "val": 1, "x": 1.0, "y": 2.0}], ["val"])
    write_gml(str(tmp_path / "l.gml"),
              [{"name": "a", "val": 1, "x": 1.0, "y": 2.0}],
              ["name", "val"])
    k = compat.GeometryFileSource(str(tmp_path / "l.kml"))
    g = compat.GeometryFileSource(str(tmp_path / "l.gml"))
    assert isinstance(k, KMLGeometrySource)
    assert isinstance(g, GMLGeometrySource)
    assert k.plan(spark).collect()[0]["x"] == 1.0
    assert g.plan(spark).collect()[0]["y"] == 2.0


def test_writers_escape_xml_text(spark, tmp_path):
    """Round-13 adversarial-XML hunt fix, pinned: names/properties
    containing & < > must escape — the raw splice produced MALFORMED
    documents the reader then silently dropped."""
    import xml.etree.ElementTree as ET

    from dask_geomodeling_spark.geometry.xmlformats import (
        GMLGeometrySource, KMLGeometrySource, write_gml, write_kml)
    rows = [{"name": "a & b <c>", "x": 1.5, "y": 2.5}]
    kp = str(tmp_path / "esc.kml")
    write_kml(kp, rows, [])
    ET.parse(kp)  # well-formed
    got = KMLGeometrySource(kp).plan(spark).collect()
    assert len(got) == 1 and got[0]["name"] == "a & b <c>"
    assert (got[0]["x"], got[0]["y"]) == (1.5, 2.5)
    gp = str(tmp_path / "esc.gml")
    write_gml(gp, [{"fid": 1, "label": "x < y & z", "x": 3.0,
                    "y": 4.0}], ["fid", "label"])
    ET.parse(gp)
    grow = GMLGeometrySource(gp).plan(spark).collect()[0]
    assert grow["label"] == "x < y & z"
    assert (grow["x"], grow["y"]) == (3.0, 4.0)


def test_write_gml_rejects_bad_element_names(tmp_path):
    """Round-13 review fix: element names can't be escaped — a
    property column named 'pop density' must raise, not emit a
    malformed document."""
    import pytest

    from dask_geomodeling_spark.geometry.xmlformats import write_gml
    rows = [{"fid": 1, "pop density": 2, "x": 1.0, "y": 2.0}]
    with pytest.raises(ValueError, match="element name"):
        write_gml(str(tmp_path / "bad.gml"), rows, ["pop density"])


def test_write_gml_allows_qnames_and_sink_fails_fast(spark, tmp_path):
    """Round-13 review pass 2: one namespace colon is a legal element
    name (ogr:feature — the reader round-trips it), and the GML file
    SINK validates property names driver-side BEFORE wiping existing
    output."""
    import os

    import pytest

    from dask_geomodeling_spark.geometry.sinks import GeometryFileSink
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    from dask_geomodeling_spark.geometry.xmlformats import write_gml
    import xml.etree.ElementTree as ET

    from dask_geomodeling_spark.geometry.xmlformats import (
        GMLGeometrySource)
    p = str(tmp_path / "ns.gml")
    write_gml(p, [{"fid": 1, "x": 1.0, "y": 2.0}], ["fid"],
              feature_tag="ogr:feature")
    ET.parse(p)  # prefix is DECLARED (review pass 3: unbound
    # prefixes made every namespace-aware parser reject the file)
    back = GMLGeometrySource(p, feature_tag="ogr:feature") \
        .plan(spark).collect()
    assert len(back) == 1 and (back[0]["x"], back[0]["y"]) == (1.0,
                                                               2.0)
    # reserved prefixes stay rejected
    import pytest as _pt
    with _pt.raises(ValueError, match="element name"):
        write_gml(str(tmp_path / "x.gml"), [{"fid": 1}],
                  ["xmlns:foo"])
    out = str(tmp_path / "sinkout")
    os.makedirs(out)
    marker = os.path.join(out, "keep.gml")
    open(marker, "w").write("x")
    df = spark.createDataFrame([(1, 1.0, 2.0, "v")],
                               "fid bigint, x double, y double, "
                               "`pop density` string")
    sink = GeometryFileSink(
        DataFrameSource(df, index_column="fid"), out, extension="gml")
    with pytest.raises(ValueError, match="element name"):
        sink.write(spark)
    assert os.path.exists(marker)  # failed BEFORE the rmtree
