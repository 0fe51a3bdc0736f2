"""GeometryFileSink feature-format write parity (round 9): the
reference's supported_extensions {shp, gpkg, geojson, gml} — with shp
as ITS default (reference geometry/sinks.py:67-81) — all write through
the Spark sink as per-partition files, read back bit-clean through the
pure-spec sources, and merge_files joins the parts into one file."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.sinks import (GeometryFileSink,
                                                   merge_feature_files)
from dask_geomodeling_spark.geometry.sources import DataFrameSource


def _donuts(spark, n=40):
    """n donut polygons + typed attributes, several partitions."""
    df = spark.range(n).select(
        F.col("id").alias("fid"),
        F.expr("CAST(id % 13 AS DOUBLE)").alias("ax"),
        F.expr("CAST((id * 3) % 11 AS DOUBLE)").alias("ay"),
        (F.col("id") % 4 == 0).alias("flag"),
        F.expr("concat('zone-', id)").alias("label"),
        F.expr("CAST(id AS DOUBLE) / 8").alias("score"))
    return df.select(
        "fid", "flag", "label", "score",
        F.expr(
            "array(array(array(ax, ay), array(ax + 4.0D, ay), "
            "array(ax + 4.0D, ay + 4.0D), array(ax, ay + 4.0D)), "
            "array(array(ax + 1, ay + 1), array(ax + 1, ay + 2), "
            "array(ax + 2, ay + 2), array(ax + 2, ay + 1)))"
        ).alias("rings")).repartition(4, "fid")


def _read_back(spark, d, ext):
    if ext == "shp":
        from dask_geomodeling_spark.geometry.shapefile import (
            ShapefileGeometrySource)
        return ShapefileGeometrySource(d, id_field="fid")
    if ext == "gpkg":
        from dask_geomodeling_spark.geometry.geopackage import (
            GeoPackageGeometrySource)
        return GeoPackageGeometrySource(d, id_field="fid")
    if ext == "gml":
        from dask_geomodeling_spark.geometry.xmlformats import (
            GMLGeometrySource)
        return GMLGeometrySource(d, id_field="fid")
    from dask_geomodeling_spark.geometry.xmlformats import (
        KMLGeometrySource)
    # KML ExtendedData is untyped text — the schema IS the dataset
    # contract on readback (same as any 100 TB ingest)
    return KMLGeometrySource(
        d, id_field="fid",
        schema="fid BIGINT, flag BOOLEAN, label STRING, score DOUBLE")


@pytest.mark.parametrize("ext", ["shp", "gpkg", "gml", "kml"])
def test_sink_write_readback(spark, ext):
    src = _donuts(spark)
    d = tempfile.mkdtemp(prefix="dgs_sink_" + ext)
    GeometryFileSink(DataFrameSource(src, index_column="fid"), d,
                     extension=ext).write(spark)
    files = [f for f in os.listdir(d) if f.endswith("." + ext)]
    assert len(files) > 1, "expected per-partition files"
    got = {r["fid"]: (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
           for r in _read_back(spark, d, ext).plan(spark).collect()}
    assert len(got) == 40
    for fid, (x1, y1, x2, y2) in got.items():
        ax, ay = float(fid % 13), float((fid * 3) % 11)
        assert (x1, y1, x2, y2) == (ax, ay, ax + 4.0, ay + 4.0), fid


@pytest.mark.parametrize("ext", ["shp", "gpkg", "gml", "kml",
                                 "geojson"])
def test_merge_files(spark, ext):
    src = _donuts(spark, n=24)
    d = tempfile.mkdtemp(prefix="dgs_merge_" + ext)
    GeometryFileSink(DataFrameSource(src, index_column="fid"), d,
                     extension=ext).write(spark)
    target = os.path.join(tempfile.mkdtemp(prefix="dgs_mergedst_"),
                          "merged." + ext)
    merge_feature_files(d, target)
    assert os.path.exists(target)
    if ext == "geojson":
        import json
        with open(target) as f:
            doc = json.load(f)
        assert doc["type"] == "FeatureCollection"
        assert len(doc["features"]) == 24
        return
    rows = _read_back(
        spark, target, ext).plan(spark).collect()
    assert sorted(r["fid"] for r in rows) == list(range(24))
    # merging into an existing target must refuse
    with pytest.raises(IOError):
        merge_feature_files(d, target)
    # the classmethod alias mirrors the reference API
    assert GeometryFileSink.merge_files is not None


def test_sink_attribute_types_survive_shp(spark):
    """dbf N/F/L/C columns parse back to the written values (floats at
    the sink's 6-decimal dbf precision)."""
    src = _donuts(spark, n=12)
    d = tempfile.mkdtemp(prefix="dgs_shpattr_")
    GeometryFileSink(DataFrameSource(src, index_column="fid"), d,
                     extension="shp").write(spark)
    rows = {r["fid"]: r for r in
            _read_back(spark, d, "shp").plan(spark).collect()}
    for fid in range(12):
        r = rows[fid]
        assert r["label"] == "zone-{}".format(fid)
        assert r["flag"] == (fid % 4 == 0)
        assert round(r["score"], 6) == round(fid / 8, 6)


def test_sink_mode_semantics(spark):
    src = _donuts(spark, n=8)
    blk = DataFrameSource(src, index_column="fid")
    d = tempfile.mkdtemp(prefix="dgs_mode_")
    sink = GeometryFileSink(blk, d, extension="gml")
    sink.write(spark)
    n1 = len(os.listdir(d))
    sink.write(spark, mode="append")
    assert len(os.listdir(d)) == 2 * n1
    sink.write(spark, mode="overwrite")
    assert len(os.listdir(d)) == n1
    with pytest.raises(IOError):
        sink.write(spark, mode="errorifexists")


def test_dbf_name_collision_rejected(spark):
    df = spark.range(3).select(
        F.col("id").alias("fid"),
        F.lit(1).alias("a_very_long_column_x"),
        F.lit(2).alias("a_very_long_column_y"),
        F.expr("CAST(id AS DOUBLE)").alias("x"),
        F.expr("CAST(id AS DOUBLE)").alias("y"))
    sink = GeometryFileSink(DataFrameSource(df, index_column="fid"),
                            tempfile.mkdtemp(prefix="dgs_clash_"),
                            extension="shp")
    with pytest.raises(ValueError, match="collision"):
        sink.write(spark)


def test_reference_sink_graph_constructs_and_writes(spark):
    """A reference JSON view graph using GeometryFileSink with ITS
    default extension 'shp' (reference geometry/sinks.py:81) must
    construct against this package and write real shapefiles."""
    from dask_geomodeling_spark.core.blocks import construct
    src = _donuts(spark, n=6)
    d = tempfile.mkdtemp(prefix="dgs_refsink_")
    graph = {
        "src": ["dask_geomodeling_spark.geometry.sources."
                "DataFrameSource", src, "fid"],
        "sink": ["dask_geomodeling.geometry.sinks.GeometryFileSink",
                 "src", d, "shp", None],
    }
    block = construct(graph, "sink")
    assert isinstance(block, GeometryFileSink)
    block.write(spark)
    rows = _read_back(spark, d, "shp").plan(spark).collect()
    assert len(rows) == 6


def test_unsupported_extension_rejected():
    df = None
    with pytest.raises(ValueError, match="unsupported"):
        GeometryFileSink.__new__(GeometryFileSink)  # no-op alloc
        from dask_geomodeling_spark.geometry.sinks import (
            GeometryFileSink as S)
        S.__init__(S.__new__(S), df, "/tmp/x", extension="xyz")


def test_geojsonseq_roundtrip_and_merge(spark):
    """Round 9: geojsonseq (RFC 8142 newline-delimited GeoJSON) —
    one feature per line through the plain text writer, read back
    through the splittable line reader (explicit schema AND inference,
    RS-prefixed lines too), merged into one file."""
    from pyspark.sql import functions as F

    from dask_geomodeling_spark.geometry.sources import (
        FileGeometrySource)
    src = _donuts(spark, n=30)
    d = tempfile.mkdtemp(prefix="dgs_seq_")
    GeometryFileSink(DataFrameSource(src, index_column="fid"), d,
                     extension="geojsonseq").write(spark)
    schema = "fid BIGINT, flag BOOLEAN, label STRING, score DOUBLE"
    back = FileGeometrySource(d, format="geojsonseq", id_field="fid",
                              schema=schema)
    got = {r["fid"]: r for r in back.plan(spark).collect()}
    assert len(got) == 30
    for fid, r in got.items():
        ax, ay = float(fid % 13), float((fid * 3) % 11)
        assert (r["xmin"], r["ymin"]) == (ax, ay)
        assert (r["xmax"], r["ymax"]) == (ax + 4.0, ay + 4.0)
        assert r["label"] == "zone-{}".format(fid)
        assert len(r["rings"]) == 2  # donut survives as true rings
    # schema inference path
    inferred = FileGeometrySource(d, format="geojsonseq",
                                  id_field="fid")
    assert inferred.plan(spark).count() == 30
    # merge to ONE file, re-read it
    target = os.path.join(tempfile.mkdtemp(prefix="dgs_seqdst_"),
                          "all.geojsonseq")
    merge_feature_files(d, target)
    n_lines = sum(1 for line in open(target) if line.strip())
    assert n_lines == 30
    again = FileGeometrySource(target, format="geojsonseq",
                               id_field="fid", schema=schema)
    assert again.plan(spark).count() == 30
    # RS-prefixed variant (RFC 8142 record separators) parses too
    rs = os.path.join(tempfile.mkdtemp(prefix="dgs_rs_"),
                      "rs.geojsonseq")
    with open(rs, "w") as f:
        for line in open(target):
            if line.strip():
                f.write("\x1e" + line)
    assert FileGeometrySource(rs, format="geojsonseq", id_field="fid",
                              schema=schema).plan(spark).count() == 30


def test_shp_sink_dbf_collision_fails_before_rmtree(spark, tmp_path):
    """Round-13 review pass 3: the shp sink's 11-char dbf name
    collision must fail BEFORE the destructive overwrite rmtree."""
    import os

    import pytest

    from dask_geomodeling_spark.geometry.sinks import GeometryFileSink
    from dask_geomodeling_spark.geometry.sources import DataFrameSource
    out = str(tmp_path / "shpout")
    os.makedirs(out)
    marker = os.path.join(out, "keep.bin")
    open(marker, "w").write("x")
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, "a", "b")],
        "fid bigint, x double, y double, "
        "temperature_a string, temperature_b string")
    sink = GeometryFileSink(
        DataFrameSource(df, index_column="fid"), out, extension="shp")
    with pytest.raises(ValueError):
        sink.write(spark)
    assert os.path.exists(marker)
