"""WARC/WET container (pipeline/warc.py): record splitting, header
parsing, payload fidelity, type filtering, request pushdown."""

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.pipeline.warc import WarcSource, WETSink


def _write_raw(path, body):
    with open(path, "wb") as f:
        f.write(body)


def test_handwritten_wet_with_warcinfo(spark, tmp_path):
    body = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 10\r\n\r\n"
        b"robots: ok\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://a.example/x\r\n"
        b"WARC-Date: 2024-03-05T12:30:00Z\r\n"
        b"WARC-Record-ID: <urn:uuid:abc>\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: 11\r\n\r\n"
        b"hello world\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://b.example/y\r\n"
        b"Content-Length: 3\r\n\r\n"
        b"two\r\n\r\n")
    _write_raw(str(tmp_path / "s.wet"), body)
    src = WarcSource(str(tmp_path / "s.wet"))
    rows = {r["warc_type"]: r for r in src.plan(spark).collect()}
    assert set(rows) == {"warcinfo", "conversion"} or len(rows) >= 2
    all_rows = src.plan(spark).collect()
    assert len(all_rows) == 3
    conv = WarcSource(str(tmp_path / "s.wet"), warc_type="conversion")
    out = {r["uri"]: r for r in conv.plan(spark).collect()}
    assert len(out) == 2
    a = out["http://a.example/x"]
    assert a["text"] == "hello world"
    assert a["content_length"] == 11
    assert a["record_id"] == "<urn:uuid:abc>"
    assert str(a["date"]).startswith("2024-03-05 12:30")
    assert out["http://b.example/y"]["text"] == "two"


def test_sink_roundtrip_payload_exact(spark, tmp_path):
    rows = [("http://x/1", "alpha beta  gamma"),
            ("http://x/2", "tab\tand  spaces"),
            ("http://x/3", "unicode éü中 payload")]
    df = spark.createDataFrame(rows, "uri string, text string")
    url = str(tmp_path / "wet")
    WETSink(DataFrameSource(df, index_column="uri"), url).write(spark)
    out = {r["uri"]: r["text"] for r in
           WarcSource(url, warc_type="conversion").plan(spark).collect()}
    assert out == dict(rows)
    # Content-Length counts BYTES (the multi-byte row differs from
    # its char count)
    cl = {r["uri"]: r["content_length"] for r in
          WarcSource(url).plan(spark).collect()}
    assert cl["http://x/3"] == len(
        "unicode éü中 payload".encode("utf-8"))


def test_request_filters_and_limit(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://a/{}".format(i), "t{}".format(i)) for i in range(20)],
        "uri string, text string")
    url = str(tmp_path / "wet")
    WETSink(DataFrameSource(df, index_column="uri"), url).write(spark)
    src = WarcSource(url, warc_type="conversion")
    assert src.plan(
        spark, filters={"uri__startswith": "http://a/1"}).count() == 11
    assert src.plan(spark, limit=5).count() == 5


def test_warc_header_parsing_anchored_and_case_insensitive(spark,
                                                           tmp_path):
    """Round-13 byte-level hunt fixes, pinned: a junk suffix header
    (X-WARC-Date:) must not poison the real WARC-Date, and ISO 28500
    field names parse case-insensitively."""
    from dask_geomodeling_spark.pipeline.warc import WarcSource
    shard = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "X-WARC-Date: 1999-09-09T09:09:09Z\r\n"
        "WARC-Target-URI: http://ex/1\r\n"
        "WARC-Date: 2024-01-02T03:04:05Z\r\n"
        "Content-Length: 5\r\n\r\nhello\r\n\r\n"
        "WARC/1.0\r\n"
        "warc-type: conversion\r\n"
        "warc-target-uri: http://ex/2\r\n"
        "content-length: 4\r\n\r\ncase\r\n\r\n")
    p = tmp_path / "shard.wet"
    p.write_bytes(shard.encode("utf-8"))
    rows = {r["uri"]: r for r in WarcSource(str(p)).plan(spark)
            .collect()}
    assert str(rows["http://ex/1"]["date"]) == "2024-01-02 03:04:05"
    assert rows["http://ex/2"]["text"] == "case"
    assert rows["http://ex/2"]["content_length"] == 4
    assert rows["http://ex/2"]["warc_type"] == "conversion"
