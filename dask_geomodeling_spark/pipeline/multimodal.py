"""Multimodal column plumbing (SURVEY.md §2 'LLM-data-pipeline
extensions').

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct.  The Spark-side plumbing is real and tested — schemas, Arrow-
batched ``mapInPandas`` signatures, partition sizing — while the actual
codec work is stubbed (no image/audio libraries in this container):
``decode=fake`` produces a deterministic feature vector from the bytes'
hash so downstream operators (dedup, ANN) can be exercised end to end;
``decode=strict`` raises NotImplementedError at the decode step.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_geomodeling_spark.geometry.base import BaseSingle

__all__ = ["AttachBinaryMetadata", "ExtractImageFeatures", "FrameSample",
           "ResizeImage", "MEDIA_SCHEMA"]

#: canonical multimodal column bundle
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])


class AttachBinaryMetadata(BaseSingle):
    """Turn a column into an opaque media payload with typed metadata —
    the schema normalization step of a multimodal ingest.  Pure column
    ops; payload bytes are never inspected JVM-side."""

    def __init__(self, source, column, mime="application/octet-stream"):
        super().__init__(source, column, mime)

    def _build(self, ctx):
        df = self.source._build(ctx)
        payload = F.col(self.args[1]).cast("binary")
        meta = F.struct(
            F.lit(self.args[2]).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("bigint").alias("duration_ms"))
        return (df.withColumn("payload", payload)
                  .withColumn("meta", meta))


def _fake_features(payload: bytes, dim: int):
    """Deterministic stand-in for a real image/audio encoder: bytes →
    md5 → dim floats in [0, 1).  Stable across runs and machines."""
    out = []
    seed = payload or b""
    h = hashlib.md5(seed).digest()
    while len(out) < dim:
        h = hashlib.md5(h).digest()
        out.extend(b / 255.0 for b in h)
    return out[:dim]


class ExtractImageFeatures(BaseSingle):
    """Decode + feature-extract a binary media column via Arrow-batched
    ``mapInPandas`` (the real 100 TB shape: one python worker per
    partition, arrow batches, bounded memory).

    decode="fake" (default): deterministic hash-features, so the
    distributed plumbing is fully testable here.  decode="strict":
    raises NotImplementedError where a real codec (PIL/ffmpeg) would run.
    """

    def __init__(self, source, payload_column="payload", dim=16,
                 decode="fake"):
        if decode not in ("fake", "strict"):
            raise ValueError("decode must be 'fake' or 'strict'")
        super().__init__(source, payload_column, int(dim), decode)

    def _build(self, ctx):
        df = self.source._build(ctx)
        payload_column, dim, decode = self.args[1], self.args[2], self.args[3]
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("features", T.ArrayType(T.DoubleType()))])

        def extract(batches):
            for pdf in batches:
                if decode == "strict":
                    raise NotImplementedError(
                        "real image decode requires PIL/ffmpeg; "
                        "not available in this container")
                pdf = pdf.copy()
                pdf["features"] = [
                    _fake_features(
                        bytes(p) if p is not None else b"", dim)
                    for p in pdf[payload_column]]
                yield pdf

        return df.mapInPandas(extract, schema=schema)


class FrameSample(BaseSingle):
    """Video frame sampling stub: emits ``n_frames`` (media_id, frame_no)
    rows per payload — the explode/fan-out plumbing of a real frame
    sampler, with the decode left to a codec UDF.  JVM-side explode, no
    Python."""

    def __init__(self, source, id_column="media_id", n_frames=4):
        super().__init__(source, id_column, int(n_frames))

    def _build(self, ctx):
        df = self.source._build(ctx)
        return df.select(
            F.col(self.args[1]),
            F.explode(F.sequence(F.lit(0), F.lit(self.args[2] - 1)))
            .alias("frame_no"))


class ResizeImage(BaseSingle):
    """Image resize stub over Arrow-batched ``mapInPandas`` — the
    distributed plumbing (schema with width/height metadata update,
    bounded batches) is real; the pixel work is stubbed.

    decode="fake": passes the payload through and stamps the target
    dimensions into the metadata struct (deterministic, testable).
    decode="strict": raises NotImplementedError where PIL would run.
    """

    def __init__(self, source, width, height, payload_column="payload",
                 decode="fake"):
        if decode not in ("fake", "strict"):
            raise ValueError("decode must be 'fake' or 'strict'")
        super().__init__(source, int(width), int(height), payload_column,
                         decode)

    def _build(self, ctx):
        df = self.source._build(ctx)
        width, height, payload_column, decode = self.args[1:5]
        schema = df.schema

        def resize(batches):
            for pdf in batches:
                if decode == "strict":
                    raise NotImplementedError(
                        "real image resize requires PIL; not available "
                        "in this container")
                pdf = pdf.copy()
                pdf["meta"] = [
                    {**(m if isinstance(m, dict) else m.asDict()),
                     "width": width, "height": height}
                    if m is not None else None
                    for m in pdf["meta"]]
                yield pdf

        return df.mapInPandas(resize, schema=schema)
