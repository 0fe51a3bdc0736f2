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
           "ResizeImage", "SyntheticPPM", "SyntheticPNG", "MEDIA_SCHEMA",
           "SyntheticWAV", "ExtractAudioFeatures", "SyntheticImageZoo",
           "SniffImageMeta"]

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
    md5 chain → dim floats in [0, 1).  Stable across runs and machines.

    Defined entirely over *hex strings* so an external SQL engine can
    re-derive it: ``h1 = md5(upper_hex(payload))`` (a 32-char lowercase
    hexdigest), ``h[k+1] = md5(h[k])``, and each digest's 16 bytes map
    to ``byte/255``.  In DuckDB: ``md5(hex(payload))`` plus per-pair
    ``strpos('0123456789abcdef', ...)`` byte extraction."""
    seed = (payload or b"").hex().upper()
    h = hashlib.md5(seed.encode("ascii")).hexdigest()
    out = [b / 255.0 for b in bytes.fromhex(h)]
    while len(out) < dim:
        h = hashlib.md5(h.encode("ascii")).hexdigest()
        out.extend(b / 255.0 for b in bytes.fromhex(h))
    return out[:dim]


def _decode_ppm(payload: bytes):
    """Parse a binary P6 PPM: header tokens (magic, width, height,
    maxval; ``#`` comments allowed) then raw RGB triplets.  Returns
    (width, height, rgb_bytes)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = payload[i:i + width * height * 3]
    if len(data) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, data


def _decode_bmp(payload: bytes):
    """Parse a 24-bit uncompressed BMP (BITMAPINFOHEADER): bottom-up
    BGR rows padded to 4 bytes → top-down RGB bytes.  Returns
    (width, height, rgb_bytes)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP")
    bottom_up = height > 0
    height = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = (height - 1 - row) if bottom_up else row
        base = data_offset + src_row * stride
        for col in range(width):
            b, g, r = payload[base + 3 * col:base + 3 * col + 3]
            k = (row * width + col) * 3
            out[k], out[k + 1], out[k + 2] = r, g, b
    return width, height, bytes(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal REAL PNG writer: 8-bit RGB, filter 0 rows, one zlib
    IDAT — every chunk CRC-correct, readable by any PNG decoder."""
    import struct
    import zlib

    def chunk(typ, data):
        body = typ + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y * width * 3:(y + 1) * width * 3]
                   for y in range(height))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _decode_png(payload: bytes):
    """REAL pure-python PNG decode (stdlib zlib): 8-bit gray / RGB /
    gray+alpha / RGBA, non-interlaced, ALL five row filters (None,
    Sub, Up, Average, Paeth).  Returns (width, height, rgb_bytes);
    alpha drops, gray replicates to RGB — the feature contract of the
    other image codecs."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    width = height = channels = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, depth, ctype, _, _, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0:
                raise NotImplementedError(
                    "8-bit non-interlaced PNG only")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise NotImplementedError("palette PNG unsupported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width * channels
    bpp = channels
    out = bytearray(stride * height)
    prev = bytearray(stride)
    p = 0
    for y in range(height):
        f = raw[p]
        row = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 1:      # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 255
        elif f == 2:    # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 255
        elif f == 3:    # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 255
        elif f == 4:    # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                q = a + b - c
                qa, qb, qc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (qa <= qb and qa <= qc) else \
                    (b if qb <= qc else c)
                row[i] = (row[i] + pred) & 255
        elif f != 0:
            raise ValueError("bad PNG filter {}".format(f))
        out[y * stride:(y + 1) * stride] = row
        prev = row
    if channels == 3:
        rgb = bytes(out)
    elif channels == 4:
        rgb = bytes(v for i in range(0, len(out), 4)
                    for v in out[i:i + 3])
    elif channels == 1:
        rgb = bytes(v for g in out for v in (g, g, g))
    else:  # gray + alpha
        rgb = bytes(v for i in range(0, len(out), 2)
                    for v in (out[i], out[i], out[i]))
    return width, height, rgb


def _decode_image(payload: bytes):
    """Magic-byte dispatch: P6 PPM, 24-bit BMP, or 8-bit PNG."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    raise NotImplementedError(
        "unsupported image codec (P6 PPM, 24-bit BMP and 8-bit PNG are "
        "built in; other formats need PIL, not available in this "
        "container)")


def _encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _image_features(payload: bytes):
    """Real (codec-backed) feature vector — 8 floats, all exactly
    re-derivable in SQL from the pixel formula of a known synthetic
    image: [width, height, n_pixels, mean_r, mean_g, mean_b, min, max]."""
    width, height, rgb = _decode_image(bytes(payload))
    n = width * height
    chans = [rgb[c::3] for c in range(3)]
    return [float(width), float(height), float(n),
            sum(chans[0]) / n, sum(chans[1]) / n, sum(chans[2]) / n,
            float(min(rgb)), float(max(rgb))]


class SyntheticPPM(BaseSingle):
    """Deterministic P6 image generator for exercising the real codec
    path end-to-end: pixel byte ``i`` of row ``id`` is
    ``(id * 37 + i * 11) % 256`` — a closed form an external SQL oracle
    can aggregate without parsing binary.  Arrow-batched mapInPandas
    (same plumbing as a real ingest decode stage)."""

    def __init__(self, source, id_column="doc_id", width=4, height=4):
        super().__init__(source, id_column, int(width), int(height))

    def _build(self, ctx):
        df = self.source._build(ctx)
        id_column, width, height = self.args[1:4]
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("payload", T.BinaryType())])
        nbytes = width * height * 3

        def gen(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["payload"] = [
                    _encode_ppm(width, height, bytes(
                        (int(i) * 37 + k * 11) % 256
                        for k in range(nbytes)))
                    for i in pdf[id_column]]
                yield pdf

        return df.mapInPandas(gen, schema=schema)


class SyntheticPNG(BaseSingle):
    """Deterministic REAL-PNG generator (same pixel formula as
    SyntheticPPM — ``(id * 37 + i * 11) % 256`` — but the payload is a
    genuine zlib-compressed, CRC-chunked PNG file), so the full
    signature→IHDR→IDAT-inflate→unfilter decode path runs end-to-end
    under the same closed-form oracle."""

    def __init__(self, source, id_column="doc_id", width=4, height=4):
        super().__init__(source, id_column, int(width), int(height))

    def _build(self, ctx):
        df = self.source._build(ctx)
        id_column, width, height = self.args[1:4]
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("payload", T.BinaryType())])
        nbytes = width * height * 3

        def gen(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["payload"] = [
                    _encode_png(width, height, bytes(
                        (int(i) * 37 + k * 11) % 256
                        for k in range(nbytes)))
                    for i in pdf[id_column]]
                yield pdf

        return df.mapInPandas(gen, schema=schema)


class ExtractImageFeatures(BaseSingle):
    """Decode + feature-extract a binary media column via Arrow-batched
    ``mapInPandas`` (the real 100 TB shape: one python worker per
    partition, arrow batches, bounded memory).

    decode="fake" (default): deterministic hash-features, so the
    distributed plumbing is fully testable here.  decode="image": REAL
    pure-python codec (P6 PPM / 24-bit BMP) → 8 pixel-statistic
    features; ``dim`` is ignored.  decode="strict": raises
    NotImplementedError where an external codec (PIL/ffmpeg) would run.
    """

    def __init__(self, source, payload_column="payload", dim=16,
                 decode="fake"):
        if decode not in ("fake", "image", "strict"):
            raise ValueError("decode must be 'fake', 'image' or 'strict'")
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
                        "external image decode requires PIL/ffmpeg; "
                        "not available in this container")
                pdf = pdf.copy()
                if decode == "image":
                    pdf["features"] = [
                        _image_features(p) for p in pdf[payload_column]]
                else:
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
    decode="image": REAL pure-python nearest-neighbor resize for P6
    PPM / 24-bit BMP payloads — source pixel for output (r, c) is
    ``(r * src_h // dst_h, c * src_w // dst_w)`` (floor), re-encoded as
    P6.  decode="strict": raises NotImplementedError where PIL would
    run.
    """

    def __init__(self, source, width, height, payload_column="payload",
                 decode="fake"):
        if decode not in ("fake", "image", "strict"):
            raise ValueError("decode must be 'fake', 'image' or 'strict'")
        super().__init__(source, int(width), int(height), payload_column,
                         decode)

    @staticmethod
    def _resize_rgb(payload, dst_w, dst_h):
        src_w, src_h, rgb = _decode_image(bytes(payload))
        out = bytearray(dst_w * dst_h * 3)
        for r in range(dst_h):
            sr = r * src_h // dst_h
            for c in range(dst_w):
                sc = c * src_w // dst_w
                src = (sr * src_w + sc) * 3
                dst = (r * dst_w + c) * 3
                out[dst:dst + 3] = rgb[src:src + 3]
        return _encode_ppm(dst_w, dst_h, bytes(out))

    def _build(self, ctx):
        df = self.source._build(ctx)
        width, height, payload_column, decode = self.args[1:5]
        schema = df.schema

        def resize(batches):
            for pdf in batches:
                if decode == "strict":
                    raise NotImplementedError(
                        "external image resize requires PIL; not "
                        "available in this container")
                pdf = pdf.copy()
                if decode == "image":
                    pdf[payload_column] = [
                        self._resize_rgb(p, width, height)
                        for p in pdf[payload_column]]
                if "meta" in pdf.columns:
                    pdf["meta"] = [
                        {**(m if isinstance(m, dict) else m.asDict()),
                         "width": width, "height": height}
                        if m is not None else None
                        for m in pdf["meta"]]
                yield pdf

        return df.mapInPandas(resize, schema=schema)


def _encode_wav(sample_rate: int, channels: int, samples) -> bytes:
    """Minimal RIFF/WAVE PCM16 encoder (``samples``: interleaved int16
    frames) — the audio twin of ``_encode_ppm``."""
    import struct
    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    sample_rate, sample_rate * channels * 2,
                                    channels * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def _decode_wav(payload: bytes):
    """Parse an uncompressed RIFF/WAVE PCM16 payload →
    ``(sample_rate, channels, samples)``.  Chunk-walking parser: only
    format tag 1 (PCM) with 16-bit samples is supported; anything else
    raises NotImplementedError naming the offending field."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from(
                "<HHI", payload, pos + 8)
            (bits,) = struct.unpack_from("<H", payload, pos + 22)
            if fmt_tag != 1:
                raise NotImplementedError(
                    "compressed WAV (format {}) needs ffmpeg".format(
                        fmt_tag))
            if bits != 16:
                raise NotImplementedError(
                    "{}-bit WAV not supported (PCM16 only)".format(bits))
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    samples = list(struct.unpack("<{}h".format(n), data[:2 * n]))
    return rate, channels, samples


def _audio_features(payload: bytes):
    """[sample_rate, channels, n_frames, duration_s, mean, rms, peak]
    over all interleaved samples — integer sums are exact in doubles,
    so an external SQL oracle reproduces every value bit-for-bit."""
    import math
    rate, channels, samples = _decode_wav(bytes(payload))
    n = len(samples)
    frames = n // channels if channels else 0
    if n == 0:
        return [float(rate), float(channels), 0.0, 0.0, None, None, None]
    ssum = 0
    sq = 0
    peak = 0
    for s in samples:
        ssum += s
        sq += s * s
        if abs(s) > peak:
            peak = abs(s)
    return [float(rate), float(channels), float(frames),
            frames / float(rate), ssum / float(n),
            math.sqrt(sq / float(n)), float(peak)]


class SyntheticWAV(BaseSingle):
    """Deterministic PCM16 WAV generator (the audio ``SyntheticPPM``):
    sample ``k`` of row ``id`` is ``(id * 31 + k * 17) % 65536 - 32768``
    — a closed form an external SQL oracle aggregates without parsing
    binary.  Arrow-batched mapInPandas."""

    def __init__(self, source, id_column="doc_id", sample_rate=8000,
                 n_frames=16, channels=1):
        super().__init__(source, id_column, int(sample_rate),
                         int(n_frames), int(channels))

    def _build(self, ctx):
        df = self.source._build(ctx)
        id_column, rate, frames, channels = self.args[1:5]
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("payload", T.BinaryType())])
        n = frames * channels

        def gen(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["payload"] = [
                    _encode_wav(rate, channels, [
                        (int(i) * 31 + k * 17) % 65536 - 32768
                        for k in range(n)])
                    for i in pdf[id_column]]
                yield pdf

        return df.mapInPandas(gen, schema=schema)


class ExtractAudioFeatures(BaseSingle):
    """Decode + feature-extract a binary audio column via Arrow-batched
    ``mapInPandas`` (same plumbing contract as ExtractImageFeatures).

    decode="fake" (default): deterministic hash-features.
    decode="audio": REAL pure-python RIFF/PCM16 parser → 7 features
    ``[sample_rate, channels, n_frames, duration_s, mean, rms, peak]``.
    decode="strict": raises NotImplementedError where an external codec
    (ffmpeg/soundfile) would run.
    """

    def __init__(self, source, payload_column="payload", dim=16,
                 decode="fake"):
        if decode not in ("fake", "audio", "strict"):
            raise ValueError("decode must be 'fake', 'audio' or 'strict'")
        super().__init__(source, payload_column, int(dim), decode)

    def _build(self, ctx):
        df = self.source._build(ctx)
        payload_column, dim, decode = self.args[1:4]
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("features", T.ArrayType(T.DoubleType()))])

        def extract(batches):
            for pdf in batches:
                if decode == "strict":
                    raise NotImplementedError(
                        "external audio decode requires ffmpeg/soundfile; "
                        "not available in this container")
                pdf = pdf.copy()
                if decode == "audio":
                    pdf["features"] = [
                        _audio_features(p) for p in pdf[payload_column]]
                else:
                    pdf["features"] = [
                        _fake_features(
                            bytes(p) if p is not None else b"", dim)
                        for p in pdf[payload_column]]
                yield pdf

        return df.mapInPandas(extract, schema=schema)


def _encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal BITMAPINFOHEADER 24-bit BMP (rows not padded correctly
    for decode purposes — header-accurate, which is what the sniffing
    path consumes; the _decode_bmp codec keeps its own strict files)."""
    row = width * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        rgb[y * row:(y + 1) * row] + b"\x00" * pad
        for y in range(height - 1, -1, -1))
    size = 54 + len(body)
    import struct
    return (b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                          0, len(body), 2835, 2835, 0, 0) + body)


def _encode_gif(width: int, height: int) -> bytes:
    """Header-only GIF89a (logical screen descriptor + trailer)."""
    import struct
    return (b"GIF89a" + struct.pack("<HH", width, height)
            + b"\x00\x00\x00" + b"\x3b")


def _encode_jpeg_header(width: int, height: int) -> bytes:
    """Structurally valid JPEG prefix: SOI, an APP0 and a COM segment
    (so the sniffer must actually WALK the variable-length segment
    chain), SOF0 with the dimensions, EOI."""
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    com = b"\xff\xfe" + struct.pack(">H", 10) + b"synthetic"[:8]
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", height, width)
            + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


class SyntheticImageZoo(BaseSingle):
    """Per-row rotating-format image generator (round 12): row ``id``
    carries a ``fmt = id % 5`` image — 0=P6 PPM, 1=PNG, 2=BMP, 3=GIF,
    4=JPEG(header) — of width ``1 + id % 7`` and height
    ``1 + (id * 3) % 5``; every payload is a REAL header in its
    format, so :class:`SniffImageMeta` has to dispatch per row.
    Closed-form dimensions keep the oracle binary-free."""

    def __init__(self, source, id_column="doc_id"):
        super().__init__(source, id_column)

    @property
    def columns(self):
        return set(self.source.columns) | {"payload"}

    def _build(self, ctx):
        df = self.source._build(ctx)
        id_column = self.args[1]
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("payload", T.BinaryType())])

        def one(i):
            i = int(i)
            w, h = 1 + i % 7, 1 + (i * 3) % 5
            fmt = i % 5
            rgb = bytes((i * 37 + k * 11) % 256
                        for k in range(w * h * 3))
            if fmt == 0:
                return _encode_ppm(w, h, rgb)
            if fmt == 1:
                return _encode_png(w, h, rgb)
            if fmt == 2:
                return _encode_bmp(w, h, rgb)
            if fmt == 3:
                return _encode_gif(w, h)
            return _encode_jpeg_header(w, h)

        def gen(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["payload"] = [one(i) for i in pdf[id_column]]
                yield pdf

        return df.mapInPandas(gen, schema=schema)


def _be_sql(p, pos, n):
    """SQL text: big-endian unsigned int of n bytes at 1-based pos."""
    return "conv(hex(substring({p}, {pos}, {n})), 16, 10)".format(
        p=p, pos=pos, n=n)


def _le16_sql(p, pos):
    return ("({b0} + 256 * {b1})".format(
        b0=_be_sql(p, pos, 1), b1=_be_sql(p, pos + 1, 1)))


def _le32_sql(p, pos):
    return ("({b0} + 256 * ({b1} + 256 * ({b2} + 256 * {b3})))"
            .format(b0=_be_sql(p, pos, 1), b1=_be_sql(p, pos + 1, 1),
                    b2=_be_sql(p, pos + 2, 1),
                    b3=_be_sql(p, pos + 3, 1)))


#: JPEG SOFn markers that carry frame dimensions (C0-CF minus the
#: non-frame C4/C8/CC)
_JPEG_SOF = (192, 193, 194, 195, 197, 198, 199, 201, 202, 203,
             205, 206, 207)


def jpeg_dims_sql(p, max_segments=64):
    """SQL text: struct('w', 'h') from a JPEG's segment chain — a
    BOUNDED fold over at most ``max_segments`` variable-length
    segments (each step either finds a SOFn frame header or skips
    marker + payload via the big-endian length field).  Pure integer
    arithmetic; whole-stage codegen, no Python."""
    marker = _be_sql(p, "s.off + 1", 1)
    seglen = _be_sql(p, "s.off + 2", 2)
    h = _be_sql(p, "s.off + 5", 2)
    w = _be_sql(p, "s.off + 7", 2)
    sof = ", ".join(str(m) for m in _JPEG_SOF)
    return (
        "aggregate(sequence(1, {n}), "
        "named_struct('off', CAST(3 AS BIGINT), "
        "'w', CAST(NULL AS BIGINT), 'h', CAST(NULL AS BIGINT)), "
        "(s, i) -> CASE "
        "WHEN s.w IS NOT NULL OR s.off + 8 > octet_length({p}) THEN s "
        "WHEN {first} != 255 THEN named_struct("
        "'off', CAST(octet_length({p}) AS BIGINT), 'w', s.w, 'h', s.h) "
        # repeated 0xFF are legal fill bytes before a marker
        # (ITU T.81 B.1.1.2) — step over them one at a time instead
        # of mis-reading the second 0xFF as a marker id (round-13
        # ADVICE fix); each fill byte consumes one step of the
        # bounded budget, which is the documented trade
        "WHEN {marker} = 255 THEN named_struct("
        "'off', s.off + 1, 'w', s.w, 'h', s.h) "
        "WHEN {marker} IN ({sof}) THEN named_struct('off', s.off, "
        "'w', {w}, 'h', {h}) "
        "ELSE named_struct('off', s.off + 2 + {seglen}, "
        "'w', s.w, 'h', s.h) END, "
        "s -> named_struct('w', s.w, 'h', s.h))"
    ).format(n=max_segments, p=p, marker=marker, seglen=seglen,
             w=w, h=h, first=_be_sql(p, "s.off", 1), sof=sof)


class SniffImageMeta(BaseSingle):
    """Image format + dimensions from the binary HEADER — PURE column
    math, no Python, no decode (round 12).  The 100 TB point: size /
    format filters ("drop icons under 64px", "JPEG only") must push
    BEFORE any Arrow-batched decode stage ever sees the payload; a
    sniffer that round-trips bytes through Python defeats that.

    Detects P6 PPM (ASCII header regexp), PNG (IHDR big-endian), BMP
    (BITMAPINFOHEADER-family little-endian, top-down negatives folded
    by abs; legacy BITMAPCOREHEADER layouts detected via the
    info-header size field and reported as NULL dims), GIF87a/89a
    (logical screen little-endian) and JPEG (a bounded in-SQL fold
    over the variable-length segment chain to the SOFn frame header —
    ``jpeg_dims_sql``; 0xFF fill bytes before markers are stepped
    over).  Unknown/short payloads yield NULLs.  Adds ``img_format``,
    ``img_width``, ``img_height``."""

    def __init__(self, source, column="payload"):
        clash = {"img_format", "img_width", "img_height"} \
            & set(source.columns)
        if clash:
            raise ValueError(
                "column(s) {} collide with SniffImageMeta's output"
                .format(sorted(clash)))
        super().__init__(source, str(column))

    @property
    def columns(self):
        return set(self.source.columns) | {"img_format", "img_width",
                                           "img_height"}

    def _build(self, ctx):
        df = self.source._build(ctx)
        p = "`{}`".format(self.args[1])
        pfx = "hex(substring({p}, 1, 8))".format(p=p)
        fmt = (
            "CASE WHEN {p} IS NULL THEN NULL "
            "WHEN {pfx} LIKE '89504E470D0A1A0A%' THEN 'png' "
            "WHEN {pfx} LIKE '474946383761%' "
            "OR {pfx} LIKE '474946383961%' THEN 'gif' "
            "WHEN {pfx} LIKE '424D%' THEN 'bmp' "
            "WHEN {pfx} LIKE 'FFD8%' THEN 'jpeg' "
            "WHEN {pfx} LIKE '5036%' THEN 'ppm' "
            "END").format(p=p, pfx=pfx)
        ppm_hdr = ("CAST(substring({p}, 1, 32) AS STRING)"
                   .format(p=p))
        jpeg = jpeg_dims_sql(p)
        # the dimension layout below (i32 at 19/23) is the
        # BITMAPINFOHEADER family only — legacy BITMAPCOREHEADER
        # (size 12, u16 dims) matches the 'BM' signature but decodes
        # to garbage there, so gate on the info-header size field
        # (round-13 ADVICE fix): unknown layouts -> NULL dims, the
        # documented behavior
        bmp_ok = ("{hs} IN (40, 52, 56, 64, 108, 124)"
                  .format(hs=_le32_sql(p, 15)))
        w = ("CASE img_format "
             "WHEN 'png' THEN {png_w} "
             "WHEN 'gif' THEN {gif_w} "
             "WHEN 'bmp' THEN IF({bmp_ok}, abs({bmp_w}), NULL) "
             "WHEN 'jpeg' THEN ({jpeg}).w "
             "WHEN 'ppm' THEN CAST(regexp_extract({ppm}, "
             "'^P6\\\\s+(\\\\d+)\\\\s+(\\\\d+)', 1) AS BIGINT) "
             "END").format(png_w=_be_sql(p, 17, 4),
                           gif_w=_le16_sql(p, 7),
                           bmp_ok=bmp_ok,
                           bmp_w=_le32_sql(p, 19),
                           jpeg=jpeg, ppm=ppm_hdr)
        # BMP little-endian i32 height: reassemble LE, then
        # two's-complement (negative = top-down row order; abs folds)
        bmp_h_le = ("({le} - CASE WHEN {msb} >= 128 "
                    "THEN 4294967296 ELSE 0 END)"
                    .format(le=_le32_sql(p, 23),
                            msb=_be_sql(p, 26, 1)))
        h = ("CASE img_format "
             "WHEN 'png' THEN {png_h} "
             "WHEN 'gif' THEN {gif_h} "
             "WHEN 'bmp' THEN IF({bmp_ok}, abs({bmp_h}), NULL) "
             "WHEN 'jpeg' THEN ({jpeg}).h "
             "WHEN 'ppm' THEN CAST(regexp_extract({ppm}, "
             "'^P6\\\\s+(\\\\d+)\\\\s+(\\\\d+)', 2) AS BIGINT) "
             "END").format(png_h=_be_sql(p, 21, 4),
                           gif_h=_le16_sql(p, 9),
                           bmp_ok=bmp_ok,
                           bmp_h=bmp_h_le, jpeg=jpeg, ppm=ppm_hdr)
        return (df.withColumn("img_format", F.expr(fmt))
                .withColumn("img_width",
                            F.expr(w).cast("bigint"))
                .withColumn("img_height",
                            F.expr(h).cast("bigint")))
