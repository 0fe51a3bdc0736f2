"""FlatGeobuf ingestion without GDAL.

The reference reads ``.fgb`` through fiona/OGR (``GeometryFileSource``,
reference geometry/sources.py:18).  FlatGeobuf is a fully published
format (flatgeobuf.org): an 8-byte magic, a FlatBuffers ``Header``
table (schema + feature count + index node size), an optional packed
Hilbert R-tree, then size-prefixed FlatBuffers ``Feature`` records.
FlatBuffers itself is a public spec (vtables + forward uoffsets), so
both directions here are plain ``struct`` arithmetic — the same
no-native-dependency contract as the shapefile and GeoPackage codecs.

Scale shape: one ``binaryFile`` task per file, Arrow-batched parse,
no shuffle — the feature stream is sequential by construction (the
size prefix delimits records), and the spatial index is skipped on
read (a full scan never needs it) and omitted on write
(``index_node_size = 0``, which the spec allows).

Geometry profile: Point, Polygon, MultiPolygon (rings normalized to
the engine contract: outer CCW, holes CW).  Properties follow the
spec's packed column encoding (u16 column index + typed value).
"""

from __future__ import annotations

import struct

from pyspark.sql import types as T

from dask_geomodeling_spark.geometry.base import (GeometryBlock,
                                                  apply_feature_request)
from dask_geomodeling_spark.geometry.sources import _oriented

__all__ = ["read_fgb", "write_fgb", "FlatGeobufGeometrySource"]

_MAGIC = b"fgb\x03fgb\x00"

#: FlatGeobuf GeometryType enum
_GT_POINT, _GT_POLYGON, _GT_MULTIPOLYGON = 1, 3, 6

#: ColumnType enum → (struct fmt | 'str'/'bytes', Spark DDL)
_COLTYPES = {
    0: ("<b", "TINYINT"), 1: ("<B", "SMALLINT"), 2: ("?", "BOOLEAN"),
    3: ("<h", "SMALLINT"), 4: ("<H", "INT"), 5: ("<i", "INT"),
    6: ("<I", "BIGINT"), 7: ("<q", "BIGINT"), 8: ("<Q", "BIGINT"),
    9: ("<f", "FLOAT"), 10: ("<d", "DOUBLE"), 11: ("str", "STRING"),
    12: ("str", "STRING"), 13: ("str", "STRING"),
    14: ("bytes", "BINARY"),
}
_CT_BY_DDL = {"BOOLEAN": 2, "INT": 5, "BIGINT": 7, "DOUBLE": 10,
              "STRING": 11, "BINARY": 14}

_GEOM_SCHEMA = [
    ("x", T.DoubleType()), ("y", T.DoubleType()),
    ("xmin", T.DoubleType()), ("ymin", T.DoubleType()),
    ("xmax", T.DoubleType()), ("ymax", T.DoubleType()),
    ("vertices", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ("rings", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
]
_GEOM_FIELDS = tuple(n for n, _ in _GEOM_SCHEMA)


# --------------------------------------------------------------------------
# FlatBuffers reading primitives (public wire format: root uoffset →
# table; table starts with an i32 soffset back to its vtable; vtable
# is u16 sizes then u16 field offsets; all uoffsets point forward)
# --------------------------------------------------------------------------

def _u16(b, p):
    return struct.unpack_from("<H", b, p)[0]


def _u32(b, p):
    return struct.unpack_from("<I", b, p)[0]


class _Table:
    def __init__(self, buf, pos):
        self.buf, self.pos = buf, pos
        self.vt = pos - struct.unpack_from("<i", buf, pos)[0]
        self.vt_size = _u16(buf, self.vt)

    def _field(self, idx):
        off = 4 + 2 * idx
        if off >= self.vt_size:
            return None
        rel = _u16(self.buf, self.vt + off)
        return self.pos + rel if rel else None

    def scalar(self, idx, fmt, default=0):
        p = self._field(idx)
        return struct.unpack_from(fmt, self.buf, p)[0] if p else default

    def _indirect(self, idx):
        p = self._field(idx)
        return p + _u32(self.buf, p) if p is not None else None

    def string(self, idx):
        o = self._indirect(idx)
        if o is None:
            return None
        n = _u32(self.buf, o)
        return self.buf[o + 4:o + 4 + n].decode("utf-8")

    def vector(self, idx):
        """(data_pos, count) or None."""
        o = self._indirect(idx)
        return (o + 4, _u32(self.buf, o)) if o is not None else None

    def table(self, idx):
        o = self._indirect(idx)
        return _Table(self.buf, o) if o is not None else None

    def table_vector(self, idx):
        v = self.vector(idx)
        if v is None:
            return []
        pos, n = v
        return [_Table(self.buf, pos + 4 * i + _u32(self.buf, pos + 4 * i))
                for i in range(n)]


def _index_size(num_items, node_size):
    """Byte size of the packed Hilbert R-tree (spec: 40-byte nodes,
    level widths from the leaves up)."""
    n, num_nodes = num_items, num_items
    while n != 1:
        n = (n + node_size - 1) // node_size
        num_nodes += n
    return num_nodes * 40


def _rings_from_xy(buf, xy, ends):
    """xy vector + ends (coordinate-pair end indices) → open rings."""
    pos, n = xy
    flat = struct.unpack_from("<{}d".format(n), buf, pos)
    bounds = (list(struct.unpack_from("<{}I".format(ends[1]), buf,
                                      ends[0]))
              if ends else [n // 2])
    rings, start = [], 0
    for end in bounds:
        ring = [[flat[2 * i], flat[2 * i + 1]] for i in range(start, end)]
        if len(ring) > 1 and ring[0] == ring[-1]:
            ring.pop()
        rings.append(ring)
        start = end
    return rings


def _geom_fields(buf, geom, header_type):
    out = dict.fromkeys(_GEOM_FIELDS)
    if geom is None:
        return out
    typ = geom.scalar(6, "<B") or header_type
    if typ == _GT_POINT:
        pos, _ = geom.vector(1)
        x, y = struct.unpack_from("<2d", buf, pos)
        out.update(x=x, y=y, xmin=x, ymin=y, xmax=x, ymax=y)
        return out
    if typ == _GT_POLYGON:
        polys = [_rings_from_xy(buf, geom.vector(1), geom.vector(0))]
    elif typ == _GT_MULTIPOLYGON:
        polys = [_rings_from_xy(buf, part.vector(1), part.vector(0))
                 for part in geom.table_vector(7)]
    else:
        raise NotImplementedError(
            "FlatGeobuf geometry type {} unsupported (Point/Polygon/"
            "MultiPolygon; reference reads others via OGR — "
            "geometry/sources.py:18)".format(typ))
    rings = []
    for poly in polys:
        rings.append(_oriented(poly[0], ccw=True))
        rings.extend(_oriented(h, ccw=False) for h in poly[1:])
    pts = [p for r in rings for p in r]
    out.update(xmin=min(p[0] for p in pts), ymin=min(p[1] for p in pts),
               xmax=max(p[0] for p in pts), ymax=max(p[1] for p in pts),
               vertices=rings[0], rings=rings)
    return out


def _decode_properties(buf, vec, columns):
    out = {}
    if vec is None:
        return out
    pos, n = vec
    end = pos + n
    while pos < end:
        idx = _u16(buf, pos)
        pos += 2
        name, fmt = columns[idx]
        if fmt in ("str", "bytes"):
            ln = _u32(buf, pos)
            raw = buf[pos + 4:pos + 4 + ln]
            out[name] = raw.decode("utf-8") if fmt == "str" else bytes(raw)
            pos += 4 + ln
        else:
            out[name] = struct.unpack_from(fmt, buf, pos)[0]
            pos += struct.calcsize(fmt)
    return out


def read_fgb(content):
    """``.fgb`` bytes → (columns [(name, spark_ddl)], feature dicts
    with typed geometry fields under ``__geom__``)."""
    buf = bytes(content)
    if buf[:8] != _MAGIC:
        raise ValueError("not a FlatGeobuf file (magic {!r})"
                         .format(buf[:8]))
    hsize = _u32(buf, 8)
    header = _Table(buf, 12 + _u32(buf, 12))
    geometry_type = header.scalar(2, "<B")
    cols = [(c.string(0), _COLTYPES[c.scalar(1, "<B")])
            for c in header.table_vector(7)]
    columns = [(name, fmt) for name, (fmt, _) in cols]
    ddl = [(name, d) for name, (_, d) in cols]
    features_count = header.scalar(8, "<Q")
    node_size = header.scalar(9, "<H", default=16)
    pos = 12 + hsize
    if node_size > 0 and features_count > 0:
        pos += _index_size(features_count, node_size)
    out = []
    while pos + 4 <= len(buf):
        fsize = _u32(buf, pos)
        if fsize == 0:
            break
        fbuf = buf[pos + 4:pos + 4 + fsize]
        feat = _Table(fbuf, _u32(fbuf, 0))
        rec = _decode_properties(fbuf, feat.vector(1), columns)
        rec["__geom__"] = _geom_fields(fbuf, feat.table(0),
                                      geometry_type)
        out.append(rec)
        pos += 4 + fsize
    return ddl, out


# --------------------------------------------------------------------------
# writer — minimal spec-compliant FlatBuffers assembly (forward
# uoffsets, one vtable per table, no index; fixture/interchange
# utility, the distributed egress path stays columnar)
# --------------------------------------------------------------------------

class _Builder:
    """Forward-layout FlatBuffers assembly: tables first, payload
    blobs after, uoffset fields patched once positions are known."""

    def __init__(self):
        self.buf = bytearray()
        self.patches = []  # (field_pos, target_id)
        self.targets = {}  # target_id -> abs pos

    def pad_to(self, align):
        while len(self.buf) % align:
            self.buf += b"\x00"

    def table(self, slots):
        """slots: list of (idx, kind, value); kind in u8/u16/u32/u64/
        f64/offset.  Returns table abs pos."""
        sizes = {"u8": 1, "u16": 2, "u32": 4, "u64": 8, "f64": 8,
                 "offset": 4}
        fmts = {"u8": "<B", "u16": "<H", "u32": "<I", "u64": "<Q",
                "f64": "<d"}
        nslots = max(i for i, _, _ in slots) + 1 if slots else 0
        vt_size = 4 + 2 * nslots
        # field layout: widest first for alignment, stable otherwise
        order = sorted(slots, key=lambda s: -sizes[s[1]])
        field_rel, off = {}, 4  # 4 = the soffset itself
        for idx, kind, _ in order:
            sz = sizes[kind]
            off = (off + sz - 1) // sz * sz
            field_rel[idx] = off
            off += sz
        tab_size = off
        self.pad_to(2)
        vt_pos = len(self.buf)
        self.buf += struct.pack("<HH", vt_size, tab_size)
        for i in range(nslots):
            self.buf += struct.pack("<H", field_rel.get(i, 0))
        self.pad_to(4)
        tab_pos = len(self.buf)
        self.buf += struct.pack("<i", tab_pos - vt_pos)
        self.buf += b"\x00" * (tab_size - 4)
        for idx, kind, value in slots:
            p = tab_pos + field_rel[idx]
            if kind == "offset":
                self.patches.append((p, value))
            else:
                struct.pack_into(fmts[kind], self.buf, p, value)
        return tab_pos

    def blob(self, target_id, payload, align=4, count=None):
        """Vector/string payload: u32 length prefix + bytes."""
        self.pad_to(align if align >= 4 else 4)
        # length prefix is u32; data after it must hit `align`
        while (len(self.buf) + 4) % align:
            self.buf += b"\x00"
        pos = len(self.buf)
        n = count if count is not None else len(payload)
        self.buf += struct.pack("<I", n) + payload
        self.targets[target_id] = pos
        return pos

    def finish(self):
        for pos, target_id in self.patches:
            struct.pack_into("<I", self.buf, pos,
                             self.targets[target_id] - pos)
        return bytes(self.buf)


def _feature_buffer(row, fields):
    """One size-prefixed Feature flatbuffer."""
    from dask_geomodeling_spark.geometry.shapefile import _row_rings
    b = _Builder()
    b.buf += b"\x00\x00\x00\x00"  # root uoffset placeholder
    rings = _row_rings(row)
    props = bytearray()
    for i, (name, ddl) in enumerate(fields):
        v = row.get(name)
        if v is None:
            continue
        props += struct.pack("<H", i)
        ct = _CT_BY_DDL[ddl]
        if ct == 11:
            raw = str(v).encode("utf-8")
            props += struct.pack("<I", len(raw)) + raw
        elif ct == 14:
            props += struct.pack("<I", len(v)) + bytes(v)
        elif ct == 2:
            props += struct.pack("?", bool(v))
        elif ct == 5:
            props += struct.pack("<i", int(v))
        elif ct == 7:
            props += struct.pack("<q", int(v))
        else:
            props += struct.pack("<d", float(v))

    geom_slots = []
    if rings is not None:
        closed = [list(r) + [list(r[0])] for r in rings]
        geom_slots = [(1, "offset", "xy"), (6, "u8", _GT_POLYGON)]
        if len(closed) > 1:
            geom_slots.append((0, "offset", "ends"))
    elif row.get("x") is not None:
        geom_slots = [(1, "offset", "xy"), (6, "u8", _GT_POINT)]

    feat_slots = []
    if geom_slots:
        feat_slots.append((0, "offset", "geom"))
    if props:
        feat_slots.append((1, "offset", "props"))
    feat_pos = b.table(feat_slots)
    struct.pack_into("<I", b.buf, 0, feat_pos)
    if geom_slots:
        b.targets["geom"] = b.table(geom_slots)
        # geometry table references its vectors
        if rings is not None:
            flat = [c for r in closed for p in r for c in p]
            b.blob("xy", struct.pack("<{}d".format(len(flat)), *flat),
                   align=8, count=len(flat))
            if len(closed) > 1:
                ends, acc = [], 0
                for r in closed:
                    acc += len(r)
                    ends.append(acc)
                b.blob("ends", struct.pack("<{}I".format(len(ends)),
                                           *ends), count=len(ends))
        else:
            b.blob("xy", struct.pack("<2d", row["x"], row["y"]),
                   align=8, count=2)
    if props:
        b.blob("props", bytes(props), count=len(props))
    out = b.finish()
    return struct.pack("<I", len(out)) + out


def write_fgb(path, rows, fields, name="layer"):
    """Write a spec-compliant FlatGeobuf (no spatial index —
    ``index_node_size = 0``).  ``fields``: [(name, ddl)] with ddl in
    BOOLEAN/INT/BIGINT/DOUBLE/STRING/BINARY."""
    b = _Builder()
    geometry_type = _GT_POINT
    for row in rows:
        if row.get("rings") or row.get("vertices") or (
                row.get("xmin") is not None and row.get("x") is None):
            geometry_type = _GT_POLYGON
            break
    # header flatbuffer: root uoffset + Header table + columns
    b.buf += b"\x00\x00\x00\x00"
    col_ids = ["col{}".format(i) for i in range(len(fields))]
    hdr_pos = b.table([
        (0, "offset", "name"), (2, "u8", geometry_type),
        (7, "offset", "cols"), (8, "u64", len(rows)),
        (9, "u16", 0),  # index_node_size = 0: no index
    ])
    struct.pack_into("<I", b.buf, 0, hdr_pos)
    # uoffsets point FORWARD: the column vector must precede the
    # Column tables it references, which precede their name strings
    b.pad_to(4)
    colvec_pos = len(b.buf)
    b.buf += struct.pack("<I", len(fields))
    for cid in col_ids:
        b.patches.append((len(b.buf), cid))
        b.buf += b"\x00\x00\x00\x00"
    b.targets["cols"] = colvec_pos
    for cid, (cname, ddl) in zip(col_ids, fields):
        b.targets[cid] = b.table([
            (0, "offset", "name:" + cid),
            (1, "u8", _CT_BY_DDL[ddl]),
        ])
    nm = name.encode("utf-8")
    b.blob("name", nm + b"\x00", count=len(nm))
    for cid, (cname, _) in zip(col_ids, fields):
        raw = cname.encode("utf-8")
        b.blob("name:" + cid, raw + b"\x00", count=len(raw))
    header = b.finish()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        for row in rows:
            f.write(_feature_buffer(row, fields))
    return path


class FlatGeobufGeometrySource(GeometryBlock):
    """Read FlatGeobuf feature files (reference: GeometryFileSource
    via fiona/OGR, geometry/sources.py:18) — pure-spec FlatBuffers
    walk, no GDAL.

    ``url``: a ``.fgb`` path or a directory of them.  ``schema``:
    attribute DDL contract; omit to infer driver-side from the first
    file's header (local filesystems only).  One ``binaryFile`` task
    per file; the optional Hilbert index block is skipped.
    """

    def __init__(self, url, id_field="fid", schema=None,
                 projection="EPSG:4326"):
        if not isinstance(url, str):
            raise TypeError("'{}' object is not allowed".format(type(url)))
        super().__init__(url, id_field, schema, str(projection).upper())

    @property
    def index_column(self):
        return self.args[1]

    @property
    def projection(self):
        return self.args[3]

    @property
    def columns(self):
        return set()

    @staticmethod
    def infer_schema(url):
        import glob
        path = url[7:] if url.startswith("file://") else url
        if not path.endswith(".fgb"):
            found = sorted(glob.glob(path.rstrip("/") + "/*.fgb"))
            if not found:
                raise ValueError("no .fgb under {!r}; pass an explicit "
                                 "schema".format(url))
            path = found[0]
        with open(path, "rb") as f:
            head = f.read(12)
            hsize = _u32(head, 8)
            buf = head + f.read(hsize)
        header = _Table(buf, 12 + _u32(buf, 12))
        return ", ".join("{} {}".format(c.string(0),
                                        _COLTYPES[c.scalar(1, "<B")][1])
                         for c in header.table_vector(7))

    def _build(self, ctx):
        url, _, schema, _ = self.args
        if schema is None:
            schema = self.infer_schema(url)
        prop_fields = T._parse_datatype_string(schema).fields
        prop_names = [f.name for f in prop_fields]
        out_schema = T.StructType(
            [T.StructField("_file", T.StringType()),
             T.StructField("fid", T.LongType())] + prop_fields
            + [T.StructField(n, t) for n, t in _GEOM_SCHEMA])

        def parse(batches):
            import pandas as pd
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                    _, recs = read_fgb(content)
                    for fid, rec in enumerate(recs):
                        geom = rec["__geom__"]
                        rows.append(
                            (stem, fid)
                            + tuple(rec.get(n) for n in prop_names)
                            + tuple(geom[n] for n in _GEOM_FIELDS))
                yield pd.DataFrame(rows, columns=["_file", "fid"]
                                   + prop_names + list(_GEOM_FIELDS),
                                   dtype="object")

        reader = ctx.spark.read.format("binaryFile")
        if url.endswith(".fgb"):
            raw = reader.load(url)
        else:
            raw = reader.option("pathGlobFilter", "*.fgb").load(url)
        df = raw.mapInPandas(parse, out_schema)
        return apply_feature_request(df, ctx.request)
