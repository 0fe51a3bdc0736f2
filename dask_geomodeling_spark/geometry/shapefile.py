"""ESRI Shapefile ingestion without GDAL.

The reference reads shapefiles through fiona/OGR
(``GeometryFileSource``, reference geometry/sources.py:18).  This
container does not ship GDAL, but the shapefile format itself is a
fully published spec (the ESRI whitepaper): a ``.shp`` of fixed-layout
binary geometry records, a ``.dbf`` (dBASE III) fixed-width attribute
table, and a ``.shx`` offset index.  All three are plain ``struct``
arithmetic — so the codec here is pure Python run as an
**Arrow-batched mapInPandas**, the same contract as the WKB and
multimodal codecs (geometry/wkb.py, pipeline/multimodal.py).

Scale shape: the format caps each ``.shp`` at 2 GB (offsets are 32-bit
word counts), so a 100 TB shapefile corpus is NECESSARILY tens of
thousands of files — exactly the unit Spark's ``binaryFile`` source
parallelizes on (one task per file, no driver loop).  Geometry and
attributes parse in independent scan-parallel map operators and meet
in ONE co-keyed ``(file, fid)`` join of parsed rows; nothing but the
typed feature columns is ever shuffled.  The ``.shx`` index is not
needed for a full sequential scan (records self-describe their
length), so it is ignored on read and emitted on write.

Geometry lands in the engine's typed columns (the
``parse_point_or_box_wkt`` / ``decode_wkb`` layout): ``x``/``y`` for
points, bbox + orientation-normalized flat ``rings`` (outer CCW,
holes CW) + compat ``vertices`` exterior ring for polygons.  Ring
role on disk follows the shapefile convention (outer rings CLOCKWISE,
holes counter-clockwise) and is flipped both ways.
"""

from __future__ import annotations

import datetime
import struct

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_geomodeling_spark.geometry.base import (GeometryBlock,
                                                  apply_feature_request)
from dask_geomodeling_spark.geometry.sources import (_oriented,
                                                     _ring_signed_area)

__all__ = ["parse_shp", "parse_dbf", "write_shapefile",
           "ShapefileGeometrySource"]

_GEOM_SCHEMA = [
    ("x", T.DoubleType()), ("y", T.DoubleType()),
    ("xmin", T.DoubleType()), ("ymin", T.DoubleType()),
    ("xmax", T.DoubleType()), ("ymax", T.DoubleType()),
    ("vertices", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ("rings", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
]
_GEOM_FIELDS = tuple(n for n, _ in _GEOM_SCHEMA)

_POINT_TYPES = (1, 11, 21)     # Point, PointZ, PointM — XY prefix shared
_POLYGON_TYPES = (5, 15, 25)   # Polygon, PolygonZ, PolygonM


# --------------------------------------------------------------------------
# .shp — geometry records
# --------------------------------------------------------------------------

def _polygon_fields(rings_raw):
    """As-stored rings (shapefile orientation: outer CW) → typed
    fields with the engine's flat-ring contract (outer CCW first,
    its holes CW after it — well-formed writers emit each outer
    followed by its holes, which file order preserves)."""
    # shapefile: signed area of the STORED ring decides the role —
    # CW (negative) = outer, CCW (positive) = hole
    rings = []
    for raw in rings_raw:
        outer = _ring_signed_area(raw) <= 0
        rings.append(_oriented(raw, ccw=outer))
    pts = [p for r in rings for p in r]
    out = dict.fromkeys(_GEOM_FIELDS)
    out.update(xmin=min(p[0] for p in pts), ymin=min(p[1] for p in pts),
               xmax=max(p[0] for p in pts), ymax=max(p[1] for p in pts),
               vertices=rings[0], rings=rings)
    return out


def parse_shp(buf):
    """``.shp`` bytes → list of typed-field dicts (file order = FID
    order).  Null shapes yield an all-NULL dict; Z/M variants parse
    their XY prefix and skip the measure block (the record header's
    content length delimits it)."""
    buf = bytes(buf)
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError("not a shapefile (file code {})".format(code))
    out, pos, end = [], 100, len(buf)
    while pos + 8 <= end:
        _, clen = struct.unpack_from(">ii", buf, pos)
        pos += 8
        rec_end = pos + 2 * clen
        (typ,) = struct.unpack_from("<i", buf, pos)
        if typ == 0:
            out.append(dict.fromkeys(_GEOM_FIELDS))
        elif typ in _POINT_TYPES:
            x, y = struct.unpack_from("<2d", buf, pos + 4)
            d = dict.fromkeys(_GEOM_FIELDS)
            d.update(x=x, y=y, xmin=x, ymin=y, xmax=x, ymax=y)
            out.append(d)
        elif typ in _POLYGON_TYPES:
            nparts, npoints = struct.unpack_from("<2i", buf, pos + 36)
            parts = struct.unpack_from("<{}i".format(nparts), buf, pos + 44)
            flat = struct.unpack_from("<{}d".format(2 * npoints), buf,
                                      pos + 44 + 4 * nparts)
            pts = [[flat[2 * i], flat[2 * i + 1]] for i in range(npoints)]
            rings = []
            for a, b in zip(parts, list(parts[1:]) + [npoints]):
                ring = pts[a:b]
                if len(ring) > 1 and ring[0] == ring[-1]:
                    ring.pop()
                rings.append(ring)
            out.append(_polygon_fields(rings))
        else:
            raise NotImplementedError(
                "shapefile shape type {} unsupported (Point/Polygon "
                "families only; reference reads others via OGR — "
                "geometry/sources.py:18)".format(typ))
        pos = rec_end
    return out


# --------------------------------------------------------------------------
# .dbf — attribute records (dBASE III)
# --------------------------------------------------------------------------

def _dbf_fields(buf):
    """Field descriptor array → [(name, type_char, length, decimals)]."""
    hsize, rsize = struct.unpack_from("<HH", buf, 8)
    fields, pos = [], 32
    while pos < hsize - 1 and buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00", 1)[0].decode("ascii")
        typ = chr(buf[pos + 11])
        length, dec = buf[pos + 16], buf[pos + 17]
        fields.append((name, typ, length, dec))
        pos += 32
    if 1 + sum(f[2] for f in fields) != rsize:
        raise ValueError("corrupt dbf: field lengths != record size")
    return fields


def _dbf_value(raw, typ, dec):
    s = raw.decode("latin-1").strip()
    if not s or set(s) <= {"*", "?"}:
        return None
    if typ == "C":
        return s
    if typ in ("N", "F"):
        return float(s) if (dec or typ == "F" or "." in s) else int(s)
    if typ == "L":
        return s in "TtYy"
    if typ == "D":
        return datetime.date(int(s[:4]), int(s[4:6]), int(s[6:8]))
    raise NotImplementedError("dbf field type {!r} unsupported".format(typ))


def parse_dbf(buf):
    """``.dbf`` bytes → (fields, list of value dicts in record order)."""
    buf = bytes(buf)
    (nrec,) = struct.unpack_from("<I", buf, 4)
    hsize, rsize = struct.unpack_from("<HH", buf, 8)
    fields = _dbf_fields(buf)
    out = []
    for i in range(nrec):
        pos = hsize + i * rsize + 1  # +1: deletion flag
        row = {}
        for name, typ, length, dec in fields:
            row[name] = _dbf_value(buf[pos:pos + length], typ, dec)
            pos += length
        out.append(row)
    return fields, out


def dbf_ddl(fields):
    """dbf field spec → Spark DDL string (the fiona type mapping:
    C→STRING, N/F→BIGINT or DOUBLE by decimal count, L→BOOLEAN,
    D→DATE)."""
    m = {"C": "STRING", "L": "BOOLEAN", "D": "DATE"}
    parts = []
    for name, typ, _, dec in fields:
        if typ in ("N", "F"):
            t = "DOUBLE" if (dec or typ == "F") else "BIGINT"
        else:
            t = m[typ]
        parts.append("{} {}".format(name, t))
    return ", ".join(parts)


# --------------------------------------------------------------------------
# writer — .shp + .shx + .dbf (test-fixture / interchange utility;
# the distributed egress path stays GeometryFileSink's columnar
# formats — a 100 TB export belongs in parquet, not 2 GB-capped dbf)
# --------------------------------------------------------------------------

def _row_rings(row):
    rings = row.get("rings")
    if rings:
        return [list(r) for r in rings]
    verts = row.get("vertices")
    if verts:
        return [list(verts)]
    if row.get("xmin") is not None and row.get("x") is None:
        x1, y1 = row["xmin"], row["ymin"]
        x2, y2 = row["xmax"], row["ymax"]
        return [[[x1, y1], [x2, y1], [x2, y2], [x1, y2]]]
    return None


def _pack_polygon(rings):
    # flip to disk orientation (outer CW, holes CCW) and close rings
    disk = [list(reversed(r)) + [list(reversed(r))[0]] for r in rings]
    pts = [p for r in disk for p in r]
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    body = struct.pack("<i4d2i", 5, min(xs), min(ys), max(xs), max(ys),
                       len(disk), len(pts))
    off = 0
    for r in disk:
        body += struct.pack("<i", off)
        off += len(r)
    for p in pts:
        body += struct.pack("<2d", p[0], p[1])
    return body


def write_shapefile(stem, rows, fields):
    """Write ``stem``.shp/.shx/.dbf from feature dicts (typed geometry
    columns + attributes).  ``fields``: [(name, 'C'|'N'|'F'|'L'|'D',
    length, decimals)]."""
    shp_records, bbox = [], [None] * 4
    shape_type = 1
    for row in rows:
        rings = _row_rings(row)
        if rings is not None:
            shape_type = 5
            body = _pack_polygon(rings)
        elif row.get("x") is not None:
            body = struct.pack("<i2d", 1, row["x"], row["y"])
        else:
            body = struct.pack("<i", 0)
            shp_records.append(body)
            continue
        shp_records.append(body)
    # second pass for bbox over all geometries
    for body in shp_records:
        (typ,) = struct.unpack_from("<i", body, 0)
        if typ == 1:
            x, y = struct.unpack_from("<2d", body, 4)
            x1, y1, x2, y2 = x, y, x, y
        elif typ == 5:
            x1, y1, x2, y2 = struct.unpack_from("<4d", body, 4)
        else:
            continue
        bbox[0] = x1 if bbox[0] is None else min(bbox[0], x1)
        bbox[1] = y1 if bbox[1] is None else min(bbox[1], y1)
        bbox[2] = x2 if bbox[2] is None else max(bbox[2], x2)
        bbox[3] = y2 if bbox[3] is None else max(bbox[3], y2)
    bbox = [v or 0.0 for v in bbox]

    flen = 100 + sum(8 + len(b) for b in shp_records)
    header = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, flen // 2)
    header += struct.pack("<2i", 1000, shape_type)
    header += struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3],
                          0, 0, 0, 0)
    shx_body = b""
    with open(stem + ".shp", "wb") as f:
        f.write(header)
        off = 100
        for i, body in enumerate(shp_records):
            f.write(struct.pack(">2i", i + 1, len(body) // 2))
            f.write(body)
            shx_body += struct.pack(">2i", off // 2, len(body) // 2)
            off += 8 + len(body)
    with open(stem + ".shx", "wb") as f:
        f.write(struct.pack(">7i", 9994, 0, 0, 0, 0, 0,
                            (100 + len(shx_body)) // 2)
                + header[28:])
        f.write(shx_body)

    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    dbf = bytearray(struct.pack("<4BIHH20x", 0x03, 26, 1, 1,
                                len(rows), hsize, rsize))
    for name, typ, length, dec in fields:
        dbf += struct.pack("<11sc4xBB14x", name.encode("ascii"),
                           typ.encode("ascii"), length, dec)
    dbf += b"\x0d"
    for row in rows:
        dbf += b" "
        for name, typ, length, dec in fields:
            v = row.get(name)
            if v is None:
                s = " " * length
            elif typ == "C":
                s = str(v)[:length].ljust(length)
            elif typ in ("N", "F"):
                s = (("{:>" + str(length) + "." + str(dec) + "f}")
                     .format(float(v)) if (dec or typ == "F")
                     else ("{:>" + str(length) + "d}").format(int(v)))
            elif typ == "L":
                s = "T" if v else "F"
            else:  # D
                s = "{:04d}{:02d}{:02d}".format(v.year, v.month, v.day)
            if len(s) > length:
                raise ValueError("dbf field {} overflow".format(name))
            dbf += s.encode("latin-1")
    dbf += b"\x1a"
    with open(stem + ".dbf", "wb") as f:
        f.write(bytes(dbf))
    return stem


# --------------------------------------------------------------------------
# the distributed source
# --------------------------------------------------------------------------

class ShapefileGeometrySource(GeometryBlock):
    """Read shapefiles (reference: GeometryFileSource via fiona/OGR,
    geometry/sources.py:18) — pure-spec ``struct`` codec, no GDAL.

    ``url``: a single ``.shp`` path or a directory of shapefiles.
    ``schema``: DDL for the dbf attribute columns — the 100 TB dataset
    contract; omit it and the schema is inferred driver-side from the
    first ``.dbf`` header (a few hundred bytes; local filesystems
    only).

    Plan shape: two ``binaryFile`` scans (one task per file — the
    format's 2 GB cap makes big corpora many-file by construction),
    two scan-parallel Arrow-batched parses, one co-keyed
    ``(file, fid)`` join of the parsed rows.  FIDs are per-file record
    numbers (the OGR contract); the file stem rides along as
    ``_file`` so (``_file``, ``fid``) stays globally unique.
    """

    def __init__(self, url, id_field="fid", schema=None,
                 projection="EPSG:4326"):
        if not isinstance(url, str):
            raise TypeError("'{}' object is not allowed".format(type(url)))
        super().__init__(url, id_field, schema, str(projection).upper())

    @property
    def url(self):
        return self.args[0]

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
        """Derive the attribute DDL from the first ``.dbf`` header
        (local paths; on object stores pass ``schema`` explicitly)."""
        import glob
        path = url[7:] if url.startswith("file://") else url
        if path.endswith(".shp"):
            candidates = [path[:-4] + ".dbf"]
        else:
            candidates = sorted(glob.glob(path.rstrip("/") + "/*.dbf"))
        if not candidates:
            raise ValueError("no .dbf beside {!r}; pass an explicit "
                             "schema".format(url))
        with open(candidates[0], "rb") as f:
            head = f.read(32)
            (hsize,) = struct.unpack_from("<H", head, 8)
            buf = head + f.read(hsize - 32)
        return dbf_ddl(_dbf_fields(buf + b"\x00" * 4))

    def _scan(self, spark, suffix):
        url = self.args[0]
        reader = spark.read.format("binaryFile")
        if url.endswith(".shp"):
            return reader.load(url[:-4] + suffix)
        return reader.option("pathGlobFilter", "*" + suffix).load(url)

    def _build(self, ctx):
        url, _, schema, _ = self.args
        if schema is None:
            schema = self.infer_schema(url)
        prop_fields = T._parse_datatype_string(schema).fields
        prop_names = [f.name for f in prop_fields]
        clash = set(prop_names) & ({"_file", "_rec"} | set(_GEOM_FIELDS))
        if clash:
            raise ValueError(
                "dbf attribute(s) {} collide with the source's "
                "synthesized columns".format(sorted(clash)))

        # the per-file record number joins geometry to attributes under
        # the PRIVATE name _rec; it surfaces as 'fid' (the OGR contract)
        # only when the dbf does not carry a field of that name — a
        # round-tripped sink frame keeps ITS OWN fid column intact.
        key = [T.StructField("_file", T.StringType()),
               T.StructField("_rec", T.LongType())]
        geom_schema = T.StructType(
            key + [T.StructField(n, t) for n, t in _GEOM_SCHEMA])
        attr_schema = T.StructType(key[:1] + [key[1]] + prop_fields)

        def parse_geoms(batches):
            import pandas as pd
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                    for rec, d in enumerate(parse_shp(content)):
                        rows.append((stem, rec) + tuple(
                            d[n] for n in _GEOM_FIELDS))
                yield pd.DataFrame(rows, columns=["_file", "_rec"]
                                   + list(_GEOM_FIELDS), dtype="object")

        def parse_attrs(batches):
            import pandas as pd
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                    _, recs = parse_dbf(content)
                    for rec_no, rec in enumerate(recs):
                        rows.append((stem, rec_no) + tuple(
                            rec.get(n) for n in prop_names))
                yield pd.DataFrame(rows, columns=["_file", "_rec"]
                                   + prop_names, dtype="object")

        geoms = self._scan(ctx.spark, ".shp").mapInPandas(
            parse_geoms, geom_schema)
        attrs = self._scan(ctx.spark, ".dbf").mapInPandas(
            parse_attrs, attr_schema)
        df = geoms.join(attrs, ["_file", "_rec"])
        if "fid" in prop_names:
            df = df.drop("_rec")
        else:
            df = df.withColumnRenamed("_rec", "fid")
        return apply_feature_request(df, ctx.request)
