"""GeoPackage ingestion without GDAL.

The reference reads GeoPackage layers through fiona/OGR
(``GeometryFileSource``, reference geometry/sources.py:18).  A
GeoPackage is just a SQLite database with a spec'd catalog
(``gpkg_contents`` / ``gpkg_geometry_columns``) and geometry blobs
that are standard WKB behind a small "GP" header — both fully
published (OGC 12-128r19).  Python's stdlib ``sqlite3`` opens the
container and the existing WKB codec (geometry/wkb.py) decodes the
geometry, so no native dependency is needed.

Scale shape: SQLite files are non-splittable, so the unit of
parallelism is the FILE — ``binaryFile`` gives one task per
``.gpkg``, and ``sqlite3.Connection.deserialize`` (Python ≥3.11)
mounts each file's bytes in-memory ON THE EXECUTOR with no temp-file
or driver round-trip.  A 100 TB GeoPackage corpus is necessarily
many files (the practical single-file ceiling is a few GB); a single
monolithic file should be re-exported to parquet — the error message
says so.  Everything downstream of the per-file parse is the typed
feature frame; the only shuffle is whatever the request plan needs.
"""

from __future__ import annotations

import struct

from pyspark.sql import types as T

from dask_geomodeling_spark.geometry.base import (GeometryBlock,
                                                  apply_feature_request)
from dask_geomodeling_spark.geometry.wkb import (_GEOM_FIELDS,
                                                 _GEOM_SCHEMA, decode_wkb,
                                                 encode_wkb)

__all__ = ["read_gpkg_bytes", "write_gpkg", "GeoPackageGeometrySource"]

_SQLITE_DDL = {"INTEGER": "BIGINT", "INT": "BIGINT", "MEDIUMINT": "BIGINT",
               "REAL": "DOUBLE", "DOUBLE": "DOUBLE", "FLOAT": "DOUBLE",
               "TEXT": "STRING", "BLOB": "BINARY", "BOOLEAN": "BOOLEAN",
               "DATE": "STRING", "DATETIME": "STRING"}


def _connect_bytes(content):
    import sqlite3
    con = sqlite3.connect(":memory:")
    con.deserialize(bytes(content))
    return con


def _layer_info(con, layer=None):
    """(table, geometry_column) from the GeoPackage catalog."""
    q = ("SELECT c.table_name, g.column_name FROM gpkg_contents c "
         "JOIN gpkg_geometry_columns g ON g.table_name = c.table_name "
         "WHERE c.data_type = 'features'")
    rows = con.execute(q).fetchall()
    if not rows:
        raise ValueError("no feature layers in GeoPackage")
    if layer is None:
        return rows[0]
    for t, g in rows:
        if t == layer:
            return t, g
    raise ValueError("layer {!r} not in GeoPackage (has: {})".format(
        layer, [r[0] for r in rows]))


def _decode_gp_blob(blob):
    """GeoPackage geometry blob → typed-field dict (spec §2.1.3: 'GP'
    magic, version, flags, srs_id, optional envelope, then standard
    WKB — decoded by the engine's existing codec)."""
    if blob is None:
        return None
    buf = bytes(blob)
    if buf[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = buf[3]
    if flags & 0x10:  # empty-geometry flag
        return None
    envelope = (flags >> 1) & 0x07
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(envelope)
    if n_env is None:
        raise ValueError("invalid envelope indicator {}".format(envelope))
    return decode_wkb(buf[8 + 8 * n_env:])


def read_gpkg_bytes(content, layer=None):
    """``.gpkg`` bytes → (column_names, rows) with the geometry column
    decoded into the typed-field dict layout."""
    con = _connect_bytes(content)
    try:
        table, geom_col = _layer_info(con, layer)
        cols = [r[1] for r in con.execute(
            'PRAGMA table_info("{}")'.format(table))]
        props = [c for c in cols if c != geom_col]
        out = []
        for row in con.execute('SELECT {}, "{}" FROM "{}"'.format(
                ", ".join('"{}"'.format(c) for c in props),
                geom_col, table)):
            rec = dict(zip(props, row[:-1]))
            rec["__geom__"] = _decode_gp_blob(row[-1])
            out.append(rec)
        return props, out
    finally:
        con.close()


def write_gpkg(path, layer, rows, fields, srs_id=4326):
    """Write a spec-compliant single-layer GeoPackage (catalog tables +
    WKB-behind-GP-header geometry).  ``fields``: [(name, sqlite_type)].
    Driver-side interchange/test utility — the distributed egress path
    stays columnar (GeometryFileSink)."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        con.executescript("""
            PRAGMA application_id = 1196444487;
            PRAGMA user_version = 10300;
            CREATE TABLE gpkg_spatial_ref_sys (
              srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
              organization TEXT NOT NULL,
              organization_coordsys_id INTEGER NOT NULL,
              definition TEXT NOT NULL, description TEXT);
            CREATE TABLE gpkg_contents (
              table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
              identifier TEXT UNIQUE, description TEXT DEFAULT '',
              last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
              max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
            CREATE TABLE gpkg_geometry_columns (
              table_name TEXT NOT NULL, column_name TEXT NOT NULL,
              geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
              z TINYINT NOT NULL, m TINYINT NOT NULL,
              CONSTRAINT pk_geom_cols PRIMARY KEY
                (table_name, column_name));
        """)
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, 'EPSG', ?,"
            " 'undefined', NULL)", ("epsg:{}".format(srs_id), srs_id,
                                    srs_id))
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?, 'features', ?, '', "
            "datetime('now'), NULL, NULL, NULL, NULL, ?)",
            (layer, layer, srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', "
            "'GEOMETRY', ?, 0, 0)", (layer, srs_id))
        # a user field named 'fid' BECOMES the primary key (the OGR
        # FID-column contract) instead of shadowing a synthesized one
        own_fid = any(n == "fid" for n, _ in fields)
        attrs = [(n, t) for n, t in fields if n != "fid"]
        if own_fid:
            fids = [row.get("fid") for row in rows]
            if any(f is None for f in fids):
                raise ValueError(
                    "gpkg: the 'fid' column becomes the PRIMARY KEY "
                    "and must not contain NULLs")
            if len(set(fids)) != len(fids):
                raise ValueError(
                    "gpkg: duplicate values in the 'fid' column — "
                    "primary keys must be unique (rename the column "
                    "to keep it as a plain attribute)")
        con.execute('CREATE TABLE "{}" (fid INTEGER PRIMARY KEY, {}, '
                    'geom BLOB)'.format(layer, ", ".join(
                        '"{}" {}'.format(n, t) for n, t in attrs)))
        header = b"GP\x00\x01" + struct.pack("<i", srs_id)
        for i, row in enumerate(rows):
            wkb = encode_wkb(row)
            blob = header + wkb if wkb is not None else None
            fid = int(row["fid"]) if own_fid else i + 1
            con.execute(
                'INSERT INTO "{}" VALUES ({})'.format(
                    layer, ", ".join("?" * (len(attrs) + 2))),
                [fid] + [row.get(n) for n, _ in attrs] + [blob])
        con.commit()
    finally:
        con.close()
    return path


class GeoPackageGeometrySource(GeometryBlock):
    """Read GeoPackage feature layers (reference: GeometryFileSource
    via fiona/OGR, geometry/sources.py:18) — stdlib ``sqlite3`` +
    the engine's WKB codec, no GDAL.

    ``url``: a ``.gpkg`` path or a directory of them.  ``layer``:
    feature table (default: the catalog's first).  ``schema``: DDL
    for the attribute columns — the 100 TB dataset contract; omit it
    and the schema infers driver-side from the first file's catalog
    (local filesystems only).

    Plan shape: one ``binaryFile`` task per file; each file mounts
    in-memory on the executor (``Connection.deserialize``) and parses
    in one Arrow-batched pass.  Unlike the shapefile pair there is no
    attribute join — SQLite rows carry geometry and properties
    together.
    """

    def __init__(self, url, layer=None, id_field="fid", schema=None,
                 projection="EPSG:4326"):
        if not isinstance(url, str):
            raise TypeError("'{}' object is not allowed".format(type(url)))
        super().__init__(url, layer, id_field, schema,
                         str(projection).upper())

    @property
    def url(self):
        return self.args[0]

    @property
    def layer(self):
        return self.args[1]

    @property
    def index_column(self):
        return self.args[2]

    @property
    def projection(self):
        return self.args[4]

    @property
    def columns(self):
        return set()

    @staticmethod
    def infer_schema(url, layer=None):
        """Attribute DDL from the first file's SQLite catalog (local
        paths; on object stores pass ``schema`` explicitly)."""
        import glob
        import sqlite3
        path = url[7:] if url.startswith("file://") else url
        if not path.endswith(".gpkg"):
            found = sorted(glob.glob(path.rstrip("/") + "/*.gpkg"))
            if not found:
                raise ValueError("no .gpkg under {!r}; pass an explicit "
                                 "schema".format(url))
            path = found[0]
        con = sqlite3.connect(path)
        try:
            table, geom_col = _layer_info(con, layer)
            parts = []
            for _, name, typ, *_ in con.execute(
                    'PRAGMA table_info("{}")'.format(table)):
                if name == geom_col:
                    continue
                ddl = _SQLITE_DDL.get((typ or "").upper().split("(")[0],
                                      "STRING")
                parts.append("{} {}".format(name, ddl))
            return ", ".join(parts)
        finally:
            con.close()

    def _build(self, ctx):
        url, layer, _, schema, _ = self.args
        if schema is None:
            schema = self.infer_schema(url, layer)
        prop_fields = T._parse_datatype_string(schema).fields
        prop_names = [f.name for f in prop_fields]
        out_schema = T.StructType(
            [T.StructField("_file", T.StringType())] + prop_fields
            + [T.StructField(n, t) for n, t in _GEOM_SCHEMA])

        def parse(batches):
            import pandas as pd
            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                    _, recs = read_gpkg_bytes(content, layer)
                    for rec in recs:
                        geom = rec["__geom__"] or dict.fromkeys(
                            _GEOM_FIELDS)
                        rows.append(
                            (stem,) + tuple(rec.get(n) for n in prop_names)
                            + tuple(geom[n] for n in _GEOM_FIELDS))
                yield pd.DataFrame(rows, columns=["_file"] + prop_names
                                   + list(_GEOM_FIELDS), dtype="object")

        reader = ctx.spark.read.format("binaryFile")
        if url.endswith(".gpkg"):
            raw = reader.load(url)
        else:
            raw = reader.option("pathGlobFilter", "*.gpkg").load(url)
        df = raw.mapInPandas(parse, out_schema)
        return apply_feature_request(df, ctx.request)
