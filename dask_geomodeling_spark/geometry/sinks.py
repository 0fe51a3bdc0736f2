"""Feature sinks (reference: geometry/sinks.py).

``GeometryFileSink`` (reference :46) writes per-tile shapefiles/geojson via
fiona; the Spark-first sink is a distributed write — parquet (default),
csv or json — optionally partitioned by columns.  Tiling = partitioning;
each task writes its own file, exactly the reference's tile-merge model
but handled by the Spark committer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle, GeometryBlock

__all__ = ["GeometryFileSink", "GeometryTableSink",
           "merge_feature_files", "to_file"]

# geometry carrier columns — everything else is an attribute/property
_FEATURE_GEOM_KEYS = frozenset(
    {"x", "y", "xmin", "ymin", "xmax", "ymax",
     "rings", "vertices", "path"})


def _dbf_spec(schema, props):
    """Spark schema → dbf field descriptors [(name, type, len, dec)]
    for the attribute columns (OGR's type laundering: ints → N 18.0,
    reals → F 24.6, bools → L, dates → D, everything else → C).
    Names truncate to dbf's 11-byte limit (OGR does the same);
    post-truncation collisions are rejected rather than silently
    merged."""
    spec, seen = [], {}
    for f in schema.fields:
        if f.name not in props:
            continue
        short = f.name[:11]
        if short in seen:
            raise ValueError(
                "dbf 11-char field-name collision: {!r} vs {!r}"
                .format(f.name, seen[short]))
        seen[short] = f.name
        t = f.dataType.simpleString()
        if t in ("tinyint", "smallint", "int", "bigint"):
            spec.append((short, "N", 18, 0))
        elif t in ("float", "double") or t.startswith("decimal"):
            spec.append((short, "F", 24, 6))
        elif t == "boolean":
            spec.append((short, "L", 1, 0))
        elif t == "date":
            spec.append((short, "D", 8, 0))
        else:
            spec.append((short, "C", 128, 0))
    return spec


def _gpkg_spec(schema, props):
    """Spark schema → sqlite column types for the attribute columns."""
    m = {"tinyint": "INTEGER", "smallint": "INTEGER", "int": "INTEGER",
         "bigint": "INTEGER", "boolean": "INTEGER",
         "float": "REAL", "double": "REAL"}
    return [(f.name, m.get(f.dataType.simpleString(), "TEXT"))
            for f in schema.fields if f.name in props]


class GeometryFileSink(BaseSingle):
    """Write features to files (reference: geometry/sinks.py:46).

    Args:
      source: GeometryBlock to write.
      url: output directory.
      extension: parquet | csv | json | geojson (reference writes
        per-tile shapefiles/geojson via fiona — columnar parquet is the
        cluster-native default here; ``geojson`` writes one
        FeatureCollection document per partition, the distributed
        analogue of the reference's per-tile geojson files, with Point
        geometry from ``x``/``y`` or Polygon from the bbox columns).
      fields: optional ``{output_name: source_column}`` mapping.
      partition_by: optional list of columns for a partitioned layout.
      max_records_per_file: optional cap on rows per output file
        (Spark's ``maxRecordsPerFile``) — the small-files/huge-files
        control at cluster scale: a 100 TB write keeps every file a
        bounded, splittable size regardless of upstream partitioning,
        without forcing an extra repartition shuffle.

    ``wkb`` writes GeoParquet-style parquet: the typed geometry
    columns encode into one little-endian WKB ``geometry`` binary
    column (geometry/wkb.py codec, Arrow-batched) and the typed
    columns drop — the read side is ``WKBGeometrySource``.
    """

    supported_extensions = ("parquet", "csv", "json", "geojson",
                            "geojsonseq", "wkb",
                            "shp", "gpkg", "gml", "kml")

    def __init__(self, source, url, extension="parquet", fields=None,
                 partition_by=None, max_records_per_file=None):
        if isinstance(extension, str) and extension.startswith("."):
            extension = extension[1:]  # reference chops the dot too
        if extension not in self.supported_extensions:
            raise ValueError("Format '{}' is unsupported".format(extension))
        if fields is not None and not isinstance(fields, dict):
            raise TypeError("'{}' object is not allowed".format(type(fields)))
        if max_records_per_file is not None \
                and int(max_records_per_file) < 1:
            raise ValueError("max_records_per_file must be >= 1")
        super().__init__(source, url, extension, fields,
                         list(partition_by or []),
                         None if max_records_per_file is None
                         else int(max_records_per_file))

    def _build(self, ctx):
        df = self.source._build(ctx)
        fields = self.args[3]
        if fields:
            df = df.select(*[F.col(src).alias(dst)
                             for dst, src in fields.items()])
        return df

    @staticmethod
    def _feature_json(df):
        """Per-row GeoJSON Feature string: TRUE MultiPolygons from a
        ``rings`` column (round 8 — the orientation contract groups
        outers/holes with one sequential fold, the same rule as
        ``rings_wkt_sql``; previously ring stacks degraded to their
        bbox), Point from x/y, Polygon ring from the bbox columns;
        all other columns become properties."""
        cols = set(df.columns)
        if "rings" in cols:
            skip = cols & {"x", "y", "xmin", "ymin", "xmax", "ymax",
                           "rings", "vertices", "path"}
            props = [c for c in df.columns if c not in skip]
            # geometry as pre-rendered JSON text (nested grouping is
            # data-dependent, so the struct encoder can't express it)
            rt = ("concat('[', array_join(transform(concat(r, "
                  "slice(r, 1, 1)), p -> concat('[', "
                  "CAST(p[0] AS STRING), ', ', CAST(p[1] AS STRING), "
                  "']')), ', '), ']')")
            from dask_geomodeling_spark.geometry.geom_operations import (
                _ring_cross_sum_sql)
            outer = "({}) >= 0".format(_ring_cross_sum_sql("r"))
            mp = ("concat('{{\"type\": \"MultiPolygon\", "
                  "\"coordinates\": [', aggregate(rings, "
                  "cast('' as string), (acc, r) -> concat(acc, "
                  "CASE WHEN acc = '' THEN '[' "
                  "WHEN {outer} THEN '], [' ELSE ', ' END, {rt})), "
                  "']]}}')").format(outer=outer, rt=rt)
            pt = ("concat('{\"type\": \"Point\", \"coordinates\": [', "
                  "CAST(x AS STRING), ', ', CAST(y AS STRING), ']}')"
                  ) if {"x", "y"} <= cols else None
            bx = None
            if {"xmin", "ymin", "xmax", "ymax"} <= cols:
                c = "CAST({} AS STRING)"
                pair = ("concat('[', {}, ', ', {}, ']')")
                corners = [pair.format(c.format(a), c.format(b))
                           for a, b in (("xmin", "ymin"),
                                        ("xmax", "ymin"),
                                        ("xmax", "ymax"),
                                        ("xmin", "ymax"),
                                        ("xmin", "ymin"))]
                bx = ("concat('{\"type\": \"Polygon\", "
                      "\"coordinates\": [[', "
                      + ", ', ', ".join(corners)
                      + ", ']]}')")
            geom_txt = F.expr(mp)
            branch = F.when(F.col("rings").isNotNull(), geom_txt)
            if pt:
                branch = branch.when(F.col("x").isNotNull(),
                                     F.expr(pt))
            if bx:
                branch = branch.when(F.col("xmin").isNotNull(),
                                     F.expr(bx))
            propjson = (F.to_json(F.struct(*props)) if props
                        else F.lit("{}"))
            return F.concat(F.lit('{"type": "Feature", "geometry": '),
                            branch,
                            F.lit(', "properties": '), propjson,
                            F.lit("}"))
        if {"x", "y"} <= cols:
            geom = F.struct(F.lit("Point").alias("type"),
                            F.array("x", "y").alias("coordinates"))
            skip = {"x", "y"}
        elif {"xmin", "ymin", "xmax", "ymax"} <= cols:
            ring = F.array(F.array("xmin", "ymin"), F.array("xmax", "ymin"),
                           F.array("xmax", "ymax"), F.array("xmin", "ymax"),
                           F.array("xmin", "ymin"))
            geom = F.struct(F.lit("Polygon").alias("type"),
                            F.array(ring).alias("coordinates"))
            skip = {"xmin", "ymin", "xmax", "ymax"}
        else:
            raise ValueError("geojson sink needs x/y or bbox columns")
        props = [c for c in df.columns if c not in skip]
        return F.to_json(F.struct(
            F.lit("Feature").alias("type"), geom.alias("geometry"),
            F.struct(*props).alias("properties")))

    def write(self, spark=None, mode="overwrite", **request):
        df = self.plan(spark, **request)
        url, extension, partition_by = self.args[1], self.args[2], self.args[4]
        if extension == "geojson":
            # one FeatureCollection document per partition — per-
            # partition imperative assembly (a single output object per
            # file) is the one legitimate RDD hop in this plane
            feats = df.select(self._feature_json(df).alias("_f"))

            def assemble(it):
                body = ", ".join(r["_f"] for r in it)
                if body:
                    yield ('{"type": "FeatureCollection", "features": ['
                           + body + "]}",)

            spark_ = feats.sparkSession
            out = spark_.createDataFrame(feats.rdd.mapPartitions(assemble),
                                         "value string")
            out.write.mode(mode).text(url)
            return url
        if extension == "geojsonseq":
            # newline-delimited GeoJSON (RFC 8142): one Feature per
            # LINE straight through the text writer — no per-partition
            # assembly hop at all, and the read side splits one huge
            # file across tasks.  The feature-scale geo egress format.
            (df.select(self._feature_json(df).alias("value"))
             .write.mode(mode).text(url))
            return url
        if extension in ("shp", "gpkg", "gml", "kml"):
            # Per-partition feature files — the exact analogue of the
            # reference's per-tile fiona writes (its process() emits
            # one <hash>.<ext> per request tile; GeometryFileSink.
            # merge_files joins them afterwards, both there and here).
            # One imperative hop per partition is legitimate: each
            # output FILE is a single object.  The url must be a
            # shared filesystem on a multi-node cluster, as for the
            # reference; columnar parquet/wkb stay the 100 TB egress.
            import os
            import shutil

            # ALL driver-side spec/name validation runs BEFORE the
            # destructive rmtree below — a bad column name (gml
            # element names, shp's 11-char dbf collisions) must fail
            # fast, not wipe existing output and then die in executor
            # tasks (round-13 review fixes, passes 2 + 3)
            props = [c for c in df.columns
                     if c not in _FEATURE_GEOM_KEYS]
            schema = df.schema
            if extension == "gml":
                from dask_geomodeling_spark.geometry.xmlformats \
                    import _ncname
                for c in props:
                    _ncname(c, "property")
            if extension == "shp":
                spec = _dbf_spec(schema, props)
                rename = {old: new for new, old in
                          zip((s[0] for s in spec), props)
                          if new != old}
            else:
                spec = (_gpkg_spec(schema, props)
                        if extension == "gpkg" else props)
                rename = {}
            if os.path.isdir(url):
                if mode == "overwrite":
                    shutil.rmtree(url)
                elif mode != "append":
                    raise IOError("'{}' exists (mode={})".format(url,
                                                                 mode))
            os.makedirs(url, exist_ok=True)
            prefix = (len([n for n in os.listdir(url)]) + 1
                      if mode == "append" else 0)

            def task(pid, it):
                rows = []
                for r in it:
                    d = r.asDict(recursive=True)
                    for old, new in rename.items():
                        d[new] = d.pop(old)
                    rows.append(d)
                if not rows:
                    return iter(())
                stem = os.path.join(
                    url, "part-{:05d}-{:05d}".format(prefix, pid))
                if extension == "shp":
                    from dask_geomodeling_spark.geometry.shapefile \
                        import write_shapefile
                    write_shapefile(stem, rows, spec)
                elif extension == "gpkg":
                    from dask_geomodeling_spark.geometry.geopackage \
                        import write_gpkg
                    for d in rows:  # sqlite binds scalars only
                        for n, _t in spec:
                            v = d.get(n)
                            if v is not None and not isinstance(
                                    v, (int, float, str, bytes)):
                                d[n] = str(v)
                    write_gpkg(stem + ".gpkg", "features", rows, spec)
                elif extension == "gml":
                    from dask_geomodeling_spark.geometry.xmlformats \
                        import write_gml
                    write_gml(stem + ".gml", rows, spec)
                else:
                    from dask_geomodeling_spark.geometry.xmlformats \
                        import write_kml
                    write_kml(stem + ".kml", rows, spec)
                return iter([stem])
            written = df.rdd.mapPartitionsWithIndex(task).collect()
            del written
            return url
        if extension == "wkb":
            from dask_geomodeling_spark.geometry.wkb import (
                _GEOM_FIELDS, encode_wkb_frame)
            encoded = encode_wkb_frame(df, column="geometry")
            keep = [c for c in encoded.columns if c not in _GEOM_FIELDS]
            writer = encoded.select(*keep).write.mode(mode)
            if len(self.args) > 5 and self.args[5]:
                writer = writer.option("maxRecordsPerFile",
                                       self.args[5])
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(url)
            return url
        writer = df.write.mode(mode)
        if len(self.args) > 5 and self.args[5]:
            writer = writer.option("maxRecordsPerFile", self.args[5])
        if extension == "csv":
            # headers make the files self-describing and are what the
            # csv read side (FileGeometrySource) expects to skip
            writer = writer.option("header", True)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        getattr(writer, "parquet" if extension == "parquet" else extension)(url)
        return url


def merge_feature_files(path, target, remove_source=False):
    """Merge the per-partition feature files under ``path`` into ONE
    ``target`` file (reference ``GeometryFileSink.merge_files``,
    geometry/sinks.py:171 — it shells the per-tile files into one via
    OGR; here each format's own pure-spec codec re-reads the parts and
    the matching writer emits the merged whole).  The target extension
    picks the format: shp | gpkg | gml | kml | geojson."""
    import glob as _glob
    import json
    import os
    import shutil

    if os.path.exists(target):
        raise IOError("Target '{}' already exists".format(target))
    ext = target.rsplit(".", 1)[-1]
    sources = sorted(_glob.glob(os.path.join(path, "*." + ext)))
    if not sources and ext in ("geojson", "geojsonseq"):
        # the geojson sink writes through Spark's text writer, so the
        # per-partition FeatureCollections land as part-*.txt
        sources = sorted(
            s for s in _glob.glob(os.path.join(path, "part-*"))
            if not s.endswith(".crc") and os.path.getsize(s) > 0)
    if not sources:
        raise IOError("No source files with extension '{}' under {}"
                      .format(ext, path))
    if ext == "geojson":
        feats = []
        for s in sources:
            with open(s) as f:
                feats.extend(json.load(f)["features"])
        with open(target, "w") as f:
            json.dump({"type": "FeatureCollection", "features": feats},
                      f)
    elif ext == "geojsonseq":
        with open(target, "w") as out:
            for s in sources:
                with open(s) as f:
                    for line in f:
                        if line.strip():
                            out.write(line.rstrip("\n") + "\n")
    elif ext in ("gml", "kml"):
        # splice member blocks between the first file's header/trailer
        trailer = ("</gml:FeatureCollection>" if ext == "gml"
                   else "</Document></kml>")
        bodies, head = [], None
        for s in sources:
            with open(s) as f:
                text = f.read()
            cut = text.index(trailer)
            first_member = text.index("<gml:featureMember"
                                      if ext == "gml" else "<Placemark")
            if head is None:
                head = text[:first_member]
            bodies.append(text[first_member:cut])
        with open(target, "w") as f:
            f.write(head + "".join(bodies) + trailer)
    elif ext == "shp":
        from dask_geomodeling_spark.geometry.shapefile import (
            parse_dbf, parse_shp, write_shapefile)
        rows, fields = [], None
        for s in sources:
            with open(s, "rb") as f:
                geoms = parse_shp(f.read())
            with open(s[:-4] + ".dbf", "rb") as f:
                fspec, attrs = parse_dbf(f.read())
            fields = fields or fspec
            for g, a in zip(geoms, attrs):
                d = dict(g)
                d.update(a)
                rows.append(d)
        write_shapefile(target[:-4], rows, fields)
    elif ext == "gpkg":
        from dask_geomodeling_spark.geometry.geopackage import (
            read_gpkg_bytes, write_gpkg)
        rows, names = [], None
        for s in sources:
            with open(s, "rb") as f:
                props, recs = read_gpkg_bytes(f.read())
            names = names or props
            for rec in recs:
                d = {k: v for k, v in rec.items() if k != "__geom__"}
                d.update(rec["__geom__"] or {})
                rows.append(d)
        # each part auto-numbered its fids 1..n, so merged parts
        # collide on the primary key — drop the column and renumber
        # sequentially unless the fids are globally unique (round-9
        # review fix: UNIQUE-constraint crash on any multi-part merge)
        fids = [r.get("fid") for r in rows if "fid" in r]
        if fids and (None in fids or len(set(fids)) != len(fids)):
            names = [n for n in names if n != "fid"]
            for r in rows:
                r.pop("fid", None)
        spec = []
        for n in names:
            v = next((r[n] for r in rows if r.get(n) is not None), None)
            spec.append((n, "INTEGER" if isinstance(v, int)
                         and not isinstance(v, bool)
                         else "REAL" if isinstance(v, float)
                         else "TEXT"))
        write_gpkg(target, "features", rows, spec)
    else:
        raise ValueError("cannot merge '{}' files".format(ext))
    if remove_source:
        shutil.rmtree(path)
    return target


GeometryFileSink.merge_files = staticmethod(merge_feature_files)


def to_file(source, url, fields=None, tile_size=None, dry_run=False,
            spark=None, **request):
    """Export a GeometryBlock to a file (reference: geometry/sinks.py:224).

    ``tile_size`` maps to a spatial repartitioning before the write (the
    reference's tile loop); ``dry_run`` only validates the plan."""
    from dask_geomodeling_spark.geometry.parallelize import GeometryTiler

    if not isinstance(source, GeometryBlock):
        raise TypeError("'{}' object is not allowed".format(type(source)))
    extension = url.rsplit(".", 1)[-1] if "." in url else "parquet"
    if tile_size:
        source = GeometryTiler(source, tile_size)
    sink = GeometryFileSink(source, url, extension=extension, fields=fields)
    if dry_run:
        sink.plan(spark, **request).schema  # force analysis only
        return None
    return sink.write(spark, **request)


class GeometryTableSink(BaseSingle):
    """Write features as a saved table BUCKETED by the index column —
    the co-location layout for shuffle-free feature merges at scale
    (SURVEY.md §6 rule 2).  Two tables bucketed with the same spec on
    their join key sort-merge-join (MergeGeometryBlocks, set ops,
    aggregations on the key) with NO Exchange on either side — at
    100 TB that deletes the dominant cost of every index-aligned merge.

    Args:
      source: GeometryBlock to save.
      table: metastore table name.
      buckets: bucket count — match it across co-merged tables.
      bucket_by: bucket column(s); defaults to the source's index.
    """

    def __init__(self, source, table, buckets=64, bucket_by=None):
        if not isinstance(table, str):
            raise TypeError("'{}' object is not allowed".format(type(table)))
        if bucket_by is None:
            bucket_by = [source.index_column]
        elif isinstance(bucket_by, str):
            bucket_by = [bucket_by]
        super().__init__(source, table, int(buckets), list(bucket_by))

    def _build(self, ctx):
        return self.source._build(ctx)

    def write(self, spark=None, mode="overwrite", **request):
        df = self.plan(spark, **request)
        table, buckets, bucket_by = self.args[1], self.args[2], self.args[3]
        (df.write.mode(mode)
         .bucketBy(buckets, *bucket_by)
         .sortBy(*bucket_by)
         .format("parquet")
         .saveAsTable(table))
        return table
