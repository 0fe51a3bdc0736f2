"""KML and GML feature ingestion via Spark's native XML source.

The reference reads both formats through fiona/OGR
(``GeometryFileSource``, reference geometry/sources.py:18).  Spark 4
ships a built-in XML data source (the former spark-xml), so the
Spark-first path needs NO Python in the scan at all: the JVM reader
splits files into row-tag records (``Placemark`` /
``gml:featureMember``), and the coordinate strings parse into the
engine's typed geometry columns with pure column math — ``split`` /
``transform`` / ``aggregate`` HOFs, whole-stage codegen, no UDF.

Supported geometry profile (the OGC simple-features subset both
specs share): Point and Polygon with any number of interior rings.
Ring orientation normalizes to the engine contract (outer CCW, holes
CW) with a SQL signed-area fold, so non-compliant writers (KML
mandates CCW outers but files vary) still land correctly.

Scale shape: the XML reader is a real file source — many files scan
in parallel, record splitting happens JVM-side, and property/bbox
request filters apply to the parsed frame before anything else.
Schema inference is Spark's own XML inference (one bounded
pre-pass); pass ``schema`` (KML: properties DDL) to skip it — at
100 TB the schema is the dataset contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_geomodeling_spark.geometry.base import (GeometryBlock,
                                                  apply_feature_request)
from dask_geomodeling_spark.geometry.geom_operations import (
    _ring_cross_sum_sql)

__all__ = ["KMLGeometrySource", "GMLGeometrySource", "write_kml",
           "write_gml"]


# --------------------------------------------------------------------------
# SQL text builders (all JVM column math)
# --------------------------------------------------------------------------

def _drop_close_sql(r):
    """Drop the closing vertex when the ring is explicitly closed."""
    return ("IF(size({r}) > 1 AND element_at({r}, 1) = "
            "element_at({r}, -1), slice({r}, 1, size({r}) - 1), {r})"
            ).format(r=r)


def _oriented_sql(r, ccw):
    """Force CCW (outer) or CW (hole) orientation via the signed-area
    fold — ``r`` must be a short SQL name (it is embedded 3×)."""
    return "IF(({c} >= 0) = {w}, {r}, reverse({r}))".format(
        c=_ring_cross_sum_sql(r), w="true" if ccw else "false", r=r)


def _kml_ring_sql(coords):
    """KML coordinates text ('x,y[,z] x,y[,z] …') → open ring."""
    toks = ("filter(split(trim({c}), '\\\\s+'), t -> t != '')"
            .format(c=coords))
    ring = ("transform({t}, t -> array("
            "cast(split(t, ',')[0] AS double), "
            "cast(split(t, ',')[1] AS double)))").format(t=toks)
    return _drop_close_sql(ring)


def _gml_ring_sql(poslist):
    """GML posList text ('x y x y …') → open ring."""
    toks = ("filter(split(trim({c}), '\\\\s+'), t -> t != '')"
            .format(c=poslist))
    ring = ("transform(sequence(1, size({t}) div 2), i -> array("
            "cast(element_at({t}, cast(2 * i - 1 AS int)) AS double), "
            "cast(element_at({t}, cast(2 * i AS int)) AS double)))"
            ).format(t=toks)
    return _drop_close_sql(ring)


def _field_at(schema, path):
    t = schema
    for p in path:
        if isinstance(t, T.StructType) and p in t.names:
            t = t[p].dataType
        else:
            return None
    return t


def _q(path):
    return ".".join("`{}`".format(p) for p in path)


def _array_at(schema, path):
    """SQL text for the elements at ``path`` as an ARRAY — Spark's XML
    inference yields a struct for a single occurrence and an array for
    repeats; normalize both (NULL-safe) so downstream SQL is stable."""
    t = _field_at(schema, path)
    if t is None:
        return None
    if isinstance(t, T.ArrayType):
        return _q(path)
    return ("IF({p} IS NULL, array(), array({p}))".format(p=_q(path)))


def _geometry_select(df, point_sql, outer_sql, holes_arr_sql,
                     hole_ring_fn):
    """Shared KML/GML tail: parse + orient rings, derive bbox, emit the
    typed geometry columns.  ``point_sql``: (x_sql, y_sql) or None;
    ``outer_sql``: coordinate-text SQL for the exterior ring or None;
    ``holes_arr_sql``: SQL for the array of interior boundary structs;
    ``hole_ring_fn``: maps a lambda var to its ring-text SQL."""
    x = F.expr(point_sql[0]) if point_sql else F.lit(None).cast("double")
    y = F.expr(point_sql[1]) if point_sql else F.lit(None).cast("double")
    df = df.withColumn("x", x).withColumn("y", y)
    if outer_sql is not None:
        df = df.withColumn("_outer_raw", F.expr(outer_sql))
        df = df.withColumn("vertices", F.expr(
            _oriented_sql("_outer_raw", ccw=True)))
        holes_parsed = ("transform({a}, hb -> {r})".format(
            a=holes_arr_sql, r=hole_ring_fn("hb")))
        holes = ("transform({p}, hr -> {o})".format(
            p=holes_parsed, o=_oriented_sql("hr", ccw=False)))
        df = df.withColumn("rings", F.expr(
            "IF(vertices IS NULL, NULL, concat(array(vertices), "
            "coalesce({h}, array())))".format(h=holes)))
    else:
        df = df.withColumn(
            "vertices",
            F.lit(None).cast("array<array<double>>")).withColumn(
            "rings", F.lit(None).cast("array<array<array<double>>>"))
    flat = "flatten(rings)"
    xs = "transform({f}, c -> c[0])".format(f=flat)
    ys = "transform({f}, c -> c[1])".format(f=flat)
    return (df
            .withColumn("xmin", F.coalesce(
                F.expr("array_min({})".format(xs)), F.col("x")))
            .withColumn("ymin", F.coalesce(
                F.expr("array_min({})".format(ys)), F.col("y")))
            .withColumn("xmax", F.coalesce(
                F.expr("array_max({})".format(xs)), F.col("x")))
            .withColumn("ymax", F.coalesce(
                F.expr("array_max({})".format(ys)), F.col("y")))
            .drop("_outer_raw"))


def _xml_frame(spark, url, row_tag, suffix):
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if url.endswith(suffix):
        return reader.load(url)
    return reader.option("pathGlobFilter", "*" + suffix).load(url)


class KMLGeometrySource(GeometryBlock):
    """Read KML Placemarks (reference: GeometryFileSource via
    fiona/OGR, geometry/sources.py:18) — Spark's native XML source,
    zero Python in the scan.

    Geometry: ``Point`` or ``Polygon`` (+ ``innerBoundaryIs`` holes).
    Properties: the Placemark ``name`` plus ``ExtendedData/Data``
    pairs; pass ``schema`` (DDL over the Data names) as the dataset
    contract or omit it to infer names from a bounded sample and types
    from Spark's XML inference.
    """

    def __init__(self, url, id_field="name", schema=None,
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

    def _build(self, ctx):
        url, _, schema, _ = self.args
        raw = _xml_frame(ctx.spark, url, "Placemark", ".kml")
        datas = _array_at(raw.schema, ["ExtendedData", "Data"])
        if datas:
            pairs = ("map_from_entries(transform({d}, e -> "
                     "struct(cast(e._name AS string), "
                     "cast(e.value AS string))))").format(d=datas)
            raw = raw.withColumn("_props", F.expr(pairs))
            if schema is None:
                names = [r[0] for r in raw.select(
                    F.explode(F.map_keys("_props"))).distinct()
                    .limit(1000).collect()]
                vtype = _field_at(raw.schema,
                                  ["ExtendedData", "Data"])
                elem = (vtype.elementType if isinstance(vtype, T.ArrayType)
                        else vtype)
                vt = (elem["value"].dataType.simpleString()
                      if isinstance(elem, T.StructType)
                      and "value" in elem.names else "string")
                fields = [(n, vt) for n in sorted(names)]
            else:
                fields = [(f.name, f.dataType.simpleString())
                          for f in T._parse_datatype_string(schema).fields]
            props = [F.expr("element_at(_props, '{}')".format(n))
                     .cast(t).alias(n) for n, t in fields]
        else:
            props = []
        point = None
        if _field_at(raw.schema, ["Point", "coordinates"]) is not None:
            c = "Point.coordinates"
            point = ("cast(split({c}, ',')[0] AS double)".format(c=c),
                     "cast(split({c}, ',')[1] AS double)".format(c=c))
        outer = None
        holes = "array()"
        if _field_at(raw.schema, ["Polygon", "outerBoundaryIs",
                                  "LinearRing", "coordinates"]) is not None:
            outer = _kml_ring_sql(
                "Polygon.outerBoundaryIs.LinearRing.coordinates")
            holes = _array_at(raw.schema,
                              ["Polygon", "innerBoundaryIs"]) or "array()"
        df = _geometry_select(
            raw, point, outer, holes,
            lambda v: _kml_ring_sql(v + ".LinearRing.coordinates"))
        name = ([F.col("name").cast("string").alias("name")]
                if "name" in raw.columns else [])
        df = df.select(*name, *props, "x", "y", "xmin", "ymin",
                       "xmax", "ymax", "vertices", "rings")
        return apply_feature_request(df, ctx.request)


class GMLGeometrySource(GeometryBlock):
    """Read GML feature collections (reference: GeometryFileSource via
    fiona/OGR, geometry/sources.py:18) — Spark's native XML source,
    zero Python in the scan.

    Profile: ``gml:featureMember`` rows wrapping one feature element
    (``feature_tag``; default = the single inferred member) whose
    children are property elements plus one geometry property
    (``geometry_tag``) holding ``gml:Point/gml:pos`` or
    ``gml:Polygon`` with ``gml:exterior``/``gml:interior`` LinearRing
    ``gml:posList`` coordinates — the OGC simple-features GML profile.
    Property types come from Spark's XML inference.
    """

    def __init__(self, url, feature_tag=None, geometry_tag="geometry",
                 id_field="fid", row_tag="gml:featureMember",
                 projection="EPSG:4326"):
        if not isinstance(url, str):
            raise TypeError("'{}' object is not allowed".format(type(url)))
        super().__init__(url, feature_tag, geometry_tag, id_field,
                         row_tag, str(projection).upper())

    @property
    def index_column(self):
        return self.args[3]

    @property
    def projection(self):
        return self.args[5]

    @property
    def columns(self):
        return set()

    def _build(self, ctx):
        url, feature_tag, geometry_tag, _, row_tag, _ = self.args
        raw = _xml_frame(ctx.spark, url, row_tag, ".gml")
        if feature_tag is None:
            members = [f.name for f in raw.schema.fields
                       if isinstance(f.dataType, T.StructType)]
            if len(members) != 1:
                raise ValueError(
                    "pass feature_tag= (featureMember wraps {})"
                    .format(members))
            feature_tag = members[0]
        feat = _field_at(raw.schema, [feature_tag])
        if not isinstance(feat, T.StructType):
            raise ValueError("feature element {!r} is not a struct"
                             .format(feature_tag))
        props = [F.col(_q([feature_tag, f.name])).alias(f.name)
                 for f in feat.fields if f.name != geometry_tag]
        g = [feature_tag, geometry_tag]
        point = None
        if _field_at(raw.schema, g + ["gml:Point", "gml:pos"]) is not None:
            pos = _q(g + ["gml:Point", "gml:pos"])
            toks = ("filter(split(trim({p}), '\\\\s+'), t -> t != '')"
                    .format(p=pos))
            point = ("cast(element_at({t}, 1) AS double)".format(t=toks),
                     "cast(element_at({t}, 2) AS double)".format(t=toks))
        outer = None
        holes = "array()"
        if _field_at(raw.schema, g + ["gml:Polygon", "gml:exterior",
                                      "gml:LinearRing",
                                      "gml:posList"]) is not None:
            outer = _gml_ring_sql(_q(
                g + ["gml:Polygon", "gml:exterior", "gml:LinearRing",
                     "gml:posList"]))
            holes = _array_at(raw.schema,
                              g + ["gml:Polygon", "gml:interior"]
                              ) or "array()"
        df = _geometry_select(
            raw, point, outer, holes,
            lambda v: _gml_ring_sql(v + ".`gml:LinearRing`.`gml:posList`"))
        df = df.select(*props, "x", "y", "xmin", "ymin", "xmax", "ymax",
                       "vertices", "rings")
        return apply_feature_request(df, ctx.request)


# --------------------------------------------------------------------------
# writers — interchange / test-fixture utilities (driver-side; the
# distributed egress path stays GeometryFileSink's columnar formats)
# --------------------------------------------------------------------------

def _rings_of(row):
    rings = row.get("rings")
    if rings:
        return rings
    verts = row.get("vertices")
    if verts:
        return [verts]
    if row.get("xmin") is not None and row.get("x") is None:
        x1, y1 = row["xmin"], row["ymin"]
        x2, y2 = row["xmax"], row["ymax"]
        return [[[x1, y1], [x2, y1], [x2, y2], [x1, y2]]]
    return None


def _closed(ring):
    return list(ring) + [list(ring[0])]


def _x(v):
    """Escape a text value for XML content (round-13 adversarial-XML
    hunt fix: a name/property containing ``& < >`` used to splice in
    raw and produce a MALFORMED document the reader then drops)."""
    from xml.sax.saxutils import escape
    return escape(str(v))


def _xa(v):
    """Escape an attribute value (also quotes)."""
    from xml.sax.saxutils import quoteattr
    return quoteattr(str(v))


def _ncname(name, what):
    """Element NAMES cannot be escaped, only validated — a property
    column named 'pop density' (legal in a DataFrame) would emit a
    malformed document the reader silently drops (round-13 review
    fix): restrict to the pragmatic QName subset (one optional
    namespace colon, e.g. ``ogr:feature`` — the shape external GML
    commonly uses and the reader round-trips)."""
    import re
    part = r"[A-Za-z_][\w.\-]*"
    if not re.fullmatch("{p}(:{p})?".format(p=part), str(name)) \
            or str(name).split(":")[0] in ("xmlns", "xml"):
        raise ValueError(
            "{} {!r} is not a valid XML element name; rename the "
            "column (letters/digits/_/./- starting with a letter "
            "or _, at most one namespace colon, no reserved "
            "xml/xmlns prefix)".format(what, name))
    return name


def _xmlns_decls(names):
    """xmlns declarations for every non-gml prefix used in element
    names — a prefixed element without a bound prefix is rejected by
    every namespace-aware parser (round-13 review pass 3, verified
    with ElementTree).  The URI is synthetic; our reader matches
    names literally, and external consumers only need the binding to
    exist."""
    prefixes = sorted({str(n).split(":")[0] for n in names
                       if ":" in str(n)} - {"gml"})
    return "".join(' xmlns:{0}="urn:x-{0}"'.format(p)
                   for p in prefixes)


def write_kml(path, rows, props):
    """Write a KML Document of Placemarks (Point or Polygon+holes;
    properties as ExtendedData/Data).  Text values XML-escape."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>']
    for row in rows:
        out.append("<Placemark>")
        if row.get("name") is not None:
            out.append("<name>{}</name>".format(_x(row["name"])))
        data = ["<Data name={}><value>{}</value></Data>".format(
            _xa(p), _x(row[p])) for p in props
            if row.get(p) is not None]
        if data:
            out.append("<ExtendedData>{}</ExtendedData>".format(
                "".join(data)))
        rings = _rings_of(row)
        if rings is not None:
            def coords(r):
                return " ".join("{},{}".format(p[0], p[1])
                                for p in _closed(r))
            poly = ["<Polygon><outerBoundaryIs><LinearRing><coordinates>"
                    + coords(rings[0])
                    + "</coordinates></LinearRing></outerBoundaryIs>"]
            for hole in rings[1:]:
                poly.append("<innerBoundaryIs><LinearRing><coordinates>"
                            + coords(hole)
                            + "</coordinates></LinearRing>"
                            "</innerBoundaryIs>")
            poly.append("</Polygon>")
            out.append("".join(poly))
        elif row.get("x") is not None:
            out.append("<Point><coordinates>{},{}</coordinates></Point>"
                       .format(row["x"], row["y"]))
        out.append("</Placemark>")
    out.append("</Document></kml>")
    with open(path, "w") as f:
        f.write("\n".join(out))
    return path


def write_gml(path, rows, props, feature_tag="feature",
              geometry_tag="geometry"):
    """Write a GML FeatureCollection in the simple-features profile the
    reader consumes (gml:featureMember / gml:Polygon / gml:posList).
    Property values XML-escape."""
    _ncname(feature_tag, "feature_tag")
    _ncname(geometry_tag, "geometry_tag")
    for p in props:
        _ncname(p, "property")
    decls = _xmlns_decls([feature_tag, geometry_tag] + list(props))
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<gml:FeatureCollection '
           'xmlns:gml="http://www.opengis.net/gml"{}>'.format(decls)]
    for row in rows:
        out.append("<gml:featureMember><{}>".format(feature_tag))
        for p in props:
            if row.get(p) is not None:
                out.append("<{0}>{1}</{0}>".format(p, _x(row[p])))
        rings = _rings_of(row)
        if rings is not None:
            def poslist(r):
                return " ".join("{} {}".format(p[0], p[1])
                                for p in _closed(r))
            g = ["<{}><gml:Polygon>".format(geometry_tag),
                 "<gml:exterior><gml:LinearRing><gml:posList>"
                 + poslist(rings[0])
                 + "</gml:posList></gml:LinearRing></gml:exterior>"]
            for hole in rings[1:]:
                g.append("<gml:interior><gml:LinearRing><gml:posList>"
                         + poslist(hole)
                         + "</gml:posList></gml:LinearRing></gml:interior>")
            g.append("</gml:Polygon></{}>".format(geometry_tag))
            out.append("".join(g))
        elif row.get("x") is not None:
            out.append("<{0}><gml:Point><gml:pos>{1} {2}</gml:pos>"
                       "</gml:Point></{0}>".format(geometry_tag,
                                                   row["x"], row["y"]))
        out.append("</{}></gml:featureMember>".format(feature_tag))
    out.append("</gml:FeatureCollection>")
    with open(path, "w") as f:
        f.write("\n".join(out))
    return path
