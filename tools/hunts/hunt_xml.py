"""KML / GML sources vs python xml.etree ground truth on adversarial
XML: CDATA-wrapped names/coordinates, XML comments inside geometry,
entity references, tab/newline/multi-space-separated coordinate
tuples, 3D (lon,lat,alt) KML tuples, multiple interior rings,
explicitly closed vs open rings, and scientific-notation ordinates.

Checks: every Placemark/feature parses, coordinates land bit-exactly
(doubles parse identically), holes map to CW rings after the
orientation normalization, and the KML/GML writers roundtrip."""
import math
import os
import sys
import tempfile

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.xmlformats import (  # noqa
    GMLGeometrySource, KMLGeometrySource)

tmp = tempfile.mkdtemp()
fails = 0


def signed_area(ring):
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


# ---- KML ------------------------------------------------------------
kml = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
<Placemark><name><![CDATA[cdata & name]]></name>
  <Point><coordinates>
     1.5,2.5,0
  </coordinates></Point></Placemark>
<Placemark><name>entity &amp; tabs</name>
  <Point><coordinates>\t-3.25,4.75\t</coordinates></Point></Placemark>
<Placemark><name>poly2holes</name>
  <Polygon><!-- a comment inside geometry -->
    <outerBoundaryIs><LinearRing><coordinates>
      0,0 10,0
      10,10\t0,10 0,0
    </coordinates></LinearRing></outerBoundaryIs>
    <innerBoundaryIs><LinearRing><coordinates>
      1,1 1,2 2,2 2,1 1,1
    </coordinates></LinearRing></innerBoundaryIs>
    <innerBoundaryIs><LinearRing><coordinates>
      5,5 5,6 6,6 6,5
    </coordinates></LinearRing></innerBoundaryIs>
  </Polygon></Placemark>
<Placemark><name>sci-notation</name>
  <Point><coordinates>1.5e-3,-2.5E2</coordinates></Point></Placemark>
</Document></kml>"""
kp = os.path.join(tmp, "h.kml")
open(kp, "w").write(kml)
rows = {r["name"]: r for r in KMLGeometrySource(kp).plan(spark)
        .collect()}
if set(rows) != {"cdata & name", "entity & tabs", "poly2holes",
                 "sci-notation"}:
    fails += 1
    print("KML NAMES FAIL", sorted(rows))
else:
    if (rows["cdata & name"]["x"], rows["cdata & name"]["y"]) != \
            (1.5, 2.5):
        fails += 1
        print("KML CDATA POINT FAIL", rows["cdata & name"])
    if (rows["entity & tabs"]["x"], rows["entity & tabs"]["y"]) != \
            (-3.25, 4.75):
        fails += 1
        print("KML TAB POINT FAIL", rows["entity & tabs"])
    if (rows["sci-notation"]["x"], rows["sci-notation"]["y"]) != \
            (1.5e-3, -2.5e2):
        fails += 1
        print("KML SCI FAIL", rows["sci-notation"])
    pr = rows["poly2holes"]["rings"]
    if pr is None or len(pr) != 3:
        fails += 1
        print("KML RINGS FAIL", pr and len(pr))
    else:
        outer = [tuple(p) for p in pr[0]]
        if len(outer) != 4 or signed_area(list(outer)) <= 0:
            fails += 1
            print("KML OUTER FAIL", outer)
        areas = sorted(abs(signed_area([tuple(p) for p in r]))
                       for r in pr[1:])
        if not all(signed_area([tuple(p) for p in r]) < 0
                   for r in pr[1:]) or areas != [1.0, 1.0]:
            fails += 1
            print("KML HOLES FAIL", [(signed_area([tuple(p)
                  for p in r])) for r in pr[1:]])

# ---- GML ------------------------------------------------------------
gml = """<?xml version="1.0" encoding="UTF-8"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
<gml:featureMember>
 <town><fid>1</fid><pop>10</pop>
  <geometry><gml:Point><gml:pos>
    7.5   -8.25
  </gml:pos></gml:Point></geometry></town>
</gml:featureMember>
<gml:featureMember>
 <town><fid>2</fid><pop>20</pop>
  <geometry><gml:Polygon>
   <gml:exterior><gml:LinearRing><gml:posList>
     0 0\t4 0 4 3
     0 3 0 0
   </gml:posList></gml:LinearRing></gml:exterior>
   <gml:interior><gml:LinearRing><gml:posList>
     1 1 1 2 2 2 2 1
   </gml:posList></gml:LinearRing></gml:interior>
  </gml:Polygon></geometry></town>
</gml:featureMember>
</gml:FeatureCollection>"""
gp = os.path.join(tmp, "h.gml")
open(gp, "w").write(gml)
grows = {r["fid"]: r for r in GMLGeometrySource(gp).plan(spark)
         .collect()}
if (grows[1]["x"], grows[1]["y"]) != (7.5, -8.25):
    fails += 1
    print("GML POINT FAIL", grows[1])
pr = grows[2]["rings"]
if pr is None or len(pr) != 2 or len(pr[0]) != 4:
    fails += 1
    print("GML RINGS FAIL", pr)
elif signed_area([tuple(p) for p in pr[0]]) != 12.0 \
        or signed_area([tuple(p) for p in pr[1]]) != -1.0:
    fails += 1
    print("GML AREAS FAIL",
          signed_area([tuple(p) for p in pr[0]]),
          signed_area([tuple(p) for p in pr[1]]))

# ---- writer roundtrips ----------------------------------------------
from dask_geomodeling_spark.geometry.xmlformats import (  # noqa
    write_gml, write_kml)
kout = os.path.join(tmp, "rt.kml")
write_kml(kout, [r.asDict() for r in
                 KMLGeometrySource(kp).plan(spark).collect()], [])
back = {r["name"]: r for r in KMLGeometrySource(kout).plan(spark)
        .collect()}
for n, r in rows.items():
    b = back.get(n)
    if b is None or (r["x"], r["y"]) != (b["x"], b["y"]) \
            or (r["rings"] or []) != (b["rings"] or []):
        fails += 1
        print("KML ROUNDTRIP FAIL", n)
gout = os.path.join(tmp, "rt.gml")
write_gml(gout, [r.asDict() for r in
                 GMLGeometrySource(gp).plan(spark).collect()],
          ["fid", "pop"])
gback = {r["fid"]: r for r in GMLGeometrySource(gout).plan(spark)
         .collect()}
for k, r in grows.items():
    b = gback.get(k)
    if b is None or (r["x"], r["y"]) != (b["x"], b["y"]) \
            or (r["rings"] or []) != (b["rings"] or []):
        fails += 1
        print("GML ROUNDTRIP FAIL", k)
print("DONE fails:", fails)
