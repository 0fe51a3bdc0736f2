"""Geometry-family hunt: ConvexHull / MinimumBoundingCircle /
OrientedEnvelope vs independent models (monotone chain, Welzl,
rotating calipers), SpatialJoin / NearestJoin vs brute force."""
import os
import sys, random, math, itertools
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.geometry.constructive import (
    ConvexHull, MinimumBoundingCircle, OrientedEnvelope)
from dask_geomodeling_spark.geometry.spatial_join import (NearestJoin,
                                                          SpatialJoin)

rng = random.Random(86420)
NF = 60
feats = []
for i in range(NF):
    pts = [[rng.randint(0, 40)*0.5, rng.randint(0, 40)*0.5]
           for _ in range(rng.randint(3, 10))]
    # dedupe
    pts = [list(p) for p in dict.fromkeys(map(tuple, pts))]
    if len(pts) < 3:
        continue
    feats.append((len(feats), pts))
S = "array<array<double>>"
df = spark.createDataFrame([(i, p) for i, p in feats],
                           "fid bigint, vertices " + S)
src = DataFrameSource(df, index_column="fid")

def hull_model(pts):
    pts = sorted(map(tuple, pts))
    def half(ps):
        out = []
        for p in ps:
            while len(out) >= 2 and (
                (out[-1][0]-out[-2][0])*(p[1]-out[-2][1])
                - (out[-1][1]-out[-2][1])*(p[0]-out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out
    lo = half(pts); hi = half(pts[::-1])
    return lo[:-1] + hi[:-1]

fails = []
# --- ConvexHull: compare hull VERTEX SETS (order may differ)
got = {r["fid"]: r["vertices"]
       for r in ConvexHull(src).plan(spark).collect()}
for i, pts in feats:
    want = set(map(tuple, hull_model(pts)))
    g = set(map(tuple, got[i] or []))
    if g != want:
        fails.append(("hull", i, sorted(g), sorted(want)))
        break

# --- MinimumBoundingCircle vs Welzl
def welzl(pts):
    import random as _r
    P = [tuple(p) for p in pts]
    _r.Random(1).shuffle(P)
    def circ2(a, b):
        return ((a[0]+b[0])/2, (a[1]+b[1])/2, math.dist(a, b)/2)
    def circ3(a, b, c):
        ax, ay = a; bx, by = b; cx, cy = c
        d = 2*(ax*(by-cy) + bx*(cy-ay) + cx*(ay-by))
        if abs(d) < 1e-12:
            return None
        ux = ((ax*ax+ay*ay)*(by-cy) + (bx*bx+by*by)*(cy-ay)
              + (cx*cx+cy*cy)*(ay-by)) / d
        uy = ((ax*ax+ay*ay)*(cx-bx) + (bx*bx+by*by)*(ax-cx)
              + (cx*cx+cy*cy)*(bx-ax)) / d
        return (ux, uy, math.dist((ux, uy), a))
    def inside(c, p):
        return c is not None and math.dist((c[0], c[1]), p) <= c[2] + 1e-9
    c = None
    for idx, p in enumerate(P):
        if inside(c, p):
            continue
        c = (p[0], p[1], 0.0)
        for jdx in range(idx):
            q = P[jdx]
            if inside(c, q):
                continue
            c = circ2(p, q)
            for kdx in range(jdx):
                r2 = P[kdx]
                if inside(c, r2):
                    continue
                c = circ3(p, q, r2) or c
    return c

got = {r["fid"]: (r["center_x"], r["center_y"], r["radius"])
       for r in MinimumBoundingCircle(src).plan(spark).collect()}
for i, pts in feats:
    w = welzl(pts)
    g = got[i]
    if abs(g[2] - w[2]) > 1e-6 or math.dist(g[:2], w[:2]) > 1e-6:
        fails.append(("mbc", i, g, w))
        break

# --- OrientedEnvelope vs rotating calipers (min-AREA rectangle)
def min_rect_area(pts):
    h = hull_model(pts)
    best = None
    n = len(h)
    if n == 1:
        return 0.0
    if n == 2:
        return 0.0
    for k in range(n):
        ax, ay = h[k]; bx, by = h[(k+1) % n]
        ux, uy = bx-ax, by-ay
        L = math.hypot(ux, uy)
        ux, uy = ux/L, uy/L
        vx, vy = -uy, ux
        us = [ (p[0]-ax)*ux + (p[1]-ay)*uy for p in h]
        vs = [ (p[0]-ax)*vx + (p[1]-ay)*vy for p in h]
        area = (max(us)-min(us)) * (max(vs)-min(vs))
        if best is None or area < best:
            best = area
    return best

from dask_geomodeling_spark.geometry.polyclip import rings_signed_area
got = {r["fid"]: r["rings"]
       for r in OrientedEnvelope(src).plan(spark).collect()}
for i, pts in feats:
    want = min_rect_area(pts)
    g = got[i]
    if g is None:
        fails.append(("env", i, "null", want))
        break
    area = abs(rings_signed_area(g))
    if abs(area - want) > 1e-6 * max(1.0, want):
        fails.append(("env", i, area, want))
        break

# --- SpatialJoin contains + NearestJoin vs brute force (points x boxes)
pts_rows = [(i, rng.uniform(0, 20), rng.uniform(0, 20))
            for i in range(150)]
box_rows = []
for b in range(25):
    x1 = rng.uniform(0, 16); y1 = rng.uniform(0, 16)
    box_rows.append((b, x1, y1, x1 + rng.uniform(1, 5),
                     y1 + rng.uniform(1, 5)))
P = DataFrameSource(spark.createDataFrame(
    pts_rows, "pid bigint, x double, y double"), index_column="pid")
B = DataFrameSource(spark.createDataFrame(
    box_rows, "bid bigint, xmin double, ymin double, xmax double, "
              "ymax double"), index_column="bid")
sj = SpatialJoin(P, B, cell_size=6.0)  # default: point-in-geometry
got = {(r["pid"], r["bid"]) for r in sj.plan(spark).collect()}
want = {(p, b) for p, x, y in pts_rows
        for b, x1, y1, x2, y2 in box_rows
        if x1 <= x <= x2 and y1 <= y <= y2}
if got != want:
    fails.append(("spatial_join", len(got ^ want), list(got ^ want)[:3]))

cent_rows = [(b, (x1+x2)/2, (y1+y2)/2) for b, x1, y1, x2, y2 in box_rows]
C = DataFrameSource(spark.createDataFrame(
    cent_rows, "bid bigint, x double, y double"), index_column="bid")
nj = NearestJoin(P, C, max_distance=4.0)
got = {r["pid"]: r["bid"] for r in nj.plan(spark).collect()}
want = {}
for p, x, y in pts_rows:
    best = None
    for b, cx, cy in cent_rows:
        d2 = (x-cx)**2 + (y-cy)**2
        if d2 <= 16.0 and (best is None or (d2, b) < best):
            best = (d2, b)
    if best is not None:
        want[p] = best[1]
if got != want:
    diff = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
    fails.append(("nearest_join", len(diff),
                  [(k, got.get(k), want.get(k)) for k in list(diff)[:3]]))

print("geometry hunt fails:", fails if fails else 0)
