"""Geometry measurement operations (reference: geometry/geom_operations.py).

``Area`` (reference :15) computes feature area in the requested projection.
Boxes are exact column math; points have zero area.  General polygons
(``vertices`` ``array<array<double>>`` column: the outer ring without
the closing vertex) use the shoelace formula via ``aggregate`` over the
array, and ``point_in_polygon_expr`` gives the exact even-odd ray-cast
containment test — both JVM-side, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.core.blocks import Block
from dask_geomodeling_spark.geometry.base import GeometryBlock, SeriesBlock

__all__ = ["Area", "Length", "GeodesicArea", "GeodesicLength",
           "point_in_polygon_expr", "shoelace_expr",
           "clip_ring_box_expr", "clip_rings_box_cols_expr",
           "perimeter_expr", "centroid_expr",
           "rings_area_expr", "point_in_rings_expr",
           "rings_perimeter_expr", "rings_centroid_expr",
           "clip_rings_box_expr"]


def _edges_sql(verts_col):
    """SQL pairing each ring vertex with its successor (wrapping)."""
    return ("zip_with({v}, concat(slice({v}, 2, size({v}) - 1), "
            "slice({v}, 1, 1)), (a, b) -> {{expr}})").format(v=verts_col)


def shoelace_expr(verts_col="vertices"):
    """Exact polygon area of a ``vertices`` ring column (shoelace)."""
    edges = _edges_sql(verts_col).format(
        expr="a[0] * b[1] - b[0] * a[1]")
    return F.abs(F.expr(
        "aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
        .format(e=edges))) / 2


#: Multi-ring geometry contract (polygon holes + MULTIPOLYGON —
#: reference operates on arbitrary GEOS geometry, geom_operations.py:15):
#: a ``rings`` column is a FLAT ``array<array<array<double>>>`` of
#: orientation-NORMALIZED rings — outer rings counter-clockwise
#: (positive shoelace), holes clockwise (negative), the invariant
#: ``parse_point_or_box_wkt`` establishes.  Total area is then ONE
#: nested signed fold; even-odd containment never needs orientation.


def _ring_cross_sum_sql(ring_sql):
    """Signed Σ(x_i·y_{i+1} − x_{i+1}·y_i) over one ring expression
    (= 2 × signed area); inner lambda variables are suffixed so the
    text nests inside an outer ``aggregate`` lambda."""
    edges = _edges_sql(ring_sql).format(
        expr="a[0] * b[1] - b[0] * a[1]")
    return ("aggregate({e}, cast(0.0 as double), "
            "(acc2, v2) -> acc2 + v2)").format(e=edges)


def rings_area_expr(rings_col="rings"):
    """Exact multi-ring area: Σ signed ring areas (holes subtract via
    their clockwise orientation) — one nested fold, pure column math."""
    return F.expr(
        "aggregate({c}, cast(0.0 as double), (acc, r) -> acc + {s})"
        .format(c=rings_col, s=_ring_cross_sum_sql("r"))) / 2


def point_in_rings_sql(px, py, rings_col="rings"):
    """Raw SQL text of the even-odd ray cast (nests inside outer
    lambdas whose variables avoid a/b/acc/acc2/r/v2)."""
    cross = ("CASE WHEN ((a[1] > {py}) != (b[1] > {py})) AND "
             "({px} < a[0] + (b[0] - a[0]) * ({py} - a[1]) / "
             "nullif(b[1] - a[1], cast(0.0 as double))) "
             "THEN 1 ELSE 0 END").format(px=px, py=py)
    per_ring = "aggregate({e}, 0, (acc2, v2) -> acc2 + v2)".format(
        e=_edges_sql("r").format(expr=cross))
    return ("pmod(aggregate({c}, 0, (acc, r) -> acc + {pr}), 2) = 1"
            .format(c=rings_col, pr=per_ring))


def point_in_rings_expr(px, py, rings_col="rings"):
    """Even-odd ray-cast containment over ALL rings: crossings of each
    ring sum; a point inside a hole crosses the hole ring an odd extra
    count → outside.  Works for any ring orientation, and disjoint
    MULTIPOLYGON parts are just more rings."""
    return F.expr(point_in_rings_sql(px, py, rings_col))


def _edge_structs_sql(rings_col, tag):
    """Flat edge list of all rings as ``struct(ax, ay, bx, by)``;
    lambda variables are suffixed with ``tag`` for clash-free
    nesting."""
    return ("flatten(transform({c}, r{t} -> zip_with(r{t}, "
            "concat(slice(r{t}, 2, size(r{t}) - 1), "
            "slice(r{t}, 1, 1)), "
            "(p{t}, q{t}) -> struct(p{t}[0] AS ax, p{t}[1] AS ay, "
            "q{t}[0] AS bx, q{t}[1] AS by))))"
            .format(c=rings_col, t=tag))


def _seg_intersect_sql(ea, eb):
    """Exact closed-segment intersection predicate (CLRS orientation
    tests + collinear on-segment checks); ``ea``/``eb`` are struct
    expressions with ax/ay/bx/by fields.  Touching counts as
    intersecting — the GEOS ``intersects`` convention."""
    def o(px, py, qx, qy, rx, ry):
        return ("sign(({qx} - {px}) * ({ry} - {py}) "
                "- ({qy} - {py}) * ({rx} - {px}))").format(
            px=px, py=py, qx=qx, qy=qy, rx=rx, ry=ry)

    def onseg(px, py, qx, qy, rx, ry):
        return ("({rx} >= least({px}, {qx}) AND "
                "{rx} <= greatest({px}, {qx}) AND "
                "{ry} >= least({py}, {qy}) AND "
                "{ry} <= greatest({py}, {qy}))").format(
            px=px, py=py, qx=qx, qy=qy, rx=rx, ry=ry)
    a = ("{}.ax".format(ea), "{}.ay".format(ea))
    b = ("{}.bx".format(ea), "{}.by".format(ea))
    c = ("{}.ax".format(eb), "{}.ay".format(eb))
    d = ("{}.bx".format(eb), "{}.by".format(eb))
    o1 = o(*a, *b, *c)
    o2 = o(*a, *b, *d)
    o3 = o(*c, *d, *a)
    o4 = o(*c, *d, *b)
    return ("((({o1}) * ({o2}) < 0 AND ({o3}) * ({o4}) < 0) "
            "OR (({o1}) = 0 AND {s1}) OR (({o2}) = 0 AND {s2}) "
            "OR (({o3}) = 0 AND {s3}) OR (({o4}) = 0 AND {s4}))"
            .format(o1=o1, o2=o2, o3=o3, o4=o4,
                    s1=onseg(*a, *b, *c), s2=onseg(*a, *b, *d),
                    s3=onseg(*c, *d, *a), s4=onseg(*c, *d, *b)))


def rings_intersect_expr(a_col, b_col):
    """EXACT polygon-polygon ``intersects`` test over two ``rings``
    columns, pure column math (whole-stage codegen, no Python):
    true iff a vertex of one polygon lies even-odd inside the other,
    or any boundary edges intersect (touch included — the GEOS
    convention).  Holes honored: a polygon entirely inside the
    other's hole neither contains a vertex nor crosses an edge.
    Cost per pair is O(|edges A| · |edges B|) — the inherent cost of
    an exact test, evaluated post-candidate-pairing only."""
    va = ("exists(flatten({a}), pv -> {t})".format(
        a=a_col, t=point_in_rings_sql("pv[0]", "pv[1]", b_col)))
    vb = ("exists(flatten({b}), pv -> {t})".format(
        b=b_col, t=point_in_rings_sql("pv[0]", "pv[1]", a_col)))
    ee = ("exists({ea}, e1 -> exists({eb}, e2 -> {t}))".format(
        ea=_edge_structs_sql(a_col, "u"),
        eb=_edge_structs_sql(b_col, "w"),
        t=_seg_intersect_sql("e1", "e2")))
    return F.expr("({va}) OR ({vb}) OR ({ee})".format(
        va=va, vb=vb, ee=ee))


def rings_perimeter_expr(rings_col="rings"):
    """Total boundary length: Σ ring perimeters (holes ADD boundary,
    matching GEOS ``length`` on polygons with interior rings)."""
    per_edge = _edges_sql("r").format(
        expr="sqrt((b[0] - a[0]) * (b[0] - a[0]) "
             "+ (b[1] - a[1]) * (b[1] - a[1]))")
    per_ring = ("aggregate({e}, cast(0.0 as double), "
                "(acc2, v2) -> acc2 + v2)").format(e=per_edge)
    return F.expr(
        "aggregate({c}, cast(0.0 as double), (acc, r) -> acc + {pr})"
        .format(c=rings_col, pr=per_ring))


def rings_centroid_expr(rings_col="rings"):
    """Area-weighted centroid over all rings: the signed-area formula
    summed ring-wise — holes subtract through their negative cross
    sums.  Degenerate total area falls back to the vertex mean over
    the flattened rings."""
    sa = ("aggregate({c}, cast(0.0 as double), (acc, r) -> acc + {s})"
          .format(c=rings_col, s=_ring_cross_sum_sql("r")))
    def _weighted(expr):
        per_edge = _edges_sql("r").format(expr=expr)
        per_ring = ("aggregate({e}, cast(0.0 as double), "
                    "(acc2, v2) -> acc2 + v2)").format(e=per_edge)
        return ("aggregate({c}, cast(0.0 as double), "
                "(acc, r) -> acc + {pr})").format(c=rings_col,
                                                  pr=per_ring)
    sx = _weighted("(a[0] + b[0]) * (a[0] * b[1] - b[0] * a[1])")
    sy = _weighted("(a[1] + b[1]) * (a[0] * b[1] - b[0] * a[1])")
    flat = "flatten({c})".format(c=rings_col)
    mean = ("aggregate({v}, cast(0.0 as double), "
            "(acc3, p3) -> acc3 + p3[{idx}]) / size({v})")
    cx = F.expr(
        "CASE WHEN ({sa}) != 0.0 THEN ({sx}) / (3.0 * ({sa})) "
        "ELSE {m} END".format(
            sa=sa, sx=sx, m=mean.format(v=flat, idx=0)))
    cy = F.expr(
        "CASE WHEN ({sa}) != 0.0 THEN ({sy}) / (3.0 * ({sa})) "
        "ELSE {m} END".format(
            sa=sa, sy=sy, m=mean.format(v=flat, idx=1)))
    return cx, cy


def _halfplane_clip_sql(ring_sql, axis, bound, keep_ge, var="hp"):
    """One Sutherland–Hodgman half-plane pass as a SQL string over a
    ring expression: each directed edge (a, b) contributes 0–2 output
    vertices (b if both inside; the crossing point on entering or
    leaving), so the pass is ``flatten(zip_with(ring, rotate(ring),
    edge -> case ...))`` — per-edge local, no imperative loop.

    ``var`` names the let-binding lambda variable (unique per chained
    pass): the input expression is bound ONCE via a single-element
    ``transform`` — substituting it textually into the 3 references
    would re-evaluate the previous pass per reference, compounding
    ~5× per pass across the 4-pass chain."""
    c = 0 if axis == "x" else 1
    cmp_op = ">=" if keep_ge else "<="
    # bound may be a numeric literal OR a SQL snippet (column-driven
    # clip windows, e.g. Subdivide's exploded grid-cell edges)
    bs = (repr(float(bound)) if isinstance(bound, (int, float))
          else "({})".format(bound))
    a_in = "(a[{c}] {op} {b})".format(c=c, op=cmp_op, b=bs)
    b_in = "(b[{c}] {op} {b})".format(c=c, op=cmp_op, b=bs)
    # intersection of segment a->b with the clip line axis = bound
    t = "(({b} - a[{c}]) / (b[{c}] - a[{c}]))".format(b=bs, c=c)
    o = 1 - c
    other = "(a[{o}] + {t} * (b[{o}] - a[{o}]))".format(o=o, t=t)
    isect = ("array(cast({b} as double), {other})".format(
        b=bs, other=other) if c == 0
        else "array({other}, cast({b} as double))".format(
        b=bs, other=other))
    edge = ("CASE WHEN {ai} AND {bi} THEN array(b) "
            "WHEN {ai} THEN array({i}) "
            "WHEN {bi} THEN array({i}, b) "
            "ELSE slice(array(b), 1, 0) END").format(
        ai=a_in, bi=b_in, i=isect)
    # greatest(…, 0) keeps the rotate legal when an earlier pass
    # emptied the ring
    return ("transform(array({r}), {v} -> "
            "flatten(zip_with({v}, concat("
            "slice({v}, 2, greatest(size({v}) - 1, 0)), "
            "slice({v}, 1, least(size({v}), 1))), (a, b) -> {e})))[0]"
            ).format(r=ring_sql, e=edge, v=var)


def clip_ring_box_expr(xmin, ymin, xmax, ymax, verts_col="vertices"):
    """Exact polygon ∩ axis-aligned box via four chained
    Sutherland–Hodgman half-plane passes (left, right, bottom, top) —
    one nested column expression, fully JVM-side; returns the clipped
    ring (possibly empty).  Correct for any simple polygon against a
    convex clip window — the textbook algorithm, re-expressed as
    per-edge array algebra instead of a loop."""
    ring = verts_col
    for k, (axis, bound, keep_ge) in enumerate(
            (("x", float(xmin), True), ("x", float(xmax), False),
             ("y", float(ymin), True), ("y", float(ymax), False))):
        ring = _halfplane_clip_sql(ring, axis, bound, keep_ge,
                                   var="hp{}".format(k))
    return F.expr(ring)


def clip_rings_box_expr(xmin, ymin, xmax, ymax, rings_col="rings"):
    """Clip every ring to the box independently (Sutherland–Hodgman
    preserves traversal order against a convex window, so outer rings
    stay counter-clockwise and holes clockwise — the signed-fold area
    of the result stays exact for valid nestings).  Rings clipped to
    fewer than 3 vertices drop out."""
    ring = "r"
    for k, (axis, bound, keep_ge) in enumerate(
            (("x", float(xmin), True), ("x", float(xmax), False),
             ("y", float(ymin), True), ("y", float(ymax), False))):
        ring = _halfplane_clip_sql(ring, axis, bound, keep_ge,
                                   var="hp{}".format(k))
    return F.expr(
        "filter(transform({c}, r -> {e}), rr -> size(rr) >= 3)"
        .format(c=rings_col, e=ring))


def clip_rings_box_cols_expr(xmin, ymin, xmax, ymax,
                             rings_col="rings"):
    """Column-bound variant of :func:`clip_rings_box_expr` — the
    bounds are SQL snippets (e.g. a subdivision cell's edges) instead
    of numeric literals; same four-pass exact S-H chain."""
    ring = "r"
    for k, (axis, bound, keep_ge) in enumerate(
            (("x", xmin, True), ("x", xmax, False),
             ("y", ymin, True), ("y", ymax, False))):
        ring = _halfplane_clip_sql(ring, axis, bound, keep_ge,
                                   var="hp{}".format(k))
    return F.expr(
        "filter(transform({c}, r -> {e}), rr -> size(rr) >= 3)"
        .format(c=rings_col, e=ring))


def point_in_polygon_expr(px, py, verts_col="vertices"):
    """Even-odd ray-cast containment of point (``px``, ``py``) — SQL
    expression strings — in the ``vertices`` ring: one crossing counted
    per edge whose y-span straddles the point and whose x-intercept at
    ``py`` lies right of ``px``.  ``nullif`` guards the horizontal-edge
    division (the straddle test is already false there, and NULL AND
    false = false under eager vectorized evaluation).  Pure column
    math — runs inside the scan, broadcastable, oracle-reproducible."""
    cross = ("CASE WHEN ((a[1] > {py}) != (b[1] > {py})) AND "
             "({px} < a[0] + (b[0] - a[0]) * ({py} - a[1]) / "
             "nullif(b[1] - a[1], cast(0.0 as double))) "
             "THEN 1 ELSE 0 END").format(px=px, py=py)
    edges = _edges_sql(verts_col).format(expr=cross)
    return F.expr(
        "pmod(aggregate({e}, 0, (acc, v) -> acc + v), 2) = 1"
        .format(e=edges))


class Area(SeriesBlock):
    """Area of each feature (reference: geometry/geom_operations.py:15)."""

    def __init__(self, source, projection="EPSG:4326"):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, projection)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        cols = set(df.columns)
        has_box = {"xmin", "ymin", "xmax", "ymax"} <= cols
        box = ((F.col("xmax") - F.col("xmin"))
               * (F.col("ymax") - F.col("ymin"))) if has_box else None
        # precedence per row: full ring set (holes/multipolygon) >
        # single exterior ring > bbox — mixed frames carry NULLs in
        # the finer columns
        expr = None
        if "rings" in cols:
            expr = F.when(F.col("rings").isNotNull(), rings_area_expr())
        if "vertices" in cols:
            ring = F.when(F.col("vertices").isNotNull(), shoelace_expr())
            expr = ring if expr is None else \
                expr.when(F.col("vertices").isNotNull(), shoelace_expr())
        if expr is not None:
            return expr.otherwise(box) if box is not None else expr
        if has_box:
            return box
        if {"x", "y"} <= cols:
            return F.lit(0.0)
        raise ValueError("Area requires geometry columns")


def centroid_expr(verts_col="vertices"):
    """Exact polygon centroid (cx, cy) of a ``vertices`` ring: the
    standard signed-area-weighted formula
    ``cx = Σ(x_i + x_{i+1})·cross_i / (6A_signed)`` — two sequential
    folds over the wrapped edges, pure column math.  Returns a pair of
    Columns.  Degenerate rings (zero signed area) fall back to the
    vertex mean."""
    cross = _edges_sql(verts_col).format(
        expr="a[0] * b[1] - b[0] * a[1]")
    sa = ("aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
          .format(e=cross))
    wx = _edges_sql(verts_col).format(
        expr="(a[0] + b[0]) * (a[0] * b[1] - b[0] * a[1])")
    wy = _edges_sql(verts_col).format(
        expr="(a[1] + b[1]) * (a[0] * b[1] - b[0] * a[1])")
    sx = ("aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
          .format(e=wx))
    sy = ("aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
          .format(e=wy))
    mean = ("aggregate({v}, cast(0.0 as double), (acc, p) -> acc + p[{c}])"
            " / size({v})")
    # divisor is 6A = 3·Σcross (the cross sum is TWICE the signed area)
    cx = F.expr(
        "CASE WHEN ({sa}) != 0.0 THEN ({sx}) / (3.0 * ({sa})) "
        "ELSE {m} END".format(
            sa=sa, sx=sx, m=mean.format(v=verts_col, c=0)))
    cy = F.expr(
        "CASE WHEN ({sa}) != 0.0 THEN ({sy}) / (3.0 * ({sa})) "
        "ELSE {m} END".format(
            sa=sa, sy=sy, m=mean.format(v=verts_col, c=1)))
    return cx, cy


def perimeter_expr(verts_col="vertices"):
    """Exact ring perimeter: sum of per-edge Euclidean lengths over the
    wrapped vertex pairs — sequential fold, deterministic order."""
    edges = _edges_sql(verts_col).format(
        expr="sqrt((b[0] - a[0]) * (b[0] - a[0]) "
             "+ (b[1] - a[1]) * (b[1] - a[1]))")
    return F.expr(
        "aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
        .format(e=edges))


def path_length_expr(path_col="path"):
    """Open-polyline length: Σ segment lengths over a ``path`` column
    (no closing edge — the LINESTRING counterpart of perimeter)."""
    return F.expr(
        "aggregate(zip_with(slice({c}, 1, size({c}) - 1), "
        "slice({c}, 2, size({c}) - 1), "
        "(a, b) -> sqrt((b[0] - a[0]) * (b[0] - a[0]) "
        "+ (b[1] - a[1]) * (b[1] - a[1]))), "
        "cast(0.0 as double), (acc, v) -> acc + v)".format(c=path_col))


class Length(SeriesBlock):
    """Perimeter/length companion measurement (exact ring perimeter
    when a ``vertices`` ring is present; box perimeter; 0 for
    points)."""

    def __init__(self, source, projection="EPSG:4326"):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, projection)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        cols = set(df.columns)
        box = (2 * ((F.col("xmax") - F.col("xmin"))
                    + (F.col("ymax") - F.col("ymin")))
               if {"xmin", "ymin", "xmax", "ymax"} <= cols else F.lit(0.0))
        expr = None
        if "path" in cols:
            expr = F.when(F.col("path").isNotNull(),
                          path_length_expr())
        if "rings" in cols:
            w = F.when(F.col("rings").isNotNull(),
                       rings_perimeter_expr())
            expr = (w if expr is None else
                    expr.when(F.col("rings").isNotNull(),
                              rings_perimeter_expr()))
        if "vertices" in cols:
            expr = (F.when(F.col("vertices").isNotNull(),
                           perimeter_expr()) if expr is None else
                    expr.when(F.col("vertices").isNotNull(),
                              perimeter_expr()))
        return box if expr is None else expr.otherwise(box)


def rings_wkt_sql(rings_col="rings"):
    """SQL text: serialize a flat orientation-normalized ring list to
    MULTIPOLYGON WKT — pure column math (one sequential fold, no
    Python).  The orientation contract does the polygon grouping: a
    counter-clockwise ring (signed cross sum >= 0) OPENS a polygon,
    clockwise rings are HOLES of the most recent outer — exactly the
    order ``parse_point_or_box_wkt`` emits, so encode(decode(wkt))
    round-trips.  The closing vertex is re-appended per WKT."""
    rt = ("array_join(transform(concat(r, slice(r, 1, 1)), "
          "p -> concat(CAST(p[0] AS STRING), ' ', "
          "CAST(p[1] AS STRING))), ', ')")
    outer = "({}) >= 0".format(_ring_cross_sum_sql("r"))
    return ("concat('MULTIPOLYGON (', aggregate({c}, "
            "cast('' as string), (acc, r) -> concat(acc, "
            "CASE WHEN acc = '' THEN '((' "
            "WHEN {outer} THEN '), ((' ELSE ', (' END, {rt}, ')')"
            "), '))')").format(c=rings_col, outer=outer, rt=rt)


def _open_edge_structs_sql(path_col, tag):
    """Edge list of an OPEN polyline as ``struct(ax, ay, bx, by)`` —
    no wrap-around edge; lambda variables suffixed for nesting."""
    return ("zip_with(slice({c}, 1, size({c}) - 1), "
            "slice({c}, 2, size({c}) - 1), "
            "(p{t}, q{t}) -> struct(p{t}[0] AS ax, p{t}[1] AS ay, "
            "q{t}[0] AS bx, q{t}[1] AS by))"
            .format(c=path_col, t=tag))


def path_intersects_rings_expr(path_col, rings_col):
    """EXACT polyline-polygon ``intersects`` test (round 8): true iff
    a path vertex lies even-odd inside the polygon (the whole line
    may sit in the interior without crossing the boundary) or any
    open-chain edge intersects a boundary edge (touch included).
    Pure column math, same cost model as
    :func:`rings_intersect_expr`."""
    va = ("exists({p}, pv -> {t})".format(
        p=path_col, t=point_in_rings_sql("pv[0]", "pv[1]", rings_col)))
    ee = ("exists({ep}, e1 -> exists({er}, e2 -> {t}))".format(
        ep=_open_edge_structs_sql(path_col, "u"),
        er=_edge_structs_sql(rings_col, "w"),
        t=_seg_intersect_sql("e1", "e2")))
    return F.expr("({va}) OR ({ee})".format(va=va, ee=ee))


class Azimuth(SeriesBlock):
    """North-based bearing of each feature's polyline, start vertex to
    end vertex, in radians [0, 2pi) clockwise from north — the PostGIS
    ``ST_Azimuth(ST_StartPoint(g), ST_EndPoint(g))`` composition (no
    reference analogue; GEOS toolbox territory).  NULL for NULL or
    closed (start == end) paths, matching ST_Azimuth's NULL on
    coincident points.  Pure column math."""

    def __init__(self, source, projection="EPSG:4326"):
        if not isinstance(source, GeometryBlock):
            raise TypeError(
                "'{}' object is not allowed".format(type(source)))
        if "path" not in source.columns:
            raise ValueError("Azimuth requires a 'path' column")
        super().__init__(source, projection)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        dx = "(element_at(path, -1)[0] - path[0][0])"
        dy = "(element_at(path, -1)[1] - path[0][1])"
        return F.expr(
            "CASE WHEN path IS NULL OR ({dx} = 0 AND {dy} = 0) "
            "THEN NULL ELSE pmod(atan2({dx}, {dy}), 2.0 * pi()) END"
            .format(dx=dx, dy=dy))


def _pt_seg_dist_sql(px, py, ax, ay, bx, by):
    """SQL text: Euclidean distance from point (px, py) to segment
    (ax, ay)-(bx, by) — projection parameter clamped to [0, 1],
    degenerate segments collapse to point distance."""
    l2 = ("(({bx} - {ax}) * ({bx} - {ax}) + ({by} - {ay}) * "
          "({by} - {ay}))").format(ax=ax, ay=ay, bx=bx, by=by)
    t = ("CASE WHEN {l2} = 0D THEN 0D ELSE LEAST(1D, GREATEST(0D, "
         "(({px} - {ax}) * ({bx} - {ax}) + ({py} - {ay}) * "
         "({by} - {ay})) / {l2})) END"
         ).format(px=px, py=py, ax=ax, ay=ay, bx=bx, by=by, l2=l2)
    # let-bind t via single-element transform (the SQL let idiom)
    return ("transform(array({t}), tt -> SQRT("
            "({px} - ({ax} + tt * ({bx} - {ax}))) * "
            "({px} - ({ax} + tt * ({bx} - {ax}))) + "
            "({py} - ({ay} + tt * ({by} - {ay}))) * "
            "({py} - ({ay} + tt * ({by} - {ay})))))[0]"
            ).format(t=t, px=px, py=py, ax=ax, ay=ay, bx=bx, by=by)


def _directed_hausdorff_sql(a, b, closed_b):
    """SQL text: directed discrete Hausdorff h(a → b) — max over a's
    VERTICES of the min distance to b's SEGMENTS (closed_b adds the
    wrap-around edge).  O(n·m) column math per row, no Python."""
    last = "size({b}) - 1".format(b=b) if not closed_b \
        else "size({b})".format(b=b)
    seg = _pt_seg_dist_sql(
        "p[0]", "p[1]",
        "{b}[s - 1][0]".format(b=b), "{b}[s - 1][1]".format(b=b),
        "{b}[s % size({b})][0]".format(b=b),
        "{b}[s % size({b})][1]".format(b=b))
    mind = ("aggregate(transform(sequence(1, GREATEST(1, {last})), "
            "s -> {seg}), CAST('Infinity' AS DOUBLE), "
            "(acc, v) -> LEAST(acc, v))"
            ).format(last=last, seg=seg)
    return ("aggregate(transform({a}, p -> {mind}), 0D, "
            "(acc, v) -> GREATEST(acc, v))").format(a=a, mind=mind)


class HausdorffDistance(Block):
    """Symmetric discrete Hausdorff distance between the SAME feature
    in two layers (PostGIS ``ST_HausdorffDistance`` semantics on the
    discrete vertex/segment sets; no reference analogue — GEOS
    toolbox).  The canonical uses: measure simplification /
    reprojection error per feature (original vs `Simplify` output),
    or score candidate track matches.

    Both layers join on ``left``'s index; geometry per side is the
    ``path`` (open) or ``vertices`` ring (closed, wrap edge included).
    ``h = max(h(A→B), h(B→A))`` where the directed term is the max
    over A's vertices of the min distance to B's segments — the
    standard discrete refinement that is exact when vertices are
    dense (``Segmentize`` first to bound the discretization error).

    One equi-join + O(n·m) pure column math per row — no kernel, no
    shuffle beyond the join.  Output: left's index + ``hausdorff``."""

    def __init__(self, left, right, id_column=None):
        if not isinstance(left, GeometryBlock) \
                or not isinstance(right, GeometryBlock):
            raise TypeError("left/right must be GeometryBlocks")
        if id_column is None:
            id_column = left.index_column
        super().__init__(left, right, str(id_column))

    @property
    def index_column(self):
        return self.args[2]

    @property
    def columns(self):
        return {self.args[2], "hausdorff"}

    @staticmethod
    def _chain(df, alias):
        cols = set(df.columns)
        if "path" in cols:
            return F.col("path").alias(alias), False
        if "vertices" in cols:
            return F.col("vertices").alias(alias), True
        raise ValueError(
            "HausdorffDistance needs a 'path' or 'vertices' column "
            "(have {})".format(sorted(cols)))

    def _build(self, ctx):
        idc = self.args[2]
        L = self.args[0]._build(ctx)
        R = self.args[1]._build(ctx)
        ca, closed_a = self._chain(L, "_ha")
        cb, closed_b = self._chain(R, "_hb")
        j = (L.select(F.col(idc), ca)
             .join(R.select(F.col(idc), cb), idc))
        h = ("CASE WHEN _ha IS NULL OR _hb IS NULL THEN NULL "
             "ELSE GREATEST({ab}, {ba}) END").format(
            ab=_directed_hausdorff_sql("_ha", "_hb", closed_b),
            ba=_directed_hausdorff_sql("_hb", "_ha", closed_a))
        return j.select(idc, F.expr(h).alias("hausdorff"))


#: authalic mean Earth radius (meters) — the sphere whose area equals
#: the WGS84 ellipsoid's; the turf.js/geographiclib convention
EARTH_RADIUS_M = 6371008.8


def geodesic_ring_sum_sql(ring_sql):
    """SQL text: the spherical Green's-theorem trapezoid sum of one
    lon/lat ring — ``Σ_edges radians(λ2−λ1)·(2 + sin φ1 + sin φ2)``
    (signed: reversing the ring negates it, so holes subtract under
    the orientation contract).  Multiply by R²/2 for area."""
    edges = _edges_sql(ring_sql).format(
        expr="radians(b[0] - a[0]) * (2.0D + sin(radians(a[1])) "
             "+ sin(radians(b[1])))")
    return ("aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
            .format(e=edges))


def _crosses_antimeridian_sql(rings_col):
    """SQL text: TRUE iff any wrapped edge of any ring spans more than
    180° of longitude — i.e. the coordinates fold across ±180° and the
    trapezoid sum (linear in Δλ) would silently integrate the wrong
    way around the sphere."""
    edge = _edges_sql("r").format(expr="abs(b[0] - a[0]) > 180.0D")
    return ("exists({c}, r -> exists({e}, v -> v))"
            .format(c=rings_col, e=edge))


def geodesic_rings_area_expr(rings_col="rings"):
    """Spherical area (m²) of a flat lon/lat ring list.
    Antimeridian guard (round-13 verdict #5): a ring with any edge
    whose |Δλ| > 180° yields NULL instead of a silently folded wrong
    area (split such polygons at ±180° upstream)."""
    total = ("aggregate({c}, cast(0.0 as double), (acc, r) -> acc + {s})"
             .format(c=rings_col, s=geodesic_ring_sum_sql("r")))
    area = (F.abs(F.expr(total))
            * (EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0))
    return F.when(~F.expr(_crosses_antimeridian_sql(rings_col)), area)


def _haversine_edge_sql():
    """Per-edge haversine distance (meters) between lon/lat pairs
    ``a``/``b`` — the zip_with lambda body."""
    return ("2.0D * {R!r} * asin(least(1.0D, sqrt("
            "pow(sin(radians(b[1] - a[1]) / 2.0D), 2) "
            "+ cos(radians(a[1])) * cos(radians(b[1])) "
            "* pow(sin(radians(b[0] - a[0]) / 2.0D), 2))))"
            ).format(R=EARTH_RADIUS_M)


def geodesic_path_length_expr(path_col="path"):
    """Great-circle polyline length (m): haversine per edge, open
    chain (no closing edge)."""
    return F.expr(
        "aggregate(zip_with(slice({c}, 1, size({c}) - 1), "
        "slice({c}, 2, size({c}) - 1), (a, b) -> {h}), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
        .format(c=path_col, h=_haversine_edge_sql()))


def geodesic_perimeter_expr(verts_col="vertices"):
    """Great-circle ring perimeter (m): haversine per wrapped edge."""
    edges = _edges_sql(verts_col).format(expr=_haversine_edge_sql())
    return F.expr(
        "aggregate({e}, cast(0.0 as double), (acc, v) -> acc + v)"
        .format(e=edges))


def geodesic_rings_perimeter_expr(rings_col="rings"):
    return F.expr(
        "aggregate({c}, cast(0.0 as double), (acc, r) -> acc + {p})"
        .format(c=rings_col,
                p="aggregate({e}, cast(0.0 as double), "
                  "(acc2, v2) -> acc2 + v2)".format(
                      e=_edges_sql("r").format(
                          expr=_haversine_edge_sql()))))


class GeodesicArea(SeriesBlock):
    """Spherical polygon area in m² of LON/LAT geometry — the PostGIS
    ``ST_Area(geography)`` analogue on the authalic sphere
    (R = 6371008.8 m); the reference reaches geodesic measures through
    pyproj.Geod upstream of its Blocks.  Green's-theorem spherical
    trapezoid sum per ring (signed — holes subtract through the
    orientation contract), pure column math shared verbatim with SQL
    oracles.  Accuracy vs the true ellipsoidal (Karney) area: the
    authalic-sphere error is < 0.4% at mid latitudes (the documented
    sphere-vs-ellipsoid bound); edges are treated as small — geodesic
    and rhumb edge interpretations agree to O(edge²).  Antimeridian-
    crossing edges are UNSUPPORTED (same contract as the planar
    kernel's bbox math) and GUARDED (round-13 verdict #5): a feature
    with any edge spanning |Δλ| > 180° gets NULL area instead of a
    silently folded wrong value — split at ±180° upstream.
    Precedence: rings > vertices; others NULL."""

    def __init__(self, source):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        cols = set(df.columns)
        expr = None
        if "rings" in cols:
            expr = F.when(F.col("rings").isNotNull(),
                          geodesic_rings_area_expr())
        if "vertices" in cols:
            one = geodesic_rings_area_expr("array(vertices)")
            expr = (F.when(F.col("vertices").isNotNull(), one)
                    if expr is None else
                    expr.when(F.col("vertices").isNotNull(), one))
        if expr is None:
            raise ValueError(
                "GeodesicArea requires ring geometry columns")
        return expr


class GeodesicLength(SeriesBlock):
    """Great-circle length/perimeter in meters of LON/LAT geometry —
    the PostGIS ``ST_Length(geography)`` analogue: haversine per edge
    on the authalic sphere, summed.  Unlike the area's trapezoid sum,
    haversine is FOLD-IMMUNE at the antimeridian (it passes Δλ through
    sin/cos, so a 179° → −179° edge measures the short 2° arc either
    way) — no guard needed.  Precedence: path (open chain) >
    rings (all-ring perimeter) > vertices (single ring); points 0."""

    def __init__(self, source):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        cols = set(df.columns)
        expr = None
        if "path" in cols:
            expr = F.when(F.col("path").isNotNull(),
                          geodesic_path_length_expr())
        if "rings" in cols:
            w = geodesic_rings_perimeter_expr()
            expr = (F.when(F.col("rings").isNotNull(), w)
                    if expr is None else
                    expr.when(F.col("rings").isNotNull(), w))
        if "vertices" in cols:
            w = geodesic_perimeter_expr()
            expr = (F.when(F.col("vertices").isNotNull(), w)
                    if expr is None else
                    expr.when(F.col("vertices").isNotNull(), w))
        if expr is None:
            if {"x", "y"} <= cols:
                return F.lit(0.0)
            raise ValueError(
                "GeodesicLength requires path or ring geometry")
        return expr.otherwise(F.lit(0.0)) if {"x", "y"} <= cols \
            else expr
