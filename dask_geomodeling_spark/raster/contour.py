"""Contour line extraction — distributed marching squares (the
``gdal_contour`` counterpart; no reference analogue, the reference
leaves vectorization to GDAL).

Each 2×2 block of adjacent cells is one marching-squares square, built
with the module-standard scatter + conditional aggregation (one
shuffle); the 16-entry case table emits 0–2 line segments per block
with endpoints linearly interpolated along the square's edges — pure
column math from a Python-generated case table whose arithmetic TEXT
is shared verbatim with the DuckDB oracles (saddle cases 5/10 use the
fixed no-center-disambiguation pairing, documented below).

Corner convention for block (y, x): A=(x, y) value ``c00``,
B=(x+1, y) ``c10``, C=(x+1, y+1) ``c11``, D=(x, y+1) ``c01``; a
corner is "inside" iff value >= level; bits A|B|C|D = 1|2|4|8.
Coordinates are cell-index space (the cell-table convention).
Blocks missing any of the 4 corners emit nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import BaseSingle

__all__ = ["Contour", "contour_case_sql"]

#: case index -> list of segments, each segment = (edge1, edge2)
#: with edges named ab / bc / cd / da.  Saddles (5, 10) use the fixed
#: pairing below — consistent on both engines by shared text.
_CASES = {
    1: [("ab", "da")],
    2: [("ab", "bc")],
    3: [("da", "bc")],
    4: [("bc", "cd")],
    5: [("ab", "da"), ("bc", "cd")],
    6: [("ab", "cd")],
    7: [("da", "cd")],
    8: [("cd", "da")],
    9: [("ab", "cd")],
    10: [("ab", "bc"), ("cd", "da")],
    11: [("bc", "cd")],
    12: [("bc", "da")],
    13: [("ab", "bc")],
    14: [("ab", "da")],
}


def _edge_points(level):
    lv = "CAST({!r} AS DOUBLE)".format(float(level))
    X = "CAST(x AS DOUBLE)"
    Y = "CAST(y AS DOUBLE)"
    return {
        "ab": ("({X} + ({L} - c00) / (c10 - c00))".format(X=X, L=lv),
               Y),
        "bc": ("({X} + 1.0)".format(X=X),
               "({Y} + ({L} - c10) / (c11 - c10))".format(Y=Y, L=lv)),
        "cd": ("({X} + ({L} - c01) / (c11 - c01))".format(X=X, L=lv),
               "({Y} + 1.0)".format(Y=Y)),
        "da": (X,
               "({Y} + ({L} - c00) / (c01 - c00))".format(Y=Y, L=lv)),
    }


def contour_case_sql(level, round_to=6):
    """Engine-portable SQL: ``(idx, [slot0 x1 y1 x2 y2],
    [slot1 x1 y1 x2 y2])`` texts over columns ``c00 c10 c01 c11 x y``.
    Slot expressions are NULL when the case emits no segment in that
    slot; endpoints ROUND(round_to) so the interpolation's ulp drift
    pins identically on both engines."""
    lv = "CAST({!r} AS DOUBLE)".format(float(level))
    idx = ("(CASE WHEN c00 >= {L} THEN 1 ELSE 0 END"
           " + CASE WHEN c10 >= {L} THEN 2 ELSE 0 END"
           " + CASE WHEN c11 >= {L} THEN 4 ELSE 0 END"
           " + CASE WHEN c01 >= {L} THEN 8 ELSE 0 END)").format(L=lv)
    pts = _edge_points(level)
    slots = []
    for slot in (0, 1):
        exprs = []
        for coord in range(4):  # x1, y1, x2, y2
            arms = []
            for case, segs in sorted(_CASES.items()):
                if slot >= len(segs):
                    continue
                e1, e2 = segs[slot]
                val = (pts[e1] + pts[e2])[coord]
                arms.append("WHEN {c} THEN ROUND({v}, {r})".format(
                    c=case, v=val, r=int(round_to)))
            exprs.append("CASE {idx} {arms} END".format(
                idx=idx, arms=" ".join(arms)))
        slots.append(exprs)
    return idx, slots[0], slots[1]


class Contour(BaseSingle):
    """Extract contour segments at ``levels`` from a raster.

    Output: ``time, level, y, x, seg, x1, y1, x2, y2`` — one row per
    emitted segment, ``(y, x)`` the block's lower-left cell, ``seg``
    the slot (0, or 1 for the second saddle segment).  Multiple
    levels share the ONE window build; each level adds only column
    math + a union of projections.
    """

    def __init__(self, store, levels, round_to=6):
        if isinstance(levels, (int, float)):
            levels = [levels]
        levels = tuple(float(v) for v in levels)
        if not levels:
            raise ValueError("need at least one contour level")
        super().__init__(store, levels, int(round_to))

    @property
    def columns(self):
        return {"time", "level", "y", "x", "seg", "x1", "y1",
                "x2", "y2"}

    def _build(self, ctx):
        _, levels, round_to = self.args
        cells = (self.store._build(ctx)
                 .filter(F.col("value").isNotNull()))
        # scatter each cell to the (<=4) blocks whose 2x2 window uses
        # it; corner tag k = dy*2 + dx of the cell WITHIN that block
        offs = ctx.spark.createDataFrame(
            [(dy, dx) for dy in (0, 1) for dx in (0, 1)],
            "dy int, dx int")
        scattered = (cells.crossJoin(F.broadcast(offs))
                     .select("time",
                             (F.col("y") - F.col("dy")).alias("y"),
                             (F.col("x") - F.col("dx")).alias("x"),
                             F.col("dy").alias("ky"),
                             F.col("dx").alias("kx"),
                             "value"))

        def at(ky, kx):
            return F.max(F.when((F.col("ky") == ky)
                                & (F.col("kx") == kx), F.col("value")))

        g = (scattered.groupBy("time", "y", "x")
             .agg(at(0, 0).alias("c00"), at(0, 1).alias("c10"),
                  at(1, 0).alias("c01"), at(1, 1).alias("c11"))
             .where(F.col("c00").isNotNull()
                    & F.col("c10").isNotNull()
                    & F.col("c01").isNotNull()
                    & F.col("c11").isNotNull()))
        outs = []
        for level in levels:
            idx, s0, s1 = contour_case_sql(level, round_to)
            for seg, exprs in ((0, s0), (1, s1)):
                outs.append(g.select(
                    "time", F.lit(level).alias("level"), "y", "x",
                    F.lit(seg).alias("seg"),
                    F.expr(exprs[0]).alias("x1"),
                    F.expr(exprs[1]).alias("y1"),
                    F.expr(exprs[2]).alias("x2"),
                    F.expr(exprs[3]).alias("y2"))
                    .where(F.col("x1").isNotNull()))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out
