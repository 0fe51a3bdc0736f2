"""Geohash encoding — the standard public base-32 spatial key
(Niemeyer's geohash; no reference analogue).  Geohashes give the
feature plane a portable spatial-bucketing key: prefix-match = spatial
proximity, so they serve as join/partition keys against external
systems that speak geohash.

Closed form, no loops: a geohash's bit string is the MSB-first
interleave of the scaled integer longitude/latitude
(``ix = floor((lon+180)/360 · 2^lonbits)``), so every output character
is 5 bits of pure integer arithmetic — the generated SQL text uses
only FLOOR / modulo / comparison / substring (no engine-specific
integer division) and is shared verbatim with the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle

__all__ = ["GeohashEncode", "geohash_sql",
           "QuadkeyEncode", "quadkey_sql"]

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _scaled(lon_expr, lat_expr, precision):
    p = int(precision)
    nbits = 5 * p
    lonbits = (nbits + 1) // 2
    latbits = nbits // 2
    # LEAST clamps the exact domain edges: lat=90 / lon=180 scale to
    # 2^bits, whose bit pattern reads all-zero — standard encoders
    # clamp to the max cell instead (round-7 advice; quadkey_sql has
    # the same guard)
    ix = ("LEAST(CAST({mx} AS BIGINT), "
          "CAST(FLOOR((({lon}) + 180.0) / 360.0 * {m}) AS BIGINT))"
          .format(lon=lon_expr, m=1 << lonbits, mx=(1 << lonbits) - 1))
    iy = ("LEAST(CAST({mx} AS BIGINT), "
          "CAST(FLOOR((({lat}) + 90.0) / 180.0 * {m}) AS BIGINT))"
          .format(lat=lat_expr, m=1 << latbits, mx=(1 << latbits) - 1))
    return ix, iy, lonbits, latbits


def geohash_sql(lon_expr, lat_expr, precision, ix_name=None,
                iy_name=None):
    """Engine-portable SQL text: the ``precision``-character geohash
    of (lon, lat).  Bit t (MSB-first, t = 0..5p−1) is a longitude bit
    for even t and a latitude bit for odd t; each character is 5
    consecutive bits looked up in the base-32 alphabet.  Bit
    extraction is ``(v % 2^(s+1)) >= 2^s`` — portable integer
    arithmetic.  ``ix_name``/``iy_name`` substitute pre-bound columns
    for the scaled integers (the let-binding idiom: otherwise the
    float scaling text repeats per bit)."""
    p = int(precision)
    if not (1 <= p <= 12):
        raise ValueError("precision must be in 1..12")
    ix, iy, lonbits, latbits = _scaled(lon_expr, lat_expr, p)
    sx = ix_name or ix
    sy = iy_name or iy

    def bit(t):
        if t % 2 == 0:
            src, total, k = sx, lonbits, t // 2
        else:
            src, total, k = sy, latbits, (t - 1) // 2
        shift = total - 1 - k
        return ("CASE WHEN ({s} % {two}) >= {one} THEN 1 ELSE 0 END"
                .format(s=src, two=1 << (shift + 1), one=1 << shift))

    chars = []
    for c in range(p):
        code = " + ".join(
            "{b} * {w}".format(b=bit(5 * c + k), w=1 << (4 - k))
            for k in range(5))
        chars.append(
            "substring('{a}', CAST({code} AS INT) + 1, 1)"
            .format(a=_B32, code=code))
    return "concat({})".format(", ".join(chars))


class GeohashEncode(BaseSingle):
    """Add a ``geohash`` column from point ``x`` (lon) / ``y`` (lat).

    Args:
      source: GeometryBlock with point x/y columns (degrees).
      precision: characters (1–12; 9 ≈ 5 m cells).
      column_name: output column.
    """

    def __init__(self, source, precision=9, column_name="geohash"):
        super().__init__(source, int(precision), str(column_name))

    @property
    def columns(self):
        return set(self.source.columns) | {self.args[2]}

    def _build(self, ctx):
        _, precision, name = self.args
        df = self.source._build(ctx)
        # bind the scaled integers ONCE as columns (the float scaling
        # would otherwise repeat per extracted bit)
        ix, iy, _, _ = _scaled("x", "y", precision)
        df = df.withColumns({"_gx": F.expr(ix), "_gy": F.expr(iy)})
        sql = geohash_sql("x", "y", precision, ix_name="_gx",
                          iy_name="_gy")
        return df.withColumn(name, F.expr(sql)).drop("_gx", "_gy")


def quadkey_sql(lon_expr, lat_expr, level, ix_name=None, iy_name=None):
    """Engine-portable SQL text: the Bing-maps quadkey (slippy-tile
    key) of (lon, lat) at zoom ``level`` — WebMercator tile indices
    ``tx = floor((lon+180)/360 · 2^z)``,
    ``ty = floor((1 − ln(tan+sec)/π)/2 · 2^z)``, one base-4 digit
    (2·ybit + xbit, MSB first) per zoom level.  Same bit-extraction
    arithmetic as :func:`geohash_sql`."""
    z = int(level)
    if not (1 <= z <= 23):
        raise ValueError("level must be in 1..23")
    m = 1 << z
    ix = ("LEAST(CAST({m} AS BIGINT) - 1, "
          "CAST(FLOOR((({lon}) + 180.0) / 360.0 * {m}) AS BIGINT))"
          .format(lon=lon_expr, m=m))
    lat_r = "radians({lat})".format(lat=lat_expr)
    iy = ("LEAST(CAST({m} AS BIGINT) - 1, "
          "CAST(FLOOR((1.0 - ln(tan({r}) + 1.0 / cos({r})) / pi()) "
          "/ 2.0 * {m}) AS BIGINT))".format(r=lat_r, m=m))
    sx = ix_name or ix
    sy = iy_name or iy

    def bit(src, k):
        shift = z - 1 - k
        return ("CASE WHEN ({s} % {two}) >= {one} THEN 1 ELSE 0 END"
                .format(s=src, two=1 << (shift + 1), one=1 << shift))

    digits = [
        "substring('0123', CAST({y} * 2 + {x} AS INT) + 1, 1)"
        .format(y=bit(sy, k), x=bit(sx, k)) for k in range(z)]
    return "concat({})".format(", ".join(digits)), ix, iy


class QuadkeyEncode(BaseSingle):
    """Add a ``quadkey`` column (Bing/slippy WebMercator tile key)
    from point ``x`` (lon) / ``y`` (lat, degrees; clamped to the
    WebMercator ±85.05° band by the tile-index LEAST guard).
    Prefix-match = tile containment, so quadkeys key tile caches and
    the WMS plugin's render targets directly."""

    def __init__(self, source, level=12, column_name="quadkey"):
        super().__init__(source, int(level), str(column_name))

    @property
    def columns(self):
        return set(self.source.columns) | {self.args[2]}

    def _build(self, ctx):
        _, level, name = self.args
        df = self.source._build(ctx)
        body, ix, iy = quadkey_sql("x", "y", level)
        df = df.withColumns({"_qx": F.expr(ix), "_qy": F.expr(iy)})
        body, _, _ = quadkey_sql("x", "y", level, ix_name="_qx",
                                 iy_name="_qy")
        return df.withColumn(name, F.expr(body)).drop("_qx", "_qy")
