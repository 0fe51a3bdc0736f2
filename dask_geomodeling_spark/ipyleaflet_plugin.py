"""Notebook/WMS visualization glue (reference: ipyleaflet_plugin.py:18
``GeomodelingWMSHandler`` and :90 ``GeomodelingLayer``).

The reference serves PNG map tiles from a Tornado handler inside the
notebook server (block graph arrives as the WMS ``layers`` query
argument) and wraps the endpoint in an ipyleaflet ``WMSLayer``.

Spark-first re-expression: one tile render is ONE raster request — the
request-grid :class:`~dask_geomodeling_spark.raster.warp.Warp` puts the
cells on the exact ``width x height`` tile grid in the requested SRS,
and the colormap (linear interpolation over literal anchor arrays) is
column math inside the same plan, so only ``width*height`` styled RGBA
rows ever reach the driver, where the stdlib-zlib PNG writer emits the
image.  Tornado/ipyleaflet are import-gated: :func:`handle_get_map`
takes a plain query-params dict and returns PNG bytes, so the full
pipeline (graph-from-JSON -> warp -> style -> PNG) is testable and
servable from any HTTP front end; :class:`GeomodelingLayer` needs the
real notebook stack and raises an actionable error without it.
"""

from __future__ import annotations

import struct
import zlib
from datetime import datetime

from pyspark.sql import functions as F

__all__ = ["COLORMAPS", "render_tile", "handle_get_map",
           "GeomodelingLayer"]

# Anchor tables (8-bit RGB, evenly spaced): public colormap data.
# "viridis" anchors follow the published matplotlib/Bids colormap
# (rounded); "gray" and "jet" are the classic definitions.
COLORMAPS = {
    "viridis": [(68, 1, 84), (71, 44, 122), (59, 81, 139),
                (44, 113, 142), (33, 144, 141), (39, 173, 129),
                (92, 200, 99), (170, 220, 50), (253, 231, 37)],
    "gray": [(0, 0, 0), (255, 255, 255)],
    "jet": [(0, 0, 127), (0, 0, 255), (0, 127, 255), (0, 255, 255),
            (127, 255, 127), (255, 255, 0), (255, 127, 0),
            (255, 0, 0), (127, 0, 0)],
}


def _encode_png_rgba(width, height, rgba):
    """Stdlib PNG writer, 8-bit RGBA (color type 6), filter-0 rows —
    the alpha channel carries nodata transparency like the reference's
    ``img[normalized.mask, 3] = 0`` (ipyleaflet_plugin.py:70)."""
    def chunk(typ, data):
        body = typ + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    stride = width * 4
    raw = b"".join(b"\x00" + bytes(rgba[y * stride:(y + 1) * stride])
                   for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _style_columns(value, style, vmin, vmax):
    """RGB columns from a value column: clamp-normalize then linearly
    interpolate between the anchor colors — literal-array element_at
    lookups, pure JVM column math."""
    anchors = COLORMAPS[style]
    n = len(anchors)
    t = F.least(F.greatest(
        (value.cast("double") - float(vmin))
        / (float(vmax) - float(vmin)), F.lit(0.0)), F.lit(1.0))
    idx = t * (n - 1)
    lo = F.floor(idx).cast("int")
    hi = F.least(lo + 1, F.lit(n - 1))
    frac = idx - lo.cast("double")
    out = []
    for ch in range(3):
        arr = F.array(*[F.lit(a[ch]) for a in anchors])
        c = (F.element_at(arr, lo + 1).cast("double") * (1.0 - frac)
             + F.element_at(arr, hi + 1).cast("double") * frac)
        out.append(F.round(c).cast("int"))
    return out


def styled_tile_frame(block, bbox, width, height,
                      projection="EPSG:3857", style="viridis",
                      vmin=None, vmax=None, start=None, stop=None,
                      spark=None):
    """The tile render as a DataFrame: ``(y, x, r, g, b)`` — one styled
    row per data cell on the exact tile grid.  This is the whole WMS
    GetMap computation; :func:`render_tile` only collects it and
    packs PNG bytes.

    ``vmin``/``vmax`` default to the window's own min/max (one small
    aggregate over the already-warped tile frame).  With multiple
    bands in range, each cell shows its LATEST band (``max_by`` over
    time) — pass ``start``/``stop`` to window the request.
    """
    from dask_geomodeling_spark.raster.warp import Warp

    if style not in COLORMAPS:
        raise ValueError("unknown style {!r}; supported: {}".format(
            style, sorted(COLORMAPS)))
    req = {"bbox": tuple(float(v) for v in bbox), "width": int(width),
           "height": int(height), "projection": projection}
    if start is not None:
        req["start"] = start
    if stop is not None:
        req["stop"] = stop
    df = Warp(block).plan(spark, **req)
    # NULL cells must drop BEFORE styling: greatest/least skip NULL
    # arguments, so a NULL value would otherwise clamp to vmin and
    # paint nodata in the low anchor color instead of transparent
    df = (df.where(F.col("value").isNotNull())
          .groupBy("y", "x")
          .agg(F.expr("max_by(value, time)").alias("value")))
    if vmin is None or vmax is None:
        row = df.agg(F.min("value"), F.max("value")).first()
        vmin = float(row[0]) if vmin is None else float(vmin)
        vmax = float(row[1]) if vmax is None else float(vmax)
    if vmax == vmin:  # flat window: everything maps to the low anchor
        vmax = vmin + 1.0
    r, g, b = _style_columns(F.col("value"), style, vmin, vmax)
    return df.select("y", "x", r.alias("r"), g.alias("g"),
                     b.alias("b"))


def render_tile(block, bbox, width=256, height=256,
                projection="EPSG:3857", style="viridis", vmin=None,
                vmax=None, start=None, stop=None, spark=None):
    """Render a RasterBlock window to PNG bytes (RGBA, nodata
    transparent) — the reference WMS handler's GetMap body
    (ipyleaflet_plugin.py:26) as one Spark plan; see
    :func:`styled_tile_frame` for the plan itself."""
    rows = styled_tile_frame(
        block, bbox, width, height, projection=projection, style=style,
        vmin=vmin, vmax=vmax, start=start, stop=stop,
        spark=spark).collect()
    width, height = int(width), int(height)
    rgba = bytearray(width * height * 4)  # alpha 0 = nodata
    for row in rows:
        o = (row.y * width + row.x) * 4
        rgba[o:o + 4] = bytes((row.r, row.g, row.b, 255))
    return _encode_png_rgba(width, height, rgba)


def handle_get_map(params, spark=None, max_cell_size=None):
    """Framework-free WMS GetMap: the reference handler's query-arg
    contract (ipyleaflet_plugin.py:26-49 — ``layers`` is a serialized
    block graph; ``styles``, ``vmin``, ``vmax``, ``format``, ``srs``,
    ``width``, ``height``, ``bbox``, ``time``, ``maxcellsize``) against
    a plain dict, returning ``(status, content_type, payload)`` so any
    HTTP layer (Tornado, Flask, a test) can mount it."""
    from dask_geomodeling_spark.core.blocks import Block

    fmt = params.get("format", "image/png")
    if str(fmt).lower() != "image/png":
        return 400, "text/plain", b"Only image/png is supported"
    try:
        # 'layers' is attacker-controlled on a mounted handler: restrict
        # graph deserialization to this package (+ the compat-mapped
        # reference paths, which resolve before any import) so the dotted
        # class path cannot import/execute arbitrary modules
        block = Block.from_json(
            params["layers"],
            allowed_prefixes=("dask_geomodeling_spark.",
                              "dask_geomodeling."))
        width = int(params["width"])
        height = int(params["height"])
        bbox = [float(x) for x in str(params["bbox"]).split(",")]
        vmin = (float(params["vmin"])
                if params.get("vmin") not in (None, "") else None)
        vmax = (float(params["vmax"])
                if params.get("vmax") not in (None, "") else None)
    except (KeyError, ValueError) as exc:
        return 400, "text/plain", str(exc).encode()
    mcs = params.get("maxcellsize", max_cell_size)
    if mcs is not None:
        if ((bbox[2] - bbox[0]) / width > float(mcs)
                or (bbox[3] - bbox[1]) / height > float(mcs)):
            return 400, "text/plain", b"Too large area requested"
    start = None
    if params.get("time"):
        start = datetime.strptime(params["time"],
                                  "%Y-%m-%dT%H:%M:%S.%fZ")
    png = render_tile(
        block, bbox, width=width, height=height,
        projection=params.get("srs", "EPSG:3857"),
        style=params.get("styles", "viridis"), vmin=vmin, vmax=vmax,
        start=start, spark=spark)
    return 200, "image/png", png


try:  # pragma: no cover - notebook stack is absent in this container
    from ipyleaflet import WMSLayer as _WMSLayer

    class GeomodelingLayer(_WMSLayer):
        """ipyleaflet layer over :func:`handle_get_map` (reference
        ipyleaflet_plugin.py:90) — only importable when the notebook
        stack is installed."""

        def __init__(self, block, url, style="viridis", vmin=0.0,
                     vmax=1.0, **kwargs):
            super().__init__(
                url=url, layers=block.to_json(), styles=style,
                format="image/png", transparent=True, **kwargs)
            self.extra_url_params = {"vmin": str(vmin),
                                     "vmax": str(vmax)}
except ImportError:
    class GeomodelingLayer:  # type: ignore[no-redef]
        """Placeholder that names the missing dependency (the compat
        convention for GDAL-needing paths — compat.py:90)."""

        def __init__(self, *args, **kwargs):
            raise NotImplementedError(
                "GeomodelingLayer needs ipyleaflet, which is not "
                "installed; handle_get_map/render_tile provide the "
                "same WMS render without the notebook stack")
