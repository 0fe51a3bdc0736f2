"""WMS/notebook visualization glue (reference ipyleaflet_plugin.py):
tile render to real PNG, GetMap param contract, import gating."""

import struct
import zlib

import pytest

from dask_geomodeling_spark.ipyleaflet_plugin import (GeomodelingLayer,
                                                      handle_get_map,
                                                      render_tile)
from dask_geomodeling_spark.pipeline.multimodal import _decode_png
from dask_geomodeling_spark.raster.sources import MemorySource


def rgba_pixels(png):
    """Raw RGBA rows of the plugin's filter-0 PNG output."""
    pos, idat = 8, b""
    w = h = ctype = None
    while pos + 8 <= len(png):
        (ln,) = struct.unpack_from(">I", png, pos)
        typ = png[pos + 4:pos + 8]
        data = png[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, _, ctype, _, _, _ = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
    assert ctype == 6  # RGBA
    raw = zlib.decompress(idat)
    stride = w * 4 + 1
    body = b"".join(raw[y * stride + 1:(y + 1) * stride]
                    for y in range(h))
    return w, h, [body[i:i + 4] for i in range(0, len(body), 4)]


@pytest.fixture(scope="module")
def ramp():
    # 4x4 gradient, one nodata hole at (row 1, col 2)
    data = [[0, 1, 2, 3],
            [4, 5, -1, 7],
            [8, 9, 10, 11],
            [12, 13, 14, 15]]
    return MemorySource(data, no_data_value=-1)


def test_render_tile_png_roundtrip(spark, ramp):
    png = render_tile(ramp, bbox=(0, 0, 4, 4), width=4, height=4,
                      projection="EPSG:4326", style="gray", vmin=0,
                      vmax=15, spark=spark)
    w, h, px = rgba_pixels(png)
    assert (w, h) == (4, 4)
    # nodata hole is fully transparent, data cells opaque
    holes = [i for i, p in enumerate(px) if p[3] == 0]
    assert len(holes) == 1
    assert all(p[3] == 255 for i, p in enumerate(px) if i != holes[0])
    # gray ramp: min value -> black, max value -> white, gray channels
    opaque = [p for p in px if p[3] == 255]
    assert all(p[0] == p[1] == p[2] for p in opaque)
    assert min(p[0] for p in opaque) == 0
    assert max(p[0] for p in opaque) == 255
    # our own codec also reads it (alpha-dropping contract)
    dw, dh, _rgb = _decode_png(png)
    assert (dw, dh) == (4, 4)


def test_render_tile_auto_range_and_styles(spark, ramp):
    png = render_tile(ramp, bbox=(0, 0, 4, 4), width=4, height=4,
                      projection="EPSG:4326", spark=spark)  # viridis
    w, h, px = rgba_pixels(png)
    assert (w, h) == (4, 4)
    assert sum(1 for p in px if p[3] == 255) == 15
    with pytest.raises(ValueError, match="unknown style"):
        render_tile(ramp, bbox=(0, 0, 4, 4), width=4, height=4,
                    style="plasma", spark=spark)


def test_handle_get_map_contract(spark, ramp):
    params = {"layers": ramp.to_json(), "styles": "jet", "vmin": "0",
              "vmax": "15", "format": "image/png", "srs": "EPSG:4326",
              "width": "4", "height": "4", "bbox": "0,0,4,4"}
    status, ctype, payload = handle_get_map(params, spark=spark)
    assert (status, ctype) == (200, "image/png")
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    # overload protection mirrors the reference maxcellsize guard
    status, _, msg = handle_get_map(dict(params, maxcellsize="0.5"),
                                    spark=spark)
    assert status == 400 and b"Too large" in msg
    status, _, msg = handle_get_map(dict(params, format="image/jpeg"),
                                    spark=spark)
    assert status == 400 and b"image/png" in msg


def test_layer_is_import_gated():
    with pytest.raises(NotImplementedError, match="ipyleaflet"):
        GeomodelingLayer(None, url="http://localhost/wms")


def test_handle_get_map_rejects_foreign_import_paths(spark):
    """The untrusted 'layers' graph may not name classes outside this
    package / the compat-mapped reference paths: import happens before
    the issubclass check, so an open prefix would execute arbitrary
    module top-levels (round-6 ADVICE)."""
    import json
    from dask_geomodeling_spark.ipyleaflet_plugin import handle_get_map
    evil = json.dumps({
        "version": 2,
        "graph": {"x": ["os.path.join", "a", "b"]},
        "name": "x"})
    params = {"layers": evil, "width": "4", "height": "4",
              "bbox": "0,0,1,1"}
    status, _, msg = handle_get_map(params, spark=spark)
    assert status == 400
    assert b"allowed module prefixes" in msg or b"outside" in msg
