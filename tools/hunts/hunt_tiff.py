"""TIFF codec/layout hunt (round 14, +predictor 3 round 15):
randomized roundtrips through write_geotiff → _parse_geotiff across
the full grid of
{none, deflate, lzw, packbits} × {strip, square tiles, ragged tiles}
× {1, 2, 3, 5 samples} × {chunky, planar} × {little, big endian}
× {no predictor, floating-point predictor 3} at random sizes — byte-exact float recovery per band; plus adversarial
LZW payloads (long runs, tiny alphabets, width-boundary-crossing
sizes) decoded against the encoder and the other-camp fallback."""
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", ".."))
import struct  # noqa: E402
import tempfile  # noqa: E402

from dask_geomodeling_spark.raster.sources import (  # noqa: E402
    _lzw_decode, _lzw_encode, _packbits_decode, _packbits_encode,
    _parse_geotiff, write_geotiff)

rng = random.Random(20140816)
fails = 0
d = tempfile.mkdtemp(prefix="hunt_tiff_")

for trial in range(60):
    w, h = rng.randint(1, 40), rng.randint(1, 30)
    spp = rng.choice([1, 1, 2, 3, 5])
    comp = rng.choice([None, "deflate", "lzw", "packbits"])
    planar = rng.choice([1, 2]) if spp > 1 else 1
    tile = None
    if planar == 1 and rng.random() < 0.5:
        tile = (rng.randint(1, w + 2), rng.randint(1, h + 2))
    bo = rng.choice(["<", ">"])
    predictor = rng.choice([None, None, 3])
    # float32-exact values, mixed magnitudes + runs (packbits food)
    vals = []
    for i in range(w * h * spp):
        if rng.random() < 0.3:
            vals.append(float(rng.randint(-5, 5)))
        else:
            vals.append(struct.unpack(
                "<f", struct.pack("<f", rng.uniform(-1e4, 1e4)))[0])
    p = os.path.join(d, "t%d.tif" % trial)
    write_geotiff(p, w, h, vals, bo=bo, samples=spp, planar=planar,
                  compression=comp, tile=tile, predictor=predictor)
    blob = open(p, "rb").read()
    for j in range(spp):
        _, _, got, _, _ = _parse_geotiff(blob, sample=j)
        want = [vals[(y * w + x) * spp + j]
                for y in range(h) for x in range(w)]
        if got != want:
            fails += 1
            print("ROUNDTRIP FAIL", trial, dict(
                w=w, h=h, spp=spp, comp=comp, planar=planar,
                tile=tile, bo=bo, band=j, predictor=predictor))
            break

# adversarial LZW: sizes that land table growth exactly on the
# 9->10->11->12 width switches and the 4094 reset
for n in (253, 254, 255, 509, 510, 511, 512, 765, 766,
          1021, 1022, 1023, 1024, 2045, 2046, 2047, 2048,
          4093, 4094, 4095, 4096, 4097, 8200):
    # all-distinct pairs grow the table one entry per 2 bytes
    blob = bytes(rng.randrange(256) for _ in range(2 * n))
    if _lzw_decode(_lzw_encode(blob)) != blob:
        fails += 1
        print("LZW BOUNDARY FAIL", n)
for blob in (b"", b"\x00", b"a" * 10000,
             bytes([1, 2] * 9000),
             bytes(rng.randrange(2) for _ in range(30000))):
    if _lzw_decode(_lzw_encode(blob)) != blob:
        fails += 1
        print("LZW PAYLOAD FAIL", len(blob))
    if _packbits_decode(_packbits_encode(blob)) != blob:
        fails += 1
        print("PACKBITS PAYLOAD FAIL", len(blob))

print()
if fails:
    print("FALSIFIERS:", fails)
    sys.exit(1)
print("CLEAN: 60 randomized TIFF roundtrips (codecs x layouts x "
      "samples x endianness) + LZW width-boundary payloads all "
      "byte-exact")
