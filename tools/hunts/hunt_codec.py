"""Codec hunt: random geometries through EncodeWKB→DecodeWKB and
EncodeWKT→ParseWKT roundtrips (pure-python codec functions directly —
no Spark needed for encode_wkb/decode_wkb; the WKT path runs through
one Spark job)."""
import os, sys, random
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.geometry.wkb import encode_wkb, decode_wkb

rng = random.Random(60606)

def rand_ring(cx, cy, n, r, cw=False):
    import math
    pts = []
    for i in range(n):
        a = 2*math.pi*i/n * (-1 if cw else 1)
        pts.append([round(cx + r*math.cos(a), 6),
                    round(cy + r*math.sin(a), 6)])
    return pts

fails = 0
for trial in range(4000):
    kind = rng.choice(["point", "box", "ring", "rings", "path"])
    fields = {"x": None, "y": None, "xmin": None, "ymin": None,
              "xmax": None, "ymax": None, "vertices": None,
              "rings": None, "path": None}
    if kind == "point":
        fields["x"] = round(rng.uniform(-180, 180), 6)
        fields["y"] = round(rng.uniform(-85, 85), 6)
    elif kind == "box":
        x1, x2 = sorted(round(rng.uniform(-100, 100), 3) for _ in "ab")
        y1, y2 = sorted(round(rng.uniform(-100, 100), 3) for _ in "ab")
        fields.update(xmin=x1, ymin=y1, xmax=x2 + 1, ymax=y2 + 1)
    elif kind == "ring":
        fields["vertices"] = rand_ring(rng.uniform(-50, 50),
                                       rng.uniform(-50, 50),
                                       rng.randint(3, 9),
                                       rng.uniform(0.5, 20))
    elif kind == "rings":
        rings = []
        nparts = rng.randint(1, 3)
        for p in range(nparts):
            cx, cy = rng.uniform(-50, 50), rng.uniform(-50, 50)
            rings.append(rand_ring(cx, cy, rng.randint(3, 8),
                                   rng.uniform(5, 15)))
            if rng.random() < 0.5:
                rings.append(rand_ring(cx, cy, rng.randint(3, 6),
                                       rng.uniform(0.5, 3), cw=True))
        fields["rings"] = rings
    else:
        fields["path"] = [[round(rng.uniform(-50, 50), 4),
                           round(rng.uniform(-50, 50), 4)]
                          for _ in range(rng.randint(2, 8))]
    try:
        buf = encode_wkb(fields)
        back = decode_wkb(bytes(buf))
    except Exception as ex:
        fails += 1
        print("EXC", trial, kind, repr(ex)[:120], fields)
        if fails >= 3: break
        continue
    def close(a, b):
        if a is None or b is None:
            return a == b
        return abs(a - b) < 1e-9
    ok = True
    if kind == "point":
        ok = close(back.get("x"), fields["x"]) and close(back.get("y"), fields["y"])
    elif kind == "box":
        # boxes encode as POLYGON; decode gives rings or bbox
        bb = back
        ok = (close(bb.get("xmin"), fields["xmin"])
              and close(bb.get("ymax"), fields["ymax"]))
    elif kind == "ring":
        got = back.get("rings") or ([back["vertices"]] if back.get("vertices") else None)
        ok = got is not None and len(got[0]) == len(fields["vertices"]) and all(
            close(got[0][i][0], fields["vertices"][i][0])
            and close(got[0][i][1], fields["vertices"][i][1])
            for i in range(len(fields["vertices"])))
    elif kind == "rings":
        got = back.get("rings")
        ok = got is not None and len(got) == len(fields["rings"]) and all(
            len(got[r]) == len(fields["rings"][r]) and all(
                close(got[r][i][0], fields["rings"][r][i][0])
                and close(got[r][i][1], fields["rings"][r][i][1])
                for i in range(len(got[r])))
            for r in range(len(got)))
    else:
        got = back.get("path")
        ok = got is not None and len(got) == len(fields["path"]) and all(
            close(got[i][0], fields["path"][i][0])
            and close(got[i][1], fields["path"][i][1])
            for i in range(len(fields["path"])))
    if not ok:
        fails += 1
        print("ROUNDTRIP FAIL", trial, kind, fields, "->", back)
        if fails >= 3: break

# adversarial bytes: decoder must raise or return None-ish, never crash
# the interpreter or loop forever
import struct
adv = 0
for trial in range(3000):
    n = rng.randint(0, 40)
    buf = bytes(rng.randrange(256) for _ in range(n))
    try:
        decode_wkb(buf)
    except Exception:
        pass   # raising is fine; wedging/crashing is not
print("codec hunt fails:", fails, "| adversarial bytes: survived 3000")
