import os
import sys, random, itertools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..', 'tests'))
from dask_geomodeling_spark.geometry.polyclip import (
    polygon_make_valid, rings_is_valid, rings_signed_area)
from test_properties import _even_odd_area

rng = random.Random(20260816)
bad = []
for trial in range(6000):
    nr = rng.choice([1, 1, 2, 2, 3])
    rings = []
    for _ in range(nr):
        npts = rng.choice([3, 4, 4, 5])
        ring = []
        seen = set()
        while len(ring) < npts:
            p = (rng.randint(0, 16) * 0.5, rng.randint(0, 16) * 0.5)
            if p not in seen:
                seen.add(p)
                ring.append([p[0], p[1]])
        rings.append(ring)
    want = _even_odd_area(rings)
    try:
        rep = polygon_make_valid(rings)
        got = _even_odd_area(rep)
        ok_area = abs(got - want) < 1e-6 * max(1.0, abs(want))
        ok_valid = rings_is_valid(rep)
        ok_idem = polygon_make_valid(rep) == rep
        if rings_is_valid(rings):
            ok_signed = True
        else:
            ok_signed = abs(rings_signed_area(rep) - want) < 1e-6 * max(1.0, abs(want))
        if not (ok_area and ok_valid and ok_idem and ok_signed):
            bad.append((rings, want, got, ok_area, ok_valid, ok_idem, ok_signed))
            if len(bad) >= 5:
                break
    except Exception as ex:
        bad.append((rings, "EXC", repr(ex)[:100]))
        if len(bad) >= 5:
            break
print("trials done, failures:", len(bad))
for b in bad[:5]:
    print(b)
