import os
import sys, random
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..', 'tests'))
from dask_geomodeling_spark.geometry.polyclip import (
    polygon_make_valid, rings_is_valid, rings_signed_area)
from test_properties import _even_odd_area
bad = 0
for seed in (7, 99, 12345):
    rng = random.Random(seed)
    for trial in range(3000):
        nr = rng.choice([1, 2, 3])
        rings = []
        for _ in range(nr):
            npts = rng.randint(3, 6)
            ring, seen = [], set()
            while len(ring) < npts:
                p = (rng.randint(0, 40) * 0.25, rng.randint(0, 40) * 0.25)
                if p not in seen:
                    seen.add(p); ring.append([p[0], p[1]])
            rings.append(ring)
        want = _even_odd_area(rings)
        try:
            rep = polygon_make_valid(rings)
            if not (abs(_even_odd_area(rep) - want) < 1e-6 * max(1.0, abs(want))
                    and rings_is_valid(rep)
                    and polygon_make_valid(rep) == rep
                    and (rings_is_valid(rings)
                         or abs(rings_signed_area(rep) - want) < 1e-6 * max(1.0, abs(want)))):
                bad += 1
                print("FAIL", seed, rings, want)
                if bad >= 3: break
        except Exception as ex:
            bad += 1
            print("EXC", seed, rings, repr(ex)[:120])
            if bad >= 3: break
    if bad >= 3: break
print("hunt2 failures:", bad)
