"""path_boolean hunt: clip + erase must partition the path's length
(conservation) and every output chain midpoint must be on the correct
side (MC spot-check)."""
import os
import sys, random, math
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.geometry.polyclip import (
    path_boolean, _point_in_poly)

def chain_len(chains):
    return sum(math.hypot(c[i+1][0]-c[i][0], c[i+1][1]-c[i][1])
               for c in chains for i in range(len(c)-1))

rng = random.Random(99)
fails = 0
for trial in range(4000):
    npts = rng.randint(2, 6)
    path = [[rng.randint(0, 16)*0.5, rng.randint(0, 16)*0.5]
            for _ in range(npts)]
    rings = []
    for _ in range(rng.choice([1, 1, 2])):
        ring, seen = [], set()
        while len(ring) < rng.choice([3, 4]):
            p = (rng.randint(0, 16)*0.5, rng.randint(0, 16)*0.5)
            if p not in seen:
                seen.add(p); ring.append([p[0], p[1]])
        rings.append(ring)
    plen = sum(math.hypot(path[i+1][0]-path[i][0], path[i+1][1]-path[i][1])
               for i in range(len(path)-1))
    try:
        clip = path_boolean(path, [rings], True)
        erase = path_boolean(path, [rings], False)
        total = chain_len(clip) + chain_len(erase)
        if abs(total - plen) > 1e-6 * max(1.0, plen):
            fails += 1
            print("CONSERVATION FAIL", trial, path, rings, plen, total)
        else:
            # midpoint side checks (skip near-boundary midpoints)
            for chains, inside in ((clip, True), (erase, False)):
                for c in chains:
                    for i in range(len(c)-1):
                        mx = (c[i][0]+c[i+1][0])/2
                        my = (c[i][1]+c[i+1][1])/2
                        got_in = _point_in_poly(mx, my, rings)
                        # boundary-riding pieces are clipped IN: only
                        # flag erase-chains that are strictly inside /
                        # clip-chains strictly outside AND off-boundary
                        from dask_geomodeling_spark.geometry.polyclip import _on_any_ring
                        if _on_any_ring(mx, my, [rings], 1e-9 * 16):
                            continue
                        if got_in != inside:
                            fails += 1
                            print("SIDE FAIL", trial, inside, c[i], c[i+1], path, rings)
                            raise StopIteration
    except StopIteration:
        pass
    except Exception as ex:
        fails += 1
        print("EXC", trial, repr(ex)[:120], path, rings)
    if fails >= 4:
        break
print("path hunt fails:", fails)
