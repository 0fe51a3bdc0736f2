"""Boolean-op identity hunt on random SIMPLE polygons (the hunts so
far stressed make_valid; this stresses the binary ops directly):
area(A) = area(A-B) + area(A∩B);
area(A∪B) = area(A) + area(B) - area(A∩B);
area(AΔB) = area(A∪B) - area(A∩B);
n-way union_all(A, B) == union(A, B)."""
import os
import sys, random
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.geometry.polyclip import (
    polygon_difference, polygon_intersection,
    polygon_symmetric_difference, polygon_union, polygon_union_all,
    rings_is_valid, rings_signed_area)

rng = random.Random(777)

def rand_simple(max_tries=50):
    for _ in range(max_tries):
        npts = rng.randint(3, 8)
        ring, seen = [], set()
        while len(ring) < npts:
            p = (rng.randint(0, 20)*0.5, rng.randint(0, 20)*0.5)
            if p not in seen:
                seen.add(p); ring.append([p[0], p[1]])
        if rings_is_valid([ring]):
            if rings_signed_area([ring]) < 0:
                ring = ring[::-1]
            return [ring]
    raise RuntimeError("no simple ring found")

fails = 0
for trial in range(3000):
    A, B = rand_simple(), rand_simple()
    try:
        aA = rings_signed_area(A)
        aB = rings_signed_area(B)
        d = rings_signed_area(polygon_difference(A, B))
        i = rings_signed_area(polygon_intersection(A, B))
        u = rings_signed_area(polygon_union(A, B))
        s = rings_signed_area(polygon_symmetric_difference(A, B))
        ua = rings_signed_area(polygon_union_all([A, B]))
        tol = 1e-7 * max(1.0, aA + aB)
        checks = (abs(d + i - aA) < tol,
                  abs(u - (aA + aB - i)) < tol,
                  abs(s - (u - i)) < tol,
                  abs(ua - u) < tol)
        if not all(checks):
            fails += 1
            print("IDENTITY FAIL", trial, A, B, checks,
                  dict(aA=aA, aB=aB, d=d, i=i, u=u, s=s, ua=ua))
            if fails >= 3: break
    except Exception as ex:
        fails += 1
        print("EXC", trial, repr(ex)[:120], A, B)
        if fails >= 3: break
print("boolean hunt fails:", fails)
