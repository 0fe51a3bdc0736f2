"""Buffer kernel hunt: the exact capsule-union polygon/path buffer vs
a Monte-Carlo Euclidean dilation (n-gon discretization error bounded
analytically)."""
import os
import sys, random, math
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.geometry.constructive import (
    _buffer_rings_kernel, _buffer_path_kernel)
from dask_geomodeling_spark.geometry.polyclip import rings_signed_area

def seg_dist(px, py, a, b):
    ax, ay = a; bx, by = b
    dx, dy = bx-ax, by-ay
    L2 = dx*dx + dy*dy
    t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px-ax)*dx + (py-ay)*dy)/L2))
    return math.hypot(px - (ax + t*dx), py - (ay + t*dy))

def poly_dist(px, py, rings):
    best = float("inf")
    for ring in rings:
        n = len(ring)
        for i in range(n):
            best = min(best, seg_dist(px, py, ring[i], ring[(i+1) % n]))
    return best

def point_in(px, py, rings):
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]; x2, y2 = ring[(i+1) % n]
            if (y1 > py) != (y2 > py):
                xi = x1 + (py-y1)/(y2-y1)*(x2-x1)
                if px < xi:
                    inside = not inside
    return inside

rng = random.Random(11)
fails = []
for trial in range(6):
    npts = rng.randint(3, 7)
    ring, seen = [], set()
    while len(ring) < npts:
        p = (rng.randint(0, 16)*0.5, rng.randint(0, 16)*0.5)
        if p not in seen:
            seen.add(p); ring.append([p[0], p[1]])
    # keep only SIMPLE rings (the kernel's valid-input contract)
    from dask_geomodeling_spark.geometry.polyclip import rings_is_valid
    if not rings_is_valid([ring]):
        continue
    dist = rng.choice([0.5, 1.0, 1.7])
    n = 64  # fine arc fan: n-gon area deficit ~ r^2*pi*(2pi/n)^2/12
    buf = _buffer_rings_kernel([ring], dist=dist, n=n)
    got = rings_signed_area(buf)
    # MC over the padded bbox
    xs = [p[0] for p in ring]; ys = [p[1] for p in ring]
    x0, x1 = min(xs)-dist-0.1, max(xs)+dist+0.1
    y0, y1 = min(ys)-dist-0.1, max(ys)+dist+0.1
    N = 120000
    hits = 0
    for _ in range(N):
        px = rng.uniform(x0, x1); py = rng.uniform(y0, y1)
        if point_in(px, py, [ring]) or poly_dist(px, py, [ring]) <= dist:
            hits += 1
    mc = hits / N * (x1-x0) * (y1-y0)
    # MC std ~ sqrt(A*(B-A))/sqrt(N)*B ... use 1.5% + n-gon deficit slack
    tol = 0.02 * mc + 0.05
    if abs(got - mc) > tol:
        fails.append((trial, ring, dist, got, mc))
print("buffer hunt fails:", fails if fails else 0)
