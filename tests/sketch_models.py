"""Pure-python replay models of the engine-exact sketches — shared by
the bit-parity pytests (tests/test_pipeline.py) and the hypothesis
properties (tests/test_properties.py).  A plain sibling module (no
package) so pytest's prepend import mode resolves it from any cwd."""

MERSENNE = 2147483647


def _poly(s, base):
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % MERSENNE
    return h


def kll_model(pairs, k):
    """Replay of KLLQuantile: ``pairs`` = [(value, id)].  Returns the
    full sketch state (n_rows, level, kept [(value, g)], tz-counts)."""
    tz_counts = {}
    items = []
    for v, i in pairs:
        g = (_poly(str(v), 257) * 1597334677
             + _poly(str(i), 131) * 2246822519 + 11) % MERSENNE
        for q in (40503, 914231):
            g = (g * g + q) % MERSENNE
        tz = 31 if g == 0 else (g & -g).bit_length() - 1
        tz_counts[tz] = tz_counts.get(tz, 0) + 1
        items.append((float(v), g, tz))
    l0 = next((l for l in range(32)
               if sum(c for t, c in tz_counts.items() if t >= l) <= k),
              31)
    kept = sorted((v, g) for v, g, tz in items if tz >= l0)
    return len(pairs), l0, kept, tz_counts


def kll_model_merge(a, b, k):
    """Merge two model sketches: sum tz counts, recompute threshold,
    re-filter the union of kept items — the deterministic compaction."""
    na, l0a, kept_a, tza = a
    nb, l0b, kept_b, tzb = b
    tz = dict(tza)
    for t, c in tzb.items():
        tz[t] = tz.get(t, 0) + c
    l0 = next((l for l in range(32)
               if sum(c for t, c in tz.items() if t >= l) <= k), 31)
    assert l0 >= max(l0a, l0b)
    kept = sorted((v, g) for v, g in kept_a + kept_b
                  if (31 if g == 0 else (g & -g).bit_length() - 1)
                  >= l0)
    return na + nb, l0, kept, tz


def bloom_positions(value, bits, k):
    """The k bit positions of one value (the BloomFilter mix)."""
    from dask_geomodeling_spark.pipeline.text import BloomFilter
    s = str(value)
    h1, h2 = _poly(s, 257), _poly(s, 131)
    out = []
    for a, b, c in BloomFilter._HASHES[:k]:
        g = (h1 * a + h2 * b + c) % MERSENNE
        for q in (40503, 914231):
            g = (g * g + q) % MERSENNE
        out.append(g % bits)
    return out


def bloom_model(values, bits, k):
    """Replay of the BloomFilter bitset: {word_idx: word}."""
    words = {}
    for v in values:
        for pos in bloom_positions(v, bits, k):
            words[pos // 64] = words.get(pos // 64, 0) \
                | (1 << (pos % 64))
    return words


def cms_model(values, width, depth):
    """Replay of the CountMinSketch counters: {(row_idx, pos): count}
    — positions shared with the Bloom pipeline by construction."""
    counters = {}
    for v in values:
        for j, pos in enumerate(bloom_positions(v, width, depth)):
            counters[(j, pos)] = counters.get((j, pos), 0) + 1
    return counters


def cms_estimate(counters, value, width, depth):
    """Point query: min over the depth counters (0 when untouched)."""
    return min(counters.get((j, pos), 0) for j, pos in
               enumerate(bloom_positions(value, width, depth)))
