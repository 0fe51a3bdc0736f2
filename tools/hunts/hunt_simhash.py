import os, sys, random, itertools
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark
spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource
from dask_geomodeling_spark.pipeline.dedup import SimHash
M = 2147483647

def poly(s, base):
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % M
    return h

def model_sig(text):
    toks = sorted(set(text.lower().strip().split())) or [""]
    # engine: split of "" gives [""], array_distinct keeps it
    toks = set(text.lower().strip().split()) if text.strip() else {""}
    votes = [0]*64
    for t in toks:
        h = poly(t, 257) * M + poly(t, 131)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= (1 << b)
    return sig

def bands_of(sig):
    return {(b, (sig >> (b*16)) & 0xFFFF) for b in range(4)}

VOCAB = ["aa", "ab", "ba", "bb", "cat", "dog", "fox", "gnu", "hen", "eel"]
rng = random.Random(77)
fails = 0
for trial in range(40):
    ndocs = rng.randint(2, 10)
    mh = rng.choice([0, 1, 3, 6])
    docs = [(i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 6))))
            for i in range(ndocs)]
    sigs = {i: model_sig(t) for i, t in docs}
    want = {}
    for (ia, _), (ib, _) in itertools.combinations(docs, 2):
        h = bin(sigs[ia] ^ sigs[ib]).count("1")
        # candidates require a shared band
        if h <= mh and bands_of(sigs[ia]) & bands_of(sigs[ib]):
            want[(ia, ib)] = h
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    blk = SimHash(DataFrameSource(df, index_column="doc_id"),
                  max_hamming=mh, hash_fn="poly")
    got = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])): r["hamming"]
           for r in blk.plan(spark).collect()}
    # guarantee: mh <= 3 → shared band always; want == exact pair set
    if got != want:
        fails += 1
        print("SIMHASH FAIL", trial, "mh=", mh, docs)
        print("  want:", sorted(want.items()))
        print("  got :", sorted(got.items()))
        if fails >= 3: break
print("simhash hunt done, fails:", fails)
