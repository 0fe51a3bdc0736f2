"""Core Block machinery tests (modeled on reference tests/test_core.py)."""

import json

from dask_geomodeling_spark import Block, construct
from dask_geomodeling_spark.geometry.field_operations import Add, Classify
from dask_geomodeling_spark.geometry.sources import LiteralGeometrySource


def make_view():
    src = LiteralGeometrySource([{"id": 1, "v": 2.0}, {"id": 2, "v": 7.0}])
    return src.set("w", Add(src["v"], 1.0))


def test_token_deterministic():
    a = make_view()
    b = make_view()
    assert a.token == b.token


def test_token_changes_with_args():
    src = LiteralGeometrySource([{"id": 1, "v": 2.0}])
    assert Add(src["v"], 1.0).token != Add(src["v"], 2.0).token


def test_graph_roundtrip(spark):
    view = make_view()
    js = view.to_json()
    back = Block.from_json(js)
    assert back.token == view.token
    rows = sorted((r.id, r.w) for r in back.plan(spark).collect())
    assert rows == [(1, 3.0), (2, 8.0)]


def test_graph_serialize_import_paths():
    view = make_view()
    graph = json.loads(view.to_json())["graph"]
    heads = {v[0] for v in graph.values()}
    assert any("geometry" in h for h in heads)


def test_construct_validates():
    view = make_view()
    data = view.serialize()
    restored = construct(data["graph"], data["name"])
    assert restored.token == view.token


def test_classify_validation():
    src = LiteralGeometrySource([{"id": 1, "v": 2.0}])
    try:
        Classify(src["v"], [3.0, 1.0], ["a", "b", "c"])
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_new_blocks_serialize_roundtrip(spark):
    """Every parquet-rooted block lineage must survive
    to_json/from_json with an identical token and an executable plan —
    including the round-2 additions (IVF, clusters, splits, packing,
    streaming joins)."""
    from dask_geomodeling_spark.geometry.sources import ParquetGeometrySource
    from dask_geomodeling_spark.pipeline.dedup import (DedupClusters,
                                                       NgramJaccard)
    from dask_geomodeling_spark.pipeline.sample import (HashSplit,
                                                        PackSequences)
    from dask_geomodeling_spark.pipeline.similarity import (
        IVFPQ, KMeansIVF, ProductQuantizerANN)
    from dask_geomodeling_spark.streaming.events import (EventSource,
                                                         IntervalJoin)
    from dask_geomodeling_spark.streaming.stateful import RunningAggregate

    sf = "/root/testdata/sf0.001"
    docs = ParquetGeometrySource(sf + "/documents.parquet",
                                 id_field="doc_id")
    emb = ParquetGeometrySource(sf + "/embeddings.parquet",
                                id_field="vec_id")
    ev = EventSource(sf + "/events.parquet")
    from dask_geomodeling_spark.pipeline.filter import (Decontaminate,
                                                        PIIRedact,
                                                        RepetitionFilter)
    from dask_geomodeling_spark.pipeline.sample import StratifiedSample
    from dask_geomodeling_spark.pipeline.text import TFIDF, ChunkText
    blocks = [
        HashSplit(docs),
        PackSequences(docs, budget=128, shards=4),
        DedupClusters(docs, NgramJaccard(docs, n=3, threshold=0.5)),
        KMeansIVF(emb, emb, k=3, clusters=2, iters=1, precision=6),
        ProductQuantizerANN(emb, emb, k=3, m=4, codes=2, iters=1,
                            dim=64, precision=6),
        IVFPQ(emb, emb, k=3, clusters=2, iters=1, m=2, codes=2,
              dim=64, precision=6),
        IntervalJoin(ev, ev, within="30 minutes"),
        RunningAggregate(ev),
        RepetitionFilter(docs),
        Decontaminate(docs, docs, n=6),
        PIIRedact(docs),
        TFIDF(docs, k=3),
        ChunkText(docs, chunk=16, overlap=4),
        StratifiedSample(docs, strata="lang", n=5),
    ]
    # round-4 additions
    from dask_geomodeling_spark.pipeline.decompose import PCAProject
    from dask_geomodeling_spark.pipeline.dedup import RepeatedSpans
    from dask_geomodeling_spark.pipeline.filter import LinearScore
    from dask_geomodeling_spark.pipeline.sample import SourceMix
    from dask_geomodeling_spark.pipeline.similarity import RandomProjection
    from dask_geomodeling_spark.pipeline.text import QualityScore
    blocks += [
        RepeatedSpans(docs, span=6, min_docs=2),
        LinearScore(QualityScore(docs),
                    ["punct_ratio", "stopword_ratio"], [1.0, -1.0],
                    bias=0.5, threshold=0.4),
        SourceMix(docs, {"en": 0.5, "de": 0.2, "zh": 0.3},
                  category_column="lang"),
        RandomProjection(emb, k=4),
        PCAProject(emb, k=2, iters=2),
    ]
    for blk in blocks:
        back = Block.from_json(blk.to_json())
        assert back.token == blk.token, type(blk).__name__
        assert back.plan(spark).count() >= 0, type(blk).__name__


def test_file_geometry_source_validates():
    from dask_geomodeling_spark.geometry.sources import FileGeometrySource
    import pytest
    with pytest.raises(ValueError):
        FileGeometrySource("/tmp/x", format="xml", schema="a int")
    with pytest.raises(ValueError):
        FileGeometrySource("/tmp/x", format="csv")  # schema required
    blk = FileGeometrySource("/tmp/x", format="csv", id_field="a",
                             schema="a bigint, b string")
    from dask_geomodeling_spark import Block
    assert Block.from_json(blk.to_json()).token == blk.token


def test_geojson_featurecollection_polygon_reader(spark, tmp_path):
    """FeatureCollection reader: Polygon features yield ring bboxes,
    Point features x/y + degenerate bbox, properties typed by DDL."""
    import json
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"fid": 1, "name": "pt"},
         "geometry": {"type": "Point", "coordinates": [4.5, 52.1]}},
        {"type": "Feature", "properties": {"fid": 2, "name": "poly"},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0.0, 0.0], [2.0, 0.0], [2.0, 3.0],
                        [0.0, 3.0], [0.0, 0.0]]]}},
    ]}
    p = tmp_path / "a.geojson"
    p.write_text(json.dumps(fc))
    from dask_geomodeling_spark.geometry.sources import FileGeometrySource
    src = FileGeometrySource(str(tmp_path), format="geojson",
                             id_field="fid",
                             schema="fid bigint, name string")
    rows = {r.fid: r for r in src.plan(spark).collect()}
    assert rows[1].x == 4.5 and rows[1].y == 52.1
    assert (rows[1].xmin, rows[1].ymax) == (4.5, 52.1)
    assert rows[2].x is None
    assert (rows[2].xmin, rows[2].ymin, rows[2].xmax, rows[2].ymax) \
        == (0.0, 0.0, 2.0, 3.0)
    # bbox request prunes the point outside the box
    sub = src.plan(spark, geometry=(1.0, 1.0, 3.0, 4.0)).collect()
    assert {r.fid for r in sub} == {2}


def test_untrusted_construct_rejects_plain_callables():
    """allowed_prefixes marks the graph UNTRUSTED: resolved heads must
    be Block subclasses — an in-prefix module still exposes plain
    functions (config.set_spark, ...) that must not execute with
    attacker-controlled args (round-7 advice)."""
    graph = {"poison": [
        "dask_geomodeling_spark.config.set_spark", None]}
    try:
        construct(graph, "poison",
                  allowed_prefixes=["dask_geomodeling_spark."])
        raise AssertionError("should have raised")
    except TypeError as e:
        assert "Block subclasses" in str(e)
    # the TRUSTED path (no allowed_prefixes) keeps accepting the
    # compat factory callables
    g2 = {"src": ["dask_geomodeling_spark.geometry.LiteralGeometrySource",
                  [{"id": 1, "v": 2.0}]]}
    assert construct(g2, "src") is not None


def test_remote_json_url_routes_to_geojson():
    """Non-local .json URLs (open() fails) route to the GeoJSON reader
    instead of silently falling through to JSON-lines (round-7
    advice)."""
    from dask_geomodeling_spark.compat import GeometryFileSource
    src = GeometryFileSource("s3://bucket/data.json")
    assert src.args[1] == "geojson"


def test_gate_anchor_policy():
    """Round 10 (verdict #2): GATE_ANCHORS stays small so the rotating
    slots actually cycle the registry — ≤ 12 anchors, the gate is
    still exactly 50 queries, and every anchor is either green in the
    latest driver CORRECTNESS artifact or absent from it (i.e. new
    this round — anchoring an op the driver already verified green
    just starves the rotation).

    Round 11 (verdict #3): the anchor-new-ops rule is MECHANICAL —
    every query registered since the previous round's frozen roster
    (_gate_roster.PRIOR_REGISTRY) must be an anchor, so every op gets
    its first driver CORRECTNESS row the round it lands; "rides the
    same helper" inferences don't substitute for a driver row."""
    import glob
    import json
    import os
    import re

    from dask_geomodeling_spark import demos
    from dask_geomodeling_spark._gate_roster import PRIOR_REGISTRY

    assert len(demos.GATE_ANCHORS) <= 12, demos.GATE_ANCHORS
    assert len(demos.GATE_ORDER) == 50
    assert len(set(demos.GATE_ORDER)) == 50
    new_this_round = set(demos.QUERIES) - set(PRIOR_REGISTRY)
    unanchored = new_this_round - set(demos.GATE_ANCHORS)
    assert not unanchored, (
        "round-new queries missing from GATE_ANCHORS (every op is "
        "anchored the round it lands): {}".format(sorted(unanchored)))
    root = os.path.dirname(os.path.dirname(
        os.path.abspath(demos.__file__)))
    arts = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            arts[int(m.group(1))] = f
    if not arts:
        return
    latest = json.load(open(arts[max(arts)]))
    always_ok = {"q1_pricing_summary", "json_graph_roundtrip"}
    for name in demos.GATE_ANCHORS:
        if name in always_ok or name not in latest:
            continue
        entry = latest[name]
        assert entry.get("err") is None and entry.get("rows_match"), (
            name, entry)


def test_gate_rotation_never_checked_first():
    """Round 12 (verdict #1): the rotating gate slots are filled
    never-driver-checked-first, then stalest-first, then by name —
    derived from the checked-in CORRECTNESS_r*.json artifacts, the
    same repo-state-only inference the old round-robin used.  Pins
    (a) the ordering key, and (b) that while ANY registry query lacks
    a driver row, the rotating slots contain no already-checked query
    ahead of a never-checked one."""
    from dask_geomodeling_spark import demos

    last = demos._driver_history()
    pool = [n for n in sorted(demos.QUERIES) if n not in demos.GATE_ANCHORS]
    rotating = [n for n in demos.GATE_ORDER
                if n not in demos.GATE_ANCHORS]
    k = len(rotating)
    expected = sorted(pool, key=lambda n: (last.get(n, 0), n))[:k]
    assert rotating == expected
    never = [n for n in pool if n not in last]
    if never:
        # never-checked queries fill slots before any checked query
        assert set(never[:k]) <= set(rotating), (
            sorted(set(never[:k]) - set(rotating)))
