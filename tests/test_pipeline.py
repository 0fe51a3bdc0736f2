"""LLM-data-pipeline operator tests (SURVEY.md §2 extensions)."""

import pytest

from dask_geomodeling_spark.geometry.sources import LiteralGeometrySource
from dask_geomodeling_spark.pipeline import dedup, similarity, text
from dask_geomodeling_spark.pipeline.multimodal import (AttachBinaryMetadata,
                                                        ExtractImageFeatures,
                                                        FrameSample)

DOCS = [
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
    {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog"},
    {"doc_id": 3, "text": "the quick brown fox leaps over the lazy dog"},
    {"doc_id": 4, "text": "completely different content about spark sql"},
]


@pytest.fixture(scope="module")
def docs():
    return LiteralGeometrySource(DOCS)


def test_exact_dedup(spark, docs):
    rows = dedup.ExactDedup(docs).plan(spark).collect()
    got = {r.doc_id: r.dup_count for r in rows}
    assert got[1] == 2 and 2 not in got and got[3] == 1


def test_minhash_finds_near_dups(spark, docs):
    pairs = dedup.MinHashLSH(docs, shingle_size=2).plan(spark).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found  # exact dup always collides
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert jac[(1, 2)] == 1.0
    assert all(not (a == 4 or b == 4) or jac[(a, b)] < 0.5
               for a, b in found)


def test_simhash(spark, docs):
    pairs = dedup.SimHash(docs).plan(spark).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found[(1, 2)] == 0


def test_ngram_jaccard(spark, docs):
    pairs = dedup.NgramJaccard(docs, n=2, threshold=0.5).plan(spark).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert found[(1, 2)] == 1.0
    assert (1, 3) in found and found[(1, 3)] < 1.0


EMB = [
    {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
    {"vec_id": 2, "embedding": [0.999, 0.01, 0.0]},
    {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
]


def test_embedding_dedup(spark):
    emb = LiteralGeometrySource(EMB)
    pairs = dedup.EmbeddingDedup(emb, threshold=0.99).plan(spark).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_cosine_topk(spark):
    emb = LiteralGeometrySource(EMB)
    rows = similarity.CosineTopK(emb, emb, k=1).plan(spark).collect()
    best = {r.query_id: r.neighbor_id for r in rows}
    assert best[1] == 2 and best[2] == 1


def test_bucketed_ann_matches_exact_for_same_bucket(spark):
    emb = LiteralGeometrySource(EMB)
    rows = similarity.BucketedANN(emb, emb, k=1, n_planes=2,
                                  dim=3).plan(spark).collect()
    best = {r.query_id: r.neighbor_id for r in rows}
    assert best.get(1) == 2  # near-identical vectors share every bucket


def test_token_count(spark, docs):
    rows = text.TokenCount(docs).plan(spark).collect()
    got = {r.doc_id: (r.ws_tokens, r.bpe_tokens) for r in rows}
    assert got[1] == (9, 9)


def test_quality_and_lang(spark, docs):
    rows = text.QualityScore(text.LanguageID(docs)).plan(spark).collect()
    got = {r.doc_id: r for r in rows}
    assert got[1].lang_pred == "en"
    assert 0.0 <= got[1].quality <= 1.0
    assert got[1].stopword_ratio > 0.2


def test_fingerprint_stability(spark, docs):
    rows = text.Fingerprint(docs).plan(spark).collect()
    got = {r.doc_id: r.fingerprint for r in rows}
    assert got[1] == got[2] != got[3]


def test_multimodal_plumbing(spark):
    src = LiteralGeometrySource([
        {"media_id": 1, "blob": "abc"},
        {"media_id": 2, "blob": "xyz"},
    ])
    media = AttachBinaryMetadata(src, "blob", mime="image/png")
    feats = ExtractImageFeatures(media, dim=8)
    rows = feats.plan(spark).collect()
    assert all(len(r.features) == 8 for r in rows)
    by_id = {r.media_id: tuple(r.features) for r in rows}
    assert by_id[1] != by_id[2]
    # deterministic across plans
    rows2 = feats.plan(spark).collect()
    assert {r.media_id: tuple(r.features) for r in rows2} == by_id

    frames = FrameSample(media, n_frames=3).plan(spark).collect()
    assert len(frames) == 6


def test_extract_strict_raises(spark):
    src = LiteralGeometrySource([{"media_id": 1, "blob": "abc"}])
    media = AttachBinaryMetadata(src, "blob")
    feats = ExtractImageFeatures(media, decode="strict")
    with pytest.raises(Exception):
        feats.plan(spark).collect()
