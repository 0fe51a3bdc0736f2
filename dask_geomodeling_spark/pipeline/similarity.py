"""Similarity search over embedding columns (SURVEY.md §2
'LLM-data-pipeline extensions').

``CosineTopK`` is the exact baseline: broadcast the (small) query set,
compute cosine with JVM-side higher-order functions (``zip_with`` +
``aggregate`` — no Python in the scan), take top-k per query with one
window.  ``BucketedANN`` is the scale path: deterministic random-
hyperplane buckets shrink the candidate set; the bucketing constants are
plain literals, so results are reproducible on any engine.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle

__all__ = ["CosineTopK", "BucketedANN", "cosine_expr", "hyperplane_bucket",
           "hyperplanes"]


def dot_expr(a, b):
    """Sequential-fold dot product of two array<float> columns — inside
    codegen, deterministic summation order."""
    return F.expr(
        "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y), "
        "cast(0.0 as double), (acc, v) -> acc + v)".format(a=a, b=b))


def norm_expr(a):
    """Euclidean norm of an array<float> column (same fold order as the
    corresponding dot product)."""
    return F.expr(
        "sqrt(aggregate({a}, cast(0.0 as double), "
        "(acc, v) -> acc + cast(v as double) * v))".format(a=a))


def cosine_expr(a, b):
    """Exact cosine similarity of two array<float> columns — zip_with dot
    product + norms, all inside codegen."""
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b),
                                     F.lit(0.0))


def hyperplanes(dim, n_planes, seed=7):
    """Deterministic pseudo-random hyperplane matrix as python lists."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def hyperplane_bucket(vec_col, dim, n_planes, seed=7):
    """Sign-bit bucket id of a vector against deterministic hyperplanes."""
    planes = hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        arr = "array({})".format(
            ",".join("cast({!r} as double)".format(w) for w in plane))
        dot = F.expr(
            "aggregate(zip_with({v}, {p}, (x, y) -> cast(x as double) * y), "
            "cast(0.0 as double), (acc, v) -> acc + v)"
            .format(v=vec_col, p=arr))
        bucket = bucket + F.when(dot >= 0,
                                 F.lit(1 << i).cast("bigint")).otherwise(0)
    return bucket


class CosineTopK(BaseSingle):
    """Exact top-k nearest neighbours by cosine.

    Args:
      source: block over the corpus embeddings table.
      queries: block over the query embeddings (small side — broadcast).
      k: neighbours per query.
      vec/id columns configurable; query ids excluded from their own
      result.  Output: ``query_id``, ``neighbor_id``, ``cosine``, ``rank``.
    """

    def __init__(self, source, queries, k=10, vec_column="embedding",
                 id_column="vec_id", precision=None):
        super().__init__(source, queries, int(k), vec_column, id_column,
                         precision)

    @property
    def columns(self):
        return {"query_id", "neighbor_id", "cosine", "rank"}

    def _build(self, ctx):
        _, queries, k, vec_column, id_column, precision = self.args
        # norms hoisted: one fold per VECTOR, not three folds per PAIR
        corpus = self.source._build(ctx).select(
            F.col(id_column).alias("neighbor_id"),
            F.col(vec_column).alias("_cv"),
            norm_expr(vec_column).alias("_cn"))
        qs = queries._build(ctx).select(
            F.col(id_column).alias("query_id"),
            F.col(vec_column).alias("_qv"),
            norm_expr(vec_column).alias("_qn"))
        joined = corpus.join(F.broadcast(qs),
                             F.col("query_id") != F.col("neighbor_id"))
        cos = dot_expr("_qv", "_cv") / F.nullif(
            F.col("_qn") * F.col("_cn"), F.lit(0.0))
        if precision is not None:
            # round-then-rank: ranking ties broken by neighbor_id become
            # deterministic across engines/runs (last-ulp-stable)
            cos = F.round(cos, int(precision))
        scored = joined.select("query_id", "neighbor_id",
                               cos.alias("cosine"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc())
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))


class BucketedANN(BaseSingle):
    """Approximate top-k: candidates restricted to the query's
    hyperplane bucket (IVF/LSH-style).  Same output shape as CosineTopK;
    recall trades off with ``n_planes``.  At 100 TB the bucket join key
    replaces the cross product — candidates shrink by ~2^n_planes."""

    def __init__(self, source, queries, k=10, vec_column="embedding",
                 id_column="vec_id", n_planes=4, dim=None, precision=None):
        if dim is None:
            raise ValueError("dim (embedding dimension) is required")
        super().__init__(source, queries, int(k), vec_column, id_column,
                         int(n_planes), int(dim), precision)

    @property
    def columns(self):
        return {"query_id", "neighbor_id", "cosine", "rank"}

    def _build(self, ctx):
        (_, queries, k, vec_column, id_column, n_planes, dim,
         precision) = self.args
        bucket = hyperplane_bucket("_cv", dim, n_planes)
        corpus = (self.source._build(ctx)
                  .select(F.col(id_column).alias("neighbor_id"),
                          F.col(vec_column).alias("_cv"),
                          norm_expr(vec_column).alias("_cn"))
                  .withColumn("_bk", bucket))
        qbucket = hyperplane_bucket("_qv", dim, n_planes)
        qs = (queries._build(ctx)
              .select(F.col(id_column).alias("query_id"),
                      F.col(vec_column).alias("_qv"),
                      norm_expr(vec_column).alias("_qn"))
              .withColumn("_qbk", qbucket))
        joined = corpus.join(F.broadcast(qs),
                             (F.col("_bk") == F.col("_qbk"))
                             & (F.col("query_id") != F.col("neighbor_id")))
        cos = dot_expr("_qv", "_cv") / F.nullif(
            F.col("_qn") * F.col("_cn"), F.lit(0.0))
        if precision is not None:
            cos = F.round(cos, int(precision))
        scored = joined.select("query_id", "neighbor_id",
                               cos.alias("cosine"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc())
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))
