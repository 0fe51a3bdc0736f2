"""Deterministic matrix decomposition over embedding columns
(SURVEY.md §2 'LLM-data-pipeline extensions').

``PCAProject`` reduces an embedding column to its top-``k`` principal
components — the classical precursor to clustering / visualization /
whitening in corpus analysis.  Everything about the fit is
deterministic and engine-independent, in the same spirit as
``learn_centroids`` (similarity.py):

- per-dimension means and covariance entries accumulate as DECIMAL
  sums of doubles (order-independent across any partitioning);
- the dominant eigenvectors come from FIXED-iteration power iteration
  with Hotelling deflation, run driver-side on the dim×dim matrix in
  plain python floats (IEEE doubles, ascending-index fold order) — so
  an ANSI-SQL engine replaying the same folds reproduces every
  component bit-for-bit (the demo oracle does exactly that, unrolled).
  The all-positive start vector makes even the sign deterministic.
  Caveat: with an EXACTLY rank-deficient spectrum (rank < k) the
  trailing components are quotients of rounding noise — orthogonal to
  the real components, but direction-arbitrary; fit on data with at
  least k independent directions.

Scale shape (SURVEY §6): the fit is two distributed aggregations — a
dim-row mean pass and a dim²-row covariance pass (posexplode pairs,
map-side partial DECIMAL sums) — and only the dim×dim matrix reaches
the driver.  The projection is a narrow literal-matrix map (no join,
no shuffle), with the same plan-size bound as the PQ codebooks.  At
100 TB fit on a sample; the projection pass stays full-scale.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle

__all__ = ["PCAProject", "fit_pca_components"]


def _array_lit(vals):
    return "array({})".format(
        ",".join("cast({!r} as double)".format(float(v)) for v in vals))


def fit_pca_components(df, k=2, iters=6, dim=64,
                       vec_column="embedding", id_column="vec_id",
                       scale=8):
    """Fit top-``k`` principal components; returns ``(n, mu, comps)``
    as plain python values (``comps`` is k lists of dim floats).

    Covariance uses the FULL (i, j) pair grid (simpler than mirroring a
    triangle, and the j-ascending row lists the SQL oracle folds over
    come out identical); the pair explosion is dim² rows per input row,
    map-side, collapsed by the partial aggregation.
    """
    dec = "decimal(28,{})".format(int(scale))
    n = df.count()
    mu_rows = (df.select(F.posexplode(vec_column).alias("_i", "_x"))
               .groupBy("_i")
               .agg((F.sum(F.col("_x").cast("double").cast(dec))
                     .cast("double") / F.count(F.lit(1))).alias("_m"))
               .collect())
    mu = [0.0] * dim
    for r in mu_rows:
        mu[r["_i"]] = r["_m"]
    ex = df.select(F.col(id_column).alias("_id"),
                   F.posexplode(vec_column).alias("_i", "_x"))
    ex = ex.select("_id", "_i",
                   (F.col("_x").cast("double")
                    - F.element_at(F.expr(_array_lit(mu)),
                                   F.col("_i") + 1)).alias("_d"))
    a, b = ex.alias("a"), ex.alias("b")
    cov_rows = (a.join(b, F.col("a._id") == F.col("b._id"))
                .groupBy(F.col("a._i").alias("_i"),
                         F.col("b._i").alias("_j"))
                .agg((F.sum((F.col("a._d") * F.col("b._d")).cast(dec))
                      .cast("double") / F.lit(int(n))).alias("_c"))
                .collect())
    C = [[0.0] * dim for _ in range(dim)]
    for r in cov_rows:
        C[r["_i"]][r["_j"]] = r["_c"]

    def power(mat, prev):
        v = [1.0 / math.sqrt(float(dim))] * dim
        for _ in range(int(iters)):
            w = []
            for i in range(dim):
                acc = 0.0
                for j in range(dim):
                    acc = acc + mat[i][j] * v[j]
                w.append(acc)
            # Gram–Schmidt against the already-found components each
            # iteration: deflation alone leaves O(ε) of the dominant
            # direction in the matrix, and on (near-)degenerate spectra
            # the iteration converges right back to it
            for q in prev:
                coef = 0.0
                for j in range(dim):
                    coef = coef + w[j] * q[j]
                w = [w[i] - coef * q[i] for i in range(dim)]
            acc = 0.0
            for x in w:
                acc = acc + x * x
            nrm = math.sqrt(acc)
            v = [x / nrm for x in w]
        return v

    comps = []
    mat = C
    for _ in range(int(k)):
        v = power(mat, comps)
        # Rayleigh quotient λ = v·(mat v), then deflate
        cv = []
        for i in range(dim):
            acc = 0.0
            for j in range(dim):
                acc = acc + mat[i][j] * v[j]
            cv.append(acc)
        lam = 0.0
        for i in range(dim):
            lam = lam + v[i] * cv[i]
        comps.append(v)
        mat = [[mat[i][j] - lam * v[i] * v[j] for j in range(dim)]
               for i in range(dim)]
    return n, mu, comps


class PCAProject(BaseSingle):
    """Project an embedding column onto its top-``k`` principal
    components: adds ``pc0..pc{k-1}`` double columns
    ``pc_c = Σ_i (x_i − μ_i) · v_c[i]`` (ascending-index fold).

    The fit (``fit_pca_components``) runs when the plan is built; the
    mean and component vectors then ride the projection as literals —
    no join, no shuffle, whole-stage codegen.
    """

    def __init__(self, source, k=2, iters=6, dim=64,
                 vector_column="embedding", id_column=None,
                 fit_fraction=1.0):
        if id_column is None:
            id_column = source.index_column
        super().__init__(source, int(k), int(iters), int(dim),
                         vector_column, id_column, float(fit_fraction))

    @property
    def columns(self):
        return set(self.source.columns) | {
            "pc{}".format(c) for c in range(self.args[1])}

    def _build(self, ctx):
        from dask_geomodeling_spark.pipeline.similarity import fit_sample
        _, k, iters, dim, vec, idc, fit_fraction = self.args
        df = self.source._build(ctx)
        # the cache only serves the iterative fit (optionally over the
        # deterministic hash sample — the 100 TB contract; the
        # projection below stays full-corpus): the output carries the
        # components as literals, so release the cache immediately
        # (a leaked persist outlives the plan build for the whole session)
        fit = fit_sample(df, idc, fit_fraction)
        fit.persist()
        try:
            _, mu, comps = fit_pca_components(
                fit, k=k, iters=iters, dim=dim, vec_column=vec,
                id_column=idc)
        finally:
            fit.unpersist()
        mu_arr = _array_lit(mu)
        out = df
        for c, comp in enumerate(comps):
            expr = F.expr(
                "aggregate(zip_with(zip_with({v}, {mu}, "
                "(x, m) -> cast(x as double) - m), {cp}, "
                "(d, c) -> d * c), cast(0.0 as double), "
                "(acc, t) -> acc + t)".format(
                    v=vec, mu=mu_arr, cp=_array_lit(comp)))
            out = out.withColumn("pc{}".format(c), expr)
        return out
