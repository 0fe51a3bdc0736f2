"""Corpus-filtering operators for LLM training-data pipelines
(SURVEY.md §2, 'LLM-data-pipeline extensions').

Gopher/C4-style repetition filtering, benchmark decontamination and PII
redaction — the standard pre-training corpus hygiene passes.  All hot
paths are JVM-side ``pyspark.sql.functions`` expressions (no Python
UDFs); the only shuffles are the per-document n-gram aggregations,
which are keyed on (doc, gram) — uniform by construction, skew-safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle, GeometryBlock
from dask_geomodeling_spark.pipeline.dedup import (MERSENNE,
                                                   ngram_regex_expr,
                                                   poly_hash_expr)

__all__ = ["RepetitionFilter", "Decontaminate", "PIIRedact",
           "LinearScore", "LogisticFit", "fit_logistic"]

# word n-gram array over a pre-split token array column (mirrors
# dedup.py's shingle expression, but keeps the gram STRINGS — the
# decontamination join matches grams exactly, no hashing)
_GRAMS = ("transform(sequence(1, greatest(size({w}) - {n} + 1, 1)), "
          "i -> concat_ws(' ', slice({w}, i, {n})))")


def _words(column):
    return F.split(F.trim(F.lower(F.col(column))), r"\s+")


class RepetitionFilter(BaseSingle):
    """Gopher-style repetition metrics per document.

    - ``dup_word_ratio`` — fraction of word occurrences that are repeats
      of an earlier word: pure array math (``array_distinct``), stays in
      the projection, NO shuffle.
    - ``top_bigram_frac`` — share of word-bigram slots taken by the most
      frequent bigram: explode (map-side) + count per (doc, bigram) +
      max per doc — two keyed aggregations, partial-aggregated map-side
      by Catalyst.
    - ``repetitive`` — boolean flag at the given thresholds.

    Scale: the (doc, bigram) key is near-unique per doc so the shuffle
    is uniform; no driver-side state.  Documents with fewer than two
    words get ``top_bigram_frac = 0.0``.
    """

    def __init__(self, source, column="text", max_dup_ratio=0.5,
                 max_bigram_frac=0.2, id_column=None):
        if id_column is None:
            id_column = source.index_column
        super().__init__(source, column, float(max_dup_ratio),
                         float(max_bigram_frac), id_column)

    @property
    def columns(self):
        return set(self.source.columns) | {
            "n_words", "dup_word_ratio", "top_bigram_frac", "repetitive"}

    def _build(self, ctx):
        _, column, max_dup, max_big, idc = self.args
        df = self.source._build(ctx)
        df = df.withColumn("_w", _words(column))
        n = F.when(F.length(F.trim(F.col(column))) == 0, 0) \
            .otherwise(F.size("_w")).cast("bigint")
        df = df.withColumn("n_words", n)
        dup = F.when(
            F.col("n_words") > 0,
            1.0 - F.size(F.array_distinct("_w"))
            / F.col("n_words").cast("double")).otherwise(0.0)
        df = df.withColumn("dup_word_ratio", dup)

        # occurrence multiset (not distinct): the top-bigram share
        # counts repeats; regex build stays in codegen (ngram_regex_expr)
        grams = F.when(F.col("n_words") >= 2,
                       ngram_regex_expr(column, 2, distinct=False)) \
            .otherwise(F.array())
        exploded = (df.select(F.col(idc), F.explode(grams).alias("_g"))
                    .groupBy(idc, "_g").count()
                    .groupBy(idc).agg(F.max("count").alias("_top")))
        df = df.join(exploded, on=idc, how="left")
        frac = F.when(
            F.col("n_words") >= 2,
            F.coalesce(F.col("_top"), F.lit(0))
            / (F.col("n_words") - 1).cast("double")).otherwise(0.0)
        df = df.withColumn("top_bigram_frac", frac)
        rep = (F.col("dup_word_ratio") > max_dup) \
            | (F.col("top_bigram_frac") > max_big)
        return df.withColumn("repetitive", rep).drop("_w", "_top")


class Decontaminate(GeometryBlock):
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with an evaluation corpus.

    Plan shape (the standard corpus-scale design):
      1. explode DISTINCT per-doc n-grams of the train side (map-side);
      2. distinct n-grams of the (much smaller) eval side;
      3. equi-join on the gram, count matches per train doc;
      4. left-join the counts back onto the train frame.
    The gram join key is uniform — no skew; the eval side is tiny in
    practice and AQE broadcast-joins it.  Documents shorter than ``n``
    words contribute their whole text as one gram (same convention as
    dedup.py shingles).

    ``hashed=True`` switches the join key to 31-bit arithmetic gram
    hashes (the same token-hash + base-8191 fold as MinHashLSH's
    arithmetic scheme): the explode+join shuffles 8-byte ints instead
    of gram strings.  That is the right trade on a network-bound
    cluster (shuffle volume drops ~5x); the default stays ``False``
    because the char-level hash fold is an interpreted higher-order
    function — on a CPU-bound single node exact strings are ~4x
    faster, and the string join is collision-free.

    ``broadcast_set=True`` switches to the STREAMING-SAFE shape: the
    eval side collapses to a single collect_set row that cross-
    broadcasts onto the train frame, and contamination becomes a pure
    map-side ``arrays_overlap`` — no aggregation over the train side,
    so the identical plan runs under ``readStream`` (stream-static
    broadcast join) for on-ingest decontamination.  In this mode
    ``shared_ngrams`` counts the overlapping grams via
    ``array_intersect`` (same values as the join formulation).  Use it
    when the eval suite fits one executor's memory — benchmark suites
    do; a web-scale eval corpus should keep the default join.

    Adds ``shared_ngrams`` (distinct shared grams) and ``contaminated``.
    """

    def __init__(self, source, eval_source, column="text", n=6,
                 id_column=None, hashed=False, broadcast_set=False):
        if not isinstance(source, GeometryBlock) \
                or not isinstance(eval_source, GeometryBlock):
            raise TypeError("sources must be GeometryBlocks")
        if id_column is None:
            id_column = source.index_column
        super().__init__(source, eval_source, column, int(n), id_column,
                         bool(hashed), bool(broadcast_set))

    @property
    def source(self):
        return self.args[0]

    @property
    def columns(self):
        return set(self.source.columns) | {"shared_ngrams", "contaminated"}

    def _build(self, ctx):
        (train_b, eval_b, column, n, idc, hashed,
         broadcast_set) = self.args
        if hashed:
            grams = F.array_distinct(F.expr(
                "transform(sequence(1, greatest(size(_th) - {n} + 1, 1)),"
                " i -> aggregate(slice(_th, i, {n}), cast(0 as bigint), "
                "(acc, h) -> pmod(acc * 8191 + h, {m})))"
                .format(n=n, m=MERSENNE)))
        else:
            # codegen regex build (docstring of ngram_regex_expr) —
            # same grams as the HOF template, ~3.5x cheaper per scan
            grams = ngram_regex_expr(column, n)

        def with_grams(df):
            if hashed:
                df = df.withColumn("_w", _words(column))
                df = df.withColumn("_th", F.expr(
                    "transform(_w, t -> {h})".format(
                        h=poly_hash_expr("t"))))
            return df.withColumn("_grams", grams)

        train = with_grams(train_b._build(ctx))
        if broadcast_set:
            ev = (with_grams(eval_b._build(ctx))
                  .select(F.explode("_grams").alias("_g")).distinct()
                  .agg(F.collect_set("_g").alias("_egs")))
            drop = ["_w", "_th", "_grams"] if hashed else ["_grams"]
            out = train.join(F.broadcast(ev))
            shared = F.size(F.array_intersect("_grams", "_egs"))
            return (out.withColumn("shared_ngrams",
                                   shared.cast("bigint"))
                    .withColumn("contaminated",
                                F.col("shared_ngrams") > 0)
                    .drop("_egs", *drop))
        eval_grams = (with_grams(eval_b._build(ctx))
                      .select(F.explode("_grams").alias("_g")).distinct())
        train_grams = train.select(
            F.col(idc), F.explode("_grams").alias("_g"))
        shared = (train_grams.join(eval_grams, "_g")
                  .groupBy(idc)
                  .agg(F.count(F.lit(1)).alias("_shared")))
        drop = ["_w", "_th", "_grams"] if hashed else ["_grams"]
        out = train.drop(*drop).join(shared, on=idc, how="left")
        return (out.withColumn(
            "shared_ngrams",
            F.coalesce(F.col("_shared"), F.lit(0)).cast("bigint"))
            .withColumn("contaminated", F.col("shared_ngrams") > 0)
            .drop("_shared"))


# regexes restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): literal classes, \d, \b, bounded repeats
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE = r"\+\d{7,15}"
#: payment-card CANDIDATES: solid 13-19 digit runs or the 4-4-4-n
#: grouped form; validation is the Luhn checksum (below), so random
#: digit runs don't redact — the Dolma-style detect-then-validate rule
_CC = (r"\b([0-9]{13,19}"
       r"|[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{1,7})\b")


def luhn_valid_sql(digits_expr):
    """Engine-portable-ish SQL (Spark HOF dialect): Luhn checksum over
    a digits-only string expression — doubling every second digit from
    the right, minus 9 when it exceeds 9, total ≡ 0 (mod 10)."""
    d = digits_expr
    return ("aggregate(sequence(1, length({d})), 0, (a, i) -> a + "
            "CASE WHEN pmod(length({d}) - i, 2) = 0 "
            "THEN CAST(substring({d}, i, 1) AS INT) "
            "ELSE CASE WHEN 2 * CAST(substring({d}, i, 1) AS INT) > 9 "
            "THEN 2 * CAST(substring({d}, i, 1) AS INT) - 9 "
            "ELSE 2 * CAST(substring({d}, i, 1) AS INT) END END) "
            "% 10 = 0").format(d=d)


class PIIRedact(BaseSingle):
    """PII scrubbing: count and redact e-mail addresses, IPv4 addresses
    and international phone numbers (``+<7-15 digits>``).

    Pure per-row regex work — one projection, no shuffle, whole-stage
    codegen; the patterns use only the regex subset that behaves
    identically in Java regex and RE2.  Replacement order is e-mail →
    IPv4 → phone so one match is never double-redacted.

    Adds ``n_emails``, ``n_ips``, ``n_phones`` and ``text_redacted``.

    ``detect_cards=True`` additionally finds payment-card candidates
    (13–19 digit runs / 4-4-4-n groups) and redacts ONLY the ones that
    pass the Luhn checksum — the detect-then-validate rule the
    published PII pipelines use, so arbitrary numeric runs survive.
    Validation is a per-candidate HOF fold (still zero shuffle); adds
    ``n_cards``.
    """

    def __init__(self, source, column="text", detect_cards=False):
        super().__init__(source, column, bool(detect_cards))

    @property
    def columns(self):
        cols = set(self.source.columns) | {
            "n_emails", "n_ips", "n_phones", "text_redacted"}
        if self.args[2]:
            cols.add("n_cards")
        return cols

    def _build(self, ctx):
        column, cards = self.args[1], self.args[2]
        df = self.source._build(ctx)
        c = F.col(column)
        redacted = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, _EMAIL, "[EMAIL]"),
                _IPV4, "[IP]"),
            _PHONE, "[PHONE]")
        out = {
            "n_emails": F.size(F.regexp_extract_all(
                c, F.lit(_EMAIL), 0)).cast("bigint"),
            "n_ips": F.size(F.regexp_extract_all(
                c, F.lit(_IPV4), 0)).cast("bigint"),
            "n_phones": F.size(F.regexp_extract_all(
                c, F.lit(_PHONE), 0)).cast("bigint"),
        }
        if cards:
            cc_re = _CC.replace("\\", "\\\\")
            valid = (
                "filter(transform(regexp_extract_all({col}, '{re}', 0),"
                " cc -> struct(cc AS cc, "
                "regexp_replace(cc, '[^0-9]', '') AS d)), "
                "s -> length(s.d) BETWEEN 13 AND 19 AND {luhn})"
                .format(col=column, re=cc_re,
                        luhn=luhn_valid_sql("s.d")))
            df = df.withColumn("_cc", F.expr(valid))
            out["n_cards"] = F.size("_cc").cast("bigint")
            # literal replace of each VALIDATED candidate, applied on
            # top of the regex redactions (the patterns are disjoint)
            redacted = F.aggregate(
                "_cc", redacted,
                lambda acc, s: F.replace(acc, s["cc"],
                                         F.lit("[CC]")))
        out["text_redacted"] = redacted
        res = df.withColumns(out)
        return res.drop("_cc") if cards else res


class LinearScore(BaseSingle):
    """Classifier-based quality filtering: a linear/logistic scorer over
    already-computed numeric feature columns — the public fastText/CCNet
    recipe's final stage (train the classifier offline, ship weights,
    score the corpus at scale).

    ``score = sigmoid(bias + Σ weights[i] * features[i])`` accumulated
    left-to-right in ``features`` order (fixed association, so every
    engine sums identically).  With ``threshold`` set, rows below it are
    dropped.  Pure column projection: no shuffle, no UDF, whole-stage
    codegen — the weights ride the plan as literals.

    Args:
      source: block whose frame carries the feature columns
        (e.g. ``QualityScore`` output, token counts, language scores).
      features: ordered list of numeric column names.
      weights: same-length list of floats.
      bias: intercept.
      threshold: optional minimum score to keep a row.
      column_name: output column (default ``score``).
    """

    def __init__(self, source, features, weights, bias=0.0,
                 threshold=None, column_name="score"):
        features = list(features)
        weights = [float(w) for w in weights]
        if len(features) != len(weights):
            raise ValueError("features and weights lengths differ")
        super().__init__(source, features, weights, float(bias),
                         threshold, column_name)

    @property
    def columns(self):
        return set(self.source.columns) | {self.args[5]}

    def _build(self, ctx):
        _, features, weights, bias, threshold, name = self.args
        df = self.source._build(ctx)
        z = F.lit(float(bias))
        for col, w in zip(features, weights):
            z = z + F.lit(w) * F.col(col).cast("double")
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        df = df.withColumn(name, score)
        if threshold is not None:
            df = df.filter(F.col(name) >= float(threshold))
        return df


def fit_logistic(df, feature_columns, label_column, iters=4, lr=0.5,
                 round_to=7):
    """Batch-gradient-descent logistic regression fit, distributed and
    DETERMINISTIC — the training half of the fastText/CCNet quality-
    classifier recipe (LinearScore is the apply half).

    Each iteration is ONE aggregation job: with the current weights as
    plan literals, every row computes ``σ(w·x)`` JVM-side and the
    per-feature gradient sums ``Σ (σ − y)·x_j`` (plus the bias term)
    reduce map-side; only d+1 scalars reach the driver.  Weights
    update ``w ← w − lr·g/n`` and ROUND to ``round_to`` decimals each
    iteration — per-row exp() can differ by 1 ulp across engines, so
    the rounding pins every engine to identical literals for the NEXT
    iteration and drift cannot compound (the model-fit determinism
    recipe the k-means/PCA oracles use).

    Returns ``(bias, weights)``.
    """
    cols = list(feature_columns)
    w = [0.0] * (len(cols) + 1)  # w[0] = bias
    # persist the (projected) fit input: each iteration is a fresh job
    # over it, and without the persist the full upstream lineage would
    # re-execute `iters` times (the PCAProject/KMeansIVF fit contract)
    fit = df.select(label_column, *cols).persist()
    try:
        for _ in range(int(iters)):
            z = F.lit(w[0])
            for c, wj in zip(cols, w[1:]):
                z = z + F.lit(wj) * F.col(c).cast("double")
            s = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = s - F.col(label_column).cast("double")
            aggs = [F.sum(err).alias("_g0")]
            aggs += [F.sum(err * F.col(c).cast("double"))
                     .alias("_g{}".format(j + 1))
                     for j, c in enumerate(cols)]
            aggs.append(F.count(F.lit(1)).alias("_n"))
            row = fit.agg(*aggs).first()
            n = row["_n"]
            if not n:
                raise ValueError(
                    "fit_logistic: empty fit input (0 rows)")
            w = [round(w[j] - lr * row["_g{}".format(j)] / n,
                       int(round_to))
                 for j in range(len(w))]
    finally:
        fit.unpersist()
    return w[0], w[1:]


class LogisticFit(BaseSingle):
    """Fit-and-score in one block: train the logistic quality
    classifier on the corpus itself (deterministic batch GD,
    :func:`fit_logistic`) and score every row with the fitted weights
    as plan literals — the in-engine analogue of 'train the fastText
    scorer, then score the corpus', with PCAProject's build-time-fit
    contract.

    Args:
      source: block carrying numeric feature columns + a 0/1 label.
      features: ordered feature column names.
      label_column: 0/1 teacher label column.
      iters / lr: GD schedule (fixed, part of the model identity).
      column_name: output score column.
      precision: optional ROUND on the output score.
    """

    def __init__(self, source, features, label_column, iters=4, lr=0.5,
                 column_name="score", precision=None):
        super().__init__(source, list(features), label_column,
                         int(iters), float(lr), column_name, precision)

    @property
    def columns(self):
        return set(self.source.columns) | {self.args[5]}

    def _build(self, ctx):
        _, features, label, iters, lr, name, precision = self.args
        df = self.source._build(ctx)
        bias, weights = fit_logistic(df, features, label, iters=iters,
                                     lr=lr)
        z = F.lit(bias)
        for c, wj in zip(features, weights):
            z = z + F.lit(wj) * F.col(c).cast("double")
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        if precision is not None:
            score = F.round(score, int(precision))
        return df.withColumn(name, score)
