"""Distributed global ranking without a single-partition window.

``NTILE(k) OVER (ORDER BY …)`` and friends put the WHOLE dataset into
one ordered window partition — one task, the classic scale killer.
The two-phase equivalent here is the textbook distributed rank:

1. ``repartitionByRange`` on the total order (sampled balanced ranges,
   skew-resistant) + ``sortWithinPartitions``;
2. per-partition local row numbers ride the zipWithIndex encoding of
   ``monotonically_increasing_id`` (partition id in the high bits,
   per-partition sequence in the low 33);
3. ONE tiny aggregation (a row per partition) collects partition
   counts; their prefix sums broadcast back as a map literal, so
   ``global_rn = offset[pid] + local + 1``.

The frame is localCheckpoint-ed after step 2 so the counts job and the
result job read the SAME materialized partitioning (the lineage-cut
pattern DedupClusters already uses).  Only ``num_partitions`` scalars
ever reach the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["global_row_number", "distributed_ntile",
           "distributed_group_ntile"]

_SEQ_BITS = 33  # monotonically_increasing_id: pid << 33 | sequence
_SEQ_MASK = (1 << _SEQ_BITS) - 1


def global_row_number(df, order_cols, out="_rn"):
    """(frame, total_count): ``frame`` = ``df`` plus a 1-based global
    row number ``out`` under the TOTAL order ``order_cols`` (callers
    must include a tiebreaker column for determinism)."""
    ranged = (df.repartitionByRange(*order_cols)
              .sortWithinPartitions(*order_cols)
              .withColumn("_mid", F.monotonically_increasing_id())
              .localCheckpoint())
    pid = F.shiftright(F.col("_mid"), _SEQ_BITS)
    counts = sorted(
        (r[0], r[1]) for r in
        ranged.groupBy(pid.alias("_pid")).count().collect())
    offsets, acc = {}, 0
    for p, c in counts:
        offsets[p] = acc
        acc += c
    off_map = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv])
    rn = (F.element_at(off_map, pid.cast("int"))
          + (F.col("_mid").bitwiseAND(F.lit(_SEQ_MASK))) + 1)
    return (ranged.withColumn(out, rn.cast("bigint")).drop("_mid"),
            acc)


def distributed_ntile(df, order_cols, k, out="bucket"):
    """Exact ``NTILE(k) OVER (ORDER BY order_cols)`` semantics — the
    first ``n mod k`` buckets get ``ceil(n/k)`` rows, the rest
    ``floor(n/k)`` — computed from the global row number instead of a
    data-sized single-partition window."""
    k = int(k)
    if k < 1:
        raise ValueError("k must be >= 1")
    ranked, n = global_row_number(df, order_cols, out="_grn")
    q, r = divmod(n, k)
    big = r * (q + 1)  # rows covered by the ceil-sized buckets
    rn = F.col("_grn")
    bucket = F.when(
        rn <= big, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(
        # greatest() keeps the eagerly-evaluated branch legal when
        # q == 0 (then big == n and this branch is never selected)
        r + F.floor((rn - big - 1) / F.greatest(F.lit(q), F.lit(1))) + 1)
    return (ranked.withColumn(out, bucket.cast("bigint"))
            .drop("_grn"))


def distributed_group_ntile(df, group_cols, order_cols, k,
                            out="bucket"):
    """Exact ``NTILE(k) OVER (PARTITION BY group_cols ORDER BY
    order_cols)`` without ANY window operator: one global two-phase
    rank over ``group_cols + order_cols`` (groups are contiguous
    under that total order), then each group's first global rank and
    size come from ONE aggregation row per group, joined back so the
    within-group rank is ``grn - first + 1`` and the NTILE bucket is
    pure per-row column math.  Data-sized state never concentrates:
    the heaviest group still spreads over the range partitioning, and
    the stats join keys on the group columns (AQE broadcasts it when
    the group count is small)."""
    k = int(k)
    if k < 1:
        raise ValueError("k must be >= 1")
    group_cols, order_cols = list(group_cols), list(order_cols)
    ranked, _ = global_row_number(df, group_cols + order_cols,
                                  out="_ggrn")
    stats = ranked.groupBy(*group_cols).agg(
        F.min("_ggrn").alias("_g0"),
        F.count(F.lit(1)).alias("_gn"))
    j = ranked.join(stats, group_cols)
    rn = F.col("_ggrn") - F.col("_g0") + 1
    q = F.floor(F.col("_gn") / k).cast("bigint")
    r = (F.col("_gn") % k).cast("bigint")
    big = r * (q + 1)
    bucket = F.when(
        rn <= big, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(
        r + F.floor((rn - big - 1)
                    / F.greatest(q, F.lit(1))) + 1)
    return (j.withColumn(out, bucket.cast("bigint"))
            .drop("_ggrn", "_g0", "_gn"))
