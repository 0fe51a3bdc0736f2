"""Skew mitigation for low-cardinality / hot-key equi-joins.

At 100 TB a hash join whose key has few (or Zipf-hot) values sends every
row of a hot key through ONE shuffle partition — one straggler task does
all the work no matter how many executors exist.  ``salted_join`` breaks
each hot key into ``salt`` sub-buckets: the large side appends a
deterministic pseudo-random salt in ``[0, salt)``, the small side is
exploded ``salt``× so every ``(key, salt_i)`` bucket still finds its
match.  Result set is identical to the plain join; only the shuffle
distribution changes (hot key fan-out: 1 → ``salt`` tasks).

This complements (not replaces) AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``): AQE splits oversized *sort-merge*
partitions after the map stage, but cannot split a single hot key that
hashes to one reducer for hash aggregation or broadcast-ineligible
joins; salting fixes the key distribution itself.

No analogue in the reference — its single-process dask scheduler never
shuffles (SURVEY.md §6 scale rules are ours alone).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_key"]

SALT_COL = "__dgs_salt"


def salted_key(*cols, salt=16):
    """Deterministic salt in [0, salt): hash of row-identity columns.

    Using content columns (not ``rand()``) keeps the plan deterministic
    and re-runnable; any column set that varies within a hot key works
    (a row id, a timestamp, the payload).
    """
    return F.pmod(F.hash(*[F.col(c) if isinstance(c, str) else c
                           for c in cols]), F.lit(int(salt)))


def salted_join(large, small, on, salt_by, how="inner", salt=16):
    """Equi-join ``large ⋈ small`` on column(s) ``on``, salting the
    large (skewed) side by ``salt_by`` identity columns.

    ``small`` is exploded ``salt``× (fine: it is the small side) so each
    ``(key, salt_i)`` pair exists; the join then shuffles on
    ``(key, salt)`` — ``salt`` reducers per hot key instead of one.
    Output columns = large's columns + small's non-key columns, exactly
    like ``large.join(small, on, how)``.
    """
    if isinstance(on, str):
        on = [on]
    n = int(salt)
    l = large.withColumn(SALT_COL, salted_key(*salt_by, salt=n))
    s = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n)])))
    out = l.join(s, on + [SALT_COL], how)
    return out.drop(SALT_COL)
