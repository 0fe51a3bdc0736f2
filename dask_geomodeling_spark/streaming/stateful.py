"""Custom stateful streaming operator via ``applyInPandasWithState``.

``RunningAggregate`` keeps (count, sum) state per key and emits every
event annotated with its running count / running sum in event-time
order — the canonical "custom state machine" shape that windowed
aggregation cannot express (output is per-EVENT, state never closes).

Two execution paths, one semantics:

- **streaming**: ``applyInPandasWithState`` (Arrow-batched, partitioned
  by key, state store persisted in the checkpoint) — state survives
  across micro-batches, so a key's running totals continue where the
  previous batch left off.
- **batch**: the identical result from a cumulative window frame
  (rows between unbounded preceding and current row) — pure Catalyst,
  whole-stage-codegen'd, and the form the DuckDB oracle checks.

Scale notes (SURVEY.md §6): state is hash-partitioned by key across
executors; per-key state is two scalars, so 10⁹ users ≈ tens of GB
spread over the cluster's state stores.  The batch path shuffles once
on the key and sorts within partitions — no driver collection.

No analogue in the reference (its temporal ops are batch snapshots —
raster/temporal.py); this is a first-class extension (SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dask_geomodeling_spark.core.blocks import Block

__all__ = ["RunningAggregate"]

_STATE_SCHEMA = "cnt long, total string"


def _out_schema(key_col, time_col, id_col, value_col):
    return ("{k} bigint, {t} timestamp, {i} bigint, {v} double, "
            "running_n bigint, running_sum double").format(
                k=key_col, t=time_col, i=id_col, v=value_col)


def _make_update_fn(key_col, time_col, id_col, value_col):
    """Stateful per-key update: fold the batch's rows (event-time order)
    into (cnt, total) carried across micro-batches."""

    def update(key, pdf_iter, state):
        import decimal

        import pandas as pd

        # mirror the batch path's DECIMAL(28,6) accumulation exactly:
        # each addend rounds to 6 dp (HALF_UP, like Spark's cast), the
        # running total stays exact, the emitted value is its double
        q = decimal.Decimal("0.000001")
        if state.exists:
            cnt, total_str = state.get
            total = decimal.Decimal(total_str)
        else:
            cnt, total = 0, decimal.Decimal(0)
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values([time_col, id_col],
                                ignore_index=True)
        ns, sums = [], []
        for v in rows[value_col]:
            cnt += 1
            total += decimal.Decimal(repr(float(v))).quantize(
                q, rounding=decimal.ROUND_HALF_UP)
            ns.append(cnt)
            sums.append(float(total))
        state.update((cnt, str(total)))
        out = rows[[time_col, id_col, value_col]].copy()
        out.insert(0, key_col, key[0])
        out["running_n"] = ns
        out["running_sum"] = sums
        yield out

    return update


class RunningAggregate(Block):
    """Per-key running count/sum over event-time order (custom stateful
    op; streaming = applyInPandasWithState, batch = cumulative window).

    Emits one row per input event: key, time, id, value, running_n,
    running_sum.
    """

    def __init__(self, source, key_column="user_id", time_column="ts",
                 id_column="event_id", value_column="value"):
        if not isinstance(source, Block):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, key_column, time_column, id_column,
                         value_column)

    def _build(self, ctx):
        source, key_col, time_col, id_col, value_col = self.args
        df = source._build(ctx)
        cols = [key_col, time_col, id_col, value_col]
        df = df.select(*cols)
        if df.isStreaming:
            from pyspark.sql.streaming.state import GroupStateTimeout
            return (df.groupBy(key_col).applyInPandasWithState(
                _make_update_fn(key_col, time_col, id_col, value_col),
                outputStructType=_out_schema(key_col, time_col, id_col,
                                             value_col),
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
        # batch parity: cumulative frame in event-time order; the sum
        # accumulates sequentially per key in both engines, and goes
        # through DECIMAL so the running value is order-exact
        w = (Window.partitionBy(key_col).orderBy(time_col, id_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return df.select(
            key_col, time_col, id_col, value_col,
            F.count(F.lit(1)).over(w).alias("running_n"),
            F.sum(F.col(value_col).cast("decimal(28,6)")).over(w)
             .cast("double").alias("running_sum"))
