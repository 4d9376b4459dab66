"""Trigger/evictor parity: count windows, delta trigger, count evictor.

Reference: flink-streaming-java/.../windowing/triggers/ (CountTrigger,
DeltaTrigger, ContinuousProcessingTimeTrigger, ...) and evictors/
(CountEvictor). Spark's Structured Streaming has exactly one trigger —
the watermark — so these are genuine engine gaps (SURVEY §2.9) filled
with stateful operators:

- **count_window_agg** = GlobalWindows + CountTrigger(n) + sum/count
  aggregate (Flink's ``keyedStream.countWindow(n)``): every n-th record
  per key closes a window and emits its aggregate. State per key is
  O(1): (records_so_far, partial sum) — no row buffer.
- **delta_trigger_agg** = DeltaTrigger(threshold): a baseline value per
  key; each arriving record whose |value − baseline| > threshold fires
  (emits the record) and becomes the new baseline.
- **count_evictor**: keep only the last ``n`` rows of each window before
  aggregating — expressed relationally (row_number desc ≤ n), usable in
  batch and in foreachBatch streaming.
- **time_evictor** / **delta_evictor**: the remaining two reference
  evictor classes (TimeEvictor, DeltaEvictor), same relational shape —
  a max/last-over-window against each row instead of a state buffer.
- ContinuousProcessingTimeTrigger / early-fire ≡ Spark update output
  mode + ``trigger(processingTime=...)`` — native, no code needed
  (documented mapping, COVERAGE §2.9).

Determinism: arrival order within a micro-batch is made explicit by
``order_cols`` (sorted inside the operator); across micro-batches it is
batch order, as in any streaming engine. 100 TB: one shuffle on the key,
O(1) state per key, emission rate 1/n of input — no buffering anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def count_window_agg(
    events: DataFrame,
    n: int = 5,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """(key, window_seq, sum_value) for every COMPLETE window of ``n``
    records per key, in arrival order. Partial windows never emit
    (CountTrigger fires only at size n)."""
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("window_seq", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_seen", LongType()),
            StructField("partial_sum", DoubleType()),
            StructField("next_seq", LongType()),
        ]
    )

    def fire(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n_seen, partial, seq = state.get if state.exists else (0, 0.0, 0)
        out_seq, out_sum = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(list(order_cols))
            for v in pdf[value_col].to_numpy():
                partial += float(v)
                n_seen += 1
                if n_seen == n:
                    out_seq.append(seq)
                    out_sum.append(partial)
                    seq += 1
                    n_seen, partial = 0, 0.0
        state.update((n_seen, partial, seq))
        yield pd.DataFrame(
            {key_col: [key[0]] * len(out_seq), "window_seq": out_seq, "sum_value": out_sum}
        )

    cols = [key_col, value_col, *order_cols]
    return (
        events.select(*dict.fromkeys(cols))
        .groupBy(key_col)
        .applyInPandasWithState(fire, out_schema, state_schema, "append", "NoTimeout")
    )


def delta_trigger_agg(
    events: DataFrame,
    threshold: float,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Rows that fire a DeltaTrigger: first record per key sets the
    baseline (no fire); each later record with |v − baseline| > threshold
    fires (is emitted) and resets the baseline."""
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("event_id", LongType()),
            StructField("fired_value", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("baseline", DoubleType())])

    def fire(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        baseline = state.get[0] if state.exists else None
        out_id, out_v = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(list(order_cols))
            for eid, v in zip(pdf["event_id"].to_numpy(), pdf[value_col].to_numpy()):
                v = float(v)
                if baseline is None:
                    baseline = v
                elif abs(v - baseline) > threshold:
                    out_id.append(int(eid))
                    out_v.append(v)
                    baseline = v
        state.update((baseline,))
        yield pd.DataFrame(
            {key_col: [key[0]] * len(out_id), "event_id": out_id, "fired_value": out_v}
        )

    cols = [key_col, "event_id", value_col, *order_cols]
    return (
        events.select(*dict.fromkeys(cols))
        .groupBy(key_col)
        .applyInPandasWithState(fire, out_schema, state_schema, "append", "NoTimeout")
    )


def count_evictor(
    df: DataFrame,
    window_cols: list[str],
    order_cols: list[str],
    keep_last_n: int,
) -> DataFrame:
    """CountEvictor.of(n): retain only the last ``n`` rows (by
    ``order_cols``) of every window group before aggregation. Relational
    form — one window function, no state; Flink's evictor buffers the
    whole window in state to do the same."""
    w = W.partitionBy(*window_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn_desc", F.row_number().over(w))
        .where(F.col("_rn_desc") <= keep_last_n)
        .drop("_rn_desc")
    )


def time_evictor(
    df: DataFrame,
    window_cols: list[str],
    ts_col: str,
    keep_seconds: float,
) -> DataFrame:
    """TimeEvictor.of(Time.seconds(keep)): evict rows whose timestamp is
    ``<= max(ts in window) - keep`` (reference TimeEvictor.java:69-82 —
    current_time is the window buffer's max timestamp, eviction is
    inclusive at the cutoff). Relational: one max-over-window, no state.

    ``ts_col`` may be a TIMESTAMP (keep_seconds in seconds) or a numeric
    column (keep_seconds in the column's own units)."""
    is_ts = dict(df.dtypes)[ts_col].startswith("timestamp")
    ts = F.unix_micros(F.col(ts_col)) if is_ts else F.col(ts_col).cast("long")
    span = int(keep_seconds * 1_000_000) if is_ts else int(keep_seconds)
    cutoff = F.max(ts).over(W.partitionBy(*window_cols)) - F.lit(span)
    return (
        df.withColumn("_keep", ts > cutoff).where(F.col("_keep")).drop("_keep")
    )


def delta_evictor(
    df: DataFrame,
    window_cols: list[str],
    order_cols: list[str],
    value_col: str,
    threshold: float,
    delta_fn=None,
) -> DataFrame:
    """DeltaEvictor.of(threshold, delta): evict every row whose
    ``delta(row, LAST row of the window buffer) >= threshold``
    (reference DeltaEvictor.java:74-83). Default delta is absolute
    difference on ``value_col``; pass ``delta_fn(col, last_col) ->
    Column`` for a custom DeltaFunction. Relational: one last-over-window
    against each row, no state."""
    w = (
        W.partitionBy(*window_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    last_v = F.last(value_col).over(w)
    delta = (
        delta_fn(F.col(value_col), last_v)
        if delta_fn is not None
        else F.abs(F.col(value_col) - last_v)
    )
    return (
        df.withColumn("_keep", delta < threshold).where(F.col("_keep")).drop("_keep")
    )
