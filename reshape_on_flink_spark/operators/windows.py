"""Window-assigner operators beyond Spark's built-ins.

Spark covers tumble/hop/session (`F.window`, `F.session_window`). The
reference additionally ships CUMULATE — growing windows that share a max
window (flink-table-runtime-blink
`operators/window/slicing/SliceAssigners.java:93`, CumulativeSliceAssigner)
— used for "running totals that reset every hour/day" dashboards.

Design: CUMULATE(max, step) assigns each event to the slices
``[ws, ws + k·step)`` for k = ceil(offset/step) .. max/step, where
``ws = floor(t / max)·max``. We expand each row into its slice memberships
with a literal array + explode, then let the caller aggregate. This is the
same expansion Flink performs via slice sharing, expressed relationally:
one narrow Expand (factor = max/step) followed by one shuffle on the
window key — no state, no UDFs, scales linearly in input size.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def parse_duration(text: str) -> int:
    """'15 minutes' -> 900 (seconds)."""
    m = re.fullmatch(r"\s*(\d+)\s+(\w+)\s*", text)
    if not m or m.group(2) not in _UNITS:
        raise ValueError(f"unsupported duration: {text!r}")
    return int(m.group(1)) * _UNITS[m.group(2)]


def epoch_seconds(ts: str | Column) -> Column:
    """Exact integer micros -> fractional-second-safe epoch (µs precision)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c)


def cumulate(df: DataFrame, ts_col: str, *, max_size: str, step: str) -> DataFrame:
    """Assign each row to its CUMULATE slices.

    Returns ``df`` plus ``window_start`` / ``window_end`` (epoch seconds,
    BIGINT) with one output row per covering slice. Aggregate the result by
    (window_start, window_end) for Flink's CUMULATE TVF semantics.
    """
    max_s = parse_duration(max_size)
    step_s = parse_duration(step)
    if max_s % step_s != 0:
        raise ValueError("max_size must be a multiple of step")
    n_slices = max_s // step_s

    us = epoch_seconds(ts_col)  # µs, exact bigint
    ws = (us / F.lit(1_000_000 * max_s)).cast("bigint") * max_s  # floor: us >= 0
    df = df.withColumn("window_start", ws)
    df = df.withColumn("_slice_k", F.explode(F.array(*[F.lit(k) for k in range(1, n_slices + 1)])))
    df = df.withColumn("window_end", F.col("window_start") + F.col("_slice_k") * step_s)
    # event belongs to slice k iff t < ws + k*step  (exact µs comparison)
    df = df.where(us < F.col("window_end") * F.lit(1_000_000))
    return df.drop("_slice_k")


def count_tumble(
    df,
    n: int,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
):
    """Batch form of countWindow(n) (GlobalWindows + CountTrigger.of(n),
    streaming form streaming/triggers.count_window_agg): every COMPLETE
    window of ``n`` records per key in ``order_cols`` order ->
    (key, window_seq, n_rows, sum_value). Partial tails never emit,
    exactly like the trigger. One window function + one keyed agg."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy(key_col).orderBy(*order_cols)
    seq = F.floor((F.row_number().over(w) - 1) / n).cast("long")
    return (
        df.withColumn("window_seq", seq)
        .groupBy(key_col, "window_seq")
        .agg(F.count("*").alias("n_rows"), F.sum(value_col).alias("sum_value"))
        .where(F.col("n_rows") == n)
    )
