"""Streaming OVER aggregates + temporal join + late-data side outputs —
the SURVEY.md §4.3 gaps Spark has no built-in for.

Reference:
- streaming OVER: ``StreamExecOverAggregate.java`` with
  ``RowTimeRowsBoundedPrecedingFunction`` /
  ``*UnboundedPrecedingFunction`` (per-key ordered state + timers).
- temporal join: ``TemporalRowTimeJoinOperator.java:78`` (latest version
  at or before row time).
- late data: ``WindowedStream.java:108-116`` (allowedLateness +
  sideOutputLateData).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def running_over_agg(events: DataFrame) -> DataFrame:
    """Streaming ``SUM(value) OVER (PARTITION BY user_id ORDER BY ts ROWS
    UNBOUNDED PRECEDING)`` — emits each event with its running per-key
    sum and count.

    Implementation: ``applyInPandasWithState`` keyed on user_id; state
    holds (running_count, running_sum); each micro-batch sorts its rows
    by (ts, event_id) and folds them onto the state — the reference's
    per-key ordered-state design, with the micro-batch as the mini-batch.

    Correctness contract: equals the batch window aggregate when rows
    arrive in event-time order across batches (the replay harness
    guarantees this; out-of-order arrivals would need the reference's
    row-time buffering + timers, i.e. a watermark-delayed emit — a
    documented divergence).

    State size: O(1) per key — 100 TB-safe.
    """
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("running_n", LongType()),
            StructField("running_sum", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def fold(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # cumulative over exact cents to keep stream == batch bit-wise
            cents = (pdf["value"] * 100).round().astype("int64")
            run_cents = cents.cumsum() + int(round(s * 100))
            out = pd.DataFrame(
                {
                    "user_id": pdf["user_id"].values,
                    "event_id": pdf["event_id"].values,
                    "ts": pdf["ts"].values,
                    "running_n": (pd.RangeIndex(1, len(pdf) + 1) + n).astype("int64"),
                    "running_sum": run_cents / 100.0,
                }
            )
            n += len(pdf)
            s = float(run_cents.iloc[-1]) / 100.0 if len(pdf) else s
            yield out
        state.update((n, s))

    return events.select("user_id", "event_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append", "NoTimeout"
    )


def temporal_join(events: DataFrame, versioned_dim: DataFrame, *, key: str, time_col: str, dim_time_col: str, dim_payload: list[str]):
    """Streaming temporal (versioned) join: each event joins the dim
    version valid at its event time (``FOR SYSTEM_TIME AS OF``).

    Returns a function for ``foreachBatch``-style composition: the engine
    applies the batch as-of join per micro-batch against the (slowly
    changing) versioned dim — Spark re-reads the static side each batch,
    which is exactly the lookup-join refresh semantics of the reference's
    CommonExecLookupJoin + temporal table combination.
    """
    from reshape_on_flink_spark.operators.joins import asof_join

    def join_batch(batch_df: DataFrame) -> DataFrame:
        return asof_join(
            batch_df,
            versioned_dim,
            key=key,
            left_time=time_col,
            right_time=dim_time_col,
            right_payload=dim_payload,
            strict=False,  # version AT the event time is valid
        )

    return join_batch


def _event_us(col) -> F.Column:
    """Event time as epoch micros, tolerant of TIMESTAMP_NTZ columns
    (parquet micros without UTC adjustment read as NTZ; ``unix_micros``
    only accepts LTZ). The cast is a no-op on LTZ and interprets NTZ in
    the session timezone — a constant offset that cancels out of every
    lateness comparison because the watermark derives from the same
    mapping."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def split_late(events: DataFrame, *, ts_col: str = "ts", lateness_seconds: int = 600) -> DataFrame:
    """Late-data side output (allowedLateness + sideOutputLateData
    analog): tags each row ``is_late`` relative to the maximum event time
    seen so far *within its micro-batch partition* minus the allowed
    lateness. Spark exposes no cross-batch watermark to transformations,
    so this is the per-batch approximation; route is_late rows to a
    side sink with ``foreachBatch`` + two filtered writes.
    """
    w_max = F.max(F.col(ts_col)).over(W.partitionBy(F.lit(1)))
    # streaming DataFrames forbid unbounded windows; compute per batch in
    # foreachBatch instead — provided here for the batch/foreachBatch path
    return events.withColumn(
        "is_late",
        _event_us(F.col(ts_col))
        < _event_us(w_max) - F.lit(lateness_seconds * 1_000_000),
    )


def temporal_sort(
    events: DataFrame,
    sink,
    checkpoint: str,
    pending_dir: str,
    *,
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
    delay_seconds: int = 0,
):
    """Streaming temporal sort — event-time ordered emit per watermark
    advance (reference ``StreamExecTemporalSort`` /
    ``RowTimeSortOperator.java``: buffer rows in state, register an
    event-time timer, on watermark emit every buffered row with
    timestamp <= watermark in timestamp order).

    Spark mapping: ``foreachBatch`` with a parquet-backed pending buffer.
    Each micro-batch (1) unions the new rows with the pending buffer,
    (2) advances the watermark to max event time seen in *completed*
    batches minus ``delay_seconds`` (the bounded-out-of-orderness bound),
    (3) emits rows at-or-below the watermark to ``sink(df)`` globally
    sorted by (ts, tiebreak), and (4) writes the remainder back as the
    new pending buffer. Ordering contract (same as the reference): when
    actual out-of-orderness <= ``delay_seconds``, emission is totally
    ordered across calls (the watermark is monotone, so call k's rows
    all sort <= call k+1's). A row later than that bound emits on
    arrival — the analog of RowTimeSortOperator's immediately-firing
    timer for a timestamp already below the watermark.

    Crash safety (the PartialUpsertSink pointer pattern): each batch
    writes its new pending buffer to an epoch-versioned directory
    (``v<batch_id>`` — a replayed epoch overwrites its own dir,
    idempotent), then commits (watermark, version) with ONE atomic
    ``os.replace`` of the ``CURRENT`` pointer. A crash at any instant
    leaves either the old committed (buffer, watermark) pair or the new
    one; a replayed already-committed epoch is skipped. Emission to
    ``sink`` happens before the commit point, so a crash inside the
    window re-emits that batch's ready rows on replay — at-least-once to
    the sink, the same contract as Flink's non-transactional sinks
    (pair with an idempotent sink for effectively-exactly-once).

    100 TB: the buffer holds only rows above the watermark (bounded by
    out-of-orderness x input rate, the reference's state bound); the
    per-batch sort is a distributed range-partition sort, and the only
    driver state is the (watermark, version) pointer.
    """
    step = temporal_sort_step(
        sink, checkpoint, pending_dir,
        ts_col=ts_col, tiebreak=tiebreak, delay_seconds=delay_seconds,
    )
    return (
        events.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def temporal_sort_step(
    sink,
    checkpoint: str,
    pending_dir: str,
    *,
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
    delay_seconds: int = 0,
):
    """The foreachBatch function behind :func:`temporal_sort`, exposed so
    the replay/commit-point behavior is directly testable."""
    import json
    import os
    import shutil

    tiebreak = tiebreak or []
    os.makedirs(pending_dir, exist_ok=True)
    current = os.path.join(pending_dir, "CURRENT")

    def read_pointer() -> dict:
        if not os.path.exists(current):
            return {"wm_us": None, "epoch": -1, "last_bid": None, "ckpt": None}
        with open(current) as fh:
            return json.load(fh)

    def step(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        p = read_pointer()
        # batch ids are only comparable within one checkpoint's id-space:
        # same checkpoint + batch_id already committed => epoch replay
        # (crash between the pointer commit and Spark's offset commit).
        # A different checkpoint is a NEW query resuming the persisted
        # buffer/watermark — its ids restart at 0 and must not be skipped.
        if p["ckpt"] == checkpoint and p["last_bid"] is not None and batch_id <= p["last_bid"]:
            return
        wm_prev, epoch = p["wm_us"], p["epoch"] + 1
        ts_us = _event_us(ts_col)
        full = batch_df
        cur_dir = os.path.join(pending_dir, f"v{p['epoch']}")
        if p["epoch"] >= 0 and os.path.exists(cur_dir):
            full = batch_df.unionByName(spark.read.parquet(cur_dir))
        full = full.persist()
        from pyspark.sql import Observation

        obs = Observation()
        observed = full.observe(obs, F.max(ts_us).alias("m"))
        try:
            # the watermark bound stays IN-PLAN as a broadcast 1-row
            # aggregate; the driver's copy (for the pointer commit) rides
            # the pending write as an observed metric — no standalone
            # max-collect job per batch
            bound = full.agg(
                F.greatest(F.max(ts_us), F.lit(wm_prev).cast("long")).alias("_wm")
            )
            cut = F.col("_wm") - F.lit(delay_seconds * 1_000_000)
            # epoch-versioned buffer: a crashed attempt of this epoch left
            # v{epoch} behind; overwrite makes the retry idempotent
            nxt_dir = os.path.join(pending_dir, f"v{epoch}")
            (
                observed.crossJoin(F.broadcast(bound))
                .where(ts_us > cut)
                .drop("_wm")
                .write.mode("overwrite")
                .parquet(nxt_dir)
            )
            mx = obs.get["m"]
            wm_us = max(wm_prev or 0, int(mx)) if mx is not None else wm_prev
            if wm_us is None:  # no data ever seen: nothing to commit
                shutil.rmtree(nxt_dir, ignore_errors=True)
                return
            ready = (
                full.crossJoin(F.broadcast(bound))
                .where(ts_us <= cut)
                .drop("_wm")
                .orderBy(ts_col, *tiebreak)
            )
            sink(ready)
            tmp = current + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {"wm_us": wm_us, "epoch": epoch, "last_bid": batch_id, "ckpt": checkpoint},
                    fh,
                )
            os.replace(tmp, current)  # the commit point
            if p["epoch"] >= 0 and os.path.exists(cur_dir):
                shutil.rmtree(cur_dir, ignore_errors=True)  # best-effort GC
        finally:
            full.unpersist()

    return step


def late_data_router(
    events: DataFrame,
    on_time_sink,
    late_sink,
    checkpoint: str,
    *,
    ts_col: str = "ts",
    lateness_seconds: int = 600,
):
    """allowedLateness + sideOutputLateData, cross-batch (reference
    WindowedStream.java:108-116): maintains the Flink watermark contract
    — max event time seen in *completed* micro-batches minus allowed
    lateness — and routes each batch's rows to ``on_time_sink(df)`` or
    ``late_sink(df)`` accordingly.

    Unlike split_late (per-batch approximation for pure-DataFrame
    pipelines), this sees the true cross-batch watermark via foreachBatch
    driver state. Divergence from Flink: the watermark resets on query
    restart (persist it next to the checkpoint for exactly-Flink
    behavior); window operators downstream still use Spark's own
    watermark. Returns the StreamingQuery.

    100 TB: the routing is two filtered writes per batch — no extra
    shuffle; the driver holds one long per query, nothing per key.
    """
    state = {"wm_us": None}
    late_bound_us = lateness_seconds * 1_000_000

    def route(batch_df, _batch_id: int):
        from pyspark.sql import Observation

        # the watermark max rides the sink job as an observed metric —
        # no separate driver job per batch. Contract: the sinks must
        # consume their DataFrame (every Flink-style sink does); the
        # observation resolves on the first such action.
        obs = Observation()
        ts_us = _event_us(ts_col)
        batch_df = batch_df.observe(obs, F.max(ts_us).alias("m")).persist()
        try:
            wm = state["wm_us"]
            if wm is None:
                on_time, late = batch_df, batch_df.where(F.lit(False))
            else:
                cut = wm - late_bound_us
                on_time = batch_df.where(ts_us >= F.lit(cut))
                late = batch_df.where(ts_us < F.lit(cut))
            on_time_sink(on_time)
            late_sink(late)
            mx = obs.get["m"]
            if mx is not None:
                state["wm_us"] = max(state["wm_us"] or 0, int(mx))
        finally:
            batch_df.unpersist()

    return (
        events.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
