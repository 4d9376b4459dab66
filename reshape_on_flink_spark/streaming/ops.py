"""Streaming operators: windows, dedup, interval join, lookup join, top-N.

Each function takes a *streaming* DataFrame and returns the transformed
streaming DataFrame (start it with writeStream yourself, or use the test
harness). Correctness contract: for every operator here, the
batch-expressed query in ``queries/streaming_batch.py`` computes the same
result on the full input — asserted stream-vs-batch in
tests/test_streaming.py (stream-batch unification is the oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reshape_on_flink_spark.queries.numeric import dsum

# ---------------------------------------------------------------------------
# State TTL — reference StateTtlConfig (flink-core/.../state/
# StateTtlConfig.java: newBuilder(ttl).setUpdateType(OnCreateAndWrite)
# .setStateVisibility(NeverReturnExpired)). The Spark analog maps TTL to
# a GroupState processing-time timeout: every write re-arms the timeout,
# and the timeout callback clears the key's state, so an expired key is
# never read again (NeverReturnExpired) and restarts fresh on its next
# event. Works on any applyInPandasWithState operator via apply_with_ttl.
# ---------------------------------------------------------------------------


class StateTtl:
    """Per-operator keyed-state time-to-live.

    Supported knobs mirror the reference defaults: update type
    ``OnCreateAndWrite`` (each write re-arms; ``OnReadAndWrite`` is
    meaningless here because a keyed invocation without data never
    happens outside the timeout callback) and visibility
    ``NeverReturnExpired`` (expiry physically removes the state).
    TTL time is processing time, as in the reference's only supported
    ``TtlTimeCharacteristic.ProcessingTime``."""

    def __init__(self, ttl_ms: int, update_type: str = "OnCreateAndWrite",
                 visibility: str = "NeverReturnExpired"):
        if ttl_ms <= 0:
            raise ValueError("ttl_ms must be positive")
        if update_type != "OnCreateAndWrite":
            raise NotImplementedError(
                "only OnCreateAndWrite is supported (reads outside the "
                "data path don't exist in the GroupState model)"
            )
        if visibility != "NeverReturnExpired":
            raise NotImplementedError(
                "only NeverReturnExpired is supported (expiry removes state)"
            )
        self.ttl_ms = int(ttl_ms)


def apply_with_ttl(grouped, func, out_schema, state_schema, output_mode,
                   ttl: "StateTtl | None"):
    """``applyInPandasWithState`` with an optional per-key TTL.

    Without ``ttl`` this is the plain NoTimeout call. With it, the
    stateful function is wrapped so that (a) a fired timeout clears the
    key's state and emits nothing, and (b) every invocation that leaves
    state behind re-arms a processing-time timeout of ``ttl.ttl_ms``."""
    if ttl is None:
        return grouped.applyInPandasWithState(
            func, out_schema, state_schema, output_mode, "NoTimeout"
        )

    def wrapped(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        yield from func(key, pdfs, state)
        if state.exists:
            state.setTimeoutDuration(ttl.ttl_ms)

    return grouped.applyInPandasWithState(
        wrapped, out_schema, state_schema, output_mode, "ProcessingTimeTimeout"
    )


# ---------------------------------------------------------------------------
# Windowed aggregation — reference StreamExecGroupWindowAggregate /
# SlicingWindowOperator. Watermark == BoundedOutOfOrdernessWatermarks.
# ---------------------------------------------------------------------------


def tumble_agg(
    events: DataFrame, *, size: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(F.unix_timestamp("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


def hop_agg(
    events: DataFrame,
    *,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(F.unix_timestamp("w.start").alias("ws"), "n", "sum_value")
    )


def session_agg(
    events: DataFrame, *, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.floor(F.unix_micros("w.start") / 1_000_000).cast("bigint").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def cumulate_agg(
    events: DataFrame,
    *,
    max_size: str = "1 hour",
    step: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming CUMULATE — growing windows sharing a max window
    (reference SliceAssigners.java:93, CumulativeSliceAssigner; the
    reference's slicing window operator is streaming-first).

    Spark-first slice sharing: ONE stateful aggregation keyed on the
    native event-time ``window(ts, max_size)`` — so state is
    watermark-purged and append mode works — computing per-slice
    *conditional* partial aggregates (slice k counts only rows with
    ``ts < window_start + k*step``); the per-slice rows are exploded
    AFTER the aggregation. Compared to the batch explode plan
    (operators/windows.cumulate), the shuffle carries 1/n_slices the
    rows: the expansion happens on aggregated state, not events.

    Output matches queries/streaming_batch.q_cumulate_window:
    (ws, we, n, sum_value), slices with no events omitted.
    """
    from reshape_on_flink_spark.operators.windows import parse_duration
    from reshape_on_flink_spark.queries.numeric import dec

    max_s = parse_duration(max_size)
    step_s = parse_duration(step)
    if max_s % step_s != 0:
        raise ValueError("max_size must be a multiple of step")
    n_slices = max_s // step_s

    us = F.unix_micros(F.col("ts"))
    ws = (us / F.lit(1_000_000 * max_s)).cast("bigint") * max_s
    in_slice = [
        us < (ws + F.lit(k * step_s)) * F.lit(1_000_000) for k in range(1, n_slices + 1)
    ]
    pre = events.withWatermark("ts", watermark).select(
        "ts",
        *[F.when(c, F.lit(1)).otherwise(F.lit(0)).alias(f"_c{k}") for k, c in enumerate(in_slice)],
        *[F.when(c, dec("value")).alias(f"_v{k}") for k, c in enumerate(in_slice)],
    )
    agg = pre.groupBy(F.window("ts", f"{max_s} seconds").alias("w")).agg(
        *[F.sum(f"_c{k}").alias(f"_n{k}") for k in range(n_slices)],
        *[F.sum(f"_v{k}").cast("double").alias(f"_s{k}") for k in range(n_slices)],
    )
    slices = F.array(
        *[
            F.struct(
                F.lit(k + 1).alias("k"),
                F.col(f"_n{k}").alias("n"),
                F.col(f"_s{k}").alias("s"),
            )
            for k in range(n_slices)
        ]
    )
    return (
        agg.select(F.unix_timestamp("w.start").alias("ws"), F.explode(slices).alias("sl"))
        .select(
            "ws",
            (F.col("ws") + F.col("sl.k") * F.lit(step_s)).alias("we"),
            F.col("sl.n").alias("n"),
            F.col("sl.s").alias("sum_value"),
        )
        .where(F.col("n") > 0)
    )


# ---------------------------------------------------------------------------
# Dedup — reference StreamExecDeduplicate (keep-first / keep-last).
# ---------------------------------------------------------------------------


def dedup_keep_first(events: DataFrame, keys: list[str]) -> DataFrame:
    """Global keep-first-arrival per key (reference
    ProcTimeDeduplicateKeepFirstRowFunction without TTL): state holds one
    row per distinct key forever — use only when key cardinality is
    bounded; otherwise use dedup_keep_first_within_watermark."""
    return events.dropDuplicates(keys)


def dedup_keep_first_within_watermark(
    events: DataFrame, keys: list[str], *, watermark: str = "10 minutes"
) -> DataFrame:
    """Keep-first with watermark-bounded state (reference dedup with
    StateTtlConfig): duplicates are only suppressed when they arrive
    within the watermark delay of the kept row — at 100 TB/day the state
    store holds the watermark horizon, not history. The semantic
    difference from the global variant is intentional and documented."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def dedup_keep_last(
    events: DataFrame, keys: list[str], ttl: StateTtl | None = None
) -> DataFrame:
    """Keep-last has no built-in: emit per-key latest row each batch in
    update mode via stateful pandas (reference
    ProcTimeDeduplicateKeepLastRowFunction; ``ttl`` is the
    StateTtlConfig analog — idle keys are dropped after the TTL)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )

    def keep_last(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            row = pdf.iloc[-1]
            ts_us = int(row["ts"].value // 1000)
            if best is None or (ts_us, int(row["event_id"])) > (best[1], best[0]):
                best = (int(row["event_id"]), ts_us, str(row["event_type"]), float(row["value"]))
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [best[0]],
                "ts": [pd.Timestamp(best[1] * 1000)],
                "event_type": [best[2]],
                "value": [best[3]],
            }
        )

    return apply_with_ttl(
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id"),
        keep_last, out_schema, state_schema, "update", ttl,
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join — reference StreamExecIntervalJoin /
# TimeIntervalJoin.java: watermarks bound both sides' state.
# ---------------------------------------------------------------------------


def interval_join_views_purchases(
    events: DataFrame,
    *,
    bound_seconds: int = 600,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream time-interval join (reference
    StreamExecIntervalJoin / TimeIntervalJoin.java): views matched to
    purchases within (v_ts, v_ts + bound]. ``how='left_outer'`` emits
    unmatched views once the watermark closes their interval — the
    reference's outer interval join semantics, built into Spark's
    stream-stream join. Both sides' state is bounded by watermark +
    interval (state cleanup is automatic)."""
    v = (
        events.where(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id"))
        .withWatermark("v_ts", watermark)
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {bound_seconds} SECONDS")),
        how,
    ).select("user_id", "view_id", "purchase_id")


def lookup_join(events: DataFrame, dim: DataFrame, on_left: str, on_right: str) -> DataFrame:
    """Stream-static (lookup) join — reference CommonExecLookupJoin. The
    static side is re-read per micro-batch; broadcast keeps it off the
    shuffle path."""
    return events.join(F.broadcast(dim), F.col(on_left) == F.col(on_right), "left")


# ---------------------------------------------------------------------------
# Streaming Top-N — reference StreamExecRank (UpdatableTopNFunction):
# continuously-updated per-group top-k, emitted each micro-batch.
# ---------------------------------------------------------------------------


def streaming_topn_counts(
    events: DataFrame, k: int = 3, ttl: StateTtl | None = None
) -> DataFrame:
    """Running per-user event counts -> per-batch global top-k rows in
    update mode, via stateful pandas. Emits (user_id, n) for users whose
    count changed; the sink keeps the latest per user (top-k is then a
    trivial sort over ≤ distinct-user rows).

    ``ttl`` bounds per-key state lifetime (StateTtlConfig analog): a key
    idle longer than the TTL is dropped and restarts from zero on its
    next event — the reference's idle-state retention for unbounded
    keyspaces."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("n", LongType())]
    )
    state_schema = StructType([StructField("n", LongType())])

    def count_updates(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        add = 0
        for pdf in pdfs:
            add += len(pdf)
        n += add
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    return apply_with_ttl(
        events.groupBy("user_id"), count_updates, out_schema, state_schema,
        "update", ttl,
    )


# ---------------------------------------------------------------------------
# Async I/O — reference AsyncDataStream.unorderedWait
# (flink-streaming-java/.../AsyncDataStream.java:101-161): per-record async
# requests with bounded in-flight concurrency. Spark expression: an Arrow
# batch enters a mapInPandas stage that drives an asyncio event loop — the
# batch is the concurrency window, results are unordered within it.
# ---------------------------------------------------------------------------


def async_lookup(df: DataFrame, fetch_coro_factory, out_schema: str) -> DataFrame:
    """Async enrichment: ``fetch_coro_factory(row_dict) -> coroutine``
    returning a dict of extra columns; all requests in an Arrow batch run
    concurrently (asyncio.gather). Use for rate-limited external lookups
    where per-row sync calls would serialize the stage."""
    import asyncio

    async def _gather(rows):
        # gather must be created inside the running loop
        return await asyncio.gather(*[fetch_coro_factory(r) for r in rows])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = pdf.to_dict("records")
            extras = asyncio.run(_gather(rows))
            out = pdf.copy()
            if extras:
                for col in extras[0]:
                    out[col] = [e[col] for e in extras]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def allow_idle_sources(spark) -> None:
    """Watermark-idleness parity (reference WatermarksWithIdleness.java:
    an idle source stops holding back the operator watermark).

    Spark has no per-source idleness detection, but the same failure mode
    — one stalled input pinning the global watermark — is governed by
    ``spark.sql.streaming.multipleWatermarkPolicy``: the default ``min``
    blocks on the slowest input; ``max`` advances with the fastest, which
    is exactly the behavior Flink's idleness marker buys (at the same
    cost: late rows from the idle side may be dropped once it resumes).
    Behavioral test: tests/test_streaming.py::test_idle_source_policy.
    """
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")


def query_state(
    spark,
    checkpoint: str,
    *,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
    flatten: bool = True,
):
    """Queryable state — read a streaming job's keyed state directly
    from its checkpoint, live (any committed batch) or post-hoc.

    Reference parity: flink-queryable-state's QueryableStateClient
    (flink-queryable-state/flink-queryable-state-client-java/.../
    QueryableStateClient.java) serves point lookups against a running
    job's keyed state; Spark's State Reader (the ``statestore`` data
    source) exposes the same state as a DataFrame instead — scans,
    joins, and aggregations over operator state, not just point gets.
    ``batch_id`` time-travels to any retained checkpointed batch.

    Scale: the reader loads state-store files directly (one task per
    store partition) — no interaction with, or load on, the running
    query.
    """
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if operator_id:
        reader = reader.option("operatorId", operator_id)
    if store_name:
        reader = reader.option("storeName", store_name)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    key_cols = [f"key.{f}" for f in df.schema["key"].dataType.fieldNames()]
    val_cols = [f"value.{f}" for f in df.schema["value"].dataType.fieldNames()]
    return df.select(*key_cols, *val_cols, "partition_id")


def state_metadata(spark, checkpoint: str):
    """Operator/state-store inventory of a checkpoint (the discovery
    step before query_state): operator ids/names, store names, and the
    committed batch range per store."""
    return spark.read.format("state-metadata").load(checkpoint)


def streaming_passage_filter(
    docs: DataFrame, block: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming passage-level dedup: the batch operator's blocking stage
    (llm/dedup.passage_blocks — stateless narrow explode/slice, runs
    unchanged on a stream) feeding keep-first dedup state on the 16-byte
    ``block_hash``. Emits each surviving passage once, append mode.

    Semantic delta vs the batch ``passage_dedup`` (documented, tested):
    which OCCURRENCE survives follows arrival order, not the global
    (doc_id, block_idx) minimum — the surviving hash SET is identical,
    so corpus-level dedup effect matches; reassembly is left to the
    batch consumer of the emitted blocks. State = one row per distinct
    passage (the dedup-table growth any streaming exact-dedup carries);
    bound it operationally by keying state TTL on ingestion time when
    the corpus has one (dropDuplicatesWithinWatermark), exactly like
    ``dedup_keep_first_within_watermark``.
    """
    from reshape_on_flink_spark.llm.dedup import passage_blocks

    return passage_blocks(docs, block=block, text_col=text_col, id_col=id_col).dropDuplicates(
        ["block_hash"]
    )


def streaming_passage_dedup(
    docs: DataFrame, block: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming passage-level dedup with DETERMINISTIC claims — the
    surviving-block stream feeding :func:`reassemble_passages_batch`.

    Keyed on ``block_hash`` with first-claim state; within a batch the
    winner is the minimum (doc_id, block_idx) — the batch operator's
    global tie-break — so the stream equals batch whenever replay is
    doc-ordered (across batches, arrival order decides: the documented
    streaming delta shared with streaming_passage_filter).

    State = one claim row per distinct passage; bound it with StateTtl
    via apply_with_ttl when ingestion time is available.
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from reshape_on_flink_spark.llm.dedup import passage_blocks

    blocks = passage_blocks(docs, block=block, text_col=text_col, id_col=id_col)
    surv_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("block_idx", LongType()),
            StructField("n_total", LongType()),
            StructField("block_text", StringType()),
        ]
    )
    claim_schema = StructType([StructField("claimed", LongType())])

    def keep_first(key, pdfs, state):
        if state.exists:
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        row = pdf.sort_values(["doc_id", "block_idx"]).iloc[0]
        state.update((1,))
        yield pd.DataFrame(
            {
                "doc_id": [int(row["doc_id"])],
                "block_idx": [int(row["block_idx"])],
                "n_total": [int(row["n_total"])],
                "block_text": [str(row["block_text"])],
            }
        )

    return blocks.groupBy("block_hash").applyInPandasWithState(
        keep_first, surv_schema, claim_schema, "append", "NoTimeout"
    )


def reassemble_passages_batch(survivors: DataFrame) -> DataFrame:
    """Batch reassembly of surviving passages -> (doc_id, n_total,
    n_kept, clean_text) — the same group-and-sort the batch operator
    runs (llm/dedup.passage_dedup's second stage)."""
    ordered = F.array_sort(F.collect_list(F.struct("block_idx", "block_text")))
    return survivors.groupBy("doc_id", "n_total").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(ordered, lambda s: s["block_text"]), " "
        ).alias("clean_text"),
    )


def streaming_passage_dedup_query(
    docs: DataFrame,
    checkpoint: str,
    sink_fn,
    block: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The full streaming passage-dedup + reassembly pipeline as ONE
    query: stage 1 is the stateful claim operator, stage 2 runs
    per-micro-batch via ``foreachBatch`` (a document's blocks all
    explode inside one micro-batch, so each batch's surviving set is
    complete — reassembly is batch-local by construction; Spark forbids
    a second stateful pandas operator in the same plan, and foreachBatch
    is the idiomatic multi-stage streaming composition, same as the
    statement-set sink pattern). ``sink_fn(assembled_df, epoch_id)``
    owns the write. Returns the started StreamingQuery."""
    survivors = streaming_passage_dedup(
        docs, block=block, text_col=text_col, id_col=id_col
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sink_fn(reassemble_passages_batch(batch_df), epoch_id)

    return (
        survivors.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
