"""Reference example programs, ported Spark-first.

flink-examples is the reference's "here is how you use the engine"
surface; these ports show the same programs on this engine's facades —
a migrating user's Rosetta stone. Each returns a DataFrame and is
pinned by tests/test_examples.py against the reference semantics.

| here | reference |
|---|---|
| word_count | flink-examples-streaming/.../wordcount/WordCount.java |
| session_windowing | .../windowing/SessionWindowing.java (the literal fixture) |
| top_speed_windowing | .../windowing/TopSpeedWindowing.java (GlobalWindows + TimeEvictor(10s) + DeltaTrigger(50)) |
| fraud_detection | flink-walkthroughs fraud-detection (small charge immediately followed by a large one, within a minute) |
| state_machine | .../statemachine/StateMachineExample.java (per-address DFA, invalid-transition alerts) |
| async_io_enrichment | .../async/AsyncIOExample.java (AsyncDataStream.orderedWait over SampleAsyncFunction) |
| iterate_fibonacci | .../iteration/IterateExample.java (DataStream.iterate + Step feedback until Fibonacci >= BOUND) |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def word_count(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """WordCount.java: tokenize, lowercase, count per word -> (word,
    cnt). Works identically on a batch or streaming frame (the
    reference ships both programs; stream-batch unification makes them
    one)."""
    words = lines.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\W+")
        ).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("cnt"))


def session_windowing(events: DataFrame) -> DataFrame:
    """SessionWindowing.java: key by id, 3 ms session gap, count per
    session. ``events`` is (id string, ts_ms long, v int); returns
    (id, session_start_ms, n)."""
    with_ts = events.withColumn("__ts", F.timestamp_millis(F.col("ts_ms")))
    return (
        with_ts.groupBy(
            F.session_window("__ts", "3 milliseconds").alias("__w"), "id"
        )
        .agg(F.sum("v").alias("n"))
        .select(
            "id",
            F.unix_millis(F.col("__w.start")).alias("session_start_ms"),
            "n",
        )
    )


def top_speed_windowing(car_data: DataFrame) -> DataFrame:
    """TopSpeedWindowing.java: per car, a GlobalWindow with
    DeltaTrigger(50 m on covered distance) and TimeEvictor(10 s) —
    every time a car advances 50 m past the last firing, emit the top
    speed seen in the trailing 10 s. ``car_data`` is (car_id int,
    speed double, distance double, ts_ms long); returns firing rows
    (car_id, ts_ms, top_speed).

    Port: the DeltaTrigger's baseline-reset scan (DeltaTrigger.java
    semantics; the streaming form of the same scan is
    streaming/triggers.delta_trigger_agg) runs per key in one Arrow
    batch, and the evictor becomes a 10 s RANGE frame max — the
    trailing-window max ONLY matters at firing rows, so
    evict+aggregate collapses to one window function.
    """
    import pandas as pd

    def fire_scan(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("ts_ms")
        baseline, out = None, []
        for dist, ts in zip(pdf["distance"].to_numpy(), pdf["ts_ms"].to_numpy()):
            if baseline is None:
                baseline = float(dist)
            elif abs(float(dist) - baseline) > 50.0:
                out.append((int(pdf["car_id"].iloc[0]), int(ts)))
                baseline = float(dist)
        return pd.DataFrame(out, columns=["car_id", "ts_ms"])

    fires = car_data.groupBy("car_id").applyInPandas(
        fire_scan, "car_id int, ts_ms long"
    )
    w = (
        W.partitionBy("car_id")
        .orderBy(F.col("ts_ms"))
        .rangeBetween(-10_000, 0)  # TimeEvictor.of(10 s), ms timestamps
    )
    enriched = car_data.withColumn("top_speed", F.max("speed").over(w))
    return fires.join(enriched, ["car_id", "ts_ms"]).select(
        "car_id", "ts_ms", "top_speed"
    )


def fraud_detection(transactions: DataFrame) -> DataFrame:
    """The fraud-detection walkthrough: a small charge (< $1)
    IMMEDIATELY followed by a large one (> $500) on the same account,
    both within one minute — the card-testing pattern. ``transactions``
    is (account_id, ts (timestamp), txn_id, amount); returns one row
    per fraud match (account_id, match_id, small_txn, large_txn).

    Uses the fluent CEP API (api.cep) exactly as the walkthrough uses
    flink-cep's Pattern."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern, sym

    pat = (
        Pattern.begin("small").where(F.col("amount") < 1.0)
        .next("large").where(F.col("amount") > 500.0)
        .within("1 minute")
    )
    return (
        CEP.pattern(transactions, pat, "account_id", ["ts", "txn_id"])
        .select(
            small_txn=F.max(sym("small", "txn_id")),
            large_txn=F.max(sym("large", "txn_id")),
        )
    )


# StateMachineExample.java's DFA (statemachine/dfa/State.java):
# Initial -a-> W -b-> Y -e-> Z -g-> Terminal; Initial -c-> X;
# X -b-> Y; X -d-> Z. Anything else is an invalid transition.
_DFA = {
    ("Initial", "a"): "W", ("Initial", "c"): "X",
    ("W", "b"): "Y", ("X", "b"): "Y", ("X", "d"): "Z",
    ("Y", "e"): "Z", ("Z", "g"): "Terminal",
}


def state_machine(events: DataFrame) -> DataFrame:
    """StateMachineExample.java: run each source address's event
    sequence through the DFA; emit an alert row (address, event_type,
    state_before) for every invalid transition. A Terminal transition
    resets to Initial (the reference evicts the key; reset is the
    batch-replay equivalent), and an invalid event leaves the state
    unchanged so later events keep being checked.

    ``events`` is (address string, seq long, event_type string); use
    :func:`state_machine_streaming` for the continuous form (same scan,
    DFA state carried in keyed state across micro-batches).
    """
    import pandas as pd

    def scan(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("seq")
        state, out = "Initial", []
        addr = pdf["address"].iloc[0]
        for ev in pdf["event_type"]:
            nxt = _DFA.get((state, ev))
            if nxt is None:
                out.append((addr, ev, state))
            elif nxt == "Terminal":
                state = "Initial"
            else:
                state = nxt
        return pd.DataFrame(out, columns=["address", "event_type", "state_before"])

    return events.groupBy("address").applyInPandas(
        scan, "address string, event_type string, state_before string"
    )


def state_machine_streaming(events: DataFrame) -> DataFrame:
    """Streaming form of :func:`state_machine`: the per-address DFA
    state lives in keyed state (applyInPandasWithState), alerts stream
    out in append mode — the actual shape of
    StateMachineExample.java's keyed FlatMapFunction.

    Assumes per-key event order within/across micro-batches follows
    ``seq`` (the reference assumes arrival order; replay sources here
    deliver in order)."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("address", StringType()),
            StructField("event_type", StringType()),
            StructField("state_before", StringType()),
        ]
    )
    state_schema = StructType([StructField("dfa_state", StringType())])

    def scan(key, pdfs, gstate):
        state = gstate.get[0] if gstate.exists else "Initial"
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("seq")
            for ev in pdf["event_type"]:
                nxt = _DFA.get((state, ev))
                if nxt is None:
                    out.append((key[0], ev, state))
                elif nxt == "Terminal":
                    state = "Initial"
                else:
                    state = nxt
        gstate.update((state,))
        yield pd.DataFrame(out, columns=["address", "event_type", "state_before"])

    return events.groupBy("address").applyInPandasWithState(
        scan, out_schema, state_schema, "append", "NoTimeout"
    )


def async_io_enrichment(
    ids: DataFrame, sleep_factor_ms: int = 0, mode: str = "ordered"
) -> DataFrame:
    """AsyncIOExample.java: an integer stream enriched through an async
    lookup — SampleAsyncFunction pauses a worker thread for a bounded
    random time, then completes with ``"key-" + (input % 10)``; the
    result stream is AsyncDataStream.orderedWait/unorderedWait over it.

    Port: the engine's :func:`streaming.ops.async_lookup` (asyncio-
    gathered Arrow batches — the thread-pool analog) with a
    deterministic bounded pause of ``(value % 7)/7 x sleep_factor_ms``
    standing in for the random sleep (same bounded-latency shape, but
    reproducible). ``mode`` mirrors the reference's waitMode flag:
    ``orderedWait``'s reorder buffer comes free here — concurrent
    results are reassembled in input order inside each Arrow batch — so
    both modes emit identically; the flag is validated for parity.
    ``failRatio`` is NOT ported: in the reference a failed future fails
    the JOB (resultFuture.completeExceptionally), and an exception from
    the lookup coroutine here does exactly that already.

    ``ids`` is (value bigint); returns (value, lookup_key). Works on a
    batch or streaming frame (mapInPandas runs on both).
    """
    import asyncio

    from reshape_on_flink_spark.streaming.ops import async_lookup

    if mode not in ("ordered", "unordered"):
        raise ValueError(f"waitMode must be 'ordered' or 'unordered', got {mode!r}")

    async def fetch(row: dict) -> dict:
        if sleep_factor_ms:
            await asyncio.sleep((row["value"] % 7) / 7 * sleep_factor_ms / 1000)
        return {"lookup_key": f"key-{row['value'] % 10}"}

    return async_lookup(ids, fetch, "value bigint, lookup_key string")


def iterate_fibonacci(
    pairs: DataFrame, bound: int = 100, max_iters: int = 64
) -> DataFrame:
    """IterateExample.java: each input pair (first, second) seeds a
    Fibonacci recurrence; the Step ProcessFunction ALWAYS advances
    ``(x, y, step) -> (y, x + y, step + 1)`` and routes the advanced
    element back into the iteration while the PRE-advance values were
    both ``< BOUND`` (so every element takes exactly one step past the
    bound crossing before it exits). OutputMap emits ((first, second),
    step).

    Port: the engine's :func:`operators.iterate.iterate` driver-side
    fixed point (the batch re-expression of DataStream.iterate /
    closeWith — SURVEY §2.9 Iterations); live rows advance per round,
    exited rows carry; convergence = no live rows. Returns (first,
    second, step).
    """
    from reshape_on_flink_spark.operators.iterate import iterate

    seed = pairs.select(
        F.col("first").cast("int"),
        F.col("second").cast("int"),
        F.col("first").cast("int").alias("x"),
        F.col("second").cast("int").alias("y"),
        F.lit(0).alias("step"),
        F.lit(False).alias("done"),
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        live = ~F.col("done")
        # Step.processElement's feedback test reads the INPUT tuple
        # (value.f2 / value.f3), i.e. the pre-advance x and y
        exit_now = (F.col("x") >= bound) | (F.col("y") >= bound)
        return state.select(
            "first",
            "second",
            F.when(live, F.col("y")).otherwise(F.col("x")).alias("x"),
            F.when(live, F.col("x") + F.col("y")).otherwise(F.col("y")).alias("y"),
            F.when(live, F.col("step") + 1).otherwise(F.col("step")).alias("step"),
            F.when(live, exit_now).otherwise(F.lit(True)).alias("done"),
        )

    out = iterate(
        seed,
        step,
        max_iters=max_iters,
        converged=lambda _p, n: n.where(~F.col("done")).limit(1).count() == 0,
    )
    return out.select("first", "second", "step")


def side_output_word_count(
    lines: DataFrame, text_col: str = "value", ts_col: str | None = None,
    window: str = "5 seconds",
) -> tuple[DataFrame, DataFrame]:
    """SideOutputExample.java port (flink-examples-streaming/.../
    sideoutput/SideOutputExample.java): tokenize lines (lowercase,
    split on non-word runs); words LONGER than 5 chars go to the
    'rejected' side output prefixed ``"rejected: "``; the rest are
    counted per 5-second tumbling window (keyed sum). Returns
    ``(counts, rejected)`` — Spark's side output is simply a second
    DataFrame branched off the shared tokenized plan (on streams,
    attach each to its own sink / one foreachBatch).

    Without ``ts_col`` the windowing collapses to a global count per
    word (the reference's ingestion-time demo is wall-clock anyway).
    """
    tokens = lines.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\W+")).alias("word"),
        *([F.col(ts_col).alias("__ts")] if ts_col else []),
    ).where(F.length("word") > 0)
    rejected = tokens.where(F.length("word") > 5).select(
        F.concat(F.lit("rejected: "), F.col("word")).alias("rejected")
    )
    kept = tokens.where(F.length("word") <= 5)
    if ts_col:
        counts = (
            kept.groupBy(F.window("__ts", window).alias("w"), "word")
            .agg(F.count("*").alias("cnt"))
            .select("word", F.col("w.start").alias("window_start"), "cnt")
        )
    else:
        counts = kept.groupBy("word").agg(F.count("*").alias("cnt"))
    return counts, rejected


def window_join(
    grades: DataFrame, salaries: DataFrame, window: str = "2 seconds"
) -> DataFrame:
    """WindowJoin.java port (flink-examples-streaming/.../join/
    WindowJoin.java): join two streams on ``name`` within a tumbling
    window — ``grades (ts, name, grade)`` x ``salaries (ts, name,
    salary)`` -> ``(name, grade, salary)`` for pairs whose events fall
    in the SAME window (TumblingEventTimeWindows semantics: the join
    window is assigned per element, so both sides must land in one
    window instance). Spark: assign ``F.window`` on each side and
    equi-join on (name, window) — co-partitioned hash join, no
    interval-join state; works batch and streaming (append mode with
    watermarks on both sides)."""
    g = grades.select(
        F.window("ts", window).alias("w"), "name", "grade"
    )
    s = salaries.select(
        F.window("ts", window).alias("w"), "name", "salary"
    )
    return g.join(s, ["w", "name"]).select("name", "grade", "salary")
