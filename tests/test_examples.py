"""Reference example-program ports (reshape_on_flink_spark.examples)
pinned against the reference semantics / literal fixtures."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from reshape_on_flink_spark import examples as E


def test_word_count_batch_and_stream_agree(spark, tmp_dir):
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.streaming.source import chunked_replay

    lines = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "To be or not to be",
            "that is the question",
            "to be is to do",
        ])],
        "i int, value string",
    )
    batch = {(r["word"], r["cnt"]) for r in E.word_count(lines).collect()}
    assert ("to", 4) in batch and ("be", 3) in batch and ("question", 1) in batch

    stream = chunked_replay(
        spark, lines, os.path.join(tmp_dir, "wc"), n_chunks=3, order_col="i"
    )
    sdf = E.word_count(stream)
    got = run_to_memory(spark, sdf, "wc_out", tmp_dir, mode="complete")
    assert {(r["word"], r["cnt"]) for r in got.collect()} == batch


def test_session_windowing_literal_fixture(spark):
    """The SessionWindowing.java input verbatim: sessions a@1, b@{1,3,5},
    c@6, a@10, c@11 with a 3 ms gap -> five sessions with counts
    1,3,1,1,1."""
    events = spark.createDataFrame(
        [("a", 1, 1), ("b", 1, 1), ("b", 3, 1), ("b", 5, 1),
         ("c", 6, 1), ("a", 10, 1), ("c", 11, 1)],
        "id string, ts_ms long, v int",
    )
    got = {
        (r["id"], r["session_start_ms"], r["n"])
        for r in E.session_windowing(events).collect()
    }
    assert got == {
        ("a", 1, 1), ("b", 1, 3), ("c", 6, 1), ("a", 10, 1), ("c", 11, 1),
    }


def test_top_speed_windowing_reference_simulation(spark):
    """Two cars; fires whenever distance advances >= 50 m past the last
    firing baseline; top speed = max over the trailing 10 s."""
    rows = []
    # car 0: distance grows 30 m/tick every 2 s -> fires at ticks 2,4,6..
    for i in range(8):
        rows.append((0, 10.0 * (i % 3 + 1), 30.0 * i, 2_000 * i))
    # car 1: one early fire then idle (no distance growth)
    rows.append((1, 50.0, 0.0, 0))
    rows.append((1, 99.0, 60.0, 1_000))
    rows.append((1, 20.0, 61.0, 30_000))
    df = spark.createDataFrame(rows, "car_id int, speed double, distance double, ts_ms long")
    got = {(r["car_id"], r["ts_ms"], r["top_speed"])
           for r in E.top_speed_windowing(df).collect()}

    # python reference: DeltaTrigger baseline-reset + trailing-10s max
    expect = set()
    for car in (0, 1):
        data = sorted([r for r in rows if r[0] == car], key=lambda r: r[3])
        baseline = None
        for (cid, speed, dist, ts) in data:
            if baseline is None:
                baseline = dist
                continue
            if abs(dist - baseline) > 50.0:
                top = max(s for (_c, s, _d, t) in data if ts - 10_000 <= t <= ts)
                expect.add((car, ts, top))
                baseline = dist
    assert got == expect and len(got) >= 3


def test_fraud_detection_pattern(spark):
    ts = lambda s: datetime(2024, 1, 1, 0, s // 60, s % 60)  # noqa: E731
    txns = spark.createDataFrame(
        [
            (1, ts(0), 100, 0.5), (1, ts(10), 101, 600.0),   # fraud
            (2, ts(0), 200, 0.5), (2, ts(5), 201, 30.0),     # small then normal
            (3, ts(0), 300, 700.0), (3, ts(5), 301, 0.2),    # large first
            (4, ts(0), 400, 0.9), (4, ts(65), 401, 900.0),   # outside the minute
        ],
        "account_id int, ts timestamp, txn_id int, amount double",
    )
    got = {(r["account_id"], r["small_txn"], r["large_txn"])
           for r in E.fraud_detection(txns).collect()}
    assert got == {(1, 100, 101)}


def test_state_machine_alerts(spark):
    """Valid walk a-b-e-g (then resets) raises nothing; the 'b' from
    Initial and the 'g' from W are invalid and carry their state."""
    rows = (
        [("ok", i, t) for i, t in enumerate("abeg")]          # full valid walk
        + [("ok", 10 + i, t) for i, t in enumerate("cd")]     # valid again post-reset
        + [("bad", 0, "b")]                                   # invalid from Initial
        + [("bad2", 0, "a"), ("bad2", 1, "g"), ("bad2", 2, "b")]  # g invalid in W
    )
    df = spark.createDataFrame(rows, "address string, seq long, event_type string")
    got = {(r["address"], r["event_type"], r["state_before"])
           for r in E.state_machine(df).collect()}
    assert got == {("bad", "b", "Initial"), ("bad2", "g", "W")}


def test_state_machine_streaming_equals_batch(spark, tmp_dir):
    """DFA state must survive micro-batch boundaries: replay the same
    sequences in 4 chunks and compare alerts with the batch scan."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.streaming.source import chunked_replay

    rows = (
        [("ok", i, t) for i, t in enumerate("abegcd")]
        + [("bad", 0, "b"), ("bad", 1, "a"), ("bad", 2, "g")]
        + [("bad2", 0, "a"), ("bad2", 1, "g"), ("bad2", 2, "b"), ("bad2", 3, "e")]
    )
    df = spark.createDataFrame(rows, "address string, seq long, event_type string")
    batch = {(r["address"], r["event_type"], r["state_before"])
             for r in E.state_machine(df).collect()}
    assert len(batch) >= 3  # non-degenerate

    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "sm"), n_chunks=4, order_col="seq"
    )
    got = run_to_memory(
        spark, E.state_machine_streaming(stream), "sm_out", tmp_dir, mode="append"
    )
    assert {(r["address"], r["event_type"], r["state_before"])
            for r in got.collect()} == batch


def test_fraud_detection_streaming_matches_batch(spark, tmp_dir):
    """The walkthrough pattern streamed: pandas predicates + WITHIN on
    the fluent CEP route; match set equals the batch route."""
    import os
    from datetime import datetime

    from pyspark.sql import functions as F

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.api.cep import CEP, Pattern
    from reshape_on_flink_spark.streaming.source import chunked_replay

    ts = lambda s: datetime(2024, 1, 1, 0, s // 60, s % 60)  # noqa: E731
    txns = spark.createDataFrame(
        [
            (1, ts(0), 100, 0.5), (1, ts(10), 101, 600.0),
            (2, ts(0), 200, 0.5), (2, ts(5), 201, 30.0),
            (4, ts(0), 400, 0.9), (4, ts(65), 401, 900.0),
            (5, ts(30), 500, 0.1), (5, ts(40), 501, 800.0),
        ],
        "account_id int, ts timestamp, txn_id int, amount double",
    )
    batch = sorted(
        (r["account_id"], r["txn_id"])
        for r in E.fraud_detection(txns).select("account_id", "small_txn").collect()
        for r in [{"account_id": r["account_id"], "txn_id": r["small_txn"]}]
    )
    assert batch == [(1, 100), (5, 500)]

    stream = chunked_replay(
        spark, txns, os.path.join(tmp_dir, "fraud"), n_chunks=3, order_col="txn_id"
    )
    pat = (
        Pattern.begin("small").where(lambda pdf: pdf["amount"] < 1.0)
        .next("large").where(lambda pdf: pdf["amount"] > 500.0)
        .within("1 minute")
    )
    sdf = CEP.pattern(stream, pat, "account_id", ["ts", "txn_id"]).flat_select()
    got = run_to_memory(spark, sdf, "fraud_out", tmp_dir, mode="append")
    small_rows = sorted(
        (r["account_id"], r["txn_id"])
        for r in got.collect()
        if r["matched_symbol"] == "small"
    )
    assert small_rows == batch


def test_async_io_enrichment_reference_simulation(spark):
    """AsyncIOExample.java: every input completes with
    'key-' + (input % 10); orderedWait restores input order even though
    lookups complete out of order (staggered deterministic pauses)."""
    from reshape_on_flink_spark.examples import async_io_enrichment

    ids = spark.range(0, 50).select(F.col("id").alias("value")).coalesce(1)
    rows = async_io_enrichment(ids, sleep_factor_ms=40).collect()
    assert [r["value"] for r in rows] == list(range(50))  # orderedWait
    assert all(r["lookup_key"] == f"key-{r['value'] % 10}" for r in rows)

    import pytest

    with pytest.raises(ValueError, match="waitMode"):
        async_io_enrichment(ids, mode="sideways")


def test_async_io_enrichment_streaming(spark, tmp_dir):
    """The same enrichment on a streaming frame (the reference program
    is a streaming job): result set equals batch."""
    import os

    from reshape_on_flink_spark.examples import async_io_enrichment
    from reshape_on_flink_spark.streaming.source import chunked_replay
    from tests.test_streaming import run_to_memory

    df = spark.range(0, 30).select(F.col("id").alias("value"))
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "async_src"), n_chunks=3, order_col="value"
    )
    got = sorted(
        (r["value"], r["lookup_key"])
        for r in run_to_memory(
            spark, async_io_enrichment(stream), "async_out", tmp_dir, mode="append"
        ).collect()
    )
    assert got == [(v, f"key-{v % 10}") for v in range(30)]


def test_iterate_fibonacci_reference_simulation(spark):
    """IterateExample.java Step semantics, simulated row-for-row: the
    element always advances once, the PRE-advance (x, y) decide whether
    it feeds back (both < BOUND) or exits — so the step count is one
    past the bound crossing."""
    from reshape_on_flink_spark.examples import iterate_fibonacci

    def ref_steps(a: int, b: int, bound: int = 100) -> int:
        x, y, s = a, b, 0
        while True:
            px, py = x, y
            x, y, s = y, x + y, s + 1
            if not (px < bound and py < bound):
                return s

    pairs = [(1, 1), (5, 60), (99, 1), (3, 7), (10, 90), (50, 49), (1, 99)]
    df = spark.createDataFrame(pairs, "first int, second int")
    got = {
        (r["first"], r["second"]): r["step"]
        for r in iterate_fibonacci(df).collect()
    }
    assert got == {(a, b): ref_steps(a, b) for a, b in pairs}
    # the docs' canonical property: (1,1) crosses 100 at F(11)=144,
    # exits one step later
    assert got[(1, 1)] == ref_steps(1, 1) == 11


def test_side_output_word_count(spark, tmp_dir):
    """SideOutputExample: >5-char words land ONLY on the side output
    (prefixed), the rest in the windowed counts; batch == stream."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.streaming.source import chunked_replay

    rows = [
        (1, "To be or not to be"),
        (2, "considering the slings and arrows"),
        (3, "to be to be"),
    ]
    df = spark.createDataFrame(rows, "seq int, value string")
    counts, rejected = E.side_output_word_count(df)
    got_counts = {(r.word, r.cnt) for r in counts.collect()}
    got_rej = sorted(r.rejected for r in rejected.collect())
    assert ("to", 4) in got_counts and ("be", 4) in got_counts
    assert all(len(w) <= 5 for w, _ in got_counts)
    assert got_rej == [
        "rejected: arrows", "rejected: considering", "rejected: slings",
    ], got_rej

    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "so_in"), n_chunks=3, order_col="seq"
    )
    s_counts, s_rej = E.side_output_word_count(stream)
    sr = sorted(
        r.rejected
        for r in run_to_memory(spark, s_rej, "so_rej", tmp_dir, mode="append").collect()
    )
    assert sr == got_rej
    sc = {
        (r.word, r.cnt)
        for r in run_to_memory(
            spark, s_counts, "so_cnt", tmp_dir, mode="complete"
        ).collect()
    }
    assert sc == got_counts


def test_window_join_same_window_only(spark):
    """WindowJoin: pairs join only inside one tumbling window
    instance."""
    g = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 0, 0, 0), "alice", 3),
            (datetime(2024, 1, 1, 0, 0, 1), "bob", 1),
            (datetime(2024, 1, 1, 0, 0, 5), "alice", 5),  # next window
        ],
        "ts timestamp, name string, grade int",
    )
    s = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 0, 0, 1), "alice", 100),
            (datetime(2024, 1, 1, 0, 0, 6), "alice", 200),
            (datetime(2024, 1, 1, 0, 0, 30), "bob", 50),  # far window: no grade
        ],
        "ts timestamp, name string, salary int",
    )
    out = sorted(
        (r.name, r.grade, r.salary)
        for r in E.window_join(g, s, "2 seconds").collect()
    )
    # window [0,2): alice grade3 x salary100; window [4,6): grade5... salary200
    # is at t=6 -> window [6,8): NO pair; bob's salary at t=30 unmatched
    assert out == [("alice", 3, 100)], out
