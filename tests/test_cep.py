"""MATCH_RECOGNIZE operator (operators.cep): NFA semantics on literal
frames — greedy quantifiers, backtracking, skip-past-last-row, errors."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.operators.cep import match_recognize, parse_pattern


def _df(spark, values):
    return spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(values)], "k int, pos int, v int"
    )


def _runs(df):
    rows = df.orderBy("match_id", "pos").collect()
    out = {}
    for r in rows:
        out.setdefault(r["match_id"], []).append((r["pos"], r["matched_symbol"]))
    return list(out.values())


def test_parse_pattern_alternation_and_rejects():
    assert parse_pattern("(A|B) C") == [(("A", "B"), ""), ("C", "")]
    assert parse_pattern("A (B|C)+ D?") == [("A", ""), (("B", "C"), "+"), ("D", "?")]
    assert parse_pattern("A+? (B|C)*? D??") == [
        ("A", "+?"), (("B", "C"), "*?"), ("D", "??"),
    ]
    with pytest.raises(ValueError, match="unsupported pattern token"):
        parse_pattern("((A|B)|C)")  # nested
    with pytest.raises(ValueError, match="empty"):
        parse_pattern("  ")


def test_after_match_skip_strategies(spark):
    """to_next_row overlaps matches; to_first/to_last resume at the
    mapped row; a strategy restarting at the match's first row raises."""
    df = _df(spark, [1, 2, 3, 4])
    always = {"A": F.lit(True), "B": F.lit(True)}
    tiled = _runs(match_recognize(df, "k", "pos", "A B", always))
    assert [[p for p, _ in m] for m in tiled] == [[0, 1], [2, 3]]
    overlap = _runs(
        match_recognize(df, "k", "pos", "A B", always, after_match="to_next_row")
    )
    assert [[p for p, _ in m] for m in overlap] == [[0, 1], [1, 2], [2, 3]]
    # to_last B on "A B+ C": resume AT the last B row of the match
    df2 = _df(spark, [1, 2, 2, 3])
    defs = {"A": F.col("v") == 1, "B": F.col("v") == 2, "C": F.col("v") == 3}
    m = _runs(match_recognize(df2, "k", "pos", "A B+ C", defs, after_match="to_last B"))
    assert [[p for p, _ in mm] for mm in m] == [[0, 1, 2, 3]]  # scan resumed at 2, no 2nd match
    with pytest.raises(Exception, match="infinite loop"):
        match_recognize(
            _df(spark, [1, 1, 1]), "k", "pos", "A+", {"A": F.lit(True)},
            after_match="to_first A",
        ).collect()
    with pytest.raises(ValueError, match="unsupported after_match"):
        match_recognize(df, "k", "pos", "A B", always, after_match="bogus")


def test_reluctant_quantifier_takes_shortest_run(spark):
    """A+? B stops at the first B-eligible row; greedy A+ B runs on.
    v<=9 is A-eligible AND B is v in {3, 5}: reluctant ends at the first
    3, greedy extends the A-run as far as backtracking allows."""
    df = _df(spark, [1, 2, 3, 4, 5])
    rel = _runs(
        match_recognize(
            df, "k", "pos", "A+? B",
            {"A": F.col("v") <= 9, "B": F.col("v").isin(3, 5)},
        )
    )
    assert rel == [[(0, "A"), (1, "A"), (2, "B")], [(3, "A"), (4, "B")]]
    greedy = _runs(
        match_recognize(
            df, "k", "pos", "A+ B",
            {"A": F.col("v") <= 9, "B": F.col("v").isin(3, 5)},
        )
    )
    assert greedy == [[(0, "A"), (1, "A"), (2, "A"), (3, "A"), (4, "B")]]


def test_alternation_group_matches_and_labels(spark):
    """(UP|DOWN)+ END: the group consumes rows where either symbol fires;
    matched_symbol reports the leftmost true alternative per row."""
    df = _df(spark, [1, 9, 2, 3])  # UP:=v>=5, DOWN:=v<5, END:=v==3
    got = match_recognize(
        df,
        "k",
        "pos",
        "(UP|DOWN)+ END",
        {
            "UP": F.col("v") >= 5,
            "DOWN": F.col("v") < 5,
            "END": F.col("v") == 3,
        },
    ).orderBy("pos")
    rows = [(r["pos"], r["matched_symbol"]) for r in got.collect()]
    # greedy run takes rows 0..2 ((UP|DOWN)+), row 3 is END; DOWN is the
    # leftmost alternative alphabetically-listed first where v<5
    assert rows == [(0, "DOWN"), (1, "UP"), (2, "DOWN"), (3, "END")]


def test_plain_sequence_and_skip_past_last_row(spark):
    # A := even, B := odd; pattern "A B": matches at (0,1) then (2,3) — not (1,2)
    df = _df(spark, [0, 1, 2, 3])
    got = _runs(
        match_recognize(
            df, "k", "pos", "A B",
            {"A": F.col("v") % 2 == 0, "B": F.col("v") % 2 == 1},
        )
    )
    assert got == [[(0, "A"), (1, "B")], [(2, "A"), (3, "B")]]


def test_plus_is_greedy_with_backtracking(spark):
    # values 5 4 3 9: DOWN+ then END (v>8). DOWN+ must backtrack nothing;
    # greedy consumes 4,3 then END=9.
    df = _df(spark, [5, 4, 3, 9])
    w = W.partitionBy("k").orderBy("pos")
    got = _runs(
        match_recognize(
            df, "k", "pos", "DOWN+ END",
            {"DOWN": F.col("v") < F.lag("v").over(w), "END": F.col("v") > 8},
        )
    )
    assert got == [[(1, "DOWN"), (2, "DOWN"), (3, "END")]]


def test_plus_backtracks_when_symbols_overlap(spark):
    # A := v < 10 (everything), B := v == 3. Greedy A+ eats all, must
    # backtrack to leave the 3 for B.
    df = _df(spark, [1, 2, 3])
    got = _runs(
        match_recognize(df, "k", "pos", "A+ B", {"A": F.col("v") < 10, "B": F.col("v") == 3})
    )
    assert got == [[(0, "A"), (1, "A"), (2, "B")]]


def test_optional_and_star(spark):
    # pattern "A B? C*": A=1, B=2, C=3
    df = _df(spark, [1, 3, 3, 1, 2, 3, 1])
    got = _runs(
        match_recognize(
            df, "k", "pos", "A B? C*",
            {"A": F.col("v") == 1, "B": F.col("v") == 2, "C": F.col("v") == 3},
        )
    )
    assert got == [
        [(0, "A"), (1, "C"), (2, "C")],
        [(3, "A"), (4, "B"), (5, "C")],
        [(6, "A")],
    ]


def test_parse_pattern_ast_nested_and_bounded():
    from reshape_on_flink_spark.operators.cep import ast_symbols, parse_pattern_ast

    ast = parse_pattern_ast("A (B C+)+ D?")
    assert ast[0] == ("A", (1, 1, True))
    group, q = ast[1]
    assert q == (1, None, True)
    assert group == [[("B", (1, 1, True)), ("C", (1, None, True))]]
    assert ast[2] == ("D", (0, 1, True))
    assert ast_symbols(ast) == ["A", "B", "C", "D"]

    assert parse_pattern_ast("A{2,3}") == [("A", (2, 3, True))]
    assert parse_pattern_ast("A{2,}?") == [("A", (2, None, False))]
    assert parse_pattern_ast("A{4}") == [("A", (4, 4, True))]
    nested = parse_pattern_ast("((A|B) C){2}")
    assert nested[0][1] == (2, 2, True)

    with pytest.raises(ValueError, match="expected"):
        parse_pattern_ast("A (B C")  # unbalanced
    with pytest.raises(ValueError, match="empty"):
        parse_pattern_ast("()")
    with pytest.raises(ValueError, match="bad quantifier bounds"):
        parse_pattern_ast("A{3,2}")
    with pytest.raises(ValueError, match="unsupported characters"):
        parse_pattern_ast("A # B")


def test_nested_group_sequence(spark):
    """A (B C)+ D: the group must repeat as a unit — a lone B without a
    following C can't close a repetition."""
    # v: 1=A, 2=B, 3=C, 4=D
    df = _df(spark, [1, 2, 3, 2, 3, 4])
    defs = {s: F.col("v") == i for i, s in enumerate(["A", "B", "C", "D"], start=1)}
    got = _runs(match_recognize(df, "k", "pos", "A (B C)+ D", defs))
    assert got == [[(0, "A"), (1, "B"), (2, "C"), (3, "B"), (4, "C"), (5, "D")]]
    # a dangling B breaks the unit: A B C B D has only one full (B C)
    df2 = _df(spark, [1, 2, 3, 2, 4])
    got2 = _runs(match_recognize(df2, "k", "pos", "A (B C)+ D", defs))
    assert got2 == []  # B at pos 3 can't complete, D isn't a C


def test_nested_group_backtracks_into_group_choice(spark):
    """(A|B C)+ D with overlapping truths: branch priority A-first, but
    the matcher must backtrack into the longer B C branch when needed."""
    # rows: x where A and B both true, then C-only, then D
    df = spark.createDataFrame(
        [(1, 0, "ab"), (1, 1, "c"), (1, 2, "d")], "k int, pos int, t string"
    )
    defs = {
        "A": F.col("t").contains("a"),
        "B": F.col("t").contains("b"),
        "C": F.col("t") == "c",
        "D": F.col("t") == "d",
    }
    got = _runs(match_recognize(df, "k", "pos", "(A|B C)+ D", defs))
    # A-branch consumes row 0, but then row 1 (c) matches neither A nor
    # B-C start... actually B C consumes rows 0-1. Regex priority: try
    # A at 0, next rep at 1 fails, D at 1 fails -> backtrack to B C.
    assert got == [[(0, "B"), (1, "C"), (2, "D")]]


def test_bounded_quantifiers_greedy_and_exact(spark):
    df = _df(spark, [1, 1, 1, 1, 2])
    defs = {"A": F.col("v") == 1, "B": F.col("v") == 2}
    got = _runs(match_recognize(df, "k", "pos", "A{2,3} B", defs))
    # greedy: takes 3 As (rows 1-3) then B; row 0 alone can't start a
    # match (only 4 As total, leftmost match consumes 0..2 then B fails
    # at 3 -> backtrack... leftmost-first: at start 0 take A{3}=0,1,2,
    # B at 3 fails (v=1); A{2}=0,1, B at 2 fails; no match at 0; at
    # start 1: A=1,2,3 B=4 matches.
    assert got == [[(1, "A"), (2, "A"), (3, "A"), (4, "B")]]
    exact = _runs(match_recognize(df, "k", "pos", "A{4} B", defs))
    assert exact == [[(0, "A"), (1, "A"), (2, "A"), (3, "A"), (4, "B")]]
    with_reluctant = _runs(match_recognize(df, "k", "pos", "A{2,3}? B", defs))
    # reluctant: fewest reps that still match -> 3 (rows 1..3) at start 1
    assert with_reluctant == [[(1, "A"), (2, "A"), (3, "A"), (4, "B")]]


def test_streaming_nested_group_matches_batch(spark, tmp_dir):
    """Nested pattern across micro-batch boundaries: the AST matcher's
    need-more verdict must hold matches open exactly like the flat one."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.operators.cep import streaming_match_recognize
    from reshape_on_flink_spark.streaming.source import chunked_replay

    # a(bc)(bc)d then a(bc)d then trailing a b (stays pending: open)
    seq = "abcbcdabcdab"
    rows = [(1, i, t) for i, t in enumerate(seq)]
    df = spark.createDataFrame(rows, "k int, pos int, t string")
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "cep_nested"), n_chunks=4, order_col="pos"
    )
    sdf = streaming_match_recognize(
        stream,
        partition_by="k",
        order_cols=["pos"],
        pattern="A (B C)+ D",
        define={
            "A": lambda pdf: pdf["t"] == "a",
            "B": lambda pdf: pdf["t"] == "b",
            "C": lambda pdf: pdf["t"] == "c",
            "D": lambda pdf: pdf["t"] == "d",
        },
        input_cols=["k", "pos", "t"],
    )
    got = sorted(
        (r["pos"], r["matched_symbol"])
        for r in run_to_memory(spark, sdf, "cep_nested_out", tmp_dir, mode="append").collect()
    )
    batch = match_recognize(
        df, "k", "pos", "A (B C)+ D",
        {"A": F.col("t") == "a", "B": F.col("t") == "b",
         "C": F.col("t") == "c", "D": F.col("t") == "d"},
    )
    expected = sorted((r["pos"], r["matched_symbol"]) for r in batch.collect())
    assert expected == [
        (0, "A"), (1, "B"), (2, "C"), (3, "B"), (4, "C"), (5, "D"),
        (6, "A"), (7, "B"), (8, "C"), (9, "D"),
    ]
    assert got == expected


def test_missing_define_is_loud(spark):
    with pytest.raises(ValueError, match="without DEFINE"):
        match_recognize(_df(spark, [1]), "k", "pos", "A B", {"A": F.lit(True)})


def test_partitions_are_independent(spark):
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 2), (2, 0, 2), (2, 1, 1)], "k int, pos int, v int"
    )
    got = match_recognize(
        df, "k", "pos", "A B", {"A": F.col("v") == 1, "B": F.col("v") == 2}
    ).collect()
    assert {(r["k"], r["pos"], r["matched_symbol"]) for r in got} == {
        (1, 0, "A"), (1, 1, "B")
    }


def test_streaming_match_recognize_alternation(spark, tmp_dir):
    """(V|C)+ P across micro-batch boundaries: the alternation group's
    OR-matching and per-row labels survive incremental NFA state."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.operators.cep import (
        match_recognize,
        streaming_match_recognize,
    )
    from reshape_on_flink_spark.streaming.source import chunked_replay

    rows = [(1, i, t) for i, t in enumerate("vcvpvvcpcc")]
    df = spark.createDataFrame(rows, "k int, pos int, typ string")
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "cep_alt"), n_chunks=3, order_col="pos"
    )
    sdf = streaming_match_recognize(
        stream,
        partition_by="k",
        order_cols=["pos"],
        pattern="(V|C)+ P",
        define={
            "V": lambda pdf: pdf["typ"] == "v",
            "C": lambda pdf: pdf["typ"] == "c",
            "P": lambda pdf: pdf["typ"] == "p",
        },
        input_cols=["k", "pos", "typ"],
    )
    got = sorted(
        (r["pos"], r["matched_symbol"])
        for r in run_to_memory(spark, sdf, "cep_alt_out", tmp_dir, mode="append").collect()
    )
    batch = match_recognize(
        df,
        "k",
        "pos",
        "(V|C)+ P",
        {
            "V": F.col("typ") == "v",
            "C": F.col("typ") == "c",
            "P": F.col("typ") == "p",
        },
    )
    expected = sorted((r["pos"], r["matched_symbol"]) for r in batch.collect())
    # both closed matches: rows 0-3 and 4-7; the trailing c,c stays pending
    assert expected == [
        (0, "V"), (1, "C"), (2, "V"), (3, "P"),
        (4, "V"), (5, "V"), (6, "C"), (7, "P"),
    ]
    assert got == expected


def test_streaming_match_recognize_matches_batch_closed(spark, tables, tmp_dir):
    """Streaming CEP must emit exactly the batch matches that are CLOSED
    (a later row proved no greedy extension) — an open match on a key's
    final row stays pending, as in Flink's NFA state."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.operators.cep import (
        match_recognize,
        streaming_match_recognize,
    )
    from reshape_on_flink_spark.streaming.source import chunked_replay

    ev_cols = ["user_id", "event_id", "value"]
    stream = chunked_replay(
        spark, tables["events"], os.path.join(tmp_dir, "cep"), n_chunks=3, order_col="event_id"
    )
    sdf = streaming_match_recognize(
        stream,
        partition_by="user_id",
        order_cols=["event_id"],
        pattern="DOWN+ UP+",
        define={
            "DOWN": lambda pdf: pdf["value"].diff() < 0,
            "UP": lambda pdf: pdf["value"].diff() > 0,
        },
        input_cols=ev_cols,
    )
    got = {}
    for r in run_to_memory(spark, sdf, "cep_out", tmp_dir, mode="append").collect():
        got.setdefault((r["user_id"], r["match_id"]), []).append(
            (r["event_id"], r["matched_symbol"])
        )

    w = W.partitionBy("user_id").orderBy("event_id")
    prev_v = F.lag("value").over(w)
    batch = match_recognize(
        tables["events"].select(*ev_cols),
        "user_id",
        ["event_id"],
        "DOWN+ UP+",
        {"DOWN": F.col("value") < prev_v, "UP": F.col("value") > prev_v},
    )
    last_eid = {
        r["user_id"]: r["m"]
        for r in tables["events"].groupBy("user_id").agg(F.max("event_id").alias("m")).collect()
    }
    expected = {}
    for r in batch.collect():
        expected.setdefault((r["user_id"], r["match_id"]), []).append(
            (r["event_id"], r["matched_symbol"])
        )
    # drop per-key matches that touch the key's final row (open forever)
    expected = {
        k: v
        for k, v in expected.items()
        if max(eid for eid, _ in v) != last_eid[k[0]]
    }
    got = {k: sorted(v) for k, v in got.items()}
    expected = {k: sorted(v) for k, v in expected.items()}
    assert got == expected
    assert expected, "fixture should contain closed matches"


def test_cep_chunked_equals_grouped(spark, tables):
    """The mapInPandas harness (keys batched per Arrow chunk, boundary
    carry) must produce exactly the grouped-map results on real data."""
    ev = tables["events"].select("user_id", "ts", "event_id", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    defs = {"DOWN": F.col("value") < prev_v, "UP": F.col("value") > prev_v}

    def canon(df):
        return sorted(
            (r["user_id"], r["match_id"], r["event_id"], r["matched_symbol"])
            for r in df.collect()
        )

    grouped = match_recognize(ev, "user_id", ["ts", "event_id"], "DOWN+ UP+", defs, impl="grouped")
    chunked = match_recognize(ev, "user_id", ["ts", "event_id"], "DOWN+ UP+", defs, impl="chunked")
    assert canon(chunked) == canon(grouped)
    with pytest.raises(ValueError, match="impl"):
        match_recognize(ev, "user_id", "event_id", "DOWN+", defs, impl="bogus")


def test_cep_chunked_null_keys_match_grouped(spark, tables):
    """Null partition keys form ONE group (Spark groupBy semantics); the
    chunked boundary scan must not split a run of null-keyed rows into
    per-row groups (NaN != NaN is True in a naive boundary test), which
    would silently drop matches spanning them."""
    ev = (
        tables["events"]
        .select("user_id", "ts", "event_id", "value")
        .withColumn(
            "user_id",
            F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(F.col("user_id")),
        )
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    defs = {"DOWN": F.col("value") < prev_v, "UP": F.col("value") > prev_v}

    def canon(df):
        return sorted(
            (
                (r["user_id"], r["match_id"], r["event_id"], r["matched_symbol"])
                for r in df.collect()
            ),
            key=repr,
        )

    grouped = match_recognize(ev, "user_id", ["ts", "event_id"], "DOWN+ UP+", defs, impl="grouped")
    chunked = match_recognize(ev, "user_id", ["ts", "event_id"], "DOWN+ UP+", defs, impl="chunked")
    g, c = canon(grouped), canon(chunked)
    assert c == g
    assert any(t[0] is None for t in g), "fixture must produce null-key matches"


@pytest.mark.parametrize(
    "strategy,n_matches",
    [
        ("past_last_row", 1),
        ("to_next_row", 2),
        ("to_first B", 2),
        ("to_last C", 2),
    ],
)
def test_streaming_skip_strategies_match_batch(spark, tmp_dir, strategy, n_matches):
    """AFTER MATCH SKIP strategies on the STREAMING matcher: stream ==
    batch on a nested pattern where the strategies genuinely differ —
    the 'd' at pos 3 both ends match 0 and (symbol A := a|d) starts
    match 1, which only a skip-back strategy can find (reference
    NFA.java SkipToFirst/LastStrategy semantics)."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.operators.cep import (
        match_recognize,
        streaming_match_recognize,
    )
    from reshape_on_flink_spark.streaming.source import chunked_replay

    seq = "abcdbcdx"
    rows = [(1, i, t) for i, t in enumerate(seq)]
    df = spark.createDataFrame(rows, "k int, pos int, t string")
    pattern = "A (B C)+ D"
    batch = match_recognize(
        df, "k", "pos", pattern,
        {
            "A": (F.col("t") == "a") | (F.col("t") == "d"),
            "B": F.col("t") == "b",
            "C": F.col("t") == "c",
            "D": F.col("t") == "d",
        },
        after_match=strategy,
    )
    expected = sorted(
        (r["match_id"], r["pos"], r["matched_symbol"]) for r in batch.collect()
    )
    assert len({m for m, _, _ in expected}) == n_matches

    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, f"cep_skip_{n_matches}_{strategy[:7].strip()}"),
        n_chunks=4, order_col="pos",
    )
    sdf = streaming_match_recognize(
        stream,
        partition_by="k",
        order_cols=["pos"],
        pattern=pattern,
        define={
            "A": lambda pdf: (pdf["t"] == "a") | (pdf["t"] == "d"),
            "B": lambda pdf: pdf["t"] == "b",
            "C": lambda pdf: pdf["t"] == "c",
            "D": lambda pdf: pdf["t"] == "d",
        },
        input_cols=["k", "pos", "t"],
        after_match=strategy,
    )
    name = f"cep_skip_out_{n_matches}_{abs(hash(strategy)) % 997}"
    got = sorted(
        (r["match_id"], r["pos"], r["matched_symbol"])
        for r in run_to_memory(spark, sdf, name, tmp_dir, mode="append").collect()
    )
    assert got == expected


def test_streaming_skip_infinite_loop_guard(spark, tmp_dir):
    """SKIP TO FIRST A would restart at the match's own first row — the
    streaming matcher must raise the NFA's infinite-loop error, not spin."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.operators.cep import streaming_match_recognize
    from reshape_on_flink_spark.streaming.source import chunked_replay

    rows = [(1, i, t) for i, t in enumerate("abx")]
    df = spark.createDataFrame(rows, "k int, pos int, t string")
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "cep_loop"), n_chunks=1, order_col="pos"
    )
    sdf = streaming_match_recognize(
        stream,
        partition_by="k",
        order_cols=["pos"],
        pattern="A B",
        define={
            "A": lambda pdf: pdf["t"] == "a",
            "B": lambda pdf: pdf["t"] == "b",
        },
        input_cols=["k", "pos", "t"],
        after_match="to_first A",
    )
    with pytest.raises(Exception, match="infinite loop"):
        run_to_memory(spark, sdf, "cep_loop_out", tmp_dir, mode="append")


def test_within_bounds_batch_matches(spark):
    """PATTERN ... WITHIN (Pattern.within analog): a match must complete
    strictly inside the bound measured from its first row; greedy
    quantifiers backtrack into the window instead of dying."""
    df = spark.createDataFrame(
        [(1, t, 1) for t in [0, 1, 2, 10, 11]], "k int, pos int, v int"
    )
    define = {"A": F.col("v") == 1}

    def mids(within, impl):
        got = match_recognize(df, "k", "pos", "A A+", define, within=within, impl=impl)
        out = {}
        for r in got.collect():
            out.setdefault(r["match_id"], []).append(r["pos"])
        return {m: sorted(p) for m, p in out.items()}

    for impl in ("chunked", "grouped"):
        # unbounded: one greedy match over everything
        assert mids(None, impl) == {0: [0, 1, 2, 10, 11]}
        # within=3 (strict <): [0,1,2] fits, [10,11] fits; the gap splits
        assert mids(3, impl) == {0: [0, 1, 2], 1: [10, 11]}
        # within=2: [0,1] then [10,11] — row 2 is exactly at the bound
        # and excluded (Flink times out at >= window)
        assert mids(2, impl) == {0: [0, 1], 1: [10, 11]}
        # too tight for any pair
        assert mids(1, impl) == {}


def test_within_streaming_greedy_loop_closes_at_window(spark, tmp_dir):
    """A greedy loop whose window closes inside the buffer must emit the
    window-clamped match (round-8 fix: the modes matcher returns
    NEED_MORE when the loop probes the horizon edge; the scan now
    re-runs a CLOSED matcher instead of silently dropping the start)."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.operators.cep import streaming_match_recognize
    from reshape_on_flink_spark.streaming.source import chunked_replay

    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "b"), (1, 10, "c"), (1, 11, "c")]
    df = spark.createDataFrame(rows, "k int, pos int, t string")
    define_b = {"A": F.col("t") == "a", "B": F.col("t") == "b"}
    batch = match_recognize(df, "k", "pos", "A B+", define_b, within=5)
    expected = sorted((r["pos"], r["matched_symbol"]) for r in batch.collect())
    assert expected == [(0, "A"), (1, "B"), (2, "B")]

    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "within_greedy"), n_chunks=2, order_col="pos"
    )
    sdf = streaming_match_recognize(
        stream,
        partition_by="k",
        order_cols=["pos"],
        pattern="A B+",
        define={"A": lambda pdf: pdf["t"] == "a", "B": lambda pdf: pdf["t"] == "b"},
        input_cols=["k", "pos", "t"],
        within=5,
    )
    got = sorted(
        (r["pos"], r["matched_symbol"])
        for r in run_to_memory(
            spark, sdf, "within_greedy_out", tmp_dir, mode="append"
        ).collect()
    )
    assert got == expected


def test_within_streaming_matches_batch_and_releases_state(spark, tmp_dir):
    """Streaming WITHIN == batch WITHIN across chunk boundaries, and a
    never-completing partial is RELEASED once its window closes (state
    does not pin on it)."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.operators.cep import streaming_match_recognize
    from reshape_on_flink_spark.streaming.source import chunked_replay

    # 'a b' pairs: close pair (0,1), far pair (10,30: window closed),
    # then a trailing 'a' at 40 with its closer at 41
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 10, "a"), (1, 30, "b"),
            (1, 40, "a"), (1, 41, "b")]
    df = spark.createDataFrame(rows, "k int, pos int, t string")
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "within"), n_chunks=3, order_col="pos"
    )
    sdf = streaming_match_recognize(
        stream,
        partition_by="k",
        order_cols=["pos"],
        pattern="A B",
        define={"A": lambda pdf: pdf["t"] == "a", "B": lambda pdf: pdf["t"] == "b"},
        input_cols=["k", "pos", "t"],
        within=5,
    )
    got = sorted(
        (r["pos"], r["matched_symbol"])
        for r in run_to_memory(spark, sdf, "within_out", tmp_dir, mode="append").collect()
    )
    batch = match_recognize(
        df, "k", "pos", "A B",
        {"A": F.col("t") == "a", "B": F.col("t") == "b"}, within=5,
    )
    expected = sorted((r["pos"], r["matched_symbol"]) for r in batch.collect())
    # (0,1) matches; (10,*) window closes before 30 -> released, no
    # match; (40,41) matches even though 30 sat between the a's
    assert expected == [(0, "A"), (1, "B"), (40, "A"), (41, "B")]
    assert got == expected
