"""Fluent CEP Pattern API (api.cep): builder compile + semantics vs the
MATCH_RECOGNIZE engine, flink-cep Pattern.java / CEP.java parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reshape_on_flink_spark.api.cep import CEP, Pattern, sym
from reshape_on_flink_spark.operators.cep import match_recognize


def _df(spark, values):
    return spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(values)], "k int, pos int, v int"
    )


def _matches(ps):
    rows = ps.flat_select().orderBy("match_id", "pos").collect()
    out = {}
    for r in rows:
        out.setdefault(r["match_id"], []).append((r["pos"], r["matched_symbol"]))
    return list(out.values())


# ---------------------------------------------------------------- compile


def test_compile_strict_chain_and_quantifiers(spark):
    p = (
        Pattern.begin("a").where(F.col("v") == 1)
        .next("b").where(F.col("v") == 2).one_or_more()
        .next("c").where(F.col("v") == 3).optional()
        .next("d").where(F.col("v") == 4).times(2, 3)
        .next("e").where(F.col("v") == 5).times_or_more(2).reluctant()
    )
    pat, define, syms, within = p.compile()
    assert pat == "a b+ c? d{2,3} e{2,}?"
    assert syms == ["a", "b", "c", "d", "e"]
    assert within is None
    assert set(define) == {"a", "b", "c", "d", "e"}


def test_compile_relaxed_inserts_reluctant_fillers(spark):
    p = (
        Pattern.begin("a").where("v = 1")
        .followed_by("b").where("v = 2")
        .followed_by("c").where("v = 3")
    )
    pat, define, syms, _ = p.compile()
    assert pat == "a __gap0*? b __gap1*? c"
    assert set(define) == {"a", "b", "c", "__gap0", "__gap1"}


def test_compile_rejections(spark):
    with pytest.raises(NotImplementedError, match="followedByAny"):
        Pattern.begin("a").where("v=1").followed_by_any("b")
    with pytest.raises(NotImplementedError, match="allowCombinations"):
        Pattern.begin("a").where("v=1").one_or_more().allow_combinations()
    with pytest.raises(NotImplementedError, match="terminal notFollowedBy"):
        Pattern.begin("a").where("v=1").not_followed_by("n").where("v=9").compile()
    with pytest.raises(NotImplementedError, match="not_followed_by"):
        (
            Pattern.begin("a").where("v=1")
            .not_next("n").where("v=9")
            .followed_by("b").where("v=2")
            .compile()
        )
    with pytest.raises(ValueError, match="no where"):
        Pattern.begin("a").next("b").where("v=1").compile()
    with pytest.raises(ValueError, match="duplicate stage"):
        Pattern.begin("a").next("a")
    with pytest.raises(ValueError, match="looping"):
        Pattern.begin("a").where("v=1").until("v=9")
    with pytest.raises(ValueError, match="cannot be quantified"):
        Pattern.begin("a").where("v=1").not_followed_by("n").times(2)


# --------------------------------------------------------------- semantics


def test_next_is_strict_followed_by_is_relaxed(spark):
    # 1 9 2: strict a(1) b(2) fails; relaxed skips the 9
    df = _df(spark, [1, 9, 2])
    strict = Pattern.begin("a").where("v = 1").next("b").where("v = 2")
    relaxed = Pattern.begin("a").where("v = 1").followed_by("b").where("v = 2")
    assert _matches(CEP.pattern(df, strict, "k", "pos")) == []
    assert _matches(CEP.pattern(df, relaxed, "k", "pos")) == [[(0, "a"), (2, "b")]]


def test_relaxed_takes_first_match_and_hides_fillers(spark):
    # Flink relaxed contiguity: the FIRST v=2 after the 1 wins (pos 2,
    # not pos 4), and the skipped v=9 row never appears in output.
    df = _df(spark, [1, 9, 2, 9, 2])
    p = Pattern.begin("a").where("v = 1").followed_by("b").where("v = 2")
    ps = CEP.pattern(df, p, "k", "pos")
    assert _matches(ps) == [[(0, "a"), (2, "b")]]
    assert all(
        not r["matched_symbol"].startswith("__gap")
        for r in ps.flat_select().collect()
    )


def test_not_followed_by_blocks_intervening_event(spark):
    # a ... b with no v=9 between: [1,2,2] ok from pos 0; [1,9,2] dead
    p = (
        Pattern.begin("a").where("v = 1")
        .not_followed_by("n").where("v = 9")
        .followed_by("b").where("v = 2")
    )
    ok = _matches(CEP.pattern(_df(spark, [1, 3, 2]), p, "k", "pos"))
    assert ok == [[(0, "a"), (2, "b")]]
    blocked = _matches(CEP.pattern(_df(spark, [1, 9, 2]), p, "k", "pos"))
    assert blocked == []


def test_not_next_folds_into_strict_stage(spark):
    # event after a must not be 9 — and b matches that same event
    p = (
        Pattern.begin("a").where("v = 1")
        .not_next("n").where("v = 9")
        .next("b").where("v > 1")
    )
    assert _matches(CEP.pattern(_df(spark, [1, 2]), p, "k", "pos")) == [
        [(0, "a"), (1, "b")]
    ]
    assert _matches(CEP.pattern(_df(spark, [1, 9]), p, "k", "pos")) == []


def test_until_stops_loop_collection(spark):
    # b+ collects v=2 until a v=8 appears; 8 then feeds stage c
    p = (
        Pattern.begin("a").where("v = 1")
        .next("b").where("v >= 2").one_or_more().until("v = 8")
        .next("c").where("v = 8")
    )
    got = _matches(CEP.pattern(_df(spark, [1, 2, 3, 8, 2]), p, "k", "pos"))
    assert got == [[(0, "a"), (1, "b"), (2, "b"), (3, "c")]]


def test_within_bounds_the_match(spark):
    p = (
        Pattern.begin("a").where("v = 1")
        .followed_by("b").where("v = 2")
        .within(2.0)  # numeric order column: raw delta, strict <
    )
    # b at pos 2 -> delta 2 is NOT < 2 -> no match; b at pos 1 matches
    assert _matches(CEP.pattern(_df(spark, [1, 9, 2]), p, "k", "pos")) == []
    assert _matches(CEP.pattern(_df(spark, [1, 2, 9]), p, "k", "pos")) == [
        [(0, "a"), (1, "b")]
    ]


def test_where_ands_or_ors(spark):
    p = (
        Pattern.begin("a").where("v >= 1").where("v <= 3").or_("v = 7")
        .next("b").where("v = 5")
    )
    got = _matches(CEP.pattern(_df(spark, [7, 5, 4, 2, 5]), p, "k", "pos"))
    assert got == [[(0, "a"), (1, "b")], [(3, "a"), (4, "b")]]


def test_select_measures_with_sym_scoping(spark):
    df = _df(spark, [1, 5, 7, 2])
    p = (
        Pattern.begin("a").where("v = 1")
        .next("b").where("v > 2").one_or_more()
        .next("c").where("v = 2")
    )
    row = (
        CEP.pattern(df, p, "k", "pos")
        .select(
            n_rows=F.count(F.lit(1)),
            max_b=F.max(sym("b", "v")),
            start_pos=F.min("pos"),
        )
        .collect()
    )
    assert [(r["n_rows"], r["max_b"], r["start_pos"]) for r in row] == [(4, 7, 0)]


def test_select_equals_hand_built_match_recognize(spark):
    """The builder is sugar: compile output run through the engine
    directly must agree row-for-row."""
    df = _df(spark, [1, 9, 3, 4, 2, 1, 3, 2])
    p = (
        Pattern.begin("a").where("v = 1")
        .followed_by("b").where("v >= 3").one_or_more()
        .next("c").where("v = 2")
    )
    pat, define, _, _ = p.compile()
    direct = match_recognize(df, "k", "pos", pat, define)
    via = CEP.pattern(df, p, "k", "pos").flat_select()
    d = sorted(
        (r["pos"], r["matched_symbol"]) for r in direct.collect()
        if not r["matched_symbol"].startswith("__gap")
    )
    v = sorted((r["pos"], r["matched_symbol"]) for r in via.collect())
    assert d == v and len(v) > 0


def test_overlapping_matches_via_after_match(spark):
    df = _df(spark, [1, 1, 2])
    p = Pattern.begin("a").where("v = 1").followed_by("b").where("v = 2")
    tiled = _matches(CEP.pattern(df, p, "k", "pos"))
    assert tiled == [[(0, "a"), (2, "b")]]
    overlapped = _matches(CEP.pattern(df, p, "k", "pos", after_match="to_next_row"))
    assert overlapped == [[(0, "a"), (2, "b")], [(1, "a"), (2, "b")]]


def test_streaming_pattern_equals_batch(spark, tmp_dir):
    """CEP.pattern on a streaming frame (pandas predicates) == batch."""
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.streaming.source import chunked_replay

    values = [1, 9, 2, 4, 1, 2, 9, 1, 5, 2]
    df = _df(spark, values)
    batch_p = (
        Pattern.begin("a").where("v = 1")
        .followed_by("b").where("v = 2")
    )
    expected = sorted(
        (r["pos"], r["matched_symbol"])
        for r in CEP.pattern(df, batch_p, "k", "pos").flat_select().collect()
    )
    assert len(expected) >= 4  # non-degenerate

    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "cep_fluent"), n_chunks=4, order_col="pos"
    )
    stream_p = (
        Pattern.begin("a").where(lambda pdf: pdf["v"] == 1)
        .followed_by("b").where(lambda pdf: pdf["v"] == 2)
    )
    sdf = CEP.pattern(stream, stream_p, "k", "pos").flat_select()
    got = sorted(
        (r["pos"], r["matched_symbol"])
        for r in run_to_memory(
            spark, sdf, "cep_fluent_out", tmp_dir, mode="append"
        ).collect()
    )
    assert got == expected


def test_builder_compile_round_trips_through_both_parsers(spark):
    """Every compilable builder chain must produce a pattern string the
    engine's parsers accept, with DEFINE covering exactly the symbols —
    across quantifier forms and contiguity mixes."""
    import itertools

    from reshape_on_flink_spark.operators.cep import (
        ast_symbols,
        parse_pattern_ast,
    )

    quants = [
        lambda p: p,
        lambda p: p.one_or_more(),
        lambda p: p.times(2),
        lambda p: p.times(1, 3),
        lambda p: p.optional(),
        lambda p: p.times_or_more(2).reluctant(),
    ]
    links = ["next", "followed_by"]
    for q1, q2, link in itertools.product(quants, quants, links):
        p = Pattern.begin("a").where("v = 1")
        p = q1(p)
        p = getattr(p, link)("b").where("v = 2")
        p = q2(p)
        pat, define, syms, _ = p.compile()
        parsed = ast_symbols(parse_pattern_ast(pat))
        assert set(parsed) == set(define), (pat, parsed, sorted(define))
        assert set(syms) == {"a", "b"}
