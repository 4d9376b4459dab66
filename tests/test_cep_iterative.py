"""IterativeCondition — conditions over the partial match.

Reference: flink-libraries/flink-cep/src/main/java/org/apache/flink/
cep/pattern/conditions/IterativeCondition.java (ctx.getEventsForPattern)
+ docs/content/docs/libs/cep.md "Iterative Conditions" (the running-sum
subtype example), and the SQL surface
docs/content/docs/dev/table/sql/queries/match_recognize.md
"Aggregations" (DEFINE A AS AVG(A.price) < 15 — the docs input/output
table is pinned verbatim in test_sql_define_aggregation_docs_example).
"""

from __future__ import annotations

import collections
import os

import pytest
from pyspark.sql import functions as F

from reshape_on_flink_spark.operators.cep import (
    iterative_predicate,
    match_recognize,
)


@pytest.fixture(scope="module")
def t_env(spark):
    from reshape_on_flink_spark.api.table_env import TableEnvironment

    return TableEnvironment.create(spark)


def _price_df(spark):
    rows = [
        (1, 1, "start", 0.0),
        (1, 2, "foo1", 2.0),
        (1, 3, "foo2", 2.0),
        (1, 4, "foo3", 2.0),  # running sum would reach 6 -> rejected
        (1, 5, "end", 0.0),
    ]
    return spark.createDataFrame(rows, "k int, t int, name string, price double")


def _sum_under_5(sym):
    # returned closure is cloudpickled BY VALUE (not by module ref, which
    # executors could not import for a test module)
    def cond(event, ctx):
        s = event["price"] + sum(e["price"] for e in ctx.get_events_for_pattern(sym))
        return s < 5.0

    return cond


def test_iterative_running_sum_bounds_greedy_loop(spark):
    """a b+ where b's running sum (incl. the candidate row) stays < 5:
    the greedy loop backtracks out of the iteratively-rejected third
    repetition (the docs' running-sum subtype example, strict form)."""
    out = match_recognize(
        _price_df(spark), "k", "t", "a b+",
        define={"a": F.col("name") == "start", "b": F.col("name").startswith("foo")},
        iter_define={"b": _sum_under_5("b")},
    )
    res = [(r.t, r.matched_symbol) for r in out.orderBy("t").collect()]
    assert res == [(1, "a"), (2, "b"), (3, "b")], res


def test_iterative_only_symbol_defaults_static_true(spark):
    out = match_recognize(
        _price_df(spark), "k", "t", "a b+",
        define={"a": F.col("name") == "start"},
        iter_define={
            "b": lambda e, ctx: e["name"].startswith("foo")
            and e["price"] + sum(x["price"] for x in ctx.get_events_for_pattern("b"))
            < 5.0
        },
    )
    assert sorted(r.t for r in out.collect()) == [1, 2, 3]


def test_iterative_chunked_equals_grouped(spark):
    args = dict(
        partition_by="k", order_by="t", pattern="a b+",
        define={"a": F.col("name") == "start", "b": F.col("name").startswith("foo")},
        iter_define={"b": _sum_under_5("b")},
    )
    df = _price_df(spark)
    chunked = match_recognize(df, impl="chunked", **args)
    grouped = match_recognize(df, impl="grouped", **args)
    key = lambda r: (r.match_id, r.t)  # noqa: E731
    assert sorted(map(key, chunked.collect())) == sorted(map(key, grouped.collect()))


def test_iterative_no_skip_enumerates_valid_expansions(spark):
    """Under noSkip every loop expansion satisfying the iterative bound
    is its own match; the sum-violating expansion is never emitted."""
    out = match_recognize(
        _price_df(spark), "k", "t", "a b+",
        define={"a": F.col("name") == "start", "b": F.col("name").startswith("foo")},
        iter_define={"b": _sum_under_5("b")},
        after_match="no_skip",
    )
    m = collections.defaultdict(list)
    for r in out.collect():
        m[r.match_id].append(r.t)
    assert sorted(sorted(v) for v in m.values()) == [[1, 2], [1, 2, 3]]


def test_flat_matcher_rejects_ic():
    from reshape_on_flink_spark.operators.cep import _matcher, parse_pattern

    toks = parse_pattern("a b")
    with pytest.raises(ValueError, match="iterative"):
        _matcher(["a", "b"], toks)([[True], [True]], 0, 1, ic=[None, None])


# ---------------------------------------------------------------------
# fluent Pattern API: where((event, ctx) -> bool)
# ---------------------------------------------------------------------


def _relaxed_df(spark):
    rows = [
        (1, 1, "c", 0.0),
        (1, 2, "foo1", 2.0),
        (1, 3, "foo2", 2.0),
        (1, 4, "x", 0.0),    # static non-match: relaxed skip
        (1, 5, "foo3", 5.0),  # static match, sum would hit 9 -> iterative skip
        (1, 6, "foo4", 0.5),  # sum 4.5 -> take
        (1, 7, "b", 0.0),
    ]
    return spark.createDataFrame(rows, "k int, t int, name string, price double")


def test_fluent_iterative_relaxed_loop_ignores_failing_event(spark):
    """The relaxed loop's ignore edge is NOT(take) evaluated ITERATIVELY
    (NFACompiler getIgnoreCondition): an event that matches statically
    but fails the running-sum bound is skipped, not branch-killing —
    the docs' oneOrMore + running-sum subtype example."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern

    pat = (
        Pattern.begin("start").where(F.col("name") == "c")
        .followed_by("mid").where(F.col("name").startswith("foo"))
        .where(_sum_under_5("mid"))
        .one_or_more()
        .followed_by("end").where(F.col("name") == "b")
    )
    out = CEP.pattern(_relaxed_df(spark), pat, "k", "t", after_match="no_skip")
    m = collections.defaultdict(list)
    for r in out.flat_select().collect():
        m[r.match_id].append((r.t, r.matched_symbol))
    sets = sorted(sorted(v) for v in m.values())
    assert sets == [
        [(1, "start"), (2, "mid"), (3, "mid"), (6, "mid"), (7, "end")],
        [(1, "start"), (2, "mid"), (3, "mid"), (7, "end")],
        [(1, "start"), (2, "mid"), (7, "end")],
    ], sets
    # t=5 (statically valid, iteratively rejected) appears in NO match
    assert all(5 not in [t for t, _ in v] for v in m.values())


def test_fluent_iterative_only_stage_and_cross_stage_ctx(spark):
    """An iterative-only stage (no static condition) referencing a
    PRIOR stage's events through ctx.get_events_for_pattern."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern

    pat = (
        Pattern.begin("a").where(lambda e, ctx: e["name"] == "c")
        .next("b2").where(
            lambda e, ctx: e["price"]
            > sum(x["price"] for x in ctx.get_events_for_pattern("a"))
        )
    )
    out = CEP.pattern(_relaxed_df(spark), pat, "k", "t").flat_select()
    assert sorted((r.t, r.matched_symbol) for r in out.collect()) == [
        (1, "a"), (2, "b2"),
    ]


def test_fluent_where_iterative_ands_with_static(spark):
    """Chained where(): static Column AND iterative callable compose."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern

    pat = (
        Pattern.begin("a").where(F.col("name") == "start")
        .next("b").where(F.col("name").startswith("foo"))
        .where(lambda e, ctx: e["price"] < 1.0)  # kills all foo rows (price 2.0)
    )
    out = CEP.pattern(_price_df(spark), pat, "k", "t").flat_select()
    assert out.count() == 0


def test_streaming_fluent_iterative_matches_batch(spark, tmp_dir):
    """Stream == batch for an iterative pattern across micro-batch
    boundaries (partial-match state carries the running sums). The
    first statically-viable loop candidate fails the iterative bound,
    so the relaxed search must skip past it in BOTH harnesses.

    (no_skip streaming enumeration stays pending at buffer end by the
    decidability rule; single-match strategies decide on the first
    completed expansion — that route is what this pins.)"""
    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.api.cep import CEP, Pattern
    from reshape_on_flink_spark.streaming.source import chunked_replay

    rows = [
        (1, 1, "c", 0.0),
        (1, 2, "foo9", 6.0),  # static match, sum 6 >= 5 -> iterative reject
        (1, 3, "foo1", 2.0),  # first surviving candidate
        (1, 4, "b", 0.0),
        (1, 5, "c", 0.0),     # second tiled match
        (1, 6, "foo2", 1.0),
        (1, 7, "b", 0.0),
        (1, 8, "z", 0.0),     # trailing sentinel
    ]
    df = spark.createDataFrame(rows, "k int, t int, name string, price double")

    def stages(where_c, where_foo, where_b):
        return (
            Pattern.begin("start").where(where_c)
            .followed_by("mid").where(where_foo).where(_sum_under_5("mid"))
            .one_or_more()
            .followed_by("end").where(where_b)
        )

    pat_b = stages(
        F.col("name") == "c", F.col("name").startswith("foo"), F.col("name") == "b"
    )
    expected = sorted(
        (r.t, r.matched_symbol)
        for r in CEP.pattern(df, pat_b, "k", "t").flat_select().collect()
    )
    assert expected == [
        (1, "start"), (3, "mid"), (4, "end"),
        (5, "start"), (6, "mid"), (7, "end"),
    ], expected

    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "iter_cep"), n_chunks=3, order_col="t"
    )
    pat_s = stages(
        lambda pdf: pdf["name"] == "c",
        lambda pdf: pdf["name"].str.startswith("foo"),
        lambda pdf: pdf["name"] == "b",
    )
    got = sorted(
        (r.t, r.matched_symbol)
        for r in run_to_memory(
            spark,
            CEP.pattern(stream, pat_s, "k", "t").flat_select(),
            "iter_cep_out",
            tmp_dir,
            mode="append",
        ).collect()
    )
    assert got == expected


# ---------------------------------------------------------------------
# SQL surface: match-scoped aggregates in DEFINE
# ---------------------------------------------------------------------


def _ticker(spark):
    """The reference docs' Aggregations input table
    (match_recognize.md: ACME 10:00:00..10:00:11)."""
    rows = [
        ("ACME", "2011-04-01 10:00:00", 12.0, 1),
        ("ACME", "2011-04-01 10:00:01", 17.0, 2),
        ("ACME", "2011-04-01 10:00:02", 13.0, 1),
        ("ACME", "2011-04-01 10:00:03", 16.0, 3),
        ("ACME", "2011-04-01 10:00:04", 25.0, 2),
        ("ACME", "2011-04-01 10:00:05", 2.0, 1),
        ("ACME", "2011-04-01 10:00:06", 4.0, 1),
        ("ACME", "2011-04-01 10:00:07", 10.0, 2),
        ("ACME", "2011-04-01 10:00:08", 15.0, 2),
        ("ACME", "2011-04-01 10:00:09", 25.0, 2),
        ("ACME", "2011-04-01 10:00:10", 25.0, 1),
        ("ACME", "2011-04-01 10:00:11", 30.0, 1),
    ]
    df = spark.createDataFrame(rows, "symbol string, rowtime string, price double, tax int")
    return df.selectExpr(
        "symbol", "cast(rowtime as timestamp) rowtime", "price", "tax"
    )


_DOCS_AGG_SQL = """
SELECT * FROM {src}
    MATCH_RECOGNIZE (
        PARTITION BY symbol
        ORDER BY rowtime
        MEASURES
            FIRST(A.rowtime) AS start_tstamp,
            LAST(A.rowtime) AS end_tstamp,
            AVG(A.price) AS avgPrice
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A+ B)
        DEFINE
            A AS AVG(A.price) < 15
    ) MR
"""


def test_sql_define_aggregation_docs_example(spark, t_env):
    """Verbatim reference query + data + result table
    (match_recognize.md "Aggregations"): accumulate rows into A while
    the running average stays < 15; B has no DEFINE (defaults TRUE)."""
    _ticker(spark).createOrReplaceTempView("iter_ticker")
    out = t_env.execute_sql(_DOCS_AGG_SQL.format(src="iter_ticker"))
    res = [
        (r.symbol, str(r.start_tstamp), str(r.end_tstamp), r.avgPrice)
        for r in out.orderBy("start_tstamp").collect()
    ]
    assert res == [
        ("ACME", "2011-04-01 10:00:00", "2011-04-01 10:00:03", 14.5),
        ("ACME", "2011-04-01 10:00:05", "2011-04-01 10:00:10", 13.5),
    ], res


def test_sql_define_aggregate_expression_single_variable(spark, t_env):
    """SUM over a single-variable expression (docs: 'SUM(A.price *
    A.tax) is a valid one')."""
    _ticker(spark).createOrReplaceTempView("iter_ticker2")
    out = t_env.execute_sql("""
        SELECT * FROM iter_ticker2
            MATCH_RECOGNIZE (
                PARTITION BY symbol
                ORDER BY rowtime
                MEASURES FIRST(A.rowtime) AS s, LAST(A.rowtime) AS e,
                         COUNT(A.price) AS n
                ONE ROW PER MATCH
                PATTERN (A+ B)
                DEFINE A AS SUM(A.price * A.tax) < 60
            ) MR
    """)
    res = [(str(r.s), str(r.e), r.n) for r in out.orderBy("s").collect()]
    assert res == [
        ("2011-04-01 10:00:00", "2011-04-01 10:00:02", 3),
        ("2011-04-01 10:00:04", "2011-04-01 10:00:06", 3),
        ("2011-04-01 10:00:08", "2011-04-01 10:00:08", 1),
        ("2011-04-01 10:00:10", "2011-04-01 10:00:10", 1),
    ], res


def test_sql_multi_variable_aggregate_is_rejected(spark, t_env):
    """Docs: 'AVG(A.price * B.tax) is not [valid]'."""
    _ticker(spark).createOrReplaceTempView("iter_ticker3")
    with pytest.raises(NotImplementedError, match="one pattern variable"):
        t_env.execute_sql("""
            SELECT * FROM iter_ticker3
                MATCH_RECOGNIZE (
                    PARTITION BY symbol ORDER BY rowtime
                    MEASURES COUNT(A.price) AS n
                    ONE ROW PER MATCH
                    PATTERN (A+ B)
                    DEFINE A AS AVG(A.price * B.tax) < 15
                ) MR
        """)


def test_sql_first_last_navigation_in_define(spark, t_env):
    """FIRST/LAST navigation in DEFINE are RUNNING over the partial
    match: B accepts only rows above the first A price."""
    _ticker(spark).createOrReplaceTempView("iter_ticker4")
    out = t_env.execute_sql("""
        SELECT * FROM iter_ticker4
            MATCH_RECOGNIZE (
                PARTITION BY symbol ORDER BY rowtime
                MEASURES FIRST(A.price) AS first_a, LAST(B.price) AS b_price
                ONE ROW PER MATCH
                PATTERN (A B)
                DEFINE A AS A.price < 15,
                       B AS B.price > FIRST(A.price)
            ) MR
    """)
    res = [(r.first_a, r.b_price) for r in out.orderBy("first_a").collect()]
    # pairs (A, B) scanning with skip-past-last-row:
    # (12,17) ok; (13,16) ok; (2,4) ok; (10,15) ok; next A candidate < 15: none left
    assert res == [(2.0, 4.0), (10.0, 15.0), (12.0, 17.0), (13.0, 16.0)], res


def test_sql_streaming_define_aggregation_matches_batch(spark, t_env, tmp_dir):
    """The docs aggregation query on a STREAMING source == batch."""
    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.streaming.source import chunked_replay

    df = _ticker(spark)
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "iter_sql"), n_chunks=3, order_col="rowtime"
    )
    stream.createOrReplaceTempView("iter_ticker_stream")
    out = t_env.execute_sql(_DOCS_AGG_SQL.format(src="iter_ticker_stream"))
    got = sorted(
        (r.symbol, str(r.start_tstamp), str(r.end_tstamp), r.avgPrice)
        for r in run_to_memory(
            spark, out, "iter_sql_out", tmp_dir, mode="append"
        ).collect()
    )
    assert got == [
        ("ACME", "2011-04-01 10:00:00", "2011-04-01 10:00:03", 14.5),
        ("ACME", "2011-04-01 10:00:05", "2011-04-01 10:00:10", 13.5),
    ], got


# ---------------------------------------------------------------------
# iterative_predicate unit behavior
# ---------------------------------------------------------------------


class _FakeCtx:
    def __init__(self, by_sym, records=None, pos=-1):
        self._by = by_sym
        self.records = records or []
        self.pos = pos

    def get_events_for_pattern(self, name):
        return self._by.get(name, [])


def test_iterative_predicate_null_semantics():
    # empty SUM -> NULL -> comparison false; COUNT empty -> 0
    p = iterative_predicate("SUM(a.x) < 100", ["a", "b"], "b")
    assert p({"x": 1}, _FakeCtx({"a": []})) is False
    p2 = iterative_predicate("COUNT(a.x) = 0", ["a", "b"], "b")
    assert p2({"x": 1}, _FakeCtx({"a": []})) is True
    # other-variable bare ref = LAST mapped row; none mapped -> false
    p3 = iterative_predicate("a.x > 0", ["a", "b"], "b")
    assert p3({"x": 5}, _FakeCtx({"a": []})) is False
    assert p3({"x": 5}, _FakeCtx({"a": [{"x": 1}, {"x": 3}]})) is True


def test_iterative_predicate_current_row_inclusion():
    # cur_sym aggregates INCLUDE the row being classified
    p = iterative_predicate("SUM(b.x) <= 6", ["a", "b"], "b")
    assert p({"x": 3}, _FakeCtx({"b": [{"x": 3}]})) is True
    assert p({"x": 4}, _FakeCtx({"b": [{"x": 3}]})) is False
    # COUNT(SYM.*) counts rows
    p2 = iterative_predicate("COUNT(b.*) < 2", ["a", "b"], "b")
    assert p2({"x": 1}, _FakeCtx({"b": []})) is True
    assert p2({"x": 1}, _FakeCtx({"b": [{"x": 1}]})) is False


def test_iterative_predicate_prev_and_loud_rejects():
    p = iterative_predicate("PREV(b.x) + SUM(b.x) > 3", ["a", "b"], "b")
    assert p.max_prev == 1
    recs = [{"x": 9}, {"x": 2}]
    assert p({"x": 2}, _FakeCtx({"b": []}, records=recs, pos=1)) is True
    # PREV off the front -> NULL -> false
    assert p({"x": 9}, _FakeCtx({"b": []}, records=recs, pos=0)) is False
    with pytest.raises(NotImplementedError, match="FINAL"):
        iterative_predicate("FINAL(SUM(b.x)) > 1", ["a", "b"], "b")
    with pytest.raises(NotImplementedError, match="comparison"):
        iterative_predicate("SUM(b.x)", ["a", "b"], "b")


# ---------------------------------------------------------------------
# IterativeConditionsITCase ports (flink-libraries/flink-cep/src/test/
# java/org/apache/flink/cep/nfa/IterativeConditionsITCase.java) —
# events: start1..4 price 1..4, SubEvents foo1..4 price (1,2,3,1),
# end price 1; noSkip emission; matches compared as row-position sets.
# ---------------------------------------------------------------------


def _itcase_sets(spark, df, pat):
    from reshape_on_flink_spark.api.cep import CEP

    m = collections.defaultdict(set)
    for r in (
        CEP.pattern(df, pat, "k", "pos", after_match="no_skip")
        .flat_select()
        .collect()
    ):
        m[r.match_id].add(r.pos)
    return sorted(sorted(v) for v in m.values())


def _sum_for(sym, cap, strict=False):
    def cond(event, ctx):
        s = event["price"] + sum(e["price"] for e in ctx.get_events_for_pattern(sym))
        return s <= cap if not strict else s < cap

    return cond


def _branching_df(spark):
    rows = [
        (1, 1, "start", 1.0, False),
        (1, 2, "foo1", 1.0, True),
        (1, 3, "foo2", 2.0, True),
        (1, 4, "start", 2.0, False),
        (1, 5, "foo3", 3.0, True),
        (1, 6, "foo4", 1.0, True),
        (1, 7, "next-one", 1.0, False),
        (1, 8, "end", 1.0, False),
    ]
    return spark.createDataFrame(rows, "k int, pos int, name string, price double, sub boolean")


def _branching_pattern(combinations):
    from reshape_on_flink_spark.api.cep import Pattern

    p = (
        Pattern.begin("start").where(F.col("name") == "start")
        .followed_by("middle")
        .where(F.col("sub") & F.col("name").startswith("foo"))
        .where(_sum_for("middle", 5.0, strict=True))
        .one_or_more()
    )
    if combinations:
        p = p.allow_combinations()
    return p.followed_by("end").where(F.col("name") == "end")


def test_itcase_iterative_branching_eager(spark):
    """testIterativeWithBranchingPatternEager: 5 matches."""
    got = _itcase_sets(spark, _branching_df(spark), _branching_pattern(False))
    assert got == sorted([
        [1, 2, 3, 6, 8], [1, 2, 3, 8], [1, 2, 8], [4, 5, 6, 8], [4, 5, 8],
    ]), got


def test_itcase_iterative_branching_combinations(spark):
    """testIterativeWithBranchingPatternCombinations: 7 matches."""
    got = _itcase_sets(spark, _branching_df(spark), _branching_pattern(True))
    assert got == sorted([
        [1, 2, 3, 6, 8], [1, 2, 3, 8], [1, 2, 5, 8], [4, 5, 6, 8],
        [1, 2, 6, 8], [1, 2, 8], [4, 5, 8],
    ]), got


def _looping_start_df(spark):
    rows = [
        (1, 1, "start", 1.0),
        (1, 2, "start", 2.0),
        (1, 3, "start", 3.0),
        (1, 4, "end", 1.0),
    ]
    return spark.createDataFrame(rows, "k int, pos int, name string, price double")


def _looping_start_pattern(combinations):
    from reshape_on_flink_spark.api.cep import Pattern

    def iter_start(event, ctx):
        if event["name"] != "start":
            return False
        s = event["price"] + sum(
            e["price"] for e in ctx.get_events_for_pattern("start")
        )
        return s < 5.0

    p = Pattern.begin("start").where(iter_start).one_or_more()
    if combinations:
        p = p.allow_combinations()
    return p.optional().followed_by("end").where(F.col("name") == "end")


def test_itcase_iterative_looping_start_eager(spark):
    """testIterativeWithLoopingStartingEager: incl. the absent-branch
    {end} match (optional loop)."""
    got = _itcase_sets(spark, _looping_start_df(spark), _looping_start_pattern(False))
    assert got == sorted([[1, 2, 4], [1, 4], [2, 4], [3, 4], [4]]), got


def test_itcase_iterative_looping_start_combinations(spark):
    """testIterativeWithLoopingStartingCombination: + the skip-s2 set."""
    got = _itcase_sets(spark, _looping_start_df(spark), _looping_start_pattern(True))
    assert got == sorted([[1, 2, 4], [1, 3, 4], [1, 4], [2, 4], [3, 4], [4]]), got


def test_itcase_iterative_prev_pattern_dependency(spark):
    """testIterativeWithPrevPatternDependency: the END stage's condition
    sums a PRIOR stage's accepted events (no current-row inclusion)."""
    from reshape_on_flink_spark.api.cep import Pattern

    rows = [(1, 1, "start", 1.0), (1, 2, "start", 2.0), (1, 3, "end", 1.0)]
    df = spark.createDataFrame(rows, "k int, pos int, name string, price double")

    def end_iter(event, ctx):
        if event["name"] != "end":
            return False
        return sum(e["price"] for e in ctx.get_events_for_pattern("start")) >= 2.0

    pat = (
        Pattern.begin("start").where(F.col("name") == "start").one_or_more()
        .followed_by("end").where(end_iter)
    )
    got = _itcase_sets(spark, df, pat)
    assert got == sorted([[1, 2, 3], [2, 3]]), got


def test_itcase_iterative_abac(spark):
    """testIterativeWithABACPattern: start -> followedByAny(subtype foo)
    -> iterative 'start' loop (sum <= 5) -> end; 5 matches."""
    from reshape_on_flink_spark.api.cep import Pattern

    rows = [
        (1, 1, "start", 1.0, False),
        (1, 2, "foo1", 1.0, True),
        (1, 3, "start", 2.0, False),
        (1, 4, "start", 3.0, False),
        (1, 5, "foo2", 2.0, True),
        (1, 6, "start", 4.0, False),
        (1, 7, "foo3", 3.0, True),
        (1, 8, "foo4", 1.0, True),
        (1, 9, "end", 1.0, False),
    ]
    df = spark.createDataFrame(rows, "k int, pos int, name string, price double, sub boolean")

    def mid2_iter(event, ctx):
        if event["name"] != "start":
            return False
        s = event["price"] + sum(
            e["price"] for e in ctx.get_events_for_pattern("middle2")
        )
        return s <= 5.0

    pat = (
        Pattern.begin("start").where(F.col("name") == "start")
        .followed_by_any("middle1")
        .where(F.col("sub") & F.col("name").startswith("foo"))
        .followed_by("middle2").where(mid2_iter).one_or_more()
        .followed_by("end").where(F.col("name") == "end")
    )
    got = _itcase_sets(spark, df, pat)
    assert got == sorted([
        [1, 2, 3, 4, 9], [1, 2, 3, 9], [1, 5, 6, 9], [3, 5, 6, 9], [4, 5, 6, 9],
    ]), got


def test_itcase_iterative_prev_dependency_after_branching(spark):
    """testIterativeWithPrevPatternDependencyAfterBranching: 7 matches,
    the final followedByAny end sums the 'start' loop."""
    from reshape_on_flink_spark.api.cep import Pattern

    rows = [
        (1, 1, "start", 1.0, False),
        (1, 2, "start", 2.0, False),
        (1, 3, "foo1", 1.0, True),
        (1, 4, "start", 3.0, False),
        (1, 5, "foo2", 2.0, True),
        (1, 6, "end", 1.0, False),
    ]
    df = spark.createDataFrame(rows, "k int, pos int, name string, price double, sub boolean")

    def end_iter(event, ctx):
        if event["name"] != "end":
            return False
        return sum(e["price"] for e in ctx.get_events_for_pattern("start")) >= 2.0

    pat = (
        Pattern.begin("start").where(F.col("name") == "start").one_or_more()
        .followed_by_any("middle1")
        .where(F.col("sub") & F.col("name").startswith("foo"))
        .followed_by_any("end").where(end_iter)
    )
    got = _itcase_sets(spark, df, pat)
    assert got == sorted([
        [1, 2, 3, 6], [2, 3, 6], [1, 2, 5, 6], [1, 2, 4, 5, 6],
        [2, 4, 5, 6], [2, 5, 6], [4, 5, 6],
    ]), got


def test_or_iterative_and_subtype_sugar(spark):
    """or_ over iterative conditions (RichOrCondition, like kinds) and
    subtype() narrowing (Pattern.java:190)."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern

    df = _relaxed_df(spark)
    pat = (
        Pattern.begin("a").where(lambda e, ctx: e["name"] == "c")
        .next("b2")
        .where(lambda e, ctx: e["price"] > 100.0)
        .or_(lambda e, ctx: e["name"] == "foo1")
    )
    out = CEP.pattern(df, pat, "k", "t").flat_select()
    assert sorted((r.t, r.matched_symbol) for r in out.collect()) == [
        (1, "a"), (2, "b2"),
    ]
    # subtype() == where() narrowing
    pat2 = (
        Pattern.begin("a").where(F.col("name") == "c")
        .followed_by("s").subtype(F.col("price") > 1.0)
        .where(F.col("name").startswith("foo"))
    )
    got = sorted(
        r.t for r in CEP.pattern(df, pat2, "k", "t").flat_select().collect()
    )
    assert got == [1, 2]
    # OR across the static/iterative boundary raises with guidance
    with pytest.raises(ValueError, match="prior\\s+iterative"):
        Pattern.begin("x").where(F.col("name") == "c").or_(
            lambda e, ctx: True
        )


# ---------------------------------------------------------------------
# MEASURES expressions (Flink MatchCodeGenerator: arbitrary expressions
# over match-scoped aggregates/navigation)
# ---------------------------------------------------------------------


def _seq_view(spark, name):
    df = _ticker(spark).selectExpr(
        "symbol", "cast(rowtime as long) - cast(timestamp'2011-04-01 10:00:00' as long) AS sec",
        "price", "tax"
    )
    df.createOrReplaceTempView(name)
    return df


def test_measures_expression_one_row(spark, t_env):
    """LAST - FIRST / derived averages / MATCH_NUMBER arithmetic in
    ONE ROW PER MATCH measures."""
    _seq_view(spark, "mexpr1")
    out = t_env.execute_sql("""
        SELECT * FROM mexpr1
            MATCH_RECOGNIZE (
                PARTITION BY symbol ORDER BY sec
                MEASURES
                    LAST(A.sec) - FIRST(A.sec) AS dur,
                    SUM(A.price) / COUNT(A.price) AS avg2,
                    AVG(A.price) AS avg1,
                    MATCH_NUMBER() * 100 + COUNT(A.*) AS coded
                ONE ROW PER MATCH
                PATTERN (A+ B)
                DEFINE A AS AVG(A.price) < 15
            ) MR
    """)
    rows = sorted(
        (r.dur, r.avg2, r.avg1, r.coded) for r in out.collect()
    )
    # docs matches: A spans :00-:03 (4 rows) and :05-:10 (6 rows)
    assert rows == [(3, 14.5, 14.5, 104), (5, 13.5, 13.5, 206)], rows


def test_measures_expression_all_rows_running_final(spark, t_env):
    """Per-atom RUNNING/FINAL wrappers inside one expression:
    remaining = FINAL(SUM) - RUNNING(SUM) decreases to zero."""
    _seq_view(spark, "mexpr2")
    out = t_env.execute_sql("""
        SELECT sec, remaining FROM mexpr2
            MATCH_RECOGNIZE (
                PARTITION BY symbol ORDER BY sec
                MEASURES FINAL(SUM(A.price)) - RUNNING(SUM(A.price)) AS remaining
                ALL ROWS PER MATCH
                PATTERN (A+ B)
                DEFINE A AS AVG(A.price) < 15
            ) MR
        WHERE sec <= 3
        ORDER BY sec
    """)
    got = [(r.sec, r.remaining) for r in out.collect()]
    # first match A rows: prices 12,17,13,16 (sum 58)
    assert got == [(0, 46.0), (1, 29.0), (2, 16.0), (3, 0.0)], got


def test_measures_expression_streaming_matches_batch(spark, t_env, tmp_dir):
    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.streaming.source import chunked_replay

    df = _seq_view(spark, "mexpr3_b")
    sql = """
        SELECT * FROM {src}
            MATCH_RECOGNIZE (
                PARTITION BY symbol ORDER BY sec
                MEASURES LAST(A.sec) - FIRST(A.sec) AS dur,
                         SUM(A.price) / COUNT(A.price) AS avg2
                ONE ROW PER MATCH
                PATTERN (A+ B)
                DEFINE A AS AVG(A.price) < 15
            ) MR
    """
    batch = sorted(
        (float(r.dur), r.avg2) for r in t_env.execute_sql(sql.format(src="mexpr3_b")).collect()
    )
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "mexpr3"), n_chunks=3, order_col="sec"
    )
    stream.createOrReplaceTempView("mexpr3_s")
    got = sorted(
        (float(r.dur), r.avg2)
        for r in run_to_memory(
            spark, t_env.execute_sql(sql.format(src="mexpr3_s")), "mexpr3_out", tmp_dir, mode="append"
        ).collect()
    )
    assert got == batch and len(got) == 2, (got, batch)


def test_measures_expression_rejects_functions(spark, t_env):
    _seq_view(spark, "mexpr4")
    with pytest.raises(NotImplementedError, match="expression subset"):
        t_env.execute_sql("""
            SELECT * FROM mexpr4
                MATCH_RECOGNIZE (
                    PARTITION BY symbol ORDER BY sec
                    MEASURES ABS(LAST(A.price) - 1) AS x
                    ONE ROW PER MATCH
                    PATTERN (A B)
                    DEFINE A AS A.price < 15
                ) MR
        """)


def test_iterative_inside_group_pattern(spark):
    """A group's inner stage carries an iterative condition; the
    group-loop relaxed filler uses the FIRST leaf's iterative take as
    its ignore guard (NFACompiler getIgnoreCondition through
    GroupPattern)."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern

    rows = [
        (1, 1, "s", 0.0),
        (1, 2, "a", 2.0),
        (1, 3, "b", 1.0),
        (1, 4, "a", 9.0),   # statically a, iteratively rejected (sum 11)
        (1, 5, "a", 2.0),
        (1, 6, "b", 1.0),
        (1, 7, "e", 0.0),
    ]
    df = spark.createDataFrame(rows, "k int, t int, name string, price double")

    def a_iter(e, ctx):
        s = e["price"] + sum(x["price"] for x in ctx.get_events_for_pattern("ga"))
        return s < 5.0

    grp = (
        Pattern.begin("ga").where(F.col("name") == "a").where(a_iter)
        .followed_by("gb").where(F.col("name") == "b")
    )
    pat = (
        Pattern.begin("s").where(F.col("name") == "s")
        .followed_by(grp).one_or_more()
        .followed_by("e").where(F.col("name") == "e")
    )
    out = CEP.pattern(df, pat, "k", "t", after_match="no_skip").flat_select()
    m = collections.defaultdict(list)
    for r in out.collect():
        m[r.match_id].append(r.t)
    sets = sorted(sorted(v) for v in m.values())
    # (a b) repetitions from s: {2,3}; second rep skips the iteratively
    # failing a@4 (relaxed), takes a@5 b@6 (sum 4)
    assert sets == [
        [1, 2, 3, 5, 6, 7],
        [1, 2, 3, 7],
    ], sets
    assert all(4 not in v for v in m.values())


def test_sql_define_aggregate_with_within(spark, t_env):
    """DEFINE aggregates compose with PATTERN ... WITHIN: the horizon
    clamps the scan before the iterative bound would."""
    _seq_view(spark, "iterw")
    out = t_env.execute_sql("""
        SELECT * FROM iterw
            MATCH_RECOGNIZE (
                PARTITION BY symbol ORDER BY sec
                MEASURES FIRST(A.sec) AS s, COUNT(A.*) AS n
                ONE ROW PER MATCH
                PATTERN (A+ B) WITHIN INTERVAL '3' SECOND
                DEFINE A AS AVG(A.price) < 15
            ) MR
    """)
    got = sorted((r.s, r.n) for r in out.collect())
    # without WITHIN the first match is A=:00-:03 + B=:04 (5 rows,
    # strictly-< horizon of 3s forbids it): A can span at most rows
    # within [s, s+3) incl. B
    assert all(n <= 2 for _s, n in got) and got, got


def test_predicate_string_literals_shield_atom_lookalikes():
    """String literals are lifted BEFORE any atom rewrite, so a literal
    whose text looks like an aggregate/PREV/SYM.col atom compares as a
    literal instead of silently miscompiling (round-9 advice)."""
    # iterative route: literal containing SUM(...) and a SYM.col ref
    p = iterative_predicate("b.name = 'SUM(b.x)'", ["a", "b"], "b")
    assert p({"name": "SUM(b.x)"}, _FakeCtx({})) is True
    assert p({"name": "other"}, _FakeCtx({})) is False
    p2 = iterative_predicate("b.name = 'see b.x here'", ["a", "b"], "b")
    assert p2({"name": "see b.x here"}, _FakeCtx({})) is True
    # pandas route: literal containing PREV(...) / a forbidden fn name
    import pandas as pd

    from reshape_on_flink_spark.operators.cep import pandas_predicate

    pp = pandas_predicate("A.name = 'PREV(A.x)'", ["A"])
    got = pp(pd.DataFrame({"name": ["PREV(A.x)", "nope"]}))
    assert got.tolist() == [True, False]
    assert pp.max_prev == 0  # the quoted PREV never compiled to a shift
    pp2 = pandas_predicate("A.name = 'LAST(call)'", ["A"])  # guard name in quotes
    assert pp2(pd.DataFrame({"name": ["LAST(call)"]})).tolist() == [True]


def test_where_dispatch_optional_ctx_and_uninspectable(spark):
    """where() routes (event, ctx=None) as an IterativeCondition (2
    positional params regardless of defaults), raises a CLEAR error for
    signature-less callables, and where_iterative() bypasses dispatch
    (round-9 advice)."""
    import functools

    from reshape_on_flink_spark.api.cep import CEP, Pattern, _is_iterative_cond

    def with_default(event, ctx=None):
        return event["v"] > 1

    assert _is_iterative_cond(with_default) is True
    assert _is_iterative_cond(lambda pdf: pdf["v"] > 1) is False
    # the default-arg capture idiom stays a pandas predicate (one
    # REQUIRED positional; second positional not named ctx) — a silent
    # iterative misroute here would produce wrong matches
    assert _is_iterative_cond(lambda pdf, n=3: pdf["v"] > n) is False

    def pdf_pred(pdf, threshold=1):
        return pdf["v"] > threshold

    assert _is_iterative_cond(pdf_pred) is False
    # explicit marker wins over inspection
    pdf_pred.cep_iterative = False
    assert _is_iterative_cond(pdf_pred) is False
    # an uninspectable callable raises with guidance, not a misroute
    uninspectable = functools.reduce  # C-implemented, no signature
    try:
        import inspect

        inspect.signature(uninspectable)
        has_sig = True
    except (TypeError, ValueError):
        has_sig = False
    if not has_sig:
        with pytest.raises(TypeError, match="cep_iterative"):
            _is_iterative_cond(uninspectable)
    # end-to-end: ctx-defaulted iterative condition works via where()
    df = spark.createDataFrame(
        [(1, 0, 1.0), (2, 0, 5.0), (3, 0, 2.0)], "seq int, k int, v double"
    )
    pat = (
        Pattern.begin("s").where(lambda e, ctx=None: e["v"] >= 1.0)
        .next("b").where_iterative(
            lambda e, ctx: sum(x["v"] for x in ctx.get_events_for_pattern("s")) < e["v"]
        )
    )
    out = CEP.pattern(df, pat, "k", "seq").select(
        start=F.min("seq"), n=F.count("*")
    )
    rows = {(r.start, r.n) for r in out.collect()}
    assert rows == {(1, 2)}, rows


# ---------------------------------------------------------------------
# NFAIterativeConditionTimeContextTest ports (flink-libraries/flink-cep/
# src/test/java/org/apache/flink/cep/nfa/
# NFAIterativeConditionTimeContextTest.java)
# ---------------------------------------------------------------------


def test_iterative_ctx_event_timestamp(spark):
    """:42 testEventTimestamp — ctx.timestamp() == the record's event
    time: one event at ts 3 matches `ctx.timestamp() == 3`; numeric
    orders return the raw order value, timestamp orders epoch ms."""
    from reshape_on_flink_spark.operators.cep import match_recognize

    df = spark.createDataFrame(
        [(1, 3, 10.0), (1, 5, 20.0)], "k int, ts int, v double"
    )
    out = match_recognize(
        df, "k", "ts", "A", {"A": F.lit(True)},
        after_match="to_next_row",
        iter_define={"A": lambda e, ctx: ctx.timestamp() == 3},
    )
    assert [r.ts for r in out.collect()] == [3]
    # timestamp order column -> epoch milliseconds (StreamRecord unit)
    import datetime as dt

    t = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    ms = int(t.timestamp() * 1000)
    df2 = spark.createDataFrame([(1, t, 1.0)], "k int, ts timestamp, v double")
    out2 = match_recognize(
        df2, "k", "ts", "A", {"A": F.lit(True)},
        iter_define={"A": lambda e, ctx, ms=ms: ctx.timestamp() == ms},
    )
    assert out2.count() == 1


def test_iterative_ctx_current_processing_time(spark):
    """:67 testCurrentProcessingTime — with the injected timer service
    (TestTimerService analog) at 1 nothing matches; at 3 the event
    matches `ctx.currentProcessingTime() == 3`."""
    from reshape_on_flink_spark.operators.cep import match_recognize

    df = spark.createDataFrame([(1, 7, 1.0), (1, 8, 2.0)], "k int, ts int, v double")
    clock = {"now": 1}
    kw = dict(
        after_match="to_next_row",
        iter_define={"A": lambda e, ctx: ctx.current_processing_time() == 3},
        timer_service=lambda: clock["now"],
    )
    assert match_recognize(df, "k", "ts", "A", {"A": F.lit(True)}, **kw).count() == 0
    clock["now"] = 3
    assert match_recognize(df, "k", "ts", "A", {"A": F.lit(True)}, **kw).count() == 2
    # default (no timer_service): wall clock, monotone non-zero
    got = match_recognize(
        df, "k", "ts", "A", {"A": F.lit(True)},
        after_match="to_next_row",
        iter_define={"A": lambda e, ctx: ctx.current_processing_time() > 1_600_000_000_000},
    )
    assert got.count() == 2


# ---------------------------------------------------------------------
# Timed-out partials with ITERATIVE survival scans (round 13): the
# consume scan's take-ability is branch-dependent, so the engine
# re-evaluates the IterativeCondition per parked branch over its
# statically-viable gap events — a cogrouped per-assignment pass on
# batch, the in-loop candidate walk on streaming. Reference: the scan
# replays the same take condition NFA.java evaluates on the waiting
# state's TAKE edge, with ctx = the branch's own partial match.
# ---------------------------------------------------------------------


def _gt_first_a_():
    # closure -> cloudpickled by value (executors can't import test modules)
    def cond(event, ctx):
        a_rows = ctx.get_events_for_pattern("A")
        return bool(a_rows) and event["v"] > a_rows[0]["v"]

    return cond


def _b_increasing_():
    def cond(event, ctx):
        bs = ctx.get_events_for_pattern("B")
        return event["v"] > max((e["v"] for e in bs), default=float("-inf"))

    return cond


def _to_sets(tdf):
    per = {}
    for r in tdf.collect():
        per.setdefault(r.timeout_id, [set(), None])
        per[r.timeout_id][0].add(r.ts)
        per[r.timeout_id][1] = r.timeout_ts
    return {(frozenset(v[0]), v[1]) for v in per.values()}


def test_timeout_iterative_head_scan_batch(spark):
    """Waiter consume scan with an iterative-only stage: b(v=3) after
    a(v=5) is statically viable but iteratively rejected, so the {a}
    waiter is NOT consumed and times out; with b(v=7) the take fires
    and the waiter is consumed (match, no timeout)."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern

    rows = [
        (1, 1, "a", 5.0), (1, 3, "b", 3.0), (1, 30, "w", 0.0),
        (2, 1, "a", 5.0), (2, 4, "b", 7.0), (2, 30, "w", 0.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts int, name string, v double")
    pat = (
        Pattern.begin("A").where(F.col("name") == "a")
        .followed_by("B").where_iterative(_gt_first_a_())
        .within(10)
    )
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    got = {}
    for r in ps.timed_out_partial_matches().collect():
        got.setdefault((r.k, r.timeout_id), set()).add(r.ts)
    assert {frozenset(v) for v in got.values()} == {frozenset({1})} and all(
        k[0] == 1 for k in got
    ), got


def test_timeout_iterative_midloop_and_copy_batch(spark):
    """Mid-loop survival with an iterative loop condition (strictly
    increasing B values): b@3(v=4) statically matches but iteratively
    fails against the {a,b@2(v=5)} branch, so that branch parks
    un-consumed and times out; the static-only scan would have
    consumed it."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern

    rows = [(1, 1, "a", 0.0), (1, 2, "b", 5.0), (1, 3, "b", 4.0),
            (1, 30, "w", 0.0)]
    df = spark.createDataFrame(rows, "k int, ts int, name string, v double")
    pat = (
        Pattern.begin("A").where(F.col("name") == "a")
        .followed_by("B").where(F.col("name") == "b")
        .where_iterative(_b_increasing_()).one_or_more()
        .followed_by("C").where(F.col("name") == "c")
        .within(10)
    )
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    assert _to_sets(ps.timed_out_partial_matches()) == {
        (frozenset({1, 2}), 11.0)
    }


def test_timeout_iterative_streaming_equals_batch(spark, tmp_dir):
    """The streaming candidate walk evaluates the same per-branch
    IterativeCondition as the batch cogroup pass."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern
    from reshape_on_flink_spark.streaming.source import chunked_replay
    from tests.test_streaming import run_to_memory

    rows = [(1, 1, "a", 0.0), (1, 2, "b", 5.0), (1, 3, "b", 4.0),
            (1, 30, "w", 0.0),
            (2, 1, "a", 0.0), (2, 2, "b", 1.0), (2, 3, "b", 2.0),
            (2, 30, "w", 0.0)]
    df = spark.createDataFrame(rows, "k int, ts int, name string, v double")

    def pat():
        return (
            Pattern.begin("A").where(F.col("name") == "a")
            .where(lambda p: p["name"] == "a")
            .followed_by("B").where(F.col("name") == "b")
            .where(lambda p: p["name"] == "b")
            .where_iterative(_b_increasing_()).one_or_more()
            .followed_by("C").where(F.col("name") == "c")
            .where(lambda p: p["name"] == "c")
            .within(10)
        )

    ps = CEP.pattern(df, pat(), "k", "ts", after_match="no_skip")
    got_b = {}
    for r in ps.timed_out_partial_matches().collect():
        got_b.setdefault((r.k, r.timeout_id), set()).add(r.ts)
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "it_to"), n_chunks=3, order_col="ts"
    )
    sdf = CEP.pattern(
        stream, pat(), "k", "ts", after_match="no_skip"
    ).timed_out_partial_matches()
    srows = run_to_memory(spark, sdf, "it_to_out", tmp_dir, mode="append").collect()
    got_s = {}
    for r in srows:
        got_s.setdefault((r.k, r.timeout_id), set()).add(r.ts)
    assert sorted(map(sorted, got_s.values())) == sorted(
        map(sorted, got_b.values())
    )
    # per-branch ground truth: key 1 parks {a,b2}; key 2's increasing
    # chain parks {a,b2}, {a,b2,b3} (relaxed consume forces b3's take)
    assert sorted(map(sorted, got_b.values())) == [
        [1, 2], [1, 2], [1, 2, 3]
    ]


def test_timeout_iterative_streaming_skip_equals_batch(spark, tmp_dir):
    """Round 14 (lifts the last streaming-skip guard): the incremental
    full-pattern cursor threads the IterativeCondition context, so
    streaming + skip strategy + iterative conditions == batch. The
    fixture exercises both sides of the context: key 1's match prunes
    its partials and leaves the post-match start; key 2's iterative
    cap blocks b@14 (7+9 > 10), so the waiter survives the statically
    take-able event and parks {11,12,13}."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern
    from reshape_on_flink_spark.streaming.source import chunked_replay
    from tests.test_streaming import run_to_memory

    rows = [(1, 1, "a", 0.0), (1, 2, "b", 5.0), (1, 3, "x", 1.0),
            (1, 4, "b", 5.0), (1, 5, "c", 0.0), (1, 6, "a", 0.0),
            (1, 7, "b", 2.0), (1, 30, "w", 0.0),
            (2, 11, "a", 0.0), (2, 12, "b", 3.0), (2, 13, "b", 4.0),
            (2, 14, "b", 9.0), (2, 40, "w", 0.0)]
    df = spark.createDataFrame(rows, "k int, ts int, name string, v double")

    def _cap(event, ctx):
        return (
            sum(e["v"] for e in ctx.get_events_for_pattern("B"))
            + event["v"] <= 10
        )

    def pat():
        return (
            Pattern.begin("A").where(F.col("name") == "a")
            .where(lambda p: p["name"] == "a")
            .followed_by("B").where(F.col("name") == "b")
            .where(lambda p: p["name"] == "b")
            .where_iterative(_cap).one_or_more()
            .followed_by("C").where(F.col("name") == "c")
            .where(lambda p: p["name"] == "c")
            .within(10)
        )

    want = [[6, 7], [11, 12], [11, 12, 13]]
    for i, after in enumerate(
        ("past_last_row", "to_next_row", "to_first B")
    ):
        got_b = {}
        for r in CEP.pattern(
            df, pat(), "k", "ts", after_match=after
        ).timed_out_partial_matches().collect():
            got_b.setdefault((r.k, r.timeout_id), set()).add(r.ts)
        stream = chunked_replay(
            spark, df, os.path.join(tmp_dir, f"it_sk{i}"), n_chunks=4,
            order_col="ts",
        )
        sdf = CEP.pattern(
            stream, pat(), "k", "ts", after_match=after
        ).timed_out_partial_matches()
        srows = run_to_memory(
            spark, sdf, f"it_sk_out{i}", tmp_dir, mode="append"
        ).collect()
        got_s = {}
        for r in srows:
            got_s.setdefault((r.k, r.timeout_id), set()).add(r.ts)
        assert sorted(map(sorted, got_s.values())) == sorted(
            map(sorted, got_b.values())
        ), after
        # ground truth: key 1's partials are PRUNED by the match
        # {a1,b2,b4,c5} (emission at c@5 precedes their horizon 11)
        # and the post-match {a6,b7} parks. Key 2: {11,12} (C-copy),
        # {11,12,13} (the iterative cap blocks b@14 from consuming
        # the waiter).
        assert sorted(map(sorted, got_b.values())) == sorted(want), after


def _c_increasing_():
    def cond(event, ctx):
        cs = ctx.get_events_for_pattern("C")
        return event["v"] > max((e["v"] for e in cs), default=float("-inf"))

    return cond


def test_timeout_group_loop_iterative_inner_leaf(spark, tmp_dir):
    """Round 13: an ITERATIVE condition on a group-loop inner leaf.
    A fb (B C)+ fb D within 10 where C requires v strictly above every
    prior C across iterations. Over a b c(5) b c(4) w: iteration 2's
    waiter {a,b,c5,b} is statically consumable by c@5(v=4) but the
    IterativeCondition rejects it against the branch's own C history
    (the renamed C__gq iteration rows included), so the branch parks
    and times out — a static-only scan would consume it. Stream ==
    batch."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern
    from reshape_on_flink_spark.streaming.source import chunked_replay
    from tests.test_streaming import run_to_memory

    rows = [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "c", 5.0),
            (1, 4, "b", 0.0), (1, 5, "c", 4.0), (1, 30, "w", 0.0)]
    df = spark.createDataFrame(rows, "k int, ts int, name string, v double")

    def pat():
        grp = (
            Pattern.begin("B").where(F.col("name") == "b")
            .where(lambda p: p["name"] == "b")
            .followed_by("C").where(F.col("name") == "c")
            .where(lambda p: p["name"] == "c")
            .where_iterative(_c_increasing_())
        )
        return (
            Pattern.begin("A").where(F.col("name") == "a")
            .where(lambda p: p["name"] == "a")
            .followed_by(grp).one_or_more()
            .followed_by("D").where(F.col("name") == "d")
            .where(lambda p: p["name"] == "d")
            .within(10)
        )

    ps = CEP.pattern(df, pat(), "k", "ts", after_match="no_skip")
    got_b = _to_sets(ps.timed_out_partial_matches())
    # {a,b,c} is consumed by b@4 but its successor copy at D
    # (proceed-reachable once the loop minimum is met) survives
    assert got_b == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
    }, got_b
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "gli_to"), n_chunks=3,
        order_col="ts",
    )
    sdf = CEP.pattern(
        stream, pat(), "k", "ts", after_match="no_skip"
    ).timed_out_partial_matches()
    srows = run_to_memory(spark, sdf, "gli_out", tmp_dir, mode="append").collect()
    per = {}
    for r in srows:
        per.setdefault(r.timeout_id, [set(), None])
        per[r.timeout_id][0].add(r.ts)
        per[r.timeout_id][1] = r.timeout_ts
    assert {(frozenset(v[0]), v[1]) for v in per.values()} == got_b


def test_timeout_iterative_static_flag_streaming(spark, tmp_dir):
    """Round-14 fix: the streaming timeout operator's IterativeCondition
    context must expose the __sym static flags — the compiler's
    iterative FILLER conditions read the loop body's static verdict off
    the row (e.get(f"__sym_{{name}}", True)), and without the column the
    permissive default made a statically-non-take-able row (x@3, which
    passes the iterative cap but is not a 'b') break the loop gap: the
    {a,b2,b4} park was silently dropped on streams while batch emitted
    it. Stream == batch, values pinned."""
    from reshape_on_flink_spark.api.cep import CEP, Pattern
    from reshape_on_flink_spark.streaming.source import chunked_replay
    from tests.test_streaming import run_to_memory

    rows = [(1, 1, "a", 0.0), (1, 2, "b", 5.0), (1, 3, "x", 1.0),
            (1, 4, "b", 5.0), (1, 30, "w", 0.0)]
    df = spark.createDataFrame(rows, "k int, ts int, name string, v double")

    def _cap(event, ctx):
        return (
            sum(e["v"] for e in ctx.get_events_for_pattern("B"))
            + event["v"] <= 10
        )

    def pat():
        return (
            Pattern.begin("A").where(F.col("name") == "a")
            .where(lambda p: p["name"] == "a")
            .followed_by("B").where(F.col("name") == "b")
            .where(lambda p: p["name"] == "b")
            .where_iterative(_cap).one_or_more()
            .followed_by("C").where(F.col("name") == "c")
            .where(lambda p: p["name"] == "c")
            .within(10)
        )

    got_b = {}
    for r in CEP.pattern(
        df, pat(), "k", "ts", after_match="no_skip"
    ).timed_out_partial_matches().collect():
        got_b.setdefault((r.k, r.timeout_id), set()).add(r.ts)
    assert sorted(map(sorted, got_b.values())) == [[1, 2], [1, 2, 4]]
    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, "it_flag"), n_chunks=3,
        order_col="ts",
    )
    sdf = CEP.pattern(
        stream, pat(), "k", "ts", after_match="no_skip"
    ).timed_out_partial_matches()
    srows = run_to_memory(
        spark, sdf, "it_flag_out", tmp_dir, mode="append"
    ).collect()
    got_s = {}
    for r in srows:
        got_s.setdefault((r.k, r.timeout_id), set()).add(r.ts)
    assert sorted(map(sorted, got_s.values())) == [[1, 2], [1, 2, 4]]
