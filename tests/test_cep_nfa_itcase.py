"""NFAITCase ports — the reference NFA's core quantifier/branching
matrices (flink-libraries/flink-cep/src/test/java/org/apache/flink/
cep/nfa/NFAITCase.java), run through the fluent builder under noSkip
(the NFA's default emission) and compared as row-position sets.

Event model: (pos, name, price, volume, sub) — ``sub`` marks the
reference's SubEvent subtype, ``volume`` its extra field.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from reshape_on_flink_spark.api.cep import CEP, Pattern


def _df(spark, rows):
    return spark.createDataFrame(
        [(1, i + 1, *r) for i, r in enumerate(rows)],
        "k int, pos int, name string, price double, volume double, sub boolean",
    )


def _ev(name, price=1.0, volume=0.0, sub=False):
    return (name, price, volume, sub)


def _sets(spark, rows, pat):
    m = collections.defaultdict(set)
    out = CEP.pattern(_df(spark, rows), pat, "k", "pos", after_match="no_skip")
    for r in out.flat_select().collect():
        m[r.match_id].add(r.pos)
    return sorted(sorted(v) for v in m.values())


def _n(name):  # simple name condition
    return F.col("name") == name


def test_nfa_itcase_branching_pattern(spark):
    """testBranchingPattern: start fba(subtype volume>5) fba(subtype
    next-one) fba(end) — full cross product of candidates."""
    rows = [
        _ev("start"),
        _ev("foo1", volume=10.0, sub=True),
        _ev("foo2", volume=10.0, sub=True),
        _ev("foo3", volume=10.0, sub=True),
        _ev("next-one", volume=2.0, sub=True),
        _ev("next-one", volume=2.0, sub=True),
        _ev("end"),
    ]
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by_any("mf").subtype(F.col("sub")).where(F.col("volume") > 5.0)
        .followed_by_any("ms").subtype(F.col("sub")).where(_n("next-one"))
        .followed_by_any("end").where(_n("end"))
    )
    got = _sets(spark, rows, pat)
    assert got == sorted(
        [1, i, j, 7] for i in (2, 3, 4) for j in (5, 6)
    ), got


def test_nfa_itcase_complex_branching_after_zero_or_more(spark):
    """testComplexBranchingAfterZeroOrMore: c fba(a+ combinations
    optional) fba(b) fba(d) fba(e) — 16 matches (every a-subset incl.
    empty x every d)."""
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0),
        _ev("b", 5.0), _ev("d", 6.0), _ev("d", 7.0), _ev("e", 8.0),
    ]
    pat = (
        Pattern.begin("start").where(_n("c"))
        .followed_by_any("mid").where(_n("a"))
        .one_or_more().allow_combinations().optional()
        .followed_by_any("e1").where(_n("b"))
        .followed_by_any("e2").where(_n("d"))
        .followed_by_any("e3").where(_n("e"))
    )
    got = _sets(spark, rows, pat)
    subsets = [
        [], [2], [3], [4], [2, 3], [2, 4], [3, 4], [2, 3, 4],
    ]
    assert got == sorted(
        sorted([1, *s, 5, d, 8]) for s in subsets for d in (6, 7)
    ), got


def test_nfa_itcase_zero_or_more(spark):
    """testZeroOrMore: c fba(a+ combinations optional) followedBy b."""
    rows = [_ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("b", 5.0)]
    pat = (
        Pattern.begin("start").where(_n("c"))
        .followed_by_any("mid").where(_n("a"))
        .one_or_more().allow_combinations().optional()
        .followed_by("end").where(_n("b"))
    )
    assert _sets(spark, rows, pat) == [
        [1, 2, 3, 4], [1, 2, 4], [1, 3, 4], [1, 4],
    ]


def test_nfa_itcase_eager_zero_or_more(spark):
    """testEagerZeroOrMore: relaxed a+ optional skips the interleaved
    'd' and folds the a-subsequence eagerly (prefixes only)."""
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("d", 6.0),
        _ev("a", 4.0), _ev("b", 5.0),
    ]
    pat = (
        Pattern.begin("start").where(_n("c"))
        .followed_by("mid").where(_n("a")).one_or_more().optional()
        .followed_by("end").where(_n("b"))
    )
    assert _sets(spark, rows, pat) == [
        [1, 2, 3, 5, 6], [1, 2, 3, 6], [1, 2, 6], [1, 6],
    ]


def test_nfa_itcase_begin_with_zero_or_more(spark):
    """testBeginWithZeroOrMore: a pattern STARTING with an optional
    loop anchors computations at every event — including the bare
    {end} match exactly once (the filler-anchoring rule)."""
    rows = [_ev("a", 2.0), _ev("a", 3.0), _ev("a", 3.0), _ev("b", 4.0)]
    pat = (
        Pattern.begin("mid").where(_n("a")).one_or_more().optional()
        .followed_by("end").where(_n("b"))
    )
    assert _sets(spark, rows, pat) == [
        [1, 2, 3, 4], [1, 2, 4], [1, 4], [2, 3, 4], [2, 4], [3, 4], [4],
    ]


def test_nfa_itcase_zero_or_more_after_zero_or_more(spark):
    """testZeroOrMoreAfterZeroOrMore: two chained optional combination
    loops; the second loop's FIRST element is pinned by its relaxed
    stage link (subsets must contain d@3)."""
    rows = [_ev("c"), _ev("a", 2.0), _ev("d", 3.0), _ev("d", 4.0), _ev("e", 4.0)]
    pat = (
        Pattern.begin("start").where(_n("c"))
        .followed_by_any("m1").where(_n("a"))
        .one_or_more().allow_combinations().optional()
        .followed_by("m2").where(_n("d"))
        .one_or_more().allow_combinations().optional()
        .followed_by("end").where(_n("e"))
    )
    assert _sets(spark, rows, pat) == sorted([
        [1, 2, 3, 4, 5], [1, 2, 3, 5], [1, 3, 4, 5],
        [1, 3, 5], [1, 2, 5], [1, 5],
    ]), _sets(spark, rows, pat)


def test_nfa_itcase_zero_or_more_after_branching(spark):
    """testZeroOrMoreAfterBranching: branch x merging x every kleene
    subset (incl. empty and {k2} alone — the kleene stage link is
    followedByAny)."""
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("f", 3.0),
        _ev("d", 4.0), _ev("d", 4.0), _ev("e", 4.0),
    ]
    pat = (
        Pattern.begin("start").where(_n("c"))
        .followed_by_any("branching").where(_n("a"))
        .followed_by_any("merging").where(_n("f"))
        .followed_by_any("kleene").where(_n("d"))
        .one_or_more().allow_combinations().optional()
        .followed_by("end").where(_n("e"))
    )
    got = _sets(spark, rows, pat)
    ks = [[], [5], [6], [5, 6]]
    assert got == sorted(
        sorted([1, a, 4, *k, 7]) for a in (2, 3) for k in ks
    ), got


# ---------------------------------------------------------------------
# times/oneOrMore x optional x contiguity matrix (NFAITCase
# testTimesNonStrictOptional1-3, testTimesStrictOptional[1],
# testOneOrMoreStrictOptional, testOptionalTimesNonStrictWithNext) —
# input 'c f a1 f a2 a3 b' unless noted; ConsecutiveData events.
# ---------------------------------------------------------------------

_CFA = [
    _ev("c"), _ev("f"), _ev("a", 2.0), _ev("f"), _ev("a", 3.0),
    _ev("a", 4.0), _ev("b", 5.0),
]


def _mid(link, *mods):
    p = Pattern.begin("start").where(_n("c"))
    p = getattr(p, link)("mid").where(_n("a"))
    for m in mods:
        p = getattr(p, m[0])(*m[1:])
    return p.followed_by("end").where(_n("b"))


def test_nfa_itcase_times_non_strict_optional1(spark):
    rows = [_ev("c"), _ev("f"), _ev("b", 5.0)]
    pat = _mid("followed_by", ("times", 3), ("optional",))
    assert _sets(spark, rows, pat) == [[1, 3]]


def test_nfa_itcase_times_non_strict_optional2(spark):
    pat = _mid("followed_by_any", ("times", 2), ("allow_combinations",), ("optional",))
    assert _sets(spark, _CFA, pat) == sorted([
        [1, 3, 5, 7], [1, 3, 6, 7], [1, 5, 6, 7], [1, 7],
    ])


def test_nfa_itcase_times_non_strict_optional3(spark):
    pat = _mid("followed_by_any", ("times", 2), ("optional",))
    assert _sets(spark, _CFA, pat) == sorted([
        [1, 3, 5, 7], [1, 5, 6, 7], [1, 7],
    ])


def test_nfa_itcase_times_strict_optional(spark):
    pat = _mid("followed_by_any", ("times", 2), ("consecutive",), ("optional",))
    assert _sets(spark, _CFA, pat) == sorted([[1, 5, 6, 7], [1, 7]])


def test_nfa_itcase_one_or_more_strict_optional(spark):
    pat = _mid("followed_by_any", ("one_or_more",), ("consecutive",), ("optional",))
    assert _sets(spark, _CFA, pat) == sorted([
        [1, 5, 6, 7], [1, 3, 7], [1, 5, 7], [1, 6, 7], [1, 7],
    ])


def test_nfa_itcase_times_strict_optional1(spark):
    rows = [_ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0), _ev("b", 5.0)]
    pat = _mid("next", ("times", 2), ("consecutive",), ("optional",))
    assert _sets(spark, rows, pat) == sorted([[1, 2, 3, 5], [1, 5]])


def test_nfa_itcase_optional_times_non_strict_with_next(spark):
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("f"), _ev("a", 3.0), _ev("f"),
        _ev("a", 4.0), _ev("b", 5.0),
    ]
    pat = _mid("next", ("times", 2), ("allow_combinations",), ("optional",))
    assert _sets(spark, rows, pat) == sorted([
        [1, 2, 4, 7], [1, 2, 6, 7], [1, 7],
    ])


# ---------------------------------------------------------------------
# mixed-contiguity branching, strict-after-loop, terminal loops, and
# the version-collision multiset (NFAITCase rows continued)
# ---------------------------------------------------------------------


def _branch_rows():
    return [
        _ev("start"),
        _ev("foo1", volume=10.0, sub=True),
        _ev("foo2", volume=10.0, sub=True),
        _ev("foo3", volume=10.0, sub=True),
        _ev("next-one", volume=2.0, sub=True),
        _ev("next-one", volume=2.0, sub=True),
        _ev("end"),
    ]


def test_nfa_itcase_branching_skip_till_next(spark):
    """testBranchingPatternSkipTillNext: all-followedBy links commit to
    the FIRST candidate at every stage — exactly one match."""
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by("mf").subtype(F.col("sub")).where(F.col("volume") > 5.0)
        .followed_by("ms").subtype(F.col("sub")).where(_n("next-one"))
        .followed_by_any("end").where(_n("end"))
    )
    assert _sets(spark, _branch_rows(), pat) == [[1, 2, 5, 7]]


def test_nfa_itcase_branching_mixed_followed_by(spark):
    """testBranchingPatternMixedFollowedBy: fba middle-first branches,
    the following followedBy commits to the first next-one."""
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by_any("mf").subtype(F.col("sub")).where(F.col("volume") > 5.0)
        .followed_by("ms").subtype(F.col("sub")).where(_n("next-one"))
        .followed_by_any("end").where(_n("end"))
    )
    assert _sets(spark, _branch_rows(), pat) == sorted(
        [1, i, 5, 7] for i in (2, 3, 4)
    )


def test_nfa_itcase_strict_continuity_after_zero_or_more(spark):
    """testStrictContinuityNoResults/ResultsAfterZeroOrMore: a strict
    NEXT after an optional loop binds to the loop's LAST element."""
    # no results: the b is separated from the a-run by a c
    rows = [_ev("d", 1.0), _ev("a", 2.0), _ev("a", 3.0), _ev("c", 1.0), _ev("b", 5.0)]
    pat = (
        Pattern.begin("start").where(_n("d"))
        .followed_by("mid").where(_n("a")).one_or_more().optional()
        .next("end").where(_n("b"))
    )
    assert _sets(spark, rows, pat) == []
    # results: combination subsets whose LAST element directly precedes b
    rows2 = [_ev("d", 1.0), _ev("a", 2.0), _ev("a", 3.0), _ev("b", 5.0)]
    pat2 = (
        Pattern.begin("start").where(_n("d"))
        .followed_by_any("mid").where(_n("a"))
        .one_or_more().optional().allow_combinations()
        .next("end").where(_n("b"))
    )
    assert _sets(spark, rows2, pat2) == sorted([[1, 2, 3, 4], [1, 3, 4]])


def test_nfa_itcase_next_zero_or_more(spark):
    """testNextZeroOrMore: a strict-NEXT consecutive loop cannot start
    past the adjacent non-matching row; only the absent branch."""
    rows = [
        _ev("start"), _ev("x"), _ev("middle", 2.0), _ev("middle", 3.0),
        _ev("middle", 4.0), _ev("end"),
    ]
    pat = (
        Pattern.begin("start").where(_n("start"))
        .next("mid").where(_n("middle")).one_or_more().optional().consecutive()
        .followed_by("end").where(_n("end"))
    )
    assert _sets(spark, rows, pat) == [[1, 6]]


def test_nfa_itcase_start_and_end_with_zero_or_more(spark):
    """testStartAndEndWithZeroOrMore: a bare optional loop pattern —
    per-anchor prefixes, no empty match."""
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0),
        _ev("d"), _ev("d"), _ev("d"),
    ]
    pat = Pattern.begin("mid").where(_n("a")).one_or_more().optional()
    assert _sets(spark, rows, pat) == sorted([
        [2, 3, 4], [2, 3], [2], [3, 4], [3], [4],
    ])


def test_nfa_itcase_end_with_zero_or_more_and_one_or_more(spark):
    """testEndWithZeroOrMore / testEndWithOneOrMore: terminal loops
    enumerate every prefix; zeroOrMore adds the bare {c}."""
    rows = [_ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0)]
    zero = (
        Pattern.begin("start").where(_n("c"))
        .followed_by("mid").where(_n("a")).one_or_more().optional()
    )
    one = (
        Pattern.begin("start").where(_n("c"))
        .followed_by("mid").where(_n("a")).one_or_more()
    )
    assert _sets(spark, rows, zero) == sorted([
        [1, 2, 3, 4], [1, 2, 3], [1, 2], [1],
    ])
    assert _sets(spark, rows, one) == sorted([
        [1, 2, 3, 4], [1, 2, 3], [1, 2],
    ])


def test_nfa_itcase_multiple_takes_version_collision(spark):
    """testMultipleTakesVersionCollision: c (a+ combinations)
    (a+ combinations) b — the same row-set reached through DIFFERENT
    middle1/middle2 splits is a distinct match (variable assignment =
    match identity), so the expectation is a MULTISET of row-sets."""
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0),
        _ev("a", 5.0), _ev("a", 6.0), _ev("b", 5.0),
    ]
    pat = (
        Pattern.begin("start").where(_n("c"))
        .followed_by("m1").where(_n("a")).one_or_more().allow_combinations()
        .followed_by("m2").where(_n("a")).one_or_more().allow_combinations()
        .followed_by("end").where(_n("b"))
    )
    m = collections.defaultdict(set)
    out = CEP.pattern(_df(spark, rows), pat, "k", "pos", after_match="no_skip")
    for r in out.flat_select().collect():
        m[r.match_id].add(r.pos)
    got = sorted(tuple(sorted(v)) for v in m.values())
    expected = sorted(
        [tuple([1, 2, 3, 4, 5, 6, 7])] * 4
        + [tuple([1, 2, 3, 4, 5, 7])] * 3
        + [tuple([1, 2, 3, 5, 6, 7])] * 2
        + [tuple([1, 2, 3, 4, 6, 7])] * 2
        + [tuple([1, 2, 4, 5, 6, 7])] * 2
        + [tuple([1, 2, 3, 4, 7])] * 2
        + [tuple([1, 2, 4, 5, 7])]
        + [tuple([1, 2, 5, 6, 7])]
        + [tuple([1, 2, 3, 5, 7])]
        + [tuple([1, 2, 3, 6, 7])]
        + [tuple([1, 2, 3, 7])]
    )
    assert got == expected, (got, expected)


# ---------------------------------------------------------------------
# atLeastOne / optional / times link-contiguity matrix (NFAITCase
# testAtLeastOne[Eager], testOptional, testTimes[Strict/NonStrict...],
# testStartWith*, testEndWithOptional)
# ---------------------------------------------------------------------


def test_nfa_itcase_at_least_one(spark):
    rows = [_ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("b", 5.0)]
    pat = _mid("followed_by_any", ("one_or_more",), ("allow_combinations",))
    pat._stages[-1].kind = "followed_by_any"  # fba end link
    assert _sets(spark, rows, pat) == sorted([[1, 2, 3, 4], [1, 2, 4], [1, 3, 4]])


def test_nfa_itcase_at_least_one_eager(spark):
    rows = [_ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0), _ev("b", 5.0)]
    pat = _mid("followed_by_any", ("one_or_more",))
    pat._stages[-1].kind = "followed_by_any"
    assert _sets(spark, rows, pat) == sorted([
        [1, 2, 3, 4, 5], [1, 2, 3, 5], [1, 3, 4, 5],
        [1, 2, 5], [1, 3, 5], [1, 4, 5],
    ])


def test_nfa_itcase_optional(spark):
    rows = [_ev("c"), _ev("a", 2.0), _ev("b", 5.0)]
    pat = _mid("followed_by", ("optional",))
    assert _sets(spark, rows, pat) == sorted([[1, 2, 3], [1, 3]])


def test_nfa_itcase_times_next_combinations(spark):
    """testTimes: NEXT pins the first loop element to the adjacent row;
    combinations pick the second."""
    rows = [_ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0), _ev("b", 5.0)]
    pat = _mid("next", ("times", 2), ("allow_combinations",))
    assert _sets(spark, rows, pat) == sorted([[1, 2, 3, 5], [1, 2, 4, 5]])


def test_nfa_itcase_start_with_times_consecutive(spark):
    rows = [_ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0), _ev("b", 5.0)]
    pat = (
        Pattern.begin("mid").where(_n("a")).times(2).consecutive()
        .followed_by("end").where(_n("b"))
    )
    assert _sets(spark, rows, pat) == sorted([[1, 2, 4], [2, 3, 4]])


def test_nfa_itcase_times_non_strict_with_next(spark):
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("f"), _ev("a", 3.0), _ev("f"),
        _ev("a", 4.0), _ev("b", 5.0),
    ]
    pat = _mid("next", ("times", 2), ("allow_combinations",))
    assert _sets(spark, rows, pat) == sorted([[1, 2, 4, 7], [1, 2, 6, 7]])


def test_nfa_itcase_times_followed_by_eager_vs_combinations(spark):
    rows = [_ev("c"), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0), _ev("b", 5.0)]
    eager = _mid("followed_by", ("times", 2))
    assert _sets(spark, rows, eager) == [[1, 2, 3, 5]]
    comb = _mid("followed_by_any", ("times", 2), ("allow_combinations",))
    assert _sets(spark, rows, comb) == sorted([
        [1, 2, 3, 5], [1, 2, 4, 5], [1, 3, 4, 5],
    ])


def test_nfa_itcase_times_strict_next_consecutive_no_match(spark):
    """testTimesStrictWithNextAndConsecutive: NEXT + consecutive with
    an interleaved row -> nothing."""
    rows = [
        _ev("c"), _ev("a", 2.0), _ev("f"), _ev("a", 3.0), _ev("a", 4.0),
        _ev("b", 5.0),
    ]
    pat = _mid("next", ("times", 2), ("consecutive",))
    assert _sets(spark, rows, pat) == []


def test_nfa_itcase_start_and_end_with_optional(spark):
    # testStartWithOptional
    rows = [_ev("c"), _ev("b", 5.0)]
    pat = (
        Pattern.begin("start").where(_n("c")).optional()
        .followed_by("end").where(_n("b"))
    )
    assert _sets(spark, rows, pat) == sorted([[1, 2], [2]])
    # testEndWithOptional
    rows2 = [_ev("c"), _ev("a", 2.0)]
    pat2 = (
        Pattern.begin("start").where(_n("c"))
        .followed_by("mid").where(_n("a")).optional()
    )
    assert _sets(spark, rows2, pat2) == sorted([[1, 2], [1]])


def test_nfa_itcase_times_strict_and_non_strict(spark):
    eager_in = [
        _ev("c"), _ev("f"), _ev("a", 2.0), _ev("f"), _ev("a", 3.0),
        _ev("a", 4.0), _ev("b", 5.0),
    ]
    strict = _mid("followed_by_any", ("times", 2), ("consecutive",))
    assert _sets(spark, eager_in, strict) == [[1, 5, 6, 7]]
    nonstrict = _mid("followed_by_any", ("times", 2), ("allow_combinations",))
    assert _sets(spark, eager_in, nonstrict) == sorted([
        [1, 3, 5, 7], [1, 3, 6, 7], [1, 5, 6, 7],
    ])


def test_nfa_itcase_start_with_one_or_more_strict(spark):
    """testStartWithOneOrMoreStrict: a bare consecutive loop pattern —
    runs are broken by non-matching rows."""
    rows = [_ev("c"), _ev("a", 2.0), _ev("c"), _ev("a", 3.0), _ev("a", 4.0)]
    pat = Pattern.begin("mid").where(_n("a")).one_or_more().consecutive()
    assert _sets(spark, rows, pat) == sorted([[2], [4], [5], [4, 5]])


# ---------------------------------------------------------------------
# the shared oneOrMore/zeroOrMore consuming-strategy matrix (NFAITCase
# private testOneOrMore/testZeroOrMore helpers + their six callers) —
# input 'c d a1 a2 a3 d a4 b', pattern c fb(a-loop <strategy>) fb(b)
# ---------------------------------------------------------------------

_CDA = [
    _ev("c"), _ev("d", 6.0), _ev("a", 2.0), _ev("a", 3.0), _ev("a", 4.0),
    _ev("d", 6.0), _ev("a", 5.0), _ev("b", 5.0),
]


def _loop_strategy(strategy, optional):
    p = Pattern.begin("start").where(_n("c"))
    p = p.followed_by("mid").where(_n("a")).one_or_more()
    if strategy == "strict":
        p = p.consecutive()
    elif strategy == "any":
        p = p.allow_combinations()
    if optional:
        p = p.optional()
    return p.followed_by("end").where(_n("b"))


def test_nfa_itcase_one_or_more_strategy_matrix(spark):
    # STRICT: the consecutive run from the first a
    assert _sets(spark, _CDA, _loop_strategy("strict", False)) == sorted([
        [1, 3, 4, 5, 8], [1, 3, 4, 8], [1, 3, 8],
    ])
    # SKIP_TILL_NEXT: prefixes of the full matching subsequence
    assert _sets(spark, _CDA, _loop_strategy("next", False)) == sorted([
        [1, 3, 4, 5, 7, 8], [1, 3, 4, 5, 8], [1, 3, 4, 8], [1, 3, 8],
    ])
    # SKIP_TILL_ANY: every subset containing the first a
    assert _sets(spark, _CDA, _loop_strategy("any", False)) == sorted([
        [1, 3, 4, 5, 7, 8], [1, 3, 4, 5, 8], [1, 3, 4, 7, 8], [1, 3, 5, 7, 8],
        [1, 3, 4, 8], [1, 3, 5, 8], [1, 3, 7, 8], [1, 3, 8],
    ])


def test_nfa_itcase_zero_or_more_strategy_matrix(spark):
    # testStrictEagerZeroOrMore
    assert _sets(spark, _CDA, _loop_strategy("strict", True)) == sorted([
        [1, 3, 4, 5, 8], [1, 3, 4, 8], [1, 3, 8], [1, 8],
    ])
    # testSkipTillNextZeroOrMore
    assert _sets(spark, _CDA, _loop_strategy("next", True)) == sorted([
        [1, 3, 4, 5, 7, 8], [1, 3, 4, 5, 8], [1, 3, 4, 8], [1, 3, 8], [1, 8],
    ])
    # testSkipTillAnyZeroOrMore
    assert _sets(spark, _CDA, _loop_strategy("any", True)) == sorted([
        [1, 3, 4, 5, 7, 8], [1, 3, 4, 5, 8], [1, 3, 4, 7, 8], [1, 3, 5, 7, 8],
        [1, 3, 4, 8], [1, 3, 5, 8], [1, 3, 7, 8], [1, 3, 8], [1, 8],
    ])


# ---------------------------------------------------------------------
# condition-less stages + strict-continuity basics (NFAITCase
# testNoConditionNFA / testNoConditionLoopingNFA /
# testAnyWithNoConditionNFA / testStrictContinuity{With,No}Results)
# ---------------------------------------------------------------------


def test_nfa_itcase_strict_continuity_basics(spark):
    pat = (
        Pattern.begin("start").where(_n("a")).next("end").where(_n("b"))
    )
    assert _sets(spark, [_ev("a"), _ev("b")], pat) == [[1, 2]]
    assert _sets(spark, [_ev("a"), _ev("c"), _ev("b")], pat) == []


def test_nfa_itcase_no_condition_pairs(spark):
    """Condition-less stages are always-true: followedBy pairs each row
    with its IMMEDIATE successor; followedByAny with every later row."""
    rows = [_ev(x) for x in "abcde"]
    t = F.lit(True)
    fb = Pattern.begin("s").where(t).followed_by("e").where(t)
    assert _sets(spark, rows, fb) == [[1, 2], [2, 3], [3, 4], [4, 5]]
    fba = Pattern.begin("s").where(t).followed_by_any("e").where(t)
    assert _sets(spark, rows, fba) == sorted(
        [i, j] for i in range(1, 6) for j in range(i + 1, 6)
    )


def test_nfa_itcase_no_condition_looping(spark):
    """testNoConditionLoopingNFA: TRUE begin + TRUE oneOrMore end —
    every contiguous interval of length >= 2."""
    rows = [_ev(x) for x in "abcde"]
    t = F.lit(True)
    pat = Pattern.begin("s").where(t).followed_by("e").where(t).one_or_more()
    assert _sets(spark, rows, pat) == sorted(
        list(range(i, j + 1)) for i in range(1, 6) for j in range(i + 1, 6)
    )


# ---------------------------------------------------------------------
# Timed-out partial matches (PatternStream.java:202-214 flatSelect with
# timedOutPartialMatchesTag; NFAITCase.java:405
# testSimplePatternWithTimeoutHandling)
# ---------------------------------------------------------------------


def _timeout_fixture(spark):
    rows = [
        (1, 1, "start"), (1, 2, "start"), (1, 3, "middle"),
        (1, 4, "foobar"), (1, 11, "end"), (1, 13, "end"),
    ]
    return spark.createDataFrame(rows, "k int, ts int, name string")


def _collect_timeouts(tdf):
    """-> set of (frozenset of ts, timeout_ts) per timed-out partial."""
    per = {}
    for r in tdf.collect():
        key = (r.k, r.timeout_id)
        per.setdefault(key, [set(), None])
        per[key][0].add(r.ts)
        per[key][1] = r.timeout_ts
    return {(frozenset(v[0]), v[1]) for v in per.values()}


def test_nfa_itcase_simple_pattern_with_timeout_handling(spark):
    """NFAITCase.java:405: start fba middle fba end WITHIN 10 over
    start@1 start@2 middle@3 foobar@4 end@11 end@13 -> exactly 1 match
    {2,3,11} and 4 timeouts {1}@11 {1,3}@11 {2}@12 {2,3}@12 (every
    live partial branch at expiry — fba waiters persist after sibling
    takes; timeout_ts = first_row_ts + within; expiry is event-driven)."""
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by_any("middle").where(_n("middle"))
        .followed_by_any("end").where(_n("end"))
        .within(10)
    )
    ps = CEP.pattern(_timeout_fixture(spark), pat, "k", "ts", after_match="no_skip")
    matches = ps.flat_select(timed_out_partial_matches_tag="late")
    got_m = collections.defaultdict(set)
    for r in matches.collect():
        got_m[r.match_id].add(r.ts)
    assert sorted(sorted(v) for v in got_m.values()) == [[2, 3, 11]]
    got_t = _collect_timeouts(ps.get_side_output("late"))
    assert got_t == {
        (frozenset({1}), 11.0),
        (frozenset({1, 3}), 11.0),
        (frozenset({2}), 12.0),
        (frozenset({2, 3}), 12.0),
    }, got_t


def test_timeout_followed_by_waiters_are_consumed(spark):
    """Derived matrix (same fixture, relaxed links): under followedBy a
    waiter is CONSUMED by the first take-able event, so {1} and {2}
    never time out (middle@3 takes both), {2,3} completes into the
    match, and only {1,3} expires (end@11 is outside start@1's
    horizon). next-contiguity kills every waiter here (adjacent
    events exist), so no timeouts at all."""
    fb = (
        Pattern.begin("start").where(_n("start"))
        .followed_by("middle").where(_n("middle"))
        .followed_by("end").where(_n("end"))
        .within(10)
    )
    ps = CEP.pattern(_timeout_fixture(spark), fb, "k", "ts", after_match="no_skip")
    got_t = _collect_timeouts(ps.timed_out_partial_matches())
    assert got_t == {(frozenset({1, 3}), 11.0)}, got_t

    nx = (
        Pattern.begin("start").where(_n("start"))
        .next("middle").where(_n("middle"))
        .next("end").where(_n("end"))
        .within(10)
    )
    ps2 = CEP.pattern(_timeout_fixture(spark), nx, "k", "ts", after_match="no_skip")
    assert ps2.timed_out_partial_matches().count() == 0


def test_timeout_event_driven_expiry_needs_witness(spark):
    """advanceTime is event-driven: with no partition row at/after a
    branch's horizon, the branch does NOT time out (the reference test
    loop only advances per arriving event)."""
    rows = [(1, 1, "start"), (1, 2, "middle")]  # max ts 2 < horizon 11
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by_any("middle").where(_n("middle"))
        .followed_by_any("end").where(_n("end"))
        .within(10)
    )
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    assert ps.timed_out_partial_matches().count() == 0
    # adding a witness row surfaces both partials
    df2 = df.union(spark.createDataFrame([(1, 20, "noise")], df.schema))
    ps2 = CEP.pattern(df2, pat, "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps2.timed_out_partial_matches())
    assert got == {(frozenset({1}), 11.0), (frozenset({1, 2}), 11.0)}, got


def test_timeout_timestamp_order_and_loud_guards(spark):
    """Timestamp order columns: horizon arithmetic in microsecond ticks,
    timeout_ts emitted as a timestamp. Loud guards: no within, loops,
    non-noSkip."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(seconds=s), n)
        for s, n in [(1, "start"), (3, "middle"), (30, "noise")]
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, name string")
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by("middle").where(_n("middle"))
        .followed_by("end").where(_n("end"))
        .within("10 seconds")
    )
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    got = {
        (r.timeout_id.split("#")[0], r.ts.second, r.timeout_ts)
        for r in ps.timed_out_partial_matches().collect()
    }
    assert got == {
        ("2", 1, t0 + dt.timedelta(seconds=11)),
        ("2", 3, t0 + dt.timedelta(seconds=11)),
    }, got  # only {start,middle} expires; {start} was consumed by middle

    nowithin = Pattern.begin("a").where(_n("start")).followed_by("b").where(_n("middle"))
    with pytest.raises(ValueError, match="within"):
        CEP.pattern(df, nowithin, "k", "ts", after_match="no_skip").timed_out_partial_matches()
    # interior greedy (2+ positive stages after) is SUPPORTED on batch
    # (round 12, late — the de-greedy'd span-kill enumeration): the
    # mid-loop park {start} and the span-clean {start,middle} park at c
    # both report
    greedy_interior = (
        Pattern.begin("a").where(_n("start")).one_or_more().greedy()
        .followed_by("b").where(_n("middle"))
        .followed_by("c").where(_n("end")).within("10 seconds")
    )
    got_gi = {
        (r.timeout_id.split("#")[0], r.ts.second)
        for r in CEP.pattern(df, greedy_interior, "k", "ts",
                             after_match="no_skip")
        .timed_out_partial_matches().collect()
    }
    assert {s for _t, s in got_gi} == {1, 3}, got_gi
    # skip strategies are supported on the batch route (round 11): with
    # no completed match in this fixture there is nothing to prune, so
    # the default past_last_row equals no_skip here
    simple = (
        Pattern.begin("a").where(_n("start")).followed_by("b").where(_n("middle")).within(10)
    )
    assert (
        CEP.pattern(df, simple, "k", "ts").timed_out_partial_matches().count()
        == CEP.pattern(df, simple, "k", "ts", after_match="no_skip")
        .timed_out_partial_matches().count()
    )
    # single-stage LOOP patterns time out (mid-loop parking) — a@1s is
    # alone in the loop, middle@3s doesn't take (relaxed ignore), the
    # @30s row witnesses expiry at 1s+10s
    looped = Pattern.begin("a").where(_n("start")).one_or_more().within("10 seconds")
    got_l = {
        (r.ts.second, r.timeout_ts)
        for r in CEP.pattern(df, looped, "k", "ts", after_match="no_skip")
        .timed_out_partial_matches().collect()
    }
    assert got_l == {(1, t0 + dt.timedelta(seconds=11))}, got_l


# ---------------------------------------------------------------------
# Timed-out partials under AfterMatchSkipStrategy (round 11). Hand-
# traced reference runs of NFA.processMatchesAccordingToSkipStrategy
# (NFA.java:396-436): completed matches queue by START event and emit
# only when no live partial starts strictly earlier; on emission,
# partials with start event <= pruningId are SILENTLY pruned (never
# reach the timeout tag; STRICT < for SkipToElementStrategy), where
# pruningId = last match event (SkipPastLastStrategy), first match
# event (SkipToNextStrategy) or first/last event mapped to SYM. A
# partial whose horizon passed at/before the emission event was
# already reported by that event's advanceTime and is NOT pruned.
# ---------------------------------------------------------------------


def _fba_within10():
    return (
        Pattern.begin("A").where(F.col("name") == "a")
        .followed_by_any("B").where(F.col("name") == "m")
        .followed_by_any("C").where(F.col("name") == "e")
        .within(10)
    )


def _skip_touts(spark, rows, pat, after):
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    ps = CEP.pattern(df, pat, "k", "ts", after_match=after)
    return _collect_timeouts(ps.timed_out_partial_matches())


def test_timeout_skip_past_last_event_prunes_partials(spark):
    """The NFAITCase:405 fixture under skipPastLastEvent: the match
    {2,3,11} completes at end@11 (no live partial starts before
    start@2 — {1}/{1,3} expired at that very event's advanceTime, so
    they ARE reported), and its emission prunes the persisting fba
    waiters {2}/{2,3} (start <= last match event) before their @12
    horizon."""
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by_any("middle").where(_n("middle"))
        .followed_by_any("end").where(_n("end"))
        .within(10)
    )
    ps = CEP.pattern(
        _timeout_fixture(spark), pat, "k", "ts", after_match="past_last_row"
    )
    matches = ps.flat_select(timed_out_partial_matches_tag="late")
    got_m = collections.defaultdict(set)
    for r in matches.collect():
        got_m[r.match_id].add(r.ts)
    assert sorted(sorted(v) for v in got_m.values()) == [[2, 3, 11]]
    got_t = _collect_timeouts(ps.get_side_output("late"))
    assert got_t == {(frozenset({1}), 11.0), (frozenset({1, 3}), 11.0)}, got_t


def test_timeout_skip_to_next_vs_past_last(spark):
    """a@1 m@2 a@3 e@4 noise@30 with start fbAny middle fbAny end:
    match {1,2,4}. skipPastLastEvent prunes every partial (starts 1
    and 3 are both <= the last match event e@4); skipToNext prunes
    only the match's own start (pruningId = first match event a@1), so
    the stuck later start {3} still times out at 13."""
    rows = [(1, 1, "a"), (1, 2, "m"), (1, 3, "a"), (1, 4, "e"), (1, 30, "x")]
    assert _skip_touts(spark, rows, _fba_within10(), "no_skip") == {
        (frozenset({1}), 11.0),
        (frozenset({1, 2}), 11.0),
        (frozenset({3}), 13.0),
    }
    assert _skip_touts(spark, rows, _fba_within10(), "past_last_row") == set()
    assert _skip_touts(spark, rows, _fba_within10(), "to_next_row") == {
        (frozenset({3}), 13.0)
    }


def test_timeout_skip_horizon_beats_emission(spark):
    """a@1 a@9 m@10 e@12 noise@30: the match {9,10,12} completes at
    e@12, but that event's advanceTime runs FIRST and reports {1} and
    {1,10} (horizon 11 <= 12) — pruning only hits partials whose
    horizon is still open at the emission tick ({9}/{9,10} at 19)."""
    rows = [(1, 1, "a"), (1, 9, "a"), (1, 10, "m"), (1, 12, "e"), (1, 30, "x")]
    got = _skip_touts(spark, rows, _fba_within10(), "past_last_row")
    assert got == {(frozenset({1}), 11.0), (frozenset({1, 10}), 11.0)}, got


def test_timeout_skip_new_starts_after_match_survive(spark):
    """a@1 m@2 e@3 a@5 noise@30: the match {1,2,3} prunes every partial
    with start <= e@3, but the NEW start a@5 (after the pruning id)
    lives on and times out at 15."""
    rows = [(1, 1, "a"), (1, 2, "m"), (1, 3, "e"), (1, 5, "a"), (1, 30, "x")]
    got = _skip_touts(spark, rows, _fba_within10(), "past_last_row")
    assert got == {(frozenset({5}), 15.0)}, got


def test_timeout_skip_prunes_mid_loop_branches(spark):
    """a+ followedBy b over a@1 a@2 b@3 a@4 noise@30: under noSkip the
    mid-loop branches {1,2,4} and {2,4} park past b@3 (relaxed inner
    ignore NOT(take) forces taking a2, so {1,4} never exists) and time
    out with {4}. skipPastLastEvent emits the first-completed {1,3}
    and prunes every branch whose start is <= b@3 — only the post-
    match start {4} still times out."""
    loop = (
        Pattern.begin("A").where(F.col("name") == "a").one_or_more()
        .followed_by("B").where(F.col("name") == "b")
        .within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"), (1, 30, "x")]
    assert _skip_touts(spark, rows, loop, "no_skip") == {
        (frozenset({1, 2, 4}), 11.0),
        (frozenset({2, 4}), 12.0),
        (frozenset({4}), 14.0),
    }
    assert _skip_touts(spark, rows, loop, "past_last_row") == {
        (frozenset({4}), 14.0)
    }
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    got_m = collections.defaultdict(set)
    for r in (
        CEP.pattern(df, loop, "k", "ts", after_match="past_last_row")
        .flat_select().collect()
    ):
        got_m[r.match_id].add(r.ts)
    assert sorted(sorted(v) for v in got_m.values()) == [[1, 3]]


def test_timeout_skip_to_element_is_strict(spark):
    """SkipToElementStrategy.shouldPrune uses STRICT < (vs <= for the
    whole-match strategies): a@1 x@2 ab@3 x@10 with A in (a,ab), B in
    (b,ab) within 5 — the match {1,3} maps its last B to ab@3, and the
    partial A-start {3} sits exactly AT that pruning id: to_last B
    keeps it (3 < 3 is false; times out at 8), past_last_row prunes it
    (3 <= 3)."""
    pat = (
        Pattern.begin("A").where(F.col("name").isin("a", "ab"))
        .followed_by("B").where(F.col("name").isin("b", "ab"))
        .within(5)
    )
    rows = [(1, 1, "a"), (1, 2, "x"), (1, 3, "ab"), (1, 10, "x")]
    assert _skip_touts(spark, rows, pat, "to_last B") == {
        (frozenset({3}), 8.0)
    }
    assert _skip_touts(spark, rows, pat, "past_last_row") == set()


def _pd_fba_within10():
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    return (
        Pattern.begin("A").where(c("a"))
        .followed_by_any("B").where(c("m"))
        .followed_by_any("C").where(c("e"))
        .within(10)
    )


def test_timeout_skip_streaming_equals_batch(spark, tmp_dir):
    """past_last_row / to_next_row timeouts on the streaming route
    (incremental sequential matcher + emission replay in keyed state,
    across 3 chunks) == the batch hand-traced matrices. Covers: full
    pruning by an emitted match, post-match starts surviving, the
    to_next start-only pruning id, and the horizon-beats-emission race."""
    rows_a = [(1, 1, "a"), (1, 2, "m"), (1, 3, "a"), (1, 4, "e"), (1, 30, "x")]
    rows_b = [(1, 1, "a"), (1, 9, "a"), (1, 10, "m"), (1, 12, "e"), (1, 30, "x")]
    rows_c = [(1, 1, "a"), (1, 2, "m"), (1, 3, "e"), (1, 5, "a"), (1, 30, "x")]
    pat = _pd_fba_within10()
    df_a = spark.createDataFrame(rows_a, "k int, ts int, name string")
    df_b = spark.createDataFrame(rows_b, "k int, ts int, name string")
    df_c = spark.createDataFrame(rows_c, "k int, ts int, name string")
    assert _stream_timeouts(
        spark, tmp_dir, df_a, pat, "sk_pl_a", after="past_last_row"
    ) == set()
    assert _stream_timeouts(
        spark, tmp_dir, df_a, pat, "sk_tn_a", after="to_next_row"
    ) == {(frozenset({3}), 13.0)}
    assert _stream_timeouts(
        spark, tmp_dir, df_b, pat, "sk_pl_b", after="past_last_row"
    ) == {(frozenset({1}), 11.0), (frozenset({1, 10}), 11.0)}
    assert _stream_timeouts(
        spark, tmp_dir, df_c, pat, "sk_pl_c", after="past_last_row"
    ) == {(frozenset({5}), 15.0)}


def test_timeout_skip_streaming_loop_and_to_element(spark, tmp_dir):
    """Mid-loop pruning on the streaming route (a+ fb b under
    skipPastLastEvent: only the post-match start {4} times out), and
    SKIP TO FIRST/LAST streaming == batch (round 12: the incremental
    matcher resumes AT the mapped element; strict-< pruning keeps the
    same-rid partial alive — the test_timeout_skip_to_element_is_strict
    batch matrix)."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    loop = (
        Pattern.begin("A").where(c("a")).one_or_more()
        .followed_by("B").where(c("b"))
        .within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"), (1, 30, "x")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    assert _stream_timeouts(
        spark, tmp_dir, df, loop, "sk_loop", after="past_last_row"
    ) == {(frozenset({4}), 14.0)}

    pat = (
        Pattern.begin("A").where(lambda pdf: pdf["name"].isin(["a", "ab"]))
        .followed_by("B").where(lambda pdf: pdf["name"].isin(["b", "ab"]))
        .within(5)
    )
    rows2 = [(1, 1, "a"), (1, 2, "x"), (1, 3, "ab"), (1, 10, "x")]
    df2 = spark.createDataFrame(rows2, "k int, ts int, name string")
    assert _stream_timeouts(
        spark, tmp_dir, df2, pat, "sk_tolast", after="to_last B"
    ) == {(frozenset({3}), 8.0)}
    assert _stream_timeouts(
        spark, tmp_dir, df2, pat, "sk_tofirst", after="to_first B"
    ) == {(frozenset({3}), 8.0)}


# ---------------------------------------------------------------------
# Timed-out partials with until() / mid-pattern notFollowedBy (round
# 11). Hand-traced against the reference STOP edges: until() extends
# the loop's take AND inner-ignore with NOT(until) and adds a stop
# state (NFACompiler.java:785-830 createLooping /
# addStopStateToLooping) — an until event is neither taken nor
# ignored, so the parked loop branch DIES; the r8 dual-dialect
# finding extends the stop to the waiting loop head. A mid-pattern
# notFollowedBy compiles stop transitions on the waiting state
# (addStopStates), so an N event in the parked gap silently kills the
# waiter (and a migrated copy parked behind the NOT gap). Kills are
# gap scans: branch alive iff no kill event in (last take, horizon).
# ---------------------------------------------------------------------


def test_timeout_until_kills_parked_loop_branch(spark):
    """A.times(2).until(U) fb B within 10 over a@1 [u|y]@3 x@30: the
    1-take mid-loop branch {1} (below the loop minimum, so no migrated
    copy) survives to 11 when the gap is quiet, and DIES on the until
    event — no timeout, nothing reported."""
    pat = (
        Pattern.begin("A").where(_n("a")).times(2).until(_n("u"))
        .followed_by("B").where(_n("b")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 3, "y"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 3, "u"), (1, 30, "x")], pat, "no_skip"
    ) == set()


def test_timeout_until_with_next_successor(spark):
    """A.oneOrMore().until(U) next B: 'next' has no ignore edge, so no
    migrated copy can save the branch — the until stop is the only
    difference between timing out at 11 and dying silently."""
    pat = (
        Pattern.begin("A").where(_n("a")).one_or_more().until(_n("u"))
        .next("B").where(_n("b")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 3, "y"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 3, "u"), (1, 30, "x")], pat, "no_skip"
    ) == set()


def test_timeout_not_followed_by_gap_kill(spark):
    """A ^N fb B within 10: the B-waiter is stop-killed by an N event
    inside its horizon (a@1 n@2 -> nothing), survives a quiet gap
    (a@1 y@2 -> {1}@11), and an N at/after the horizon cannot kill a
    branch advanceTime already reported (a@1 n@12 -> {1}@11)."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .followed_by("B").where(_n("b")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "y"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 30, "x")], pat, "no_skip"
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 12, "nn"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}


def test_timeout_not_gap_kills_migrated_copy_and_prefix(spark):
    """A fb B? ^N fb C: the {a,b} waiter at C and the {a} migrated
    copy behind the absent optional B both die on the N event; without
    it both time out. A ^N fb B fb C: an N INSIDE the prefix gap kills
    the branch before b is ever taken, so the {A,B} prefix set is
    empty (the prefix matcher's NOT gap, not the kill scan)."""
    p4 = (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b")).optional()
        .not_followed_by("N").where(F.col("name") == "nn")
        .followed_by("C").where(_n("c")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "y"), (1, 30, "x")],
        p4, "no_skip",
    ) == {(frozenset({1}), 11.0), (frozenset({1, 2}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "nn"), (1, 30, "x")],
        p4, "no_skip",
    ) == set()
    p5 = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .followed_by("B").where(_n("b"))
        .followed_by("C").where(_n("c")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "x")], p5, "no_skip"
    ) == {(frozenset({1, 2}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 3, "b"), (1, 30, "x")],
        p5, "no_skip",
    ) == set()


def test_timeout_until_streaming_equals_batch(spark, tmp_dir):
    """until + NOT kill scans on the streaming route: the pandas kill
    predicates ride the plan dicts; chunked replay == batch."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    pat = (
        Pattern.begin("A").where(c("a")).one_or_more().until(c("u"))
        .followed_by("B").where(c("b")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 5, "a"), (1, 30, "x")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    assert _stream_timeouts(spark, tmp_dir, df, pat, "until_sb") == {
        (frozenset({1, 5}), 11.0),
        (frozenset({5}), 15.0),
    }
    # the until event kills the mid-loop branch but its migrated copy
    # (min met, fb B head) spawned at that same event and survives —
    # the partial still times out, exactly as on the batch route
    rows2 = [(1, 1, "a"), (1, 2, "u"), (1, 30, "x")]
    df2 = spark.createDataFrame(rows2, "k int, ts int, name string")
    assert _stream_timeouts(spark, tmp_dir, df2, pat, "until_sb2") == {
        (frozenset({1}), 11.0)
    }
    # with a 'next' successor there is no copy: the until stop is the
    # whole difference between reporting at 11 and dying silently
    nxt = (
        Pattern.begin("A").where(c("a")).one_or_more().until(c("u"))
        .next("B").where(c("b")).within(10)
    )
    assert _stream_timeouts(spark, tmp_dir, df2, nxt, "until_sb3") == set()
    nf = (
        Pattern.begin("A").where(c("a"))
        .not_followed_by("N").where(c("nn"))
        .followed_by("B").where(c("b")).within(10)
    )
    df3 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "nn"), (1, 30, "x")], "k int, ts int, name string"
    )
    assert _stream_timeouts(spark, tmp_dir, df3, nf, "nf_sb") == set()
    df4 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "y"), (1, 30, "x")], "k int, ts int, name string"
    )
    assert _stream_timeouts(spark, tmp_dir, df4, nf, "nf_sb2") == {
        (frozenset({1}), 11.0)
    }


def test_timeout_not_next_adjacency_kill(spark):
    """A not_next(N) fb B within 10 (NotPatternITCase adjacency): the
    parked B-waiter dies iff the event DIRECTLY after a@1 matches N —
    a non-adjacent N@3 behind a noise row does NOT kill (this is what
    separates the 'adj' kill scan from the notFollowedBy 'gap' scan),
    and an adjacent N at/after the horizon loses to advanceTime. With
    a strict successor (not_next then next B) the waiter dies on any
    event regardless, so the fold changes nothing about parking."""
    p1 = (
        Pattern.begin("A").where(_n("a"))
        .not_next("N").where(F.col("name") == "nn")
        .followed_by("B").where(_n("b")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "y"), (1, 30, "x")], p1, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 30, "x")], p1, "no_skip"
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 12, "nn"), (1, 30, "x")], p1, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "y"), (1, 3, "nn"), (1, 30, "x")],
        p1, "no_skip",
    ) == {(frozenset({1}), 11.0)}
    p2 = (
        Pattern.begin("A").where(_n("a"))
        .not_next("N").where(F.col("name") == "nn")
        .next("B").where(_n("b")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 30, "x")], p2, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 30, "x")], p2, "no_skip"
    ) == set()


def test_timeout_not_next_before_optional_successor(spark):
    """A not_next(N) fb B? fb C within 10 (round 12, late): the parked
    branch at B?'s head spawns a migrated copy at C; the NFA's notNext
    state PROCEEDs to stop on N and through to C on NOT(N) at the SAME
    next event, so the copy inherits the 'adj' kill — an adjacent N
    kills waiter AND copy; a non-adjacent N kills neither."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .not_next("N").where(F.col("name") == "nn")
        .followed_by("B").where(_n("b")).optional()
        .followed_by("C").where(_n("c")).within(10)
    )
    # quiet gap: waiter at B and its copy at C share {a} -> one partial
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "x"), (1, 13, "w")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    # ADJACENT N: the copy dies with the waiter (the un-lifted model
    # left the copy alive and wrongly reported {a})
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 13, "w")], pat, "no_skip"
    ) == set()
    # non-adjacent N: adjacency satisfied, the park survives
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "x"), (1, 3, "nn"), (1, 13, "w")],
        pat, "no_skip",
    ) == {(frozenset({1}), 11.0)}
    # copy consumed by c -> match {a,c} (B absent); the B-waiter still
    # times out
    rows = [(1, 1, "a"), (1, 2, "x"), (1, 3, "c"), (1, 13, "w")]
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({1}), 11.0)
    }
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    got = CEP.pattern(df, pat, "k", "ts", after_match="no_skip").flat_select()
    assert {r.ts for r in got.collect()} == {1, 3}
    # b taken: {a,b} parks at C (prefix enforces adjacency via the
    # retained fold) AND the ignore-after-PROCEED copy {a} persists at
    # C (NFA.java:621-633) — both time out
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 13, "w")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0), (frozenset({1, 2}), 11.0)}
    # zero-able quantified successor takes the same route
    pat2 = (
        Pattern.begin("A").where(_n("a"))
        .not_next("N").where(F.col("name") == "nn")
        .followed_by("B").where(_n("b")).times(0, 2)
        .followed_by("C").where(_n("c")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 13, "w")], pat2, "no_skip"
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "x"), (1, 13, "w")], pat2, "no_skip"
    ) == {(frozenset({1}), 11.0)}


def test_timeout_not_next_streaming_equals_batch(spark, tmp_dir):
    """The 'adj' kill on the streaming route: the first gap event
    decides, across chunked replay — same four-cell matrix."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    pat = (
        Pattern.begin("A").where(c("a"))
        .not_next("N").where(c("nn"))
        .followed_by("B").where(c("b")).within(10)
    )
    cells = [
        ([(1, 1, "a"), (1, 2, "y"), (1, 30, "x")], {(frozenset({1}), 11.0)}),
        ([(1, 1, "a"), (1, 2, "nn"), (1, 30, "x")], set()),
        (
            [(1, 1, "a"), (1, 2, "y"), (1, 3, "nn"), (1, 30, "x")],
            {(frozenset({1}), 11.0)},
        ),
    ]
    for j, (rows, want) in enumerate(cells):
        df = spark.createDataFrame(rows, "k int, ts int, name string")
        assert _stream_timeouts(spark, tmp_dir, df, pat, f"nn_sb{j}") == want


# ---------------------------------------------------------------------
# Timed-out partials with quantified/optional prefixes (round 10+).
# Expectations are hand-traced NFA runs under the reference ignore
# conditions: a branch parked INSIDE a loop survives by the INNER
# ignore (NFACompiler.java:862 getInnerIgnoreCondition — consecutive
# none, relaxed NOT(take), allowCombinations true); a branch parked AT
# a stage's head by the OUTER ignore (:901); NFA.advanceTime (NFA.java:
# 259-297) reports EVERY pruned partial, including ones whose event
# sets already emitted completed matches via PROCEED.
# ---------------------------------------------------------------------


def _tdf(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, name string")


def _loop_pat(inner=None, lo=None, hi=None):
    p = Pattern.begin("start").where(_n("start")).followed_by("mid").where(_n("middle"))
    if lo is None:
        p = p.one_or_more()
    else:
        p = p.times(lo, hi)
    if inner == "strict":
        p = p.consecutive()
    elif inner == "comb":
        p = p.allow_combinations()
    return p.followed_by("end").where(_n("end")).within(10)


def test_timeout_midloop_relaxed_inner(spark):
    """start fb mid+ fb end WITHIN 10 over s@1 m@3 m@5 x@6 e@20.
    Trace: {s1} consumed by m@3. {s1,m3}'s loop ignore (NOT take) fails
    at m@5, but the decision graph also collects head(end)'s IGNORE via
    PROCEED (NFA.java:621-633 'IGNORE after PROCEED'): NOT(take_end)
    fires at m@5, so a COPY of {s1,m3} parks at head(end) and expires
    @11 alongside {s1,m3,m5} (which ignores x@6 in the loop and is
    pruned by advanceTime(20) BEFORE e@20 processes). {s1,m5} never
    exists (m@3 is take-able inside the head gap); oneOrMore never
    parks at the end stage by TAKE."""
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 5, "middle"),
                      (1, 6, "foobar"), (1, 20, "end")])
    ps = CEP.pattern(df, _loop_pat(), "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps.timed_out_partial_matches())
    assert got == {(frozenset({1, 3}), 11.0), (frozenset({1, 3, 5}), 11.0)}, got


def test_timeout_migrated_copy_consumed_by_successor(spark):
    """The migrated copy lives under head(end)'s OWN consumption rule:
    with end@9 inside the window, {s1,m3}'s copy takes it (match, not
    timeout) while the {s1,m3,m5} loop branch survives the proceed-take
    (its loop ignore fires at e@9) and still expires — the reference's
    eager-prefix matches and the timeout coexist."""
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 5, "middle"),
                      (1, 9, "end"), (1, 30, "noise")])
    ps = CEP.pattern(df, _loop_pat(), "k", "ts", after_match="no_skip")
    matches = ps.flat_select(timed_out_partial_matches_tag="late")
    got_m = collections.defaultdict(set)
    for r in matches.collect():
        got_m[r.match_id].add(r.ts)
    assert sorted(sorted(v) for v in got_m.values()) == [[1, 3, 5, 9], [1, 3, 9]]
    got_t = _collect_timeouts(ps.get_side_output("late"))
    assert got_t == {(frozenset({1, 3, 5}), 11.0)}, got_t


def test_timeout_midloop_consecutive_inner(spark):
    """consecutive() inner: no loop ignore edge — the loop branch dies
    on ANY intervening event, but 'IGNORE after PROCEED' still freezes
    a copy at head(end) (the reference's own consecutive() docs matrix
    rests on this: C A1 B matches despite A2 adjacent to A1). So both
    prefixes expire whether the killer is a noise row or a take-able
    middle; in the quiet fixture {s1,m3,m5} survives primarily (the
    next partition event IS the @20 witness)."""
    noisy = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 5, "middle"),
                         (1, 6, "foobar"), (1, 20, "end")])
    ps = CEP.pattern(noisy, _loop_pat("strict"), "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps.timed_out_partial_matches())
    assert got == {(frozenset({1, 3}), 11.0), (frozenset({1, 3, 5}), 11.0)}, got

    quiet = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 5, "middle"),
                         (1, 20, "end")])
    ps2 = CEP.pattern(quiet, _loop_pat("strict"), "k", "ts", after_match="no_skip")
    got2 = _collect_timeouts(ps2.timed_out_partial_matches())
    assert got2 == {(frozenset({1, 3}), 11.0), (frozenset({1, 3, 5}), 11.0)}, got2


def test_timeout_midloop_allow_combinations_inner(spark):
    """allowCombinations() inner: true ignore — mid-loop branches are
    never consumed, so BOTH {s1,m3} and {s1,m3,m5} reach their horizon.
    The head gap still follows the OUTER followedBy (m@3 consumed the
    {s1} waiter), so {s1,m5} stays impossible."""
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 5, "middle"),
                      (1, 6, "foobar"), (1, 20, "end")])
    ps = CEP.pattern(df, _loop_pat("comb"), "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps.timed_out_partial_matches())
    assert got == {(frozenset({1, 3}), 11.0), (frozenset({1, 3, 5}), 11.0)}, got


def test_timeout_trailing_loop_coexists_with_matches(spark):
    """start fb mid+ WITHIN 10: the looping branch emits matches via
    PROCEED as it grows, yet advanceTime still reports it when pruned
    — {s1,m3,m5} is BOTH two emitted matches' prefix set and the one
    timeout (NFA.java:270-281 reports every pruned partial)."""
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 5, "middle"),
                      (1, 6, "foobar"), (1, 20, "noise")])
    pat = (
        Pattern.begin("start").where(_n("start"))
        .followed_by("mid").where(_n("middle")).one_or_more()
        .within(10)
    )
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    matches = ps.flat_select(timed_out_partial_matches_tag="late")
    got_m = collections.defaultdict(set)
    for r in matches.collect():
        got_m[r.match_id].add(r.ts)
    assert sorted(sorted(v) for v in got_m.values()) == [[1, 3], [1, 3, 5]]
    got_t = _collect_timeouts(ps.get_side_output("late"))
    assert got_t == {(frozenset({1, 3, 5}), 11.0)}, got_t


def test_timeout_times_exact_parks_at_next_stage(spark):
    """mid.times(2): the 2nd take EXITS the times chain into the end
    stage's head — the {s1,m3,m6} branch then waits under end's OUTER
    fb ignore and times out; with end@8 present it is consumed into a
    completed match instead and nothing expires."""
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 6, "middle"),
                      (1, 30, "noise")])
    pat = _loop_pat(lo=2, hi=2)
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps.timed_out_partial_matches())
    assert got == {(frozenset({1, 3, 6}), 11.0)}, got

    df2 = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 6, "middle"),
                       (1, 8, "end"), (1, 30, "noise")])
    ps2 = CEP.pattern(df2, pat, "k", "ts", after_match="no_skip")
    matches = ps2.flat_select(timed_out_partial_matches_tag="late")
    got_m = collections.defaultdict(set)
    for r in matches.collect():
        got_m[r.match_id].add(r.ts)
    assert sorted(sorted(v) for v in got_m.values()) == [[1, 3, 6, 8]]
    assert ps2.get_side_output("late").count() == 0


def test_timeout_times_range_midloop(spark):
    """mid.times(2,3): j=2 (>= from, < to) parks at the unrolled
    OPTIONAL inner state — inner ignore, NOT the end stage's; a 3rd
    middle consumes it and parks the j=3 branch at the end stage."""
    pat = _loop_pat(lo=2, hi=3)
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 6, "middle"),
                      (1, 30, "noise")])
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps.timed_out_partial_matches())
    assert got == {(frozenset({1, 3, 6}), 11.0)}, got

    # a 3rd middle kills the j=2 loop branch but spawns its head(end)
    # copy (NOT(take_end) fires at m@8), so BOTH prefixes expire
    df2 = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 6, "middle"),
                       (1, 8, "middle"), (1, 30, "noise")])
    ps2 = CEP.pattern(df2, pat, "k", "ts", after_match="no_skip")
    got2 = _collect_timeouts(ps2.timed_out_partial_matches())
    assert got2 == {
        (frozenset({1, 3, 6}), 11.0),
        (frozenset({1, 3, 6, 8}), 11.0),
    }, got2


def test_timeout_optional_stage_parking(spark):
    """A fb B? fb C WITHIN 10: with no B event the {a1} branch parks at
    B's head and times out as {a1} ONCE — its 'IGNORE after PROCEED'
    copy at head(C) carries the same event set, and computations
    sharing an event set collapse (NFAITCase compares sets). With b@3
    the head(B) waiter is consumed, but the head(C) copy (spawned at
    b@3: NOT(take_C) fires) survives — so BOTH {a1} and {a1,b3}
    expire."""
    pat = (
        Pattern.begin("a").where(_n("start"))
        .followed_by("b").where(_n("middle")).optional()
        .followed_by("c").where(_n("end"))
        .within(10)
    )
    df = _tdf(spark, [(1, 1, "start"), (1, 4, "foobar"), (1, 30, "noise")])
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps.timed_out_partial_matches())
    assert got == {(frozenset({1}), 11.0)}, got

    df2 = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 30, "noise")])
    ps2 = CEP.pattern(df2, pat, "k", "ts", after_match="no_skip")
    got2 = _collect_timeouts(ps2.timed_out_partial_matches())
    assert got2 == {(frozenset({1}), 11.0), (frozenset({1, 3}), 11.0)}, got2


def test_timeout_times_optional_zero_or_exactly_n(spark):
    """mid.times(2).optional() (0 or exactly 2): one middle leaves the
    j=1 branch mid-chain (inner ignore, below the minimum -> no PROCEED
    copy) and it expires; the {a1} head waiter is consumed by that same
    middle BUT its head(c) copy (the optional head's PROCEED closure)
    spawns at m@3 and survives — both partials expire."""
    pat = (
        Pattern.begin("a").where(_n("start"))
        .followed_by("mid").where(_n("middle")).times(2).optional()
        .followed_by("c").where(_n("end"))
        .within(10)
    )
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 30, "noise")])
    ps = CEP.pattern(df, pat, "k", "ts", after_match="no_skip")
    got = _collect_timeouts(ps.timed_out_partial_matches())
    assert got == {(frozenset({1}), 11.0), (frozenset({1, 3}), 11.0)}, got


# ---------------------------------------------------------------------
# Streaming timeout side output (horizon-close emission inside
# streaming_timed_out_partials) — stream == batch on the reference
# fixture and on a quantified-prefix pattern, replayed across chunks so
# the frontier/buffer state crosses micro-batch boundaries.
# ---------------------------------------------------------------------


def _pd_n(name):
    return lambda pdf, _n=name: pdf["name"] == _n


def _stream_timeouts(spark, tmp_dir, df, pat, sub, after="no_skip"):
    import os

    from tests.test_streaming import run_to_memory
    from reshape_on_flink_spark.streaming.source import chunked_replay

    stream = chunked_replay(
        spark, df, os.path.join(tmp_dir, f"to_{sub}"), n_chunks=3, order_col="ts"
    )
    sdf = CEP.pattern(
        stream, pat, "k", "ts", after_match=after
    ).timed_out_partial_matches()
    rows = run_to_memory(
        spark, sdf, f"to_out_{sub}", tmp_dir, mode="append"
    ).collect()
    per = {}
    for r in rows:
        per.setdefault((r.k, r.timeout_id), [set(), None])
        per[(r.k, r.timeout_id)][0].add(r.ts)
        per[(r.k, r.timeout_id)][1] = r.timeout_ts
    return {(frozenset(v[0]), v[1]) for v in per.values()}


def test_streaming_timeouts_equal_batch_simple(spark, tmp_dir):
    """NFAITCase:405 (fba chain) on the streaming route: the 4 pinned
    timeouts, each emitted once its horizon closes in keyed state."""
    pat = (
        Pattern.begin("start").where(_pd_n("start"))
        .followed_by_any("middle").where(_pd_n("middle"))
        .followed_by_any("end").where(_pd_n("end"))
        .within(10)
    )
    got = _stream_timeouts(spark, tmp_dir, _timeout_fixture(spark), pat, "simple")
    assert got == {
        (frozenset({1}), 11.0),
        (frozenset({1, 3}), 11.0),
        (frozenset({2}), 12.0),
        (frozenset({2, 3}), 12.0),
    }, got


def test_streaming_timeouts_loop_equal_batch(spark, tmp_dir):
    """Relaxed mid-loop fixture: the loop prefix {s1,m3} survives via
    its 'IGNORE after PROCEED' copy and {s1,m3,m5} primarily — same
    two partials as the batch matrix, across chunked replay."""
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 5, "middle"),
                      (1, 6, "foobar"), (1, 20, "end")])
    pat = (
        Pattern.begin("start").where(_pd_n("start"))
        .followed_by("mid").where(_pd_n("middle")).one_or_more()
        .followed_by("end").where(_pd_n("end"))
        .within(10)
    )
    got = _stream_timeouts(spark, tmp_dir, df, pat, "loop")
    assert got == {(frozenset({1, 3}), 11.0), (frozenset({1, 3, 5}), 11.0)}, got


def test_streaming_timeouts_times_range_equal_batch(spark, tmp_dir):
    """times(2,3) with a 3rd middle: the j=2 branch's migrated copy and
    the j=3 end-waiter both expire — matches the batch matrix; the
    loop-minimum gate keeps the j=1 branch dead."""
    df = _tdf(spark, [(1, 1, "start"), (1, 3, "middle"), (1, 6, "middle"),
                      (1, 8, "middle"), (1, 30, "noise")])
    pat = (
        Pattern.begin("start").where(_pd_n("start"))
        .followed_by("mid").where(_pd_n("middle")).times(2, 3)
        .followed_by("end").where(_pd_n("end"))
        .within(10)
    )
    got = _stream_timeouts(spark, tmp_dir, df, pat, "times")
    assert got == {
        (frozenset({1, 3, 6}), 11.0),
        (frozenset({1, 3, 6, 8}), 11.0),
    }, got


# ---------------------------------------------------------------------
# Skip strategies x stop-edge kill scans (round 12, ADVICE r11): the
# reference gates deferred emissions on EVERY live partial in
# partialMatches, INCLUDING branches later killed mid-gap by until()/
# notFollowedBy/not_next stop edges — such a branch defers emissions
# until its kill event, then vanishes silently. The emission replay
# models them as gate-only entries (kill-truncated gate-until ticks)
# that never reach the timeout output.
# ---------------------------------------------------------------------


def test_skip_prune_verdicts_gate_only_kill_entries(spark):
    """Unit pin of the emission-replay walk: a gate-only (stop-edge-
    killed) partial with death tick 5 defers an earlier match's
    emission from tick 3 to tick 5, saving the reportable partial
    whose horizon (4.5) lies in between (the reference reports it via
    advanceTime before the deferred emission); a second gate-only
    entry (death 6.5) defers the second match past the 6.8 horizon.
    Gate-only srids never appear in the prune output; the reportable
    partial at srid 2 (horizon 10 > the tick-5 emission, start <= the
    pruning id 3) is the only pruned start."""
    from reshape_on_flink_spark.operators.cep import skip_prune_verdicts

    ev = spark.createDataFrame(
        [(1, r, float(r)) for r in range(1, 8)],
        "k int, __rid long, __tick double",
    )
    matches = spark.createDataFrame(
        [(1, 2, 3.0, 3.0), (1, 5, 5.5, 7.0)],
        "k int, __srid long, __etick double, __prid double",
    )
    partials = spark.createDataFrame(
        [
            (1, 1, 5.0, 1),   # killed at 5 -> gates match 1 (etick 3)
            (1, 3, 4.5, 0),   # horizon 4.5 < deferred emission 5: saved
            (1, 4, 6.5, 1),   # killed at 6.5 -> gates match 2 (5.5)
            (1, 2, 10.0, 0),  # alive at emission 5, start <= prid 3: pruned
            (1, 6, 6.8, 0),   # horizon 6.8 < deferred emission 7: saved
        ],
        "k int, __srid long, __horizon double, __gate int",
    )
    got = {
        (r.k, r["__srid"])
        for r in skip_prune_verdicts(
            ev, matches, partials, ["k"], strict=False
        ).collect()
    }
    assert got == {(1, 2)}, got


def test_timeout_skip_with_until_kill_scan(spark):
    """A.times(2).until(U) fb B within 10 under skipPastLastEvent over
    a@1 u@2 a@3 a@4 b@5 x@30: the mid-loop branch {1} is stop-killed
    at u@2 (a gate-only entry — dead before the match completes at
    b@5, so no deferral), the match {3,4,5} emits at tick 5, and its
    pruning id b@5 covers the surviving mid-loop branch {4} (horizon
    14 > 5) — nothing times out. Under noSkip {4} is reported."""
    pat = (
        Pattern.begin("A").where(_n("a")).times(2).until(_n("u"))
        .followed_by("B").where(_n("b")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "u"), (1, 3, "a"), (1, 4, "a"),
            (1, 5, "b"), (1, 30, "x")]
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({4}), 14.0)
    }
    assert _skip_touts(spark, rows, pat, "past_last_row") == set()
    # to_next_row prunes only at/below the match's first event a@3:
    # the later start {4} survives and still times out
    assert _skip_touts(spark, rows, pat, "to_next_row") == {
        (frozenset({4}), 14.0)
    }


def test_timeout_skip_with_not_followed_by_kill_scan(spark):
    """A ^N fb B fbAny C within 10 under skipPastLastEvent over
    a@1 nn@2 a@3 b@4 c@5 x@30: the C-waiter lineage from a@1 is
    stop-killed by nn@2 before b is ever taken (prefix-gap NOT), the
    a@3 lineage completes {3,4,5} and its emission covers the
    persisting fbAny waiter {3,4} (horizon 13); nothing survives.
    Under noSkip the {3,4} waiter is reported."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .followed_by("B").where(_n("b"))
        .followed_by_any("C").where(_n("c")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "nn"), (1, 3, "a"), (1, 4, "b"),
            (1, 5, "c"), (1, 30, "x")]
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({3, 4}), 13.0)
    }
    assert _skip_touts(spark, rows, pat, "past_last_row") == set()


def test_timeout_skip_until_streaming_equals_batch(spark, tmp_dir):
    """The until-kill x skipPastLastEvent fixture on the streaming
    route (incremental matcher + dead-gate entries in keyed state) ==
    the batch matrices."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    pat = (
        Pattern.begin("A").where(c("a")).times(2).until(c("u"))
        .followed_by("B").where(c("b")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "u"), (1, 3, "a"), (1, 4, "a"),
            (1, 5, "b"), (1, 30, "x")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    assert _stream_timeouts(
        spark, tmp_dir, df, pat, "sk_uk_pl", after="past_last_row"
    ) == set()
    assert _stream_timeouts(
        spark, tmp_dir, df, pat, "sk_uk_tn", after="to_next_row"
    ) == {(frozenset({4}), 14.0)}


def test_timeout_state_format_mismatch_is_loud(spark, tmp_dir):
    """Restoring keyed timeout state across an after_match change
    (no-skip blob = bare pickled DataFrame vs skip blob = {pdf, aux})
    raises a clear 'state format mismatch' error instead of an opaque
    KeyError / silently misreading the dict as the pending frame."""
    import os
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from reshape_on_flink_spark.streaming.source import chunked_replay

    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    pat = (
        Pattern.begin("A").where(c("a"))
        .followed_by("B").where(c("b")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "m")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    src = os.path.join(tmp_dir, "fmt_src")
    ckpt = os.path.join(tmp_dir, "fmt_ckpt")

    chunked_replay(spark, df, src, n_chunks=1, order_col="ts")

    def run(after, qname):
        # re-point at the SAME source dir without rewriting it
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "stream"))
        )
        sdf = CEP.pattern(
            stream, pat, "k", "ts", after_match=after
        ).timed_out_partial_matches()
        q = (
            sdf.writeStream.outputMode("append")
            .format("noop").queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("no_skip", "fmt_run1")  # leaves no-skip keyed state behind
    # new file so the restarted query has a batch to process
    extra = spark.createDataFrame(
        [(1, 30, "x")], "k int, ts int, name string"
    )
    tmp_extra = os.path.join(tmp_dir, "fmt_extra")
    extra.coalesce(1).write.mode("overwrite").parquet(tmp_extra)
    part = next(
        f for f in sorted(os.listdir(tmp_extra)) if f.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(tmp_extra, part),
        os.path.join(src, "stream", "999.parquet"),
    )
    with pytest.raises(StreamingQueryException, match="state format mismatch"):
        run("past_last_row", "fmt_run2")


# ---------------------------------------------------------------------
# Timed-out partials under greedy() (round 12). Reference semantics:
# NFACompiler.updateWithGreedyCondition ANDs NOT(takeCondition) onto
# EVERY transition of the greedy stage's PROCEED sink, so a branch
# parked at the successor state (the maxed-out head waiter, a mid-loop
# migrated copy) can neither take nor ignore a greedy-take-able event
# — it silently DIES on the first one in its gap. Terminal greedy is
# ignored (GreedyITCase.testEndWithZeroOrMoreGreedy). reluctant() is
# this engine's match-emission extension: commitment happens at
# completion time, liveness is unchanged, so timeouts == default.
# ---------------------------------------------------------------------


def _greedy_fix(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, name string")


def test_timeout_greedy_kills_migrated_copy(spark):
    """C fb A+.greedy fb D within 10 over c@1 a@2 x@3 a@4 x@30. Hand
    trace: {c,a2} mid-loop is consume-dead (a@4 forced-take); its
    migrated copy at D (spawned at x@3) DIES at a@4 under greedy (D's
    transitions carry NOT(A-take)) but survives without greedy. The
    maximal branch {c,a2,a4} parks mid-loop with a clean gap and times
    out either way."""
    def pat(greedy):
        p = Pattern.begin("C").where(_n("c")).followed_by("A").where(_n("a")).one_or_more()
        if greedy:
            p = p.greedy()
        return p.followed_by("D").where(_n("d")).within(10)

    rows = [(1, 1, "c"), (1, 2, "a"), (1, 3, "x"), (1, 4, "a"), (1, 30, "x")]
    assert _skip_touts(spark, rows, pat(False), "no_skip") == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
    }
    assert _skip_touts(spark, rows, pat(True), "no_skip") == {
        (frozenset({1, 2, 4}), 11.0)
    }


def test_timeout_greedy_kills_maxed_head_waiter(spark):
    """C fb A.times(2).greedy fb D within 10 over c@1 a@2 a@3 x@4 a@5
    x@30: the maxed branch {c,a2,a3} parks at D's head — the guarded
    sink — and dies at a@5 under greedy (times out at 11 without it).
    The 1-take mid-loop branch is below the loop minimum (no copy)
    and consume-dead either way."""
    def pat(greedy):
        p = Pattern.begin("C").where(_n("c")).followed_by("A").where(_n("a")).times(2)
        if greedy:
            p = p.greedy()
        return p.followed_by("D").where(_n("d")).within(10)

    rows = [(1, 1, "c"), (1, 2, "a"), (1, 3, "a"), (1, 4, "x"),
            (1, 5, "a"), (1, 30, "x")]
    assert _skip_touts(spark, rows, pat(False), "no_skip") == {
        (frozenset({1, 2, 3}), 11.0)
    }
    assert _skip_touts(spark, rows, pat(True), "no_skip") == set()
    # quiet gap: the maxed waiter survives under greedy too
    rows2 = [(1, 1, "c"), (1, 2, "a"), (1, 3, "a"), (1, 4, "x"), (1, 30, "x")]
    assert _skip_touts(spark, rows2, pat(True), "no_skip") == {
        (frozenset({1, 2, 3}), 11.0)
    }


def test_timeout_greedy_with_skip_strategy(spark):
    """greedy x AfterMatchSkip interplay. Fixture 1: the sink guard is
    CROSS-START — the second start's own a-events are A-take-able
    events inside the first start's D-waiter gap, so greedy kills that
    waiter (its death feeds the emission replay's gate entries);
    nothing times out. Fixture 2: the second start begins after the
    first waiter's horizon — the waiter expires via advanceTime before
    the match completes, the emission prunes nothing, and the timeout
    survives under past_last_row."""
    p = (
        Pattern.begin("C").where(_n("c"))
        .followed_by("A").where(_n("a")).times(2).greedy()
        .followed_by("D").where(_n("d")).within(10)
    )
    rows = [(1, 1, "c"), (1, 2, "a"), (1, 3, "a"), (1, 4, "x"),
            (1, 5, "c"), (1, 6, "a"), (1, 7, "a"), (1, 13, "d"),
            (1, 30, "x")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    ps = CEP.pattern(df, p, "k", "ts", after_match="past_last_row")
    matches = ps.flat_select(timed_out_partial_matches_tag="late")
    got_m = collections.defaultdict(set)
    for r in matches.collect():
        got_m[r.match_id].add(r.ts)
    assert sorted(sorted(v) for v in got_m.values()) == [[5, 6, 7, 13]]
    assert _collect_timeouts(ps.get_side_output("late")) == set()

    rows2 = [(1, 1, "c"), (1, 2, "a"), (1, 3, "a"), (1, 4, "x"),
             (1, 12, "c"), (1, 13, "a"), (1, 14, "a"), (1, 15, "d"),
             (1, 30, "x")]
    assert _skip_touts(spark, rows2, p, "past_last_row") == {
        (frozenset({1, 2, 3}), 11.0)
    }


def test_timeout_reluctant_equals_default(spark):
    """reluctant() commits the shortest COMPLETION but never changes
    branch liveness — the timed-out partial set equals the default's."""
    def pat(reluctant):
        p = Pattern.begin("C").where(_n("c")).followed_by("A").where(_n("a")).one_or_more()
        if reluctant:
            p = p.reluctant()
        return p.followed_by("D").where(_n("d")).within(10)

    rows = [(1, 1, "c"), (1, 2, "a"), (1, 3, "x"), (1, 4, "a"), (1, 30, "x")]
    assert _skip_touts(spark, rows, pat(True), "no_skip") == _skip_touts(
        spark, rows, pat(False), "no_skip"
    )


def test_timeout_greedy_comb_midloop_persists(spark):
    """greedy + allow_combinations (round 13): the TRUE inner ignore
    keeps every mid-loop branch alive, so for an UNBOUNDED loop the
    timeout set equals plain combinations — the sink guard only bites
    where a branch actually sits at the sink. C fb A+.comb[.greedy]
    fb D within 10 over c@1 a@2 x@3 a@4 x@30: {c,a2} persists under
    comb+greedy (vs relaxed+greedy, where it is consume-dead —
    test_timeout_greedy_kills_migrated_copy)."""
    def pat(greedy):
        p = (Pattern.begin("C").where(_n("c"))
             .followed_by("A").where(_n("a")).one_or_more()
             .allow_combinations())
        if greedy:
            p = p.greedy()
        return p.followed_by("D").where(_n("d")).within(10)

    rows = [(1, 1, "c"), (1, 2, "a"), (1, 3, "x"), (1, 4, "a"), (1, 30, "x")]
    want = {(frozenset({1, 2}), 11.0), (frozenset({1, 2, 4}), 11.0)}
    assert _skip_touts(spark, rows, pat(True), "no_skip") == want
    assert _skip_touts(spark, rows, pat(False), "no_skip") == want


def test_timeout_greedy_comb_bounded_head_waiter_dies(spark):
    """Bounded comb loop, maxed branch parked at the guarded sink:
    C fb A.times(2,3).comb.greedy fb D within 10 over c@1 a@2 a@3 a@4
    x@5 a@6 x@30. NFA trace: first take forced at a@2 (relaxed entry),
    then comb skips enumerate 2/3-subsets; the 3-subsets park at D —
    {a2,a3,a4} dies at a@6 under greedy (sink transitions carry
    NOT(A-take)); {a2,a3,a6}/{a2,a4,a6} park at t6 with clean gaps.
    Mid-loop 1/2-subsets all persist (true inner ignore)."""
    def pat(greedy):
        p = (Pattern.begin("C").where(_n("c"))
             .followed_by("A").where(_n("a")).times(2, 3)
             .allow_combinations())
        if greedy:
            p = p.greedy()
        return p.followed_by("D").where(_n("d")).within(10)

    rows = [(1, 1, "c"), (1, 2, "a"), (1, 3, "a"), (1, 4, "a"),
            (1, 5, "x"), (1, 6, "a"), (1, 30, "x")]
    base = {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
        (frozenset({1, 2, 6}), 11.0),
        (frozenset({1, 2, 3, 6}), 11.0),
        (frozenset({1, 2, 4, 6}), 11.0),
    }
    assert _skip_touts(spark, rows, pat(True), "no_skip") == base
    assert _skip_touts(spark, rows, pat(False), "no_skip") == base | {
        (frozenset({1, 2, 3, 4}), 11.0)
    }


def test_timeout_interior_greedy_comb_span_kill(spark):
    """Interior comb+greedy: a prefix THROUGH the loop keeps exactly
    the expansions whose (last loop take, next taken row] span is
    greedy-clean — under combinations the expansions are subsequences,
    and the ignoreState has no PROCEED edge, so the jump rule is the
    same as relaxed greedy. A+.comb[.greedy] fb B fb C within 10 over
    a@1 a@2 b@3 x@30: greedy kills the {a1,b3} expansion (a@2 lies in
    its span); plain comb keeps it via the unguarded sink-ignore
    copy."""
    def pat(greedy):
        p = (Pattern.begin("A").where(_n("a")).one_or_more()
             .allow_combinations())
        if greedy:
            p = p.greedy()
        return (p.followed_by("B").where(_n("b"))
                .followed_by("C").where(_n("c")).within(10))

    rows = [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 30, "x")]
    base = {
        (frozenset({1}), 11.0),
        (frozenset({2}), 12.0),
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({2, 3}), 12.0),
    }
    assert _skip_touts(spark, rows, pat(True), "no_skip") == base
    assert _skip_touts(spark, rows, pat(False), "no_skip") == base | {
        (frozenset({1, 3}), 11.0)
    }


def test_match_greedy_comb_subsequences_end_at_last_takeable(spark):
    """Match-surface pin for greedy + allow_combinations: matches are
    the loop-event SUBSEQUENCES whose last taken element has no
    greedy-take-able event between it and the successor take (the
    ignoreState has no PROCEED edge; the sink is NOT(take)-guarded).
    a+ comb.greedy fb b over a1 a2 a3 b4: the four subsequences ending
    at a3 match; relaxed greedy admits only the contiguous suffixes."""
    rows = [(1, 1, "a"), (1, 2, "a"), (1, 3, "a"), (1, 4, "b")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(comb):
        p = Pattern.begin("A").where(_n("a")).one_or_more()
        if comb:
            p = p.allow_combinations()
        return p.greedy().followed_by("B").where(_n("b"))

    def match_sets(p):
        out = CEP.pattern(df, p, "k", "ts", after_match="no_skip").flat_select()
        per = collections.defaultdict(set)
        for r in out.collect():
            per[r.match_id].add(r.ts)
        return sorted(sorted(v) for v in per.values())

    assert match_sets(pat(True)) == [
        [1, 2, 3, 4], [1, 3, 4], [2, 3, 4], [3, 4],
    ]
    assert match_sets(pat(False)) == [[1, 2, 3, 4], [2, 3, 4], [3, 4]]


def test_timeout_greedy_comb_streaming_equals_batch(spark, tmp_dir):
    """comb+greedy timeouts: the streaming route (persist primary +
    greedy kill predicates over the incremental cursor) equals batch
    on the bounded-loop fixture where the sink guard discriminates,
    plus a key where a completing D coexists with persisting
    mid-loop branches."""
    rows = [(1, 1, "c"), (1, 2, "a"), (1, 3, "a"), (1, 4, "a"),
            (1, 5, "x"), (1, 6, "a"), (1, 30, "x"),
            (2, 11, "c"), (2, 12, "a"), (2, 13, "a"), (2, 18, "d"),
            (2, 40, "x")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        return (
            Pattern.begin("C").where(cols("c"))
            .followed_by("A").where(cols("a")).times(2, 3)
            .allow_combinations().greedy()
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "gcomb")
    assert got_s == got_b


def _ig_pat():
    return (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b")).one_or_more().greedy()
        .followed_by("C").where(_n("c"))
        .followed_by("D").where(_n("d")).within(10)
    )


def test_timeout_interior_greedy_span_kill(spark):
    """greedy followed by 2+ positive stages (round 12, late): a park
    at D whose prefix passed THROUGH B+.greedy keeps exactly the
    expansions with no B-take-able event between the last B and the C
    take (updateWithGreedyCondition on the sink). a b1 b2 c: the
    {a,b1,c} expansion is span-killed by b2, only {a,b1,b2,c} parks."""
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
                (1, 30, "x")],
        _ig_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3, 4}), 11.0), (frozenset({1, 2, 3}), 11.0)}


def test_timeout_interior_greedy_interleaved_takes(spark):
    """The possessive-commit divergence case: a b1 c b2 — the branch
    that proceeded at c@3 is PAST the guarded sink when b@4 arrives
    ({a,b1,c} parks at D), while the loop branch was forced through
    b@4 ({a,b1,b2} parks mid-loop). A longest-commit prefix would lose
    the first."""
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
                (1, 30, "x")],
        _ig_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0), (frozenset({1, 2, 4}), 11.0)}
    # quiet control: both the D-park and the loop park survive
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "x")],
        _ig_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0), (frozenset({1, 2}), 11.0)}


def _go_pat():
    return (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b")).one_or_more().greedy()
        .followed_by("C").where(_n("c")).optional()
        .followed_by("D").where(_n("d")).within(10)
    )


def test_timeout_greedy_before_optional_successor(spark):
    """greedy before an optional successor (round 12, late): the copy
    BEYOND the guarded sink spawns only if the FIRST gap event passes
    the sink's NOT(take) — a later B cannot kill it ('adj', not 'gap').
    a b x b: the D-copy of {a,b@2} spawned at x@3 and survives b@4;
    a b b x: the first gap event IS B-take-able, so it never spawned."""
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "x"), (1, 4, "b"),
                (1, 30, "x")],
        _go_pat(), "no_skip",
    ) == {(frozenset({1, 2}), 11.0), (frozenset({1, 2, 4}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "x"),
                (1, 30, "x")],
        _go_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0)}
    # C present: the span-killed D-park route coexists with the copy
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "x")],
        _go_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0), (frozenset({1, 2}), 11.0)}


def test_timeout_greedy_zero_take_guard_split(spark):
    """Round-13 correction of the round-12 reading: without prior NOTs
    ``copyWithoutTransitiveNots`` returns its ARGUMENT, so a NOT-free
    zero-able greedy loop — bounded times OR unbounded optional — has
    only ONE successor state and ``updateWithGreedyCondition`` guards
    it for the zero-take route too (pinned by GreedyITCase
    testGreedyZeroOrMore: {c,d} does not match over ``c a a a d``).
    The genuine split is an unbounded optional loop PRECEDED BY A NOT:
    only there does the copy split leave the zero-take PROCEED on the
    unguarded original. Three fixtures over a@1 x@2 b@3 w@30."""
    rows = [(1, 1, "a"), (1, 2, "x"), (1, 3, "b"), (1, 30, "w")]
    bounded = (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b")).times(0, 2).greedy()
        .followed_by("C").where(_n("c")).within(10)
    )
    assert _skip_touts(spark, rows, bounded, "no_skip") == {
        (frozenset({1, 3}), 11.0)
    }
    # NOT-free unbounded optional: the zero-take copy {a} at C shares
    # the guarded sink and dies at b@3
    unbounded = (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b")).one_or_more().optional().greedy()
        .followed_by("C").where(_n("c")).within(10)
    )
    assert _skip_touts(spark, rows, unbounded, "no_skip") == {
        (frozenset({1, 3}), 11.0)
    }
    # the genuine exempt case — a NOT before the OPTIONAL loop, where
    # copyWithoutTransitiveNots actually copies and the zero-take
    # route lands on the unguarded original — is unconstructible here:
    # the builder's pre-existing scope guard rejects notFollowedBy
    # before any optional/zero-able stage (NotPatternITCase
    # testNotFollowedByBeforeOptional), so the 'exempt0' spec mode is
    # defensive only
    not_split = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(_n("n"))
        .followed_by("B").where(_n("b")).one_or_more().optional().greedy()
        .followed_by("C").where(_n("c")).within(10)
    )
    with pytest.raises(NotImplementedError, match="optional|zero-able"):
        _skip_touts(spark, rows, not_split, "no_skip")


def test_timeout_interior_greedy_zero_take_span(spark):
    """Interior BOUNDED zero-able greedy: the span kill anchors on the
    last pre-post row, so a ZERO-take expansion {a,c} is killed by a
    B event between a and c (the guarded original's take carries
    NOT(B)); the one-take expansion {a,b,c} parks."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b")).times(0, 2).greedy()
        .followed_by("C").where(_n("c"))
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "w")],
        pat, "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0), (frozenset({1, 2}), 11.0)}


def test_timeout_interior_greedy_streaming_equals_batch(spark, tmp_dir):
    """The de-greedy'd span-kill enumeration on the streaming route ==
    the batch matrices (span kill + possessive-divergence fixtures,
    plus the zero-take 'anchor' span)."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    pat = (
        Pattern.begin("A").where(c("a"))
        .followed_by("B").where(c("b")).one_or_more().greedy()
        .followed_by("C").where(c("c"))
        .followed_by("D").where(c("d")).within(10)
    )
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"), (1, 30, "x"),
         (2, 1, "a"), (2, 2, "b"), (2, 3, "c"), (2, 4, "b"), (2, 30, "x")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df, pat, "ig_sb") == {
        (frozenset({1, 2, 3, 4}), 11.0), (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
    }
    zpat = (
        Pattern.begin("A").where(c("a"))
        .followed_by("B").where(c("b")).times(0, 2).greedy()
        .followed_by("C").where(c("c"))
        .followed_by("D").where(c("d")).within(10)
    )
    df2 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "w")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df2, zpat, "igz_sb") == {
        (frozenset({1, 2, 3}), 11.0), (frozenset({1, 2}), 11.0)
    }


def test_timeout_greedy_streaming_equals_batch(spark, tmp_dir):
    """The greedy kill scans ride the streaming plan dicts like every
    other kill: chunked replay == the batch matrices for both greedy
    fixtures."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    p1 = (
        Pattern.begin("C").where(c("c"))
        .followed_by("A").where(c("a")).one_or_more().greedy()
        .followed_by("D").where(c("d")).within(10)
    )
    rows1 = [(1, 1, "c"), (1, 2, "a"), (1, 3, "x"), (1, 4, "a"), (1, 30, "x")]
    df1 = spark.createDataFrame(rows1, "k int, ts int, name string")
    assert _stream_timeouts(spark, tmp_dir, df1, p1, "greedy_sb1") == {
        (frozenset({1, 2, 4}), 11.0)
    }
    p2 = (
        Pattern.begin("C").where(c("c"))
        .followed_by("A").where(c("a")).times(2).greedy()
        .followed_by("D").where(c("d")).within(10)
    )
    rows2 = [(1, 1, "c"), (1, 2, "a"), (1, 3, "a"), (1, 4, "x"),
             (1, 5, "a"), (1, 30, "x")]
    df2 = spark.createDataFrame(rows2, "k int, ts int, name string")
    assert _stream_timeouts(spark, tmp_dir, df2, p2, "greedy_sb2") == set()


# ---------------------------------------------------------------------
# Timed-out partials with GROUP-pattern prefixes (round 12). Reference:
# NFACompiler converts a non-looping GroupPattern's inner pattern IN
# PLACE between its neighbours (the same state graph a flat pattern
# produces), with the outer link's contiguity on the first inner leaf.
# The engine flattens such groups for the timeout route, so branches
# park AT the group's head leaf and INSIDE the group at each inner
# waiting position; quantified/optional/until groups stay loud.
# ---------------------------------------------------------------------


def _grp_pat(within=10):
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    return (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp)
        .followed_by("D").where(_n("d")).within(within)
    )


def test_timeout_group_prefix_parks_at_head_and_inside(spark):
    """A fb (B fb C) fb D within 10: the {a} branch parks at the
    group's HEAD leaf (consumed by b), {a,b} parks INSIDE the group at
    C's waiting position, {a,b,c} parks past the group at D."""
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "x"), (1, 30, "n")], _grp_pat(), "no_skip"
    ) == {(frozenset({1}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "x"), (1, 30, "n")],
        _grp_pat(), "no_skip",
    ) == {(frozenset({1, 2}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "n")],
        _grp_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0)}


def test_timeout_group_not_before_group_kills_head_waiter(spark):
    """A ^N fb (B fb C) within 10: the NOT gap guards the flattened
    group's head waiter — an N event in the gap kills {a} silently."""
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    pat = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .followed_by(grp).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 30, "x")], pat, "no_skip"
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "y"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}


def test_timeout_group_with_inner_loop(spark):
    """A fb (B+ fb C) within 10: the inner loop's mid-collection park
    lives inside the group — {a,b} waits with a migrated copy at C."""
    grp = (
        Pattern.begin("B").where(_n("b")).one_or_more()
        .followed_by("C").where(_n("c"))
    )
    pat = Pattern.begin("A").where(_n("a")).followed_by(grp).within(10)
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1, 2}), 11.0)}


def test_timeout_group_skip_strategy_prunes_inner_park(spark):
    """Group prefixes x AfterMatchSkip: the match {1,2,3,6} emits at
    d@6 and its pruning id covers the second start's inside-group park
    {4,5} (horizon 14 > 6) — pruned under past_last_row, reported
    under no_skip."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
            (1, 5, "b"), (1, 6, "d"), (1, 30, "x")]
    assert _skip_touts(spark, rows, _grp_pat(), "no_skip") == {
        (frozenset({4, 5}), 14.0)
    }
    assert _skip_touts(spark, rows, _grp_pat(), "past_last_row") == set()


def test_timeout_group_residual_guards(spark):
    """Quantified groups WORK (round 12 late — the quiet head-waiter
    here times out), as does until() on a group loop (lifted later the
    same round: the quiet head-waiter still reports, a stop event
    kills it)."""
    df = spark.createDataFrame([(1, 1, "a"), (1, 30, "x")],
                               "k int, ts int, name string")
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    quant = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(2).within(10)
    )
    got = _collect_timeouts(
        CEP.pattern(df, quant, "k", "ts", after_match="no_skip")
        .timed_out_partial_matches()
    )
    assert got == {(frozenset({1}), 11.0)}, got
    grp2 = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    until = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp2).one_or_more().until(_n("u")).within(10)
    )
    got_u = _collect_timeouts(
        CEP.pattern(df, until, "k", "ts", after_match="no_skip")
        .timed_out_partial_matches()
    )
    assert got_u == {(frozenset({1}), 11.0)}, got_u
    df_u = spark.createDataFrame([(1, 1, "a"), (1, 2, "u"), (1, 30, "x")],
                                 "k int, ts int, name string")
    assert _collect_timeouts(
        CEP.pattern(df_u, until, "k", "ts", after_match="no_skip")
        .timed_out_partial_matches()
    ) == set()


def test_timeout_group_streaming_equals_batch(spark, tmp_dir):
    """Flattened group prefixes ride the streaming plan dicts: chunked
    replay == the batch matrices (head park, inside-group park, past-
    group park)."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    grp = Pattern.begin("B").where(c("b")).followed_by("C").where(c("c"))
    pat = (
        Pattern.begin("A").where(c("a"))
        .followed_by(grp)
        .followed_by("D").where(c("d")).within(10)
    )
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "x"), (1, 30, "n")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df, pat, "grp_sb1") == {
        (frozenset({1, 2}), 11.0)
    }
    df2 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "n")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df2, pat, "grp_sb2") == {
        (frozenset({1, 2, 3}), 11.0)
    }


# ---------------------------------------------------------------------
# Terminal notFollowedBy + NOT-before-followedByAny timeouts (round 12)
# ---------------------------------------------------------------------


def test_timeout_terminal_not_followed_by_no_skip(spark):
    """A fb B ^N within 10 under no_skip: the terminal NOT's stop edges
    attach to the post-prefix PENDING state only — the {a} B-waiter
    times out normally; a consumed waiter leaves nothing (the pending
    {a,b} branch either matches at horizon close or is killed by N,
    never a timeout)."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "x"), (1, 30, "w")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    # consumed waiter + N-killed pending: no timeout, no match
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "nn"), (1, 30, "w")]
    assert _skip_touts(spark, rows, pat, "no_skip") == set()
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    assert CEP.pattern(df, pat, "k", "ts", after_match="no_skip").flat_select().count() == 0
    # clean pending -> MATCH at horizon close, still no timeout
    rows2 = [(1, 1, "a"), (1, 2, "b"), (1, 30, "w")]
    df2 = spark.createDataFrame(rows2, "k int, ts int, name string")
    ps2 = CEP.pattern(df2, pat, "k", "ts", after_match="no_skip")
    assert _collect_timeouts(ps2.timed_out_partial_matches()) == set()
    assert {r.ts for r in ps2.flat_select().collect()} == {1, 2}


def test_timeout_terminal_not_scope_excludes_inner_waiters(spark):
    """A fb B fb C ^N within 10: the terminal NOT guards only the
    post-C region — an N inside the {a,b} C-waiter's gap does NOT kill
    it (it still times out at 11)."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b"))
        .followed_by("C").where(_n("c"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "nn"), (1, 30, "w")],
        pat, "no_skip",
    ) == {(frozenset({1, 2}), 11.0)}


def _tn3_pat(within=10):
    return (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b"))
        .followed_by("C").where(_n("c"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .within(within)
    )


def test_timeout_terminal_not_skip_prunes_interior_partial(spark):
    """A fb B fb C ^N within 10 under skipPastLastEvent: the pending
    {a@0,b@2,c@4} completes AT its horizon (advanceTime turns the
    timed-out pending into a match) and emits at the first event >= 10
    (w@11), pruning the interior B-waiter {a@3} (start rid 3 <= prid 4,
    horizon 13 > 11) before its @14 witness. no_skip reports it."""
    rows = [(1, 0, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
            (1, 11, "w"), (1, 14, "w")]
    assert _skip_touts(spark, rows, _tn3_pat(), "no_skip") == {
        (frozenset({3}), 13.0)
    }
    assert _skip_touts(spark, rows, _tn3_pat(), "past_last_row") == set()
    # the match itself is emitted either way
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    m = CEP.pattern(df, _tn3_pat(), "k", "ts",
                    after_match="past_last_row").flat_select()
    assert {r.ts for r in m.collect()} == {0, 2, 4}


def test_timeout_terminal_not_skip_emission_at_horizon(spark):
    """The pending's completion tick is its HORIZON, not its last row:
    with the match {a@0,b@1,c@3} (h=10) and the only later event at
    @13, emission happens at 13 — the interior B-waiter {a@2}
    (horizon 12 <= 13) was reported by an earlier advanceTime and must
    ESCAPE the prune. A last-row completion tick (3) would emit at c@3
    and wrongly prune it."""
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
            (1, 13, "w")]
    want = {(frozenset({2}), 12.0)}
    assert _skip_touts(spark, rows, _tn3_pat(), "past_last_row") == want
    assert _skip_touts(spark, rows, _tn3_pat(), "no_skip") == want


def test_timeout_terminal_not_skip_match_side_pruning(spark):
    """Two pendings complete at the same advanceTime in start order;
    the first emission prunes the second COMPLETED match from the
    queue (NFA.java prunes completedMatches too): A fb B ^N over
    a@0 a@1 b@2 — past_last_row keeps only {0,2}, no_skip both."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by("B").where(_n("b"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .within(10)
    )
    rows = [(1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 12, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def msets(after):
        out = collections.defaultdict(set)
        got = CEP.pattern(df, pat, "k", "ts", after_match=after).flat_select()
        for r in got.collect():
            out[r.match_id].add(r.ts)
        return sorted(sorted(v) for v in out.values())

    assert msets("no_skip") == [[0, 2], [1, 2]]
    assert msets("past_last_row") == [[0, 2]]
    # pendings are matches-or-dead, never timeouts
    assert _skip_touts(spark, rows, pat, "past_last_row") == set()


def test_timeout_terminal_not_skip_n_killed_pending_prunes_nothing(spark):
    """An N event kills the pending mid-gap — the match is never
    emitted, so it prunes nothing: the interior B-waiter still times
    out under the skip strategy."""
    rows = [(1, 0, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
            (1, 5, "nn"), (1, 14, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    assert CEP.pattern(df, _tn3_pat(), "k", "ts",
                       after_match="past_last_row").flat_select().count() == 0
    assert _skip_touts(spark, rows, _tn3_pat(), "past_last_row") == {
        (frozenset({3}), 13.0)
    }


def test_timeout_terminal_not_skip_to_element_is_strict(spark):
    """SKIP TO FIRST B prunes with STRICT < on the mapped element's
    rid: the interior waiter {a@3} (start rid 3) survives prid=rid(b@2)
    =2 where past_last_row (prid=4, <=) killed it."""
    rows = [(1, 0, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
            (1, 11, "w"), (1, 14, "w")]
    assert _skip_touts(spark, rows, _tn3_pat(), "to_first B") == {
        (frozenset({3}), 13.0)
    }


def test_timeout_terminal_not_skip_streaming_equals_batch(spark, tmp_dir):
    """Terminal notFollowedBy under a skip strategy on the STREAMING
    route: the incremental cursor treats a found sequence as PENDING —
    killed by an N in (last row, horizon), else completing AT the
    horizon — and the keyed emission replay prunes with that tick.
    Same fixtures as the batch matrices."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    pat = (
        Pattern.begin("A").where(c("a"))
        .followed_by("B").where(c("b"))
        .followed_by("C").where(c("c"))
        .not_followed_by("N").where(c("nn"))
        .within(10)
    )
    # interior partial pruned by the horizon-close emission (key 1) vs
    # the emission-at-horizon escape (key 2: horizon 12 <= emit 13)
    df = spark.createDataFrame(
        [(1, 0, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
         (1, 11, "w"), (1, 14, "w"),
         (2, 0, "a"), (2, 1, "b"), (2, 2, "a"), (2, 3, "c"), (2, 13, "w")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(
        spark, tmp_dir, df, pat, "tnsk_sb", after="past_last_row"
    ) == {(frozenset({2}), 12.0)}
    # N-killed pending prunes nothing
    df2 = spark.createDataFrame(
        [(1, 0, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"), (1, 5, "nn"),
         (1, 14, "w")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(
        spark, tmp_dir, df2, pat, "tnsk_sb2", after="past_last_row"
    ) == {(frozenset({3}), 13.0)}


def test_timeout_not_before_followed_by_any(spark):
    """A ^N fbAny B fb C within 10: the NOT stop edge kills the
    PERSISTING fbAny waiter on an N in its gap (NotPatternITCase
    testNotFollowedBy scope), while an already-taken child parked at C
    is out of the NOT's scope and still times out."""
    pat = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(F.col("name") == "nn")
        .followed_by_any("B").where(_n("b"))
        .followed_by("C").where(_n("c")).within(10)
    )
    # quiet gap: the fbAny waiter {1} persists AND its child {1,2}
    # parks at C — both time out
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "w")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0), (frozenset({1, 2}), 11.0)}
    # N after the take: kills the waiter {1}; the child {1,2} survives
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "nn"), (1, 30, "w")],
        pat, "no_skip",
    ) == {(frozenset({1, 2}), 11.0)}
    # N before any take: the waiter dies before b; no branch exists
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "nn"), (1, 3, "b"), (1, 30, "w")],
        pat, "no_skip",
    ) == set()


def test_timeout_terminal_not_and_fbany_not_streaming(spark, tmp_dir):
    """Both round-12 NOT lifts on the streaming route == batch."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    tpat = (
        Pattern.begin("A").where(c("a"))
        .followed_by("B").where(c("b"))
        .not_followed_by("N").where(c("nn"))
        .within(10)
    )
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "x"), (1, 30, "w")], "k int, ts int, name string"
    )
    assert _stream_timeouts(spark, tmp_dir, df, tpat, "tnot_sb") == {
        (frozenset({1}), 11.0)
    }
    fpat = (
        Pattern.begin("A").where(c("a"))
        .not_followed_by("N").where(c("nn"))
        .followed_by_any("B").where(c("b"))
        .followed_by("C").where(c("c")).within(10)
    )
    df2 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "nn"), (1, 30, "w")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df2, fpat, "fbany_not_sb") == {
        (frozenset({1, 2}), 11.0)
    }


# ---------------------------------------------------------------------
# Timed-out partials inside/between iterations of QUANTIFIED groups
# (round 12, late). NFACompiler compiles a looping GroupPattern into
# its inner states repeated with the relaxed iteration link guarded by
# the group's entry condition (the r8 group-loop filler rule = the NFA
# ignore edge). Parked shapes: inside the first iteration, inside
# iteration j+1, BETWEEN iterations (consume on the entry condition,
# PROCEED copies gated by iteration count >= the loop minimum), and
# the maxed head-park at the successor.
# ---------------------------------------------------------------------


def _gq_pat(lo, hi=None, within=10):
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    p = Pattern.begin("A").where(_n("a")).followed_by(grp)
    p = p.times(lo) if hi is None else p.times(lo, hi)
    return p.followed_by("D").where(_n("d")).within(within)


def test_timeout_group_loop_parked_shapes(spark):
    """A fb (B fb C).times(2) fb D within 10 — each park topology:
    inside iteration 1 ({a,b}), between iterations ({a,b,c} waiting the
    next entry), inside iteration 2 ({a,b,c,b}), and the maxed
    head-park at D ({a,b,c,b,c})."""
    pat2 = _gq_pat(2)
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "x")], pat2, "no_skip"
    ) == {(frozenset({1, 2}), 11.0)}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "x")],
        pat2, "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0)}
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 30, "x")],
        pat2, "no_skip",
    ) == {(frozenset({1, 2, 3, 4}), 11.0)}
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 5, "c"),
         (1, 30, "x")],
        pat2, "no_skip",
    ) == {(frozenset({1, 2, 3, 4, 5}), 11.0)}


def test_timeout_group_loop_min_gates_proceed_copies(spark):
    """times(1,2) vs times(2,3) over a b c x b: the j=1 branch
    {a,b,c} is consumed by the next entry event b@5; with the minimum
    met (times(1,2)) its PROCEED copy at D persists and it still times
    out — below the minimum (times(2,3)) there is no PROCEED edge and
    it dies, leaving only the iteration-2 park {a,b,c,b}."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "x"),
            (1, 5, "b"), (1, 30, "x")]
    assert _skip_touts(spark, rows, _gq_pat(1, 2), "no_skip") == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 5}), 11.0),
    }
    assert _skip_touts(spark, rows, _gq_pat(2, 3), "no_skip") == {
        (frozenset({1, 2, 3, 5}), 11.0)
    }


def test_timeout_optional_group_absent_branch_copy(spark):
    """A fb (B fb C).optional() fb D within 10 over a b x: the {a}
    waiter at the optional group is consumed by the entry b@2, but its
    absent-branch PROCEED copy at D persists — both {a} and the
    inside-group {a,b} time out."""
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).optional()
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0), (frozenset({1, 2}), 11.0)}


def test_timeout_group_loop_residual_guards(spark):
    """GREEDY nested inner quantifiers on a quantified group stay
    loud; unbounded inner loops run since round 13 (the Gq plans —
    the one_or_more fixture parks its lone head waiter on an empty
    window) and BOUNDED ones since round 14 (dual runtime counters —
    the times(2) fixture parks {a} at the chain head the same way)."""
    df = spark.createDataFrame([(1, 1, "a"), (1, 30, "x")],
                               "k int, ts int, name string")
    inner_u = Pattern.begin("B").where(_n("b")).one_or_more().followed_by("C").where(_n("c"))
    runs = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(inner_u).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 30, "x")], runs, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    inner_q = Pattern.begin("B").where(_n("b")).times(2).followed_by("C").where(_n("c"))
    nested = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(inner_q).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 30, "x")], nested, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    inner_g = (
        Pattern.begin("B").where(_n("b")).times(2, 3).greedy()
        .followed_by("C").where(_n("c"))
    )
    greedy_nested = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(inner_g).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    with pytest.raises(NotImplementedError, match="inner stage"):
        CEP.pattern(df, greedy_nested, "k", "ts", after_match="no_skip").timed_out_partial_matches()


def _gqu_pat(lo, hi=None, within=10):
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    p = Pattern.begin("A").where(_n("a")).followed_by(grp)
    p = (p.times(lo) if hi is None else p.times(lo, hi)).until(_n("u"))
    return p.followed_by("D").where(_n("d")).within(within)


def _gqo_pat(lo, hi=None, within=10, grp_times=True):
    grp = (
        Pattern.begin("B").where(_n("b"))
        .followed_by("C").where(_n("c")).optional()
    )
    p = Pattern.begin("A").where(_n("a")).followed_by(grp)
    p = (
        (p.times(lo) if hi is None else p.times(lo, hi))
        if grp_times
        else p.one_or_more()
    )
    return p.followed_by("D").where(_n("d")).within(within)


def test_timeout_group_inner_optional_leaf(spark):
    """A fb (B fb C?).times(2) fb D within 10 (round 12, late —
    OPTIONAL inner leaves): a branch waiting at C? is simultaneously
    (via PROCEED) at the iteration boundary, so it consumes on C OR
    the next entry, and its iteration counts as complete."""
    pat = _gqo_pat(2)
    # waiting at C? of iteration 1 (boundary copy alive too — same rows)
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "w")], pat, "no_skip"
    ) == {(frozenset({1, 2}), 11.0)}
    # tail-absent iteration 1 + iteration 2 in progress: BOTH the
    # iteration-1 waiter (still parked at C?) and the tail-absent
    # iteration-2 waiter report
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 30, "w")],
        pat, "no_skip",
    ) == {(frozenset({1, 2}), 11.0), (frozenset({1, 2, 3}), 11.0)}
    # C taken: the waiter dies at c@3 but its ignore-after-PROCEED
    # boundary copy {a,b} survives, alongside the completed-iteration
    # between-wait {a,b,c}
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "w")],
        pat, "no_skip",
    ) == {(frozenset({1, 2}), 11.0), (frozenset({1, 2, 3}), 11.0)}


def test_timeout_group_inner_optional_fluid_links(spark):
    """The two-path link filter on the timeout prefixes: after the
    tail-absent iteration {b@2}, the C?-waiter force-takes the first
    purchase c@4 and the boundary copy force-takes the first entry
    b@3, so NO carrier survives to start iteration 2 at b@5 — the
    {a,b2,b5} park must not be reported. Valid parks: {a,b2} (waiting
    C? killed... consumed at c@4 -> boundary copy consumed at b@3 ->
    dead), {a,b2,b3} (iteration 2 via the first entry, waiting C?
    consumed at c@4 -> its boundary copy takes b@5 -> {a,b2,b3,b5}),
    {a,b2,c4} chains, etc. — hand-traced below."""
    pat = _gqo_pat(1, 2)
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
            (1, 5, "b"), (1, 30, "w")]
    # the full hand-traced park set; notably ABSENT: {a,b2,b5} (its
    # b2->b5 link crosses both the first entry b3 — killing the
    # boundary copy — and the first purchase c4 — consuming the
    # C?-waiter) and any 3-iteration chain (mx=2)
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 4, 5}), 11.0),
    }


def test_timeout_group_inner_optional_maxed_parks(spark):
    """times(2) maxed with optable tails: every tail-present/absent
    combination that completes two iterations parks at D — the
    tail-present finals via the (restricted) maxed head-park prefix,
    the tail-absent finals via the waiting positions' successor copies
    (gated by iterations >= lo) — with no cross-plan duplicates."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (1, 5, "c"), (1, 6, "x"), (1, 30, "w")]
    assert _skip_touts(spark, rows, _gqo_pat(2), "no_skip") == {
        (frozenset({1, 2, 3, 4, 5}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 4, 5}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
    }


def test_timeout_group_inner_optional_unbounded(spark):
    """one_or_more with an optable tail: the C?-waiter, its boundary
    wait and its successor copy (min met) share one row set — one
    reported partial."""
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "x"), (1, 30, "w")],
        _gqo_pat(0, grp_times=False), "no_skip",
    ) == {(frozenset({1, 2}), 11.0)}


def test_timeout_group_inner_optional_residual_guards(spark):
    """Round 13 lifted the OPTIONAL entry leaf (the guard fixture now
    runs: only the head waiter parks on an empty window); nested
    quantifiers and all-optional group loops stay loud."""
    df = spark.createDataFrame([(1, 1, "a"), (1, 30, "x")],
                               "k int, ts int, name string")
    grp = (
        Pattern.begin("B").where(_n("b")).optional()
        .followed_by("C").where(_n("c"))
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 30, "x")], pat, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    # BOUNDED inner quantifiers run since round 14 (the dual runtime
    # counters: inner-min gating AND iteration gating on one plan);
    # the head waiter parks on an empty window like any other shape
    nested = (
        Pattern.begin("B").where(_n("b")).times(2)
        .followed_by("C").where(_n("c"))
    )
    pat2 = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(nested).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 30, "x")], pat2, "no_skip"
    ) == {(frozenset({1}), 11.0)}
    allopt = (
        Pattern.begin("B").where(_n("b")).optional()
        .followed_by("C").where(_n("c")).optional()
    )
    pat3 = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(allopt).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    with pytest.raises(NotImplementedError, match="mandatory"):
        CEP.pattern(df, pat3, "k", "ts", after_match="no_skip").timed_out_partial_matches()


def test_timeout_group_inner_optional_streaming_equals_batch(spark, tmp_dir):
    """Inner-optional group parks on the streaming route == batch
    (per-copy iteration gates and the fluid-link filter ride the plan
    dicts)."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    grp = (
        Pattern.begin("B").where(c("b"))
        .followed_by("C").where(c("c")).optional()
    )
    pat = (
        Pattern.begin("A").where(c("a"))
        .followed_by(grp).times(2)
        .followed_by("D").where(c("d")).within(10)
    )
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 30, "w"),
         (2, 1, "a"), (2, 2, "b"), (2, 3, "c"), (2, 30, "w")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df, pat, "gqo_sb") == {
        (frozenset({1, 2}), 11.0), (frozenset({1, 2, 3}), 11.0)
    }


def test_timeout_fluid_skip_streaming_equals_batch(spark, tmp_dir):
    """Skip strategies over a FLUID pattern (optional-tail group loop)
    on the streaming route: the cursor enumerates with the two-path
    filter and picks the first-completed survivor; the emission then
    prunes the open partials exactly as on batch. Fixture: the
    {a0,b1,d3} match (tail-absent iteration) emits at d@3 with
    prid = rid(d), pruning both the {a0,b1} waiter (horizon 10) and
    the second start {a2} (horizon 12) before their witnesses."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    def build(cols):
        grp = (
            Pattern.begin("B").where(cols("b"))
            .followed_by("C").where(cols("c")).optional()
        )
        return (
            Pattern.begin("A").where(cols("a"))
            .followed_by(grp).one_or_more()
            .followed_by("D").where(cols("d")).within(10)
        )

    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "d"),
            (1, 14, "w")]
    want_ns = {(frozenset({0, 1}), 10.0), (frozenset({2}), 12.0)}
    assert _skip_touts(spark, rows, build(_n), "no_skip") == want_ns
    assert _skip_touts(spark, rows, build(_n), "past_last_row") == set()
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    assert _stream_timeouts(
        spark, tmp_dir, df, build(c), "flsk_ns", after="no_skip"
    ) == want_ns
    assert _stream_timeouts(
        spark, tmp_dir, df, build(c), "flsk_pl", after="past_last_row"
    ) == set()


def test_match_fluid_link_filter(spark):
    """The MATCH surface's two-path link rule (round 12, late): for
    A fb (B fb C?)+ fb D over a b1 b2 c1 b3 d, the {a,b1,b3,d} set is
    NOT a match — after c1 (tail force-take) and b2 (boundary force-
    take) no {a,b1} carrier survives to start an iteration at b3 —
    while the pure-path sets (b2-entry, first-entry-after-purchase)
    all remain."""
    import collections

    grp = (
        Pattern.begin("B").where(_n("b"))
        .followed_by("C").where(_n("c")).optional()
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(100)
    )
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
            (1, 5, "b"), (1, 6, "d")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")
    out = CEP.pattern(df, pat, "k", "ts", after_match="no_skip").flat_select()
    m = collections.defaultdict(set)
    for r in out.collect():
        m[r.match_id].add(r.ts)
    got = sorted(sorted(v) for v in m.values())
    assert [1, 2, 5, 6] not in got, got
    assert got == [
        [1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 6], [1, 2, 3, 5, 6],
        [1, 2, 3, 6], [1, 2, 4, 5, 6], [1, 2, 4, 6], [1, 2, 6],
    ], got


def test_timeout_group_loop_until_kills_parked_shapes(spark):
    """until() on a quantified group (round 12, late): the stop edge
    guards every looping position — inside iteration 1, between
    iterations (below the copy minimum), inside iteration 2, and the
    head waiter; each dies on a stop event in its gap."""
    pat = _gqu_pat(2)
    # inside iteration 1: {a,b} waiting C dies at u@3
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "u"), (1, 30, "x")],
        pat, "no_skip",
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "x"), (1, 30, "x")],
        pat, "no_skip",
    ) == {(frozenset({1, 2}), 11.0)}
    # between iterations, below the times(2) minimum (no PROCEED copy)
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "u"), (1, 30, "x")],
        pat, "no_skip",
    ) == set()
    # inside iteration 2: {a,b,c,b} waiting C dies at u@5
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 5, "u"),
         (1, 30, "x")],
        pat, "no_skip",
    ) == set()
    # head waiter {a} dies on a stop event before the first entry
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "u"), (1, 30, "x")], pat, "no_skip"
    ) == set()


def test_timeout_group_loop_until_guards_prefix_gaps(spark):
    """The until threads into the IN-PROGRESS iteration's inner gaps
    and takes (the partial-group wrap): a stop event inside the B->C
    gap kills that branch, so no between-iterations park may claim
    {a,b,c} across it."""
    pat = _gqu_pat(2)
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "u"), (1, 4, "c"), (1, 30, "x")],
        pat, "no_skip",
    ) == set()


def test_timeout_group_loop_until_copy_survives(spark):
    """With the loop minimum met, the PROCEED copy at D is OUTSIDE the
    looping states: the stop event kills the between-iterations waiter
    but the already-spawned copy still times out (mirrors the plain-
    loop copy-survives-the-until-event matrix)."""
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "x"), (1, 5, "u"),
         (1, 30, "x")],
        _gqu_pat(1, 2), "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0)}


def test_timeout_group_loop_consecutive(spark):
    """consecutive() iteration contiguity (round 12, late): the
    between-iterations waiter dies on any non-adjacent event; an
    adjacent entry chains iteration 2 exactly as relaxed would."""
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(2).consecutive()
        .followed_by("D").where(_n("d")).within(10)
    )
    # quiet gap: the strict waiter times out like the relaxed one
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 30, "x")],
        pat, "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0)}
    # a non-entry event in the gap kills the strict waiter (relaxed
    # would survive it) — and a later entry cannot resurrect it
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "x"), (1, 30, "x")],
        pat, "no_skip",
    ) == set()
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "x"), (1, 5, "b"),
         (1, 30, "x")],
        pat, "no_skip",
    ) == set()
    # directly-adjacent entry: iteration 2 parks inside as usual
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 30, "x")],
        pat, "no_skip",
    ) == {(frozenset({1, 2, 3, 4}), 11.0)}


def test_timeout_group_loop_allow_combinations(spark):
    """allowCombinations() iteration contiguity: the between-iterations
    waiter is a TRUE ignore — it persists through entry events (each
    spawns an iteration-2 branch) and still times out itself."""
    grp = Pattern.begin("B").where(_n("b")).followed_by("C").where(_n("c"))
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(2).allow_combinations()
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "x"), (1, 5, "b"),
         (1, 30, "x")],
        pat, "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0), (frozenset({1, 2, 3, 5}), 11.0)}
    # two candidate second entries both branch (SKIP_TILL_ANY link)
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 5, "b"),
         (1, 30, "x")],
        pat, "no_skip",
    ) == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 3, 5}), 11.0),
    }


def test_timeout_group_loop_until_and_contiguity_streaming(spark, tmp_dir):
    """Group-loop until() and consecutive() ride the streaming plan
    dicts: chunked replay == the batch matrices."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    gu = Pattern.begin("B").where(c("b")).followed_by("C").where(c("c"))
    pat_u = (
        Pattern.begin("A").where(c("a"))
        .followed_by(gu).times(2).until(c("u"))
        .followed_by("D").where(c("d")).within(10)
    )
    df_u = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "u"), (1, 30, "x"),
         (2, 1, "a"), (2, 2, "b"), (2, 3, "x"), (2, 30, "x")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df_u, pat_u, "gqu_sb") == {
        (frozenset({1, 2}), 11.0)
    }
    gc = Pattern.begin("B").where(c("b")).followed_by("C").where(c("c"))
    pat_c = (
        Pattern.begin("A").where(c("a"))
        .followed_by(gc).times(2).consecutive()
        .followed_by("D").where(c("d")).within(10)
    )
    df_c = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "x"), (1, 30, "x"),
         (2, 1, "a"), (2, 2, "b"), (2, 3, "c"), (2, 4, "b"), (2, 30, "x")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df_c, pat_c, "gqc_sb") == {
        (frozenset({1, 2, 3, 4}), 11.0)
    }


def test_timeout_group_loop_streaming_equals_batch(spark, tmp_dir):
    """The quantified-group parked shapes on the streaming route ==
    the batch matrices (iteration-2 park and the maxed head-park)."""
    def c(name):
        return lambda pdf, _n=name: pdf["name"] == _n

    grp = Pattern.begin("B").where(c("b")).followed_by("C").where(c("c"))
    pat = (
        Pattern.begin("A").where(c("a"))
        .followed_by(grp).times(2)
        .followed_by("D").where(c("d")).within(10)
    )
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 30, "x")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df, pat, "gq_sb1") == {
        (frozenset({1, 2, 3, 4}), 11.0)
    }
    df2 = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 5, "c"),
         (1, 30, "x")],
        "k int, ts int, name string",
    )
    assert _stream_timeouts(spark, tmp_dir, df2, pat, "gq_sb2") == {
        (frozenset({1, 2, 3, 4, 5}), 11.0)
    }


# ---------------------------------------------------------------------
# Quantified group loops with an OPTIONAL ENTRY leaf (round 13). The
# iteration waiter parks at the optable head leaf's state, whose NFA
# ignore edge is NOT(head take) only — deeper chain states carry
# 'IGNORE after PROCEED' copies sharing the waiter's rows, so the
# parked partial survives iff ANY of those computations does.
# Iterations count by the first MANDATORY leaf.
# ---------------------------------------------------------------------


def _goe_pat():
    grp = (
        Pattern.begin("B").where(_n("b")).optional()
        .followed_by("C").where(_n("c"))
    )
    return (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(10)
    )


def test_timeout_group_optional_entry_matrix(spark):
    """Hand-traced matrix for A fb (B? C)+ fb D within 10."""
    # a c w: head waiter survives c (NOT-b ignore); {a,c} between-waits
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "c"), (1, 30, "w")], _goe_pat(),
        "no_skip",
    ) == {(frozenset({1}), 11.0), (frozenset({1, 2}), 11.0)}
    # a b c w: b@2 consumes the head waiter, whose PRE-SPAWNED C-copy
    # (B absent) force-takes c@4 — iteration {c4} exists alongside
    # {b2,c4}; both between-wait. No {a} partial survives (waiter and
    # copy both consumed).
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 4, "c"), (1, 30, "w")],
        _goe_pat(), "no_skip",
    ) == {(frozenset({1, 2, 4}), 11.0), (frozenset({1, 4}), 11.0)}
    # a c b w: the between-waiter {a,c} is consumed by b@3 but its
    # C-chain copy survives (no later c) — the round-13 lift's case;
    # {a,c,b} waits inside iteration 2 at C; the head waiter IGNORED
    # c@2 (NOT-b) and forked at b@3 — {a,b} waits at C too
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "c"), (1, 3, "b"), (1, 30, "w")],
        _goe_pat(), "no_skip",
    ) == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 3}), 11.0),
    }
    # a x w: no group event at all — only the head waiter
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "x"), (1, 30, "w")], _goe_pat(),
        "no_skip",
    ) == {(frozenset({1}), 11.0)}


def test_timeout_group_optional_entry_times2(spark):
    """times(2) variant: iteration counting by the MANDATORY leaf (C)
    gates the successor copies; a c1 c2 parks between iterations with
    the minimum met, a c1 parks below it."""
    grp = (
        Pattern.begin("B").where(_n("b")).optional()
        .followed_by("C").where(_n("c"))
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    # a c1 c2 w: {a} head-waits (c's are NOT-b-ignorable and fork
    # iterations {c1} AND {c2}); {a,c1}/{a,c2} between-wait below the
    # minimum; {a,c1,c2} maxed -> parks at D's head
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "c"), (1, 3, "c"), (1, 30, "w")],
        pat, "no_skip",
    ) == {
        (frozenset({1}), 11.0),
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 3}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
    }


def test_timeout_group_optional_entry_streaming_equals_batch(spark, tmp_dir):
    rows = [(1, 1, "a"), (1, 2, "c"), (1, 3, "b"), (1, 30, "w"),
            (2, 1, "a"), (2, 2, "b"), (2, 4, "c"), (2, 30, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        grp = (
            Pattern.begin("B").where(cols("b")).optional()
            .followed_by("C").where(cols("c"))
        )
        return (
            Pattern.begin("A").where(cols("a"))
            .followed_by(grp).one_or_more()
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "goe")
    assert got_s == got_b


# ---------------------------------------------------------------------
# Group loops with UNBOUNDED inner loops (round 13): (B+ C)+ etc. The
# Gq mid-loop plans park branches inside the inner loop per iteration
# topology; waits at the position after an unbounded loop exist only
# as its migrated copies (no exit-by-take); tail-loop groups have no
# distinct between-state (the loop branch IS the waiter), and
# iterations count by the first plain mandatory leaf.
# ---------------------------------------------------------------------


def _gql_pat(times=None):
    grp = (
        Pattern.begin("B").where(_n("b")).one_or_more()
        .followed_by("C").where(_n("c"))
    )
    p = Pattern.begin("A").where(_n("a")).followed_by(grp)
    p = p.times(times) if times else p.one_or_more()
    return p.followed_by("D").where(_n("d")).within(10)


def test_timeout_group_inner_loop_matrix(spark):
    """A fb (B+ C)+ fb D within 10 over a b b x c b w. Hand trace:
    mid-B branch {a,b2} is consumed by the forced b@3; {a,b2,b3}
    IGNORES x@4 and c@5 (the inner relaxed ignore only forbids
    skipping B-take-able events — the C-take forks a completion copy
    without consuming the loop branch) and extends through b@6 to
    park as {a,b2,b3,b6}; the completions {a,b2,c5}/{a,b2,b3,c5} are
    consumed by b@6 as between-waiters BUT survive through their
    D-copies (loop minimum met); iteration-2 mid-B branches {..,b6}
    park with clean gaps."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "x"),
            (1, 5, "c"), (1, 6, "b"), (1, 30, "w")]
    assert _skip_touts(spark, rows, _gql_pat(), "no_skip") == {
        (frozenset({1, 2, 5}), 11.0),
        (frozenset({1, 2, 3, 5}), 11.0),
        (frozenset({1, 2, 3, 6}), 11.0),
        (frozenset({1, 2, 5, 6}), 11.0),
        (frozenset({1, 2, 3, 5, 6}), 11.0),
    }


def test_timeout_group_inner_loop_times2(spark):
    """(B+ C).times(2): iteration 2's mid-B branch {a,b2,c3,b4} parks;
    the maxed 2-iteration assignment parks at D via the head-park
    plan; the 1-iteration between-waiter {a,b2,c3} dies at b@4 with
    its D-copy gated below the minimum (C-count 1 < 2). The inner
    loop's relaxed ignore admits skipping c@3: B-chain {b2,b4} parks
    mid-iteration-1 ({1,2,4}) and completes via c@5 into the
    1-iteration between-waiter {1,2,4,5}."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (1, 5, "c"), (1, 6, "x"), (1, 30, "w")]
    assert _skip_touts(spark, rows, _gql_pat(times=2), "no_skip") == {
        (frozenset({1, 2, 4}), 11.0),
        (frozenset({1, 2, 4, 5}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 3, 4, 5}), 11.0),
    }


def test_timeout_group_tail_loop(spark):
    """TAIL-loop group (C B+)+: the iteration's B-loop branch IS the
    between-waiter (it can still extend), so survival is its relaxed
    consume scan OR the next-iteration C-copy OR the D successor copy.
    a c b x w: {a,c2} (waiting at the mandatory B with no proceed) is
    consumed by b@3 and leaves no copy; {a,c2,b3} parks mid-loop with
    a clean tail (x neutral) and times out — alive through its own
    relaxed consume scan AND its C/D copies alike."""
    grp = (
        Pattern.begin("C").where(_n("c"))
        .followed_by("B").where(_n("b")).one_or_more()
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "c"), (1, 3, "b"), (1, 4, "x"),
            (1, 30, "w")]
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({1, 2, 3}), 11.0),
    }


def test_timeout_group_inner_loop_streaming_equals_batch(spark, tmp_dir):
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "x"),
            (1, 5, "c"), (1, 6, "b"), (1, 30, "w"),
            (2, 11, "a"), (2, 12, "b"), (2, 13, "c"), (2, 18, "d"),
            (2, 40, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        grp = (
            Pattern.begin("B").where(cols("b")).one_or_more()
            .followed_by("C").where(cols("c"))
        )
        return (
            Pattern.begin("A").where(cols("a"))
            .followed_by(grp).one_or_more()
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "gql")
    assert got_s == got_b


# ---------------------------------------------------------------------
# BOUNDED nested quantifiers in group loops (round 14, dual runtime
# counters). NFACompiler compiles times(m, n) into a chain of n states
# (the first m mandatory); inside a looping group, a branch parked at
# chain position j has PROCEED copies only once j >= m (the second,
# current-iteration counter — completed iterations carry the __gq
# rename and never pollute it), and the branch leaves the chain only
# by taking the n-th event (exit-by-max pinned position waits / wA-wB
# between plans).
# ---------------------------------------------------------------------


def _gqb_pat(lo, hi, within=10):
    grp = (
        Pattern.begin("B").where(_n("b")).times(lo, hi)
        .followed_by("C").where(_n("c"))
    )
    return (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(within)
    )


def test_timeout_group_bounded_loop_parked_inside(spark):
    """A fb (B{2,3} fb C)+ fb D over a b b w: the j=1 branch {a,b2} is
    consumed by b@4; the j=2 branch {a,b2,b4} parks inside the times
    chain with a clean gap and times out."""
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 4, "b"), (1, 30, "w")],
        _gqb_pat(2, 3), "no_skip",
    ) == {(frozenset({1, 2, 4}), 11.0)}


def test_timeout_group_bounded_loop_exit_by_max(spark):
    """a b b b x w: {a,b2,b3} is consumed by b@4 but its C-copy
    (j=2 >= lo) persists past it; {a,b2,b3,b4} took the chain maximum
    and parks AT the C state (the pinned exit plan); the j=1 branch
    {a,b2} dies with no copies."""
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "b"), (1, 5, "x"),
         (1, 30, "w")],
        _gqb_pat(2, 3), "no_skip",
    ) == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
    }


def test_timeout_group_bounded_loop_min_gates_copies(spark):
    """a b b c w under times(2,3) vs times(1,3): the j=1 branch
    {a,b2} is consumed by b@3 either way, but only with the minimum
    met does its C-copy exist — times(1,3) admits the extra
    {a,b2,c4} completion (between-wait + D-copy), times(2,3) does not
    (the dual-counter discriminator)."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
            (1, 30, "w")]
    assert _skip_touts(spark, rows, _gqb_pat(2, 3), "no_skip") == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
    }
    assert _skip_touts(spark, rows, _gqb_pat(1, 3), "no_skip") == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
    }


def test_timeout_group_bounded_loop_between_and_completions(spark):
    """a b x b b c w: iteration-1 B-chains are {2},{2,4},{2,4,5}
    (relaxed inner gaps may hold non-B events, never a skipped B).
    j=3 exits to C and completes into {a,b2,b4,b5,c6}; the j=2
    branch's C-copy completes into {a,b2,b4,c6}; both park at the
    boundary/successor and time out. j=1 has no copies and every
    in-chain waiter was consumed."""
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "x"), (1, 4, "b"), (1, 5, "b"),
         (1, 6, "c"), (1, 30, "w")],
        _gqb_pat(2, 3), "no_skip",
    ) == {
        (frozenset({1, 2, 4, 5, 6}), 11.0),
        (frozenset({1, 2, 4, 6}), 11.0),
    }


def test_timeout_group_bounded_loop_iteration2(spark):
    """a b b c b b w: iteration 2 parks inside the bounded chain
    ({a,b2,b3,c4,b5,b6}, plan Gq-m); the iteration-1 between-waiter
    {a,b2,b3,c4} is consumed by b@5 but survives through its D-copy;
    {a,b2,b3,b5} (the waiter consumed-extended across c@4) exits at
    the maximum and parks at C. The iteration-2 j=1 branch
    {..,c4,b5} dies at b@6 with its copies gated (j < 2)."""
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"), (1, 5, "b"),
         (1, 6, "b"), (1, 30, "w")],
        _gqb_pat(2, 3), "no_skip",
    ) == {
        (frozenset({1, 2, 3, 5}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 3, 4, 5, 6}), 11.0),
    }


def test_timeout_group_bounded_tail_loop(spark):
    """BOUNDED TAIL loop (B fb C{1,2})+: a b c c x w — the j=1 branch
    {a,b2,c3} is consumed by c@4 but its boundary/D copies persist
    (lo=1 met); {a,b2,c3,c4} took the tail maximum and parks BETWEEN
    iterations (the pinned wA plan); with C{0,2} the tail-absent
    completion {a,b2} additionally times out through its boundary
    copy (j=0 proceed allowed at a zero minimum)."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "c"),
            (1, 5, "x"), (1, 30, "w")]

    def pat(lo):
        grp = (
            Pattern.begin("B").where(_n("b"))
            .followed_by("C").where(_n("c")).times(lo, 2)
        )
        return (
            Pattern.begin("A").where(_n("a"))
            .followed_by(grp).one_or_more()
            .followed_by("D").where(_n("d")).within(10)
        )

    assert _skip_touts(spark, rows, pat(1), "no_skip") == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
    }
    assert _skip_touts(spark, rows, pat(0), "no_skip") == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
    }


def test_timeout_group_min2_inner_loop(spark):
    """times_or_more(2) inner loop (B{2,} fb C)+: the j=1 park
    {a,b2} survives an empty window as its own waiter but never
    spawns copies below the minimum — a b b c w yields the j=2 park
    and its completion, never the j=1 completion {a,b2,c4}."""
    grp = (
        Pattern.begin("B").where(_n("b")).times_or_more(2)
        .followed_by("C").where(_n("c"))
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(10)
    )
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "w")], pat, "no_skip"
    ) == {(frozenset({1, 2}), 11.0)}
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"), (1, 30, "w")],
        pat, "no_skip",
    ) == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
    }


def test_timeout_group_bounded_loop_streaming_equals_batch(spark, tmp_dir):
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"), (1, 5, "b"),
            (1, 6, "b"), (1, 30, "w"),
            (2, 11, "a"), (2, 12, "b"), (2, 13, "b"), (2, 14, "b"),
            (2, 15, "x"), (2, 40, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        grp = (
            Pattern.begin("B").where(cols("b")).times(2, 3)
            .followed_by("C").where(cols("c"))
        )
        return (
            Pattern.begin("A").where(cols("a"))
            .followed_by(grp).one_or_more()
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "gqb")
    assert got_s == got_b


# ------------------------------------ greedy inner loops in group loops


def _ggl_pat(times=None):
    grp = (
        Pattern.begin("B").where(_n("b")).one_or_more().greedy()
        .followed_by("C").where(_n("c"))
    )
    p = Pattern.begin("A").where(_n("a")).followed_by(grp)
    p = p.times(times) if times else p.one_or_more()
    return p.followed_by("D").where(_n("d")).within(10)


def test_timeout_group_greedy_loop_times2(spark):
    """A fb (B+greedy C).times(2) fb D within 10 over a b b c b w
    (round 14, late). updateWithGreedyCondition ANDs NOT(b) onto every
    transition of the loop's PROCEED sink inside each iteration copy:

    - inside-loop branches are unchanged ({a,b2,b3,b5} parks; shorter
      runs are consumed by the next forced b);
    - iteration 1 = {b2,c4} is span-KILLED in the prefix (b3 is
      B-able in (b2, c4] — the branch waited at the guarded C state
      through b3), so the non-greedy timeout {1,2,4,5} disappears;
    - iteration 1 = {b2,b3,c4} is span-clean, its iteration-2 mid-B
      branch {a,b2,b3,c4,b5} parks."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
            (1, 5, "b"), (1, 30, "w")]
    assert _skip_touts(spark, rows, _ggl_pat(times=2), "no_skip") == {
        (frozenset({1, 2, 3, 5}), 11.0),
        (frozenset({1, 2, 3, 4, 5}), 11.0),
    }
    # the non-greedy control keeps the {b2,c4}-iteration branch
    assert _skip_touts(spark, rows, _gql_pat(times=2), "no_skip") == {
        (frozenset({1, 2, 3, 5}), 11.0),
        (frozenset({1, 2, 4, 5}), 11.0),
        (frozenset({1, 2, 3, 4, 5}), 11.0),
    }


def test_timeout_group_greedy_loop_sink_copy_dies(spark):
    """The migrated sink copy's greedy kill (the new 'gap' kill on the
    loop's own take condition): over a b b w the {a,b2} C-copy has NO
    c in its gap — without the kill it would survive to the horizon
    and wrongly emit {1,2}; the NFA copy died at b@3 (every sink
    transition carries NOT(b)). The non-greedy control DOES emit it
    (a legitimate relaxed C-waiter ignoring b@3)."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 30, "w")]
    assert _skip_touts(spark, rows, _ggl_pat(times=2), "no_skip") == {
        (frozenset({1, 2, 3}), 11.0),
    }
    assert _skip_touts(spark, rows, _gql_pat(times=2), "no_skip") == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
    }


def test_timeout_group_greedy_loop_one_or_more(spark):
    """(B+greedy C)+ fb D over a b c b w: the 1-iteration
    between-waiter {a,b2,c3} is consumed by b@4 as a waiter but its
    D-copy survives (minimum met); the iteration-2 mid-B branch
    {a,b2,c3,b4} and the c-skipping single-iteration run {a,b2,b4}
    park with clean gaps. The {a,b2} C-copy is consumed by c@3 before
    its greedy kill at b@4 (completion, not death)."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (1, 30, "w")]
    assert _skip_touts(spark, rows, _ggl_pat(), "no_skip") == {
        (frozenset({1, 2, 4}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
    }


def test_timeout_group_greedy_loop_streaming_equals_batch(spark, tmp_dir):
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
            (1, 5, "b"), (1, 30, "w"),
            (2, 11, "a"), (2, 12, "b"), (2, 13, "b"), (2, 40, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        grp = (
            Pattern.begin("B").where(cols("b")).one_or_more().greedy()
            .followed_by("C").where(cols("c"))
        )
        return (
            Pattern.begin("A").where(cols("a"))
            .followed_by(grp).times(2)
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "ggl")
    assert got_s == got_b
    # key 2's sink copy dies at b@13 on both routes (the greedy kill)
    assert (frozenset({11, 12}), 21.0) not in got_s


def test_timeout_group_greedy_loop_full_completion_parks_at_d(spark):
    """Maxed times(2) group with a full 2-iteration completion over
    a b c b c x w: the D-waiter {a,b2,c3,b4,c5} parks (past the
    guarded sink — unguarded, x is neutral); iteration 1 = {b2,b4,c5}
    (the loop's relaxed ignore skips c@3) leaves the span-clean
    between-waiter {1,2,4,5}; the inside-loop max run {1,2,4} and the
    iteration-2 mid-B branch {1,2,3,4} park as before."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (1, 5, "c"), (1, 6, "x"), (1, 30, "w")]
    assert _skip_touts(spark, rows, _ggl_pat(times=2), "no_skip") == {
        (frozenset({1, 2, 4}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 4, 5}), 11.0),
        (frozenset({1, 2, 3, 4, 5}), 11.0),
    }


# ------------- group loops with no plain mandatory inner leaf (round 14)


def test_timeout_group_all_loop_mandatory_optional_entry(spark):
    """A fb (C? B+)+ fb D within 10 over a c b x w: no plain mandatory
    inner leaf exists (the only mandatory leaf is the B loop), but a
    one_or_more group materializes NO iteration-count gate (boundary
    copies gate on bounded mx only, successor copies on lo >= 2) — the
    round-14 relaxation admits the shape. {a,c2,b3} parks inside the
    loop; {a,b3} parks too (C absent: the optable-head machinery's
    'fb' B-chain copy ignores the non-B c2 and takes b3); {a} and
    {a,c2} are consumed by b3."""
    grp = (
        Pattern.begin("C").where(_n("c")).optional()
        .followed_by("B").where(_n("b")).one_or_more()
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "c"), (1, 3, "b"), (1, 4, "x"),
            (1, 30, "w")]
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 3}), 11.0),
    }


def test_timeout_group_all_loop_mandatory_optional_tail(spark):
    """A fb (B+ C?)+ fb D within 10 over a b c b w — the shape where a
    k-take run and its split across two iterations are DISTINCT live
    computations over identical rows (the iteration both continues and
    completes on each loop take): the reference reports ONE partial
    per event set, pinned here via the set-level dedup pass.
    {a,b2} completes iteration 1 (C absent) and its D-copy survives;
    {a,b2,c3} completes via c and its D-copy survives; {a,b2,c3,b4}
    parks inside iteration 2; {a,b2,b4} is BOTH the single-iteration
    2-take run and the {b2}|{b4} split — one timeout."""
    grp = (
        Pattern.begin("B").where(_n("b")).one_or_more()
        .followed_by("C").where(_n("c")).optional()
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (1, 30, "w")]
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 3}), 11.0),
        (frozenset({1, 2, 3, 4}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
    }


def test_timeout_group_pure_loop(spark):
    """A fb (B+)+ fb D within 10 over a b x b w: the doubly-looping
    degenerate — {a,b2}'s D-copy survives (iteration complete, min
    met); {a,b2,b4} collapses the single-run and split-iteration
    computations; {a,b4} is unconstructible (A's waiter cannot skip
    the B-able b2)."""
    grp = Pattern.begin("B").where(_n("b")).one_or_more()
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).one_or_more()
        .followed_by("D").where(_n("d")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "x"), (1, 4, "b"),
            (1, 30, "w")]
    assert _skip_touts(spark, rows, pat, "no_skip") == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
    }


def test_timeout_group_all_loop_mandatory_gate_needed_raises(spark):
    """times(2) (bounded mx) on an all-loop-mandatory group needs the
    iteration-count gate and still raises loudly."""
    grp = Pattern.begin("B").where(_n("b")).one_or_more()
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 30, "w")]
    with pytest.raises(NotImplementedError, match="iteration-count gate"):
        _skip_touts(spark, rows, pat, "no_skip")


def test_timeout_group_all_loop_mandatory_streaming_equals_batch(
    spark, tmp_dir
):
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (1, 30, "w"),
            (2, 11, "a"), (2, 12, "c"), (2, 13, "b"), (2, 18, "x"),
            (2, 40, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        grp = (
            Pattern.begin("B").where(cols("b")).one_or_more()
            .followed_by("C").where(cols("c")).optional()
        )
        return (
            Pattern.begin("A").where(cols("a"))
            .followed_by(grp).one_or_more()
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "allloop")
    assert got_s == got_b
    # the set-level collapse holds on both routes: {1,2,4} exactly once
    assert (frozenset({1, 2, 4}), 11.0) in got_s


# ----------------- until() on inner loops inside group loops (round 14)


def _giu_pat(times=2):
    grp = (
        Pattern.begin("B").where(_n("b")).one_or_more().until(_n("u"))
        .followed_by("C").where(_n("c"))
    )
    return (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(times)
        .followed_by("D").where(_n("d")).within(10)
    )


def test_timeout_group_inner_until_kills_loop_waits(spark):
    """A fb (B+ until(u) C).times(2) fb D within 10. NFACompiler
    attaches the until stop edges to the inner loop's own states
    (addStopStateToLooping + the init state, r8 dual dialect); the
    sink C state is NOT guarded — a C-copy crosses the stop event
    (UntilConditionITCase's completion-survives rule).

    a b u c w: the inside-loop park {a,b2} dies at u@3 while its
    C-copy is CONSUMED by c@4 (completion) — so the iteration-1
    completion's between-waiter {a,b2,c4} is the only timeout. The
    no-until control keeps {a,b2} alive to the horizon."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "u"), (1, 4, "c"),
            (1, 30, "w")]
    assert _skip_touts(spark, rows, _giu_pat(), "no_skip") == {
        (frozenset({1, 2, 4}), 11.0),
    }
    assert _skip_touts(spark, rows, _gql_pat(times=2), "no_skip") == {
        (frozenset({1, 2}), 11.0),
        (frozenset({1, 2, 4}), 11.0),
    }


def test_timeout_group_inner_until_kills_between_and_head_waits(spark):
    """The between-iterations waiter and the group-head waiter park at
    the next iteration's loop-INIT state — until-guarded (the r8 dual
    dialect). a b c u w: the iteration-1 between-waiter {a,b2,c3} dies
    at u@4 (and the inside park is consumed by c@3's sibling copy then
    killed) -> NO timeouts. a u w: the head waiter {a} dies at u@2;
    the neutral control a x w keeps it."""
    assert _skip_touts(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "u"), (1, 30, "w")],
        _giu_pat(), "no_skip",
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "u"), (1, 30, "w")],
        _giu_pat(), "no_skip",
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "x"), (1, 30, "w")],
        _giu_pat(), "no_skip",
    ) == {(frozenset({1}), 11.0)}


def test_timeout_group_inner_until_copies_cross_the_stop(spark):
    """a b c b u b c w: iteration-2's inside park {a,b2,c3,b4} dies at
    u@5, but BOTH until-crossing C-copy completions survive to their
    own waits — iter1={b2,b4,c7} (the copy skips c3's sibling... the
    run {b2,b4} skipped c3 via the inner ignore, its C-copy crossed
    u@5 and ignored the B-able b6) leaves the between-waiter
    {1,2,4,7}; iter1={b2,c3} + iter2={b4,c7} leaves the maxed D-wait
    {1,2,3,4,7}. The inside park {a,b2} is consumed by b4."""
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (1, 5, "u"), (1, 6, "b"), (1, 7, "c"), (1, 30, "w")]
    assert _skip_touts(spark, rows, _giu_pat(), "no_skip") == {
        (frozenset({1, 2, 3, 4, 7}), 11.0),
        (frozenset({1, 2, 4, 7}), 11.0),
    }


def test_timeout_group_inner_until_park_not_masked(spark):
    """a b w (no u, no c): the inside park survives — the until kill
    fires only on actual stop events."""
    assert _skip_touts(
        spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "w")],
        _giu_pat(), "no_skip",
    ) == {(frozenset({1, 2}), 11.0)}


def test_timeout_group_inner_until_streaming_equals_batch(spark, tmp_dir):
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "u"), (1, 4, "c"),
            (1, 30, "w"),
            (2, 11, "a"), (2, 12, "b"), (2, 13, "c"), (2, 14, "u"),
            (2, 40, "w"),
            (3, 21, "a"), (3, 22, "b"), (3, 30, "x"), (3, 50, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        grp = (
            Pattern.begin("B").where(cols("b")).one_or_more()
            .until(cols("u"))
            .followed_by("C").where(cols("c"))
        )
        return (
            Pattern.begin("A").where(cols("a"))
            .followed_by(grp).times(2)
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "giu")
    assert got_s == got_b
    # key 1's inside park died at u@3 on both routes
    assert (frozenset({1, 2}), 11.0) not in got_s


def test_timeout_group_greedy_until_loop_still_raises(spark):
    """greedy + until inner loops keep the possessive match compile
    (the twin-sink corner) which would under-enumerate the prefixes —
    loud guard."""
    grp = (
        Pattern.begin("B").where(_n("b")).one_or_more().greedy()
        .until(_n("u"))
        .followed_by("C").where(_n("c"))
    )
    pat = (
        Pattern.begin("A").where(_n("a"))
        .followed_by(grp).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    with pytest.raises(NotImplementedError, match="greedy\\+until|not a supported leaf"):
        _skip_touts(
            spark, [(1, 1, "a"), (1, 2, "b"), (1, 30, "w")],
            pat, "no_skip",
        )


# ---------- interior notFollowedBy inside group loops (round 14, late)


def _gnot_pat(times=2):
    grp = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(_n("n"))
        .followed_by("C").where(_n("c"))
    )
    return (
        Pattern.begin("S").where(_n("s"))
        .followed_by(grp).times(times)
        .followed_by("D").where(_n("d")).within(10)
    )


def test_timeout_group_interior_not_kills_carrier_waits(spark):
    """S fb (A ~N C).times(2) fb D within 10: the NOT gap guards the
    branch waiting at its carrier leaf C in EVERY iteration
    (addStopStates on the waiting state), re-derived per iteration
    copy by the prefix compile. s a n w: the iteration-1 C-wait
    {s,a2} dies at n@3 (the neutral control s a x w keeps it);
    s a c a n w: the iteration-2 C-wait {s,a2,c3,a4} dies at n@5."""
    assert _skip_touts(
        spark, [(1, 1, "s"), (1, 2, "a"), (1, 3, "n"), (1, 30, "w")],
        _gnot_pat(), "no_skip",
    ) == set()
    assert _skip_touts(
        spark, [(1, 1, "s"), (1, 2, "a"), (1, 3, "x"), (1, 30, "w")],
        _gnot_pat(), "no_skip",
    ) == {(frozenset({1, 2}), 11.0)}
    assert _skip_touts(
        spark,
        [(1, 1, "s"), (1, 2, "a"), (1, 3, "c"), (1, 4, "a"),
         (1, 5, "n"), (1, 30, "w")],
        _gnot_pat(), "no_skip",
    ) == set()


def test_timeout_group_interior_not_scoped_to_carrier(spark):
    """The kill applies ONLY to waits at the carrier: the
    between-iterations waiter (waiting for the next A) and the maxed
    D-wait are untouched by an N event in their gaps. s a c n w: the
    between-waiter {s,a2,c3} survives n@4; the full 2-iteration
    completion parks at D."""
    assert _skip_touts(
        spark,
        [(1, 1, "s"), (1, 2, "a"), (1, 3, "c"), (1, 4, "n"), (1, 30, "w")],
        _gnot_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3}), 11.0)}
    assert _skip_touts(
        spark,
        [(1, 1, "s"), (1, 2, "a"), (1, 3, "c"), (1, 4, "a"),
         (1, 5, "c"), (1, 6, "x"), (1, 30, "w")],
        _gnot_pat(), "no_skip",
    ) == {(frozenset({1, 2, 3, 4, 5}), 11.0)}


def test_timeout_group_interior_not_untraced_shapes_raise(spark):
    """Leading/trailing inner NOTs and NOTs before loops stay loud."""
    grp = (
        Pattern.begin("A").where(_n("a"))
        .not_followed_by("N").where(_n("n"))
        .followed_by("B").where(_n("b")).one_or_more()
    )
    pat = (
        Pattern.begin("S").where(_n("s"))
        .followed_by(grp).times(2)
        .followed_by("D").where(_n("d")).within(10)
    )
    with pytest.raises(NotImplementedError, match="inner NOT stage"):
        _skip_touts(
            spark, [(1, 1, "s"), (1, 2, "a"), (1, 30, "w")],
            pat, "no_skip",
        )


def test_timeout_group_interior_not_streaming_equals_batch(spark, tmp_dir):
    rows = [(1, 1, "s"), (1, 2, "a"), (1, 3, "n"), (1, 30, "w"),
            (2, 11, "s"), (2, 12, "a"), (2, 13, "c"), (2, 14, "n"),
            (2, 40, "w"),
            (3, 21, "s"), (3, 22, "a"), (3, 23, "x"), (3, 50, "w")]
    df = spark.createDataFrame(rows, "k int, ts int, name string")

    def pat(cols):
        grp = (
            Pattern.begin("A").where(cols("a"))
            .not_followed_by("N").where(cols("n"))
            .followed_by("C").where(cols("c"))
        )
        return (
            Pattern.begin("S").where(cols("s"))
            .followed_by(grp).times(2)
            .followed_by("D").where(cols("d")).within(10)
        )

    got_b = _skip_touts(spark, rows, pat(_n), "no_skip")
    got_s = _stream_timeouts(spark, tmp_dir, df, pat(_pd_n), "gnot")
    assert got_s == got_b
    # key 1's C-wait died at n@3 on both routes; key 3's survived
    assert (frozenset({1, 2}), 11.0) not in got_s
    assert (frozenset({21, 22}), 31.0) in got_s
