"""Fluent Table API facade (api.table): pyflink Table surface on
DataFrames — verb semantics vs direct DataFrame ops, Flink set-op
semantics, group/over windows, string-DSL subset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reshape_on_flink_spark.api.table import (
    CURRENT_RANGE,
    CURRENT_ROW,
    Over,
    Session,
    Slide,
    Table,
    Tumble,
    UNBOUNDED_RANGE,
    UNBOUNDED_ROW,
)


def _t(spark, rows, schema):
    return Table(spark.createDataFrame(rows, schema))


@pytest.fixture(scope="module")
def orders_t(spark):
    return _t(
        spark,
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "b", 7.0), (5, "c", 1.0)],
        "id int, k string, v double",
    )


def test_select_filter_alias_order(spark, orders_t):
    got = (
        orders_t.select("id", "k", F.col("v") * 2)
        .alias("id", "k", "v2")
        .filter("v2 > 10")
        .order_by("id")
        .df.collect()
    )
    assert [(r["id"], r["v2"]) for r in got] == [(1, 20.0), (2, 40.0), (4, 14.0)]


def test_group_by_select_with_dsl_and_sql(spark, orders_t):
    got = {
        (r["k"], r["n"], r["v_sum"])
        for r in orders_t.group_by("k").select("k", "v.sum", "count(*) as n").df.collect()
    }
    assert got == {("a", 2, 30.0), ("b", 2, 12.0), ("c", 1, 1.0)}
    # key can appear anywhere in the select order; Column aggregates too
    got2 = orders_t.group_by("k").select(F.max("v").alias("mx"), "k").df.columns
    assert got2 == ["mx", "k"]


def test_flink_set_op_semantics(spark):
    a = _t(spark, [(1,), (1,), (2,)], "x int")
    b = _t(spark, [(1,), (3,)], "x int")
    assert sorted(r["x"] for r in a.union(b).df.collect()) == [1, 2, 3]
    assert sorted(r["x"] for r in a.union_all(b).df.collect()) == [1, 1, 1, 2, 3]
    assert sorted(r["x"] for r in a.minus(b).df.collect()) == [2]
    assert sorted(r["x"] for r in a.minus_all(b).df.collect()) == [1, 2]
    assert sorted(r["x"] for r in a.intersect(b).df.collect()) == [1]
    assert sorted(r["x"] for r in a.intersect_all(b).df.collect()) == [1]


def test_joins_and_lateral(spark, orders_t):
    dim = _t(spark, [("a", "alpha"), ("b", "beta")], "k2 string, label string")
    got = {
        (r["id"], r["label"])
        for r in orders_t.join(dim, "k = k2").select("id", "label").df.collect()
    }
    assert got == {(1, "alpha"), (2, "alpha"), (3, "beta"), (4, "beta")}
    left = orders_t.left_outer_join(dim, "k = k2").select("id", "label")
    assert sum(1 for r in left.df.collect() if r["label"] is None) == 1
    # lateral: explode vs explode_outer on an empty array
    arr = _t(spark, [(1, [10, 20]), (2, [])], "id int, xs array<int>")
    inner = arr.join_lateral("explode(xs) as x").df.collect()
    assert {(r["id"], r["x"]) for r in inner} == {(1, 10), (1, 20)}
    outer = arr.left_outer_join_lateral("explode(xs) as x").df.collect()
    assert {(r["id"], r["x"]) for r in outer} == {(1, 10), (1, 20), (2, None)}


def test_column_verbs_and_limits(spark, orders_t):
    t = (
        orders_t.add_columns("v * 10 as v10")
        .add_or_replace_columns("v * 100 as v10")
        .rename_columns("v10 as big")
        .drop_columns("v")
    )
    assert t.df.columns == ["id", "k", "big"]
    assert t.order_by("id").fetch(1).df.collect()[0]["big"] == 1000.0
    assert t.order_by("id").limit(2, offset=1).df.count() == 2
    assert t.order_by("id").offset(4).df.count() == 1


def test_map_pandas(spark, orders_t):
    def double(pdf):
        pdf = pdf[["id", "v"]].copy()
        pdf["v"] = pdf["v"] * 2
        return pdf

    got = orders_t.map(double, "id int, v double").order_by("id").df.collect()
    assert [r["v"] for r in got] == [20.0, 40.0, 10.0, 14.0, 2.0]


def test_tumble_window_equals_dataframe(spark, tables):
    ev = tables["events"]
    t = Table(ev)
    via = (
        t.window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("w", "event_type")
        .select(
            "event_type",
            "w.start as ws",
            F.count(F.lit(1)).alias("n"),
        )
        .df
    )
    direct = ev.groupBy(
        F.window("ts", "1 hour").alias("__w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n")).select(
        "event_type", F.col("__w.start").alias("ws"), "n"
    )
    assert sorted(map(tuple, via.collect())) == sorted(map(tuple, direct.collect()))
    assert via.count() > 0


def test_session_and_slide_builders(spark, tables):
    ev = tables["events"]
    slide = (
        Table(ev)
        .window(Slide.over("2 hours").every("1 hour").on("ts").alias("w"))
        .group_by("w")
        .select("w.end as we", F.count(F.lit(1)).alias("n"))
        .df
    )
    assert slide.columns == ["we", "n"] and slide.count() > 0
    sess = (
        Table(ev)
        .window(Session.with_gap("30 minutes").on("ts").alias("w"))
        .group_by("w", "user_id")
        .select("user_id", F.count(F.lit(1)).alias("n"))
        .df
    )
    assert sess.count() > 0
    with pytest.raises(ValueError, match="window alias"):
        Table(ev).window(Tumble.over("1 hour").on("ts").alias("w")).group_by("user_id")


def test_over_window_running_and_sliding(spark, orders_t):
    run = (
        orders_t.over_window(
            Over.partition_by("k").order_by("id").preceding(UNBOUNDED_ROW).alias("w")
        )
        .select(rsum=F.sum("v"))
        .order_by("id")
        .df.collect()
    )
    assert [r["rsum"] for r in run] == [10.0, 30.0, 5.0, 12.0, 1.0]
    slide = (
        orders_t.over_window(
            Over.partition_by("k").order_by("id").preceding(1).alias("w")
        )
        .select(s2=F.sum("v"))
        .order_by("id")
        .df.collect()
    )
    assert [r["s2"] for r in slide] == [10.0, 30.0, 5.0, 12.0, 1.0]
    rng = (
        orders_t.over_window(
            Over.order_by("v").preceding(UNBOUNDED_RANGE).alias("w")
        )
        .select(cume=F.count(F.lit(1)))
        .df.collect()
    )
    # RANGE frame includes peers — all-distinct v: positions 1..5
    assert sorted(r["cume"] for r in rng) == [1, 2, 3, 4, 5]


def test_table_delegates_to_dataframe(spark, orders_t):
    # __getattr__ fallthrough: DataFrame surface keeps working
    assert orders_t.count() == 5
    assert "k" in orders_t.columns
    assert orders_t.schema["v"].dataType.typeName() == "double"


def test_from_path_returns_fluent_table(spark, orders_t):
    from reshape_on_flink_spark.api.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    orders_t.df.createOrReplaceTempView("tapi_orders")
    t = tenv.from_path("tapi_orders")
    assert t.group_by("k").select("k", "v.sum").df.count() == 3
    lit = tenv.from_elements([(1, "x")], "a int, b string")
    assert lit.select("a").df.collect()[0]["a"] == 1


def test_dsl_rejects_unknown_suffix(spark, orders_t):
    with pytest.raises(ValueError, match="unsupported Flink string-DSL"):
        orders_t.group_by("k").select("k", "v.median as m")
