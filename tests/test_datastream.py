"""DataStream facade (api.datastream): the reference's fluent API surface
runs on DataFrames and matches equivalent native computations."""

from __future__ import annotations

from pyspark.sql import functions as F

from reshape_on_flink_spark.api.datastream import DataStream


def test_side_output_partitions_rows(spark, tables):
    ev = DataStream(tables["events"])
    main, side = ev.side_output(F.col("event_type") == "purchase")
    n_side = side.df.count()
    assert n_side == tables["events"].where("event_type = 'purchase'").count()
    assert main.df.count() + n_side == tables["events"].count()


def test_broadcast_connect_enriches(spark, tables):
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 5.0)], "et string, weight double"
    )
    out = DataStream(tables["events"]).broadcast_connect(
        dim, F.col("event_type") == F.col("et")
    )
    got = out.df.where("event_type = 'purchase'").select("weight").distinct().collect()
    assert [r["weight"] for r in got] == [5.0]
    assert out.df.count() == tables["events"].count()  # left join keeps all


def test_window_hop_counts(spark, tables):
    got = (
        DataStream(tables["events"])
        .key_by("event_type")
        .window_hop("ts", "1 hour", "30 minutes")
        .aggregate(n=F.count("*"))
    )
    expected = (
        tables["events"]
        .groupBy("event_type", F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    assert got.df.agg(F.sum("n")).collect()[0][0] == expected.agg(F.sum("n")).collect()[0][0]


def test_window_join_matches_query(spark, tables):
    from reshape_on_flink_spark.queries.streaming_batch import q_window_join
    from tests.conftest import SF_DIR

    ev = tables["events"]
    v = DataStream(ev.where("event_type = 'view'")).key_by("user_id")
    p = DataStream(ev.where("event_type = 'purchase'")).key_by("user_id")
    joined = v.window_join(p, "ts", "1 hour")
    got = (
        joined.df.groupBy("user_id", F.unix_timestamp("window.start").alias("ws"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id", "ws")
        .collect()
    )
    expected = q_window_join(spark, SF_DIR).select("user_id", "ws", "n_pairs").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in expected]


def test_co_group_set_difference(spark, tables):
    import pandas as pd

    ev = tables["events"]
    views = DataStream(ev.where("event_type = 'view'").select("user_id", "event_id")).key_by(
        "user_id"
    )
    buys = DataStream(ev.where("event_type = 'purchase'").select("user_id", "event_id")).key_by(
        "user_id"
    )

    def viewers_without_purchase(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) and not len(right):
            return pd.DataFrame({"user_id": [left["user_id"].iloc[0]], "n_views": [len(left)]})
        return pd.DataFrame({"user_id": [], "n_views": []}).astype({"user_id": "int64", "n_views": "int64"})

    got = {
        r["user_id"]: r["n_views"]
        for r in views.co_group(buys, viewers_without_purchase, "user_id long, n_views long").df.collect()
    }
    v_users = {r["user_id"] for r in ev.where("event_type = 'view'").select("user_id").distinct().collect()}
    p_users = {r["user_id"] for r in ev.where("event_type = 'purchase'").select("user_id").distinct().collect()}
    expected_users = v_users - p_users
    assert set(got) == expected_users


def test_partitioner_facade(spark, tables):
    ev = DataStream(tables["events"].select("user_id", "event_id"))
    assert ev.rebalance(16).df.rdd.getNumPartitions() == 16
    assert ev.rebalance(16).rescale(4).df.rdd.getNumPartitions() == 4
    assert ev.global_().df.rdd.getNumPartitions() == 1
    p = ev.partition_custom(8, "user_id")
    assert p.df.rdd.getNumPartitions() == 8
    assert p.df.count() == tables["events"].count()
