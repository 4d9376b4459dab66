"""Changelog operators + DataStream facade tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from reshape_on_flink_spark.operators.changelog import (
    CHANGE_COL,
    DELETE,
    INSERT,
    UPDATE_AFTER,
    UPDATE_BEFORE,
    changelog_normalize,
    drop_update_before,
    snapshot_diff,
)
from tests.conftest import assert_same_rows


def _log(spark, rows):
    return spark.createDataFrame(rows, f"{CHANGE_COL} string, k int, v string, seq int")


def test_changelog_normalize_basic(spark):
    log = _log(
        spark,
        [
            (INSERT, 1, "a", 1),
            (UPDATE_BEFORE, 1, "a", 2),
            (UPDATE_AFTER, 1, "b", 3),
            (INSERT, 2, "x", 4),
            (DELETE, 2, "x", 5),
            (INSERT, 3, "z", 6),
        ],
    )
    got = changelog_normalize(log, ["k"], "seq")
    assert {(r["k"], r["v"]) for r in got.collect()} == {(1, "b"), (3, "z")}


def test_drop_update_before(spark):
    log = _log(spark, [(INSERT, 1, "a", 1), (UPDATE_BEFORE, 1, "a", 2), (UPDATE_AFTER, 1, "b", 3)])
    assert drop_update_before(log).count() == 2


def test_snapshot_diff_roundtrip(spark, tables):
    """normalize(initial-inserts + diff) == after snapshot."""
    before = tables["customer"].select("c_custkey", "c_acctbal").limit(100)
    after = (
        before.where("c_custkey % 7 != 0")  # deletes
        .withColumn("c_acctbal", F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 1).otherwise(F.col("c_acctbal")))
        .union(spark.createDataFrame([(99991, 5.0), (99992, 6.0)], ["c_custkey", "c_acctbal"]))
    )
    diff = snapshot_diff(before, after, ["c_custkey"], ["c_acctbal"])
    n_del = diff.where(F.col(CHANGE_COL) == DELETE).count()
    n_ins = diff.where(F.col(CHANGE_COL) == INSERT).count()
    assert n_ins == 2 and n_del == before.where("c_custkey % 7 = 0").count()

    initial = before.select(F.lit(INSERT).alias(CHANGE_COL), "c_custkey", "c_acctbal").withColumn(
        "seq", F.lit(0)
    )
    log = initial.unionByName(diff.withColumn("seq", F.lit(1)))
    rebuilt = changelog_normalize(log, ["c_custkey"], "seq")
    assert_same_rows(rebuilt.select("c_custkey", "c_acctbal"), after)


def test_datastream_facade(spark, tables):
    from reshape_on_flink_spark.api.datastream import DataStream

    ev = DataStream(tables["events"])
    # map/filter stay expression-level
    out = (
        ev.filter_expr("event_type = 'click'")
        .map_expr("user_id", (F.col("value") * 2).alias("v2"))
        .key_by("user_id")
        .reduce(total=F.sum("v2"), n=F.count("*"))
    )
    expected = (
        tables["events"]
        .where("event_type = 'click'")
        .groupBy("user_id")
        .agg(F.sum(F.col("value") * 2).alias("total"), F.count("*").alias("n"))
    )
    assert_same_rows(out.df, expected)


def test_datastream_windowed_aggregate(spark, tables):
    from reshape_on_flink_spark.api.datastream import DataStream

    out = (
        DataStream(tables["events"])
        .key_by("event_type")
        .window_tumble("ts", "1 hour")
        .aggregate(n=F.count("*"))
    )
    expected = (
        tables["events"]
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("event_type", F.unix_timestamp("w.start").alias("window_start"), F.unix_timestamp("w.end").alias("window_end"), "n")
    )
    assert_same_rows(out.df, expected)


def test_datastream_pandas_paths(spark, tables):
    from reshape_on_flink_spark.api.datastream import DataStream

    ev = DataStream(tables["events"].select("user_id", "value"))
    doubled = ev.map_pandas(lambda pdf: pdf.assign(value=pdf.value * 2), "user_id long, value double")
    assert doubled.df.agg(F.sum("value")).first()[0] == (
        tables["events"].agg(F.sum(F.col("value") * 2)).first()[0]
    )

    def top1(key, pdf):
        return pdf.nlargest(1, "value")

    top = ev.key_by("user_id").process(top1, "user_id long, value double")
    expected = (
        tables["events"].groupBy("user_id").agg(F.max("value").alias("value"))
    )
    assert_same_rows(top.df, expected)
