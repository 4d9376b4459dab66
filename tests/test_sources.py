"""Source/sink tests: format round-trips and the datagen source."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reshape_on_flink_spark.sources.readers import datagen, read_table, write_table
from tests.conftest import assert_same_rows


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tables, tmp_dir, fmt):
    src = tables["nation"]
    path = os.path.join(tmp_dir, fmt)
    write_table(src, path, fmt=fmt)
    got = read_table(spark, path, fmt=fmt, schema=src.schema)
    assert_same_rows(got, src)


def test_partitioned_write_prunes(spark, tables, tmp_dir):
    path = os.path.join(tmp_dir, "part")
    write_table(tables["orders"], path, partition_by=["o_orderstatus"])
    got = read_table(spark, path).where(F.col("o_orderstatus") == "F")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert got.count() == tables["orders"].where("o_orderstatus = 'F'").count()


def test_csv_requires_schema(spark, tmp_dir):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, tmp_dir, fmt="csv")


def test_unknown_format_rejected(spark, tmp_dir):
    with pytest.raises(ValueError, match="unavailable"):
        read_table(spark, tmp_dir, fmt="no_such_format", schema="x int")


def test_datagen_deterministic_and_skewed(spark):
    a = datagen(spark, 10_000, skew_hot_share=0.5)
    b = datagen(spark, 10_000, skew_hot_share=0.5)
    assert_same_rows(a, b)
    hot = a.where("key = 0").count()
    assert 0.45 <= hot / 10_000 <= 0.60


def test_idempotent_foreach_batch_skips_replayed_ids(spark, tables, tmp_dir):
    """Exactly-once contract: replaying a committed batch_id must not
    duplicate sink output; an uncommitted (crashed) batch must be
    re-writable."""
    import os

    from reshape_on_flink_spark.sources.readers import idempotent_foreach_batch

    calls = []

    def sink(df, batch_id):
        calls.append((batch_id, df.count()))

    write = idempotent_foreach_batch(sink, os.path.join(tmp_dir, "markers"))
    df = tables["region"]
    write(df, 0)
    write(df, 1)
    write(df, 0)  # replay after successful commit -> skipped
    assert [c[0] for c in calls] == [0, 1]

    # simulate a crash between sink write and marker: remove the marker,
    # replay must call the sink again (at-least-once within the batch,
    # made exact by the overwrite-by-batch contract)
    os.remove(os.path.join(tmp_dir, "markers", "batch_1.done"))
    write(df, 1)
    assert [c[0] for c in calls] == [0, 1, 1]


def test_jdbc_roundtrip_partitioned_and_pushdown(spark, tables):
    """JDBC connector against embedded Derby: round-trip, partitioned
    parallel read, and filter pushdown into the remote query."""
    from reshape_on_flink_spark.sources.readers import read_jdbc, write_jdbc

    url = "jdbc:derby:memory:enginetest;create=true"
    src = tables["nation"]
    write_jdbc(src, url, "nation_jdbc")
    back = read_jdbc(
        spark, url, "nation_jdbc",
        partition_column="n_nationkey", num_partitions=4, lower_bound=0, upper_bound=25,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    filtered = back.where("n_nationkey < 5").select("n_name")
    plan = filtered._jdf.queryExecution().explainString(
        filtered._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "n_nationkey" in plan.split("PushedFilters")[1][:120]
    assert filtered.count() == 5


def test_chunked_replay_string_order_col_chunks_are_time_ordered(spark, tmp_dir):
    """The range-partition path (non-numeric order columns) must produce
    chunks where every row of chunk i orders <= every row of chunk i+1 —
    the replay-order contract the quantile path gives numeric columns."""
    import os

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from reshape_on_flink_spark.streaming.source import chunked_replay

    df = spark.range(500).select(
        F.col("id").alias("event_id"), F.md5(F.col("id").cast("string")).alias("okey")
    )
    out = os.path.join(tmp_dir, "replay_str")
    stream = chunked_replay(spark, df, out, n_chunks=4, order_col="okey")
    assert stream.isStreaming
    flat = os.path.join(out, "stream")
    prev_max, total = None, 0
    for fname in sorted(os.listdir(flat)):
        keys = pq.read_table(os.path.join(flat, fname), columns=["okey"]).column("okey").to_pylist()
        total += len(keys)
        if not keys:
            continue
        if prev_max is not None:
            assert min(keys) >= prev_max, (fname, min(keys), prev_max)
        prev_max = max(keys)
    assert total == 500
