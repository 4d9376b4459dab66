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
