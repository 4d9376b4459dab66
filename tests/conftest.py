"""Shared fixtures: one tuned SparkSession per test run, sf0.001 data."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture(scope="session")
def spark():
    from reshape_on_flink_spark.session import get_spark

    s = get_spark("tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from reshape_on_flink_spark.session import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture()
def tmp_dir(request):
    # sanitize: bracketed parametrize ids ("x[orc]") glob-expand in Spark paths
    import re

    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", request.node.name)
    d = os.path.join(TMP, safe)
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def assert_same_rows(df1, df2, key=None):
    """Order-insensitive DataFrame equality (collected)."""
    r1 = sorted(map(tuple, df1.collect()))
    r2 = sorted(map(tuple, df2.collect()))
    assert r1 == r2, f"row mismatch: {len(r1)} vs {len(r2)} rows\n{r1[:3]}\n{r2[:3]}"
