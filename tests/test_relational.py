"""Relational inventory smoke: every queries() entry runs at sf0.001 and
its oracle agrees (the full sf0.01 gate is tools/oracle_check.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR
from tools.oracle_check import TABLES, canonical_hash

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    assert canonical_hash(sdf) == canonical_hash(odf)


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(ORACLES) <= set(QUERIES)
