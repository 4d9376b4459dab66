"""TPC-H literal-text harness: dbgen data + registration.

The reference end-to-end suite runs the 22 canonical TPC-H query texts
against dbgen data (flink-end-to-end-tests/test-scripts/test_tpch.sh:
63-83 — `INSERT INTO qN $(cat query/qN.sql)`, with 4 modified variants
shipped in test-data/tpch/modified-query/). This module provides the
same capability on Spark: deterministic TPC-H data via DuckDB's bundled
``tpch`` extension (a public dbgen reimplementation, which also ships
the canonical query texts through ``tpch_queries()``), parquet export,
and table registration; comparison utilities are shared with the
TPC-DS harness (sources/tpcds.py).

The driver-shipped ``/root/testdata`` fixtures are REDUCED TPC-H (no
partsupp, no commit/receipt dates), so the literal texts need this
full-schema dbgen data — exactly as the reference test fetches its own.
"""

from __future__ import annotations

import os

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "partsupp",
    "orders", "lineitem",
]

_MARKER = "_TPCH_GENERATED"


def generate_tpch(out_dir: str, sf: float = 0.01) -> str:
    """dbgen at ``sf`` -> parquet under ``out_dir`` (idempotent)."""
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == str(sf):
                return out_dir
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpch")
    con.execute(f"CALL dbgen(sf={sf})")
    for t in TPCH_TABLES:
        con.execute(
            f"COPY {t} TO '{os.path.join(out_dir, t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()
    with open(marker, "w") as fh:
        fh.write(str(sf))
    return out_dir


def query_texts() -> dict[str, str]:
    """The 22 canonical texts, keyed 'q1'..'q22' (tpch_queries())."""
    import duckdb

    con = duckdb.connect()
    con.execute("LOAD tpch")
    rows = con.execute("SELECT query_nr, query FROM tpch_queries()").fetchall()
    con.close()
    return {f"q{nr}": text for nr, text in rows}


def register_tpch(spark, data_dir: str) -> None:
    from reshape_on_flink_spark.session import ensure_confs

    ensure_confs(spark)
    for t in TPCH_TABLES:
        spark.read.parquet(os.path.join(data_dir, t + ".parquet")) \
            .createOrReplaceTempView(t)


def duckdb_tpch(data_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(data_dir, t + '.parquet')}')"
        )
    return con
