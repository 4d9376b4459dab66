"""TPC-DS literal-text harness: data generation, registration, comparison.

The reference ships 103 runnable TPC-DS query texts plus a driver that
executes them verbatim against registered tables
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql;
TpcdsTestProgram.java:48-80 reads each file and hands the text to
``tEnv.sqlQuery``).  This module gives the Spark build the same
capability: deterministic TPC-DS data (DuckDB's bundled ``tpcds``
extension — a public dsdgen reimplementation), table registration in a
SparkSession, and a tolerant result comparator so the *same query text*
can be executed by both Spark (through the dialect layer) and DuckDB
(the oracle) and checked value-for-value.

Design notes for scale: the generated parquet is partition-friendly
(one file per table at test sf; a real deployment points
``register_tpcds`` at a partitioned warehouse and Catalyst handles
pushdown/pruning exactly as pinned in tests/test_plans.py).  Nothing
here is test-only except the generator itself.
"""

from __future__ import annotations

import math
import os
import re
from datetime import date, datetime
from decimal import Decimal

TPCDS_TABLES = [
    "call_center", "catalog_page", "catalog_returns", "catalog_sales",
    "customer", "customer_address", "customer_demographics", "date_dim",
    "household_demographics", "income_band", "inventory", "item",
    "promotion", "reason", "ship_mode", "store", "store_returns",
    "store_sales", "time_dim", "warehouse", "web_page", "web_returns",
    "web_sales", "web_site",
]

_MARKER = "_TPCDS_GENERATED"


def generate_tpcds(out_dir: str, sf: float = 0.01) -> str:
    """Generate TPC-DS tables at ``sf`` as parquet under ``out_dir``.

    Idempotent: a marker file records the sf; regeneration only happens
    when the directory is missing or was built at a different sf.
    Both engines under test read these parquet files (never the live
    DuckDB tables), so they see byte-identical data.
    """
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == str(sf):
                return out_dir
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpcds")
    con.execute(f"CALL dsdgen(sf={sf})")
    for t in TPCDS_TABLES:
        path = os.path.join(out_dir, f"{t}.parquet")
        con.execute(f"COPY {t} TO '{path}' (FORMAT PARQUET)")
    con.close()
    with open(marker, "w") as fh:
        fh.write(str(sf))
    return out_dir


def register_tpcds(spark, data_dir: str) -> None:
    """Register every TPC-DS table as a temp view over its parquet."""
    for t in TPCDS_TABLES:
        spark.read.parquet(os.path.join(data_dir, f"{t}.parquet")) \
            .createOrReplaceTempView(t)


def duckdb_tpcds(data_dir: str):
    """A DuckDB connection with views over the same parquet files."""
    import duckdb

    con = duckdb.connect()
    for t in TPCDS_TABLES:
        path = os.path.join(data_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def load_query_text(path: str) -> str:
    """Read one reference query file, dropping the comment banner lines."""
    with open(path) as fh:
        lines = [l for l in fh.read().splitlines()
                 if not l.strip().startswith("--")]
    return "\n".join(lines).strip()


_LIMIT_RE = re.compile(r"\blimit\s+(\d+)\s*$", re.IGNORECASE)


def top_limit(sql: str) -> int | None:
    """The query's trailing top-level LIMIT, if any."""
    m = _LIMIT_RE.search(sql.rstrip())
    return int(m.group(1)) if m else None


def strip_top_limit(sql: str) -> str:
    """Remove the trailing top-level LIMIT (applied to BOTH engines when
    tie-breaking at the limit boundary is engine-dependent)."""
    return _LIMIT_RE.sub("", sql.rstrip()).rstrip()


def to_duckdb_dialect(sql: str) -> str:
    """Normalize Flink/Spark identifier quoting for the DuckDB oracle:
    backtick-quoted identifiers become double-quoted.  String literals
    are masked first so their contents are never touched."""
    out, parts = [], []
    masked = re.sub(
        r"'(?:[^']|'')*'",
        lambda m: (parts.append(m.group(0)) or f"\x00{len(parts) - 1}\x00"),
        sql,
    )
    masked = re.sub(r"`([^`]*)`", r'"\1"', masked)
    return re.sub(r"\x00(\d+)\x00", lambda m: parts[int(m.group(1))], masked)


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        # engines disagree on DATE vs midnight-TIMESTAMP for date-typed
        # outputs (DuckDB's fetchdf upcasts DATE to datetime64); collapse
        # exact midnights to the date string so both spell identically
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return str(v.date())
        return str(v)
    if isinstance(v, date):
        return str(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _rows_of(obj) -> list[tuple]:
    """Normalize a Spark DataFrame or a pandas DataFrame to row tuples."""
    import pandas as pd

    if not isinstance(obj, pd.DataFrame):
        obj = obj.toPandas()
    rows = []
    for row in obj.itertuples(index=False, name=None):
        rows.append(tuple(_norm_cell(v) for v in row))
    return rows


def _sort_key(row: tuple):
    # each side is sorted independently and per-column types are
    # homogeneous within a result set, so native ordering is safe;
    # floats are rounded so tolerance-equal values align across sides
    return tuple(
        (v is None, round(v, 4) if isinstance(v, float) else v)
        for v in row
    )


def _cells_match(a, b, rel=1e-6, abs_=1e-4) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rel, abs_tol=abs_)
        except (TypeError, ValueError):
            return False
    return a == b


def compare_results(spark_df, duck_df, rel=1e-6, abs_=1e-4) -> str | None:
    """Order-insensitive compare of two result sets (column-positional,
    float/decimal tolerant).  Returns None on match, else a message."""
    a = _rows_of(spark_df)
    b = _rows_of(duck_df)
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if a and len(a[0]) != len(b[0]):
        return f"column count {len(a[0])} vs {len(b[0])}"
    a.sort(key=_sort_key)
    b.sort(key=_sort_key)
    for i, (ra, rb) in enumerate(zip(a, b)):
        for j, (va, vb) in enumerate(zip(ra, rb)):
            if not _cells_match(va, vb, rel, abs_):
                return f"row {i} col {j}: {va!r} vs {vb!r}"
    return None
