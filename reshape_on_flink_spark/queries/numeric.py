"""Cross-engine deterministic numerics.

Floating-point SUM is order-dependent: Spark and DuckDB visit rows in
different orders, so ``SUM(double)`` over 10k+ rows diverges at ~1e-5 —
far above the oracle's 1e-9 rounding. The fixtures' money columns are
2-decimal-exact doubles, so the fix is exact arithmetic:

    SUM(CAST(x AS DECIMAL(18,2)))          -- exact, order-independent
    -> CAST(... AS DOUBLE)                 -- same nearest-double in both

Decimal multiplication keeps exactness (scales add), so composite measures
like ``extendedprice * (1 - discount) * (1 + tax)`` stay exact end-to-end.
Averages are written as exact-sum / count in DOUBLE, one IEEE division in
both engines. This is a *test-determinism* device; the engine's public
operators use plain doubles (documented fp semantics), these helpers exist
so every inventory query can hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact SUM of a fixed-point double column, returned as DOUBLE."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def disc_price() -> Column:
    """lineitem revenue measure: extendedprice * (1 - discount), exact."""
    return dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))


def charge() -> Column:
    """extendedprice * (1 - discount) * (1 + tax), exact decimal."""
    return disc_price() * (F.lit(1).cast(DEC) + dec("l_tax"))


# SQL-side equivalents (DuckDB dialect == ANSI here)
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)
SQL_CHARGE = (
    f"{SQL_DISC_PRICE} * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))"
)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
