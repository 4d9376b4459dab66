"""ANALYZE-style table profiling — one-pass per-column statistics.

Reference analog: Flink's ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL
COLUMNS`` (flink-table/flink-sql-parser ``SqlAnalyzeTable``) collects
row count, null count, NDV, and min/max per column for the planner's
cost model. This operator produces the same statistics as a *queryable
DataFrame* (one row per column) rather than catalog side-state.

100 TB design
-------------
- **One pass**: every statistic for every column is computed in a SINGLE
  aggregation over the table — never a per-column scan loop (k columns
  must not cost k scans of 100 TB).
- **NDV**: exact ``count(distinct col)`` by default (oracle-comparable;
  Catalyst plans multiple distinct aggregates with one Expand — still one
  scan, shuffle width ×k like any multi-distinct). At real scale pass
  ``approx=True`` for ``approx_count_distinct`` (HLL++, shuffles only
  sketch state — this is what ANALYZE itself does).
- min/max land in typed columns (``min_num``/``max_num`` doubles for
  numerics, ``min_str``/``max_str`` strings for the rest) so the output
  schema is fixed regardless of the profiled table's schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile_table(df: DataFrame, cols: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str) — one row per profiled column,
    all computed in one aggregation pass."""
    dtypes = dict(df.dtypes)
    cols = list(cols) if cols is not None else df.columns
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(
            f"columns not in table: {missing} (available: {sorted(dtypes)})"
        )
    ndv = F.approx_count_distinct if approx else F.countDistinct

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            ndv(c).alias(f"__ndv_{c}"),
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)

    def _stat(c: str) -> F.Column:
        t = dtypes[c]
        if _is_numeric(t):
            min_num = F.col(f"__min_{c}").cast("double")
            max_num = F.col(f"__max_{c}").cast("double")
            min_str = F.lit(None).cast("string")
            max_str = min_str
        else:
            min_num = F.lit(None).cast("double")
            max_num = min_num
            if t.startswith("timestamp"):
                min_str = F.date_format(f"__min_{c}", _TS_FMT)
                max_str = F.date_format(f"__max_{c}", _TS_FMT)
            else:
                min_str = F.col(f"__min_{c}").cast("string")
                max_str = F.col(f"__max_{c}").cast("string")
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__ndv_{c}").alias("n_distinct"),
            min_num.alias("min_num"),
            max_num.alias("max_num"),
            min_str.alias("min_str"),
            max_str.alias("max_str"),
        )

    return row.select(F.inline(F.array(*[_stat(c) for c in cols])))
