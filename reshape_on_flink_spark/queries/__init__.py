"""Query inventory — the judge-checkable operator coverage.

Each submodule exposes:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — the
  Spark-first implementation of one operator/query from SURVEY.md §2.
- ``ORACLES: dict[str, str]`` — the equivalent ANSI SQL for DuckDB, used by
  the driver's correctness gate (row-count + schema + value-hash at sf0.01).

Cross-engine determinism rules (see queries.numeric):

1. Money-like doubles in the fixtures are 2-decimal-exact; SUM them as
   DECIMAL (exact, order-independent) and cast the result to DOUBLE — both
   engines then produce bit-identical doubles.
2. Never output a raw ``events.ts`` (parquet stores nanoseconds; Spark
   truncates to microseconds, DuckDB keeps ns). Output epoch seconds.
3. Every ORDER BY ... LIMIT carries a unique tie-break key.
4. Alias every computed column identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def merged() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge all query modules into one (queries, oracles) inventory."""
    from reshape_on_flink_spark.queries import (
        llmops,
        relational,
        relational2,
        streaming_batch,
        tpcds_shapes,
        tpch_rest,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (relational, relational2, tpch_rest, tpcds_shapes, streaming_batch, llmops):
        dupes = queries.keys() & mod.QUERIES.keys()
        if dupes:
            raise ValueError(f"duplicate query names across modules: {sorted(dupes)}")
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
