"""Batch relational inventory — SURVEY.md §2.2-§2.8 coverage.

Each query is the Spark-first expression of a reference operator family
(planner exec nodes under
flink-table/flink-table-planner-blink/.../plan/nodes/exec/{batch,common}/ and
runtime operators under flink-table/flink-table-runtime-blink/.../operators/).
Catalyst supplies the physical strategy: hash/sort-merge/broadcast joins
(BatchExecHashJoin.java / BatchExecSortMergeJoin.java equivalents), hash
aggregation (BatchExecHashAggregate.java), window frames
(BatchExecOverAggregate.java), external sort (BatchExecSort.java).

Scale notes live on each query: what shuffles, what broadcasts, what pushes
down — written for the 1000-executor / 100 TB case, verified on local[32].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.queries.numeric import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    davg,
    dec,
    disc_price,
    dsum,
    sql_davg,
    sql_dsum,
)
from reshape_on_flink_spark.session import load_tables

QUERIES = {}
ORACLES = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Scans + Calc (project/filter) + agg: TPC-H Q1 pricing summary.
# Reference: CommonExecCalc.java + BatchExecHashAggregate.java.
# Scale: filter + 6-column projection push into the parquet scan
# (PushedFilters/ReadSchema); partial aggregation map-side then one shuffle
# on (returnflag, linestatus) — 6 groups, so the reduce side is trivial at
# any SF. No skew risk (group count is tiny and uniform).
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')}                        AS sum_qty,
           {sql_dsum('l_extendedprice')}                   AS sum_base_price,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE)           AS sum_disc_price,
           CAST(SUM({SQL_CHARGE}) AS DOUBLE)               AS sum_charge,
           {sql_davg('l_quantity')}                        AS avg_qty,
           {sql_davg('l_extendedprice')}                   AS avg_price,
           {sql_davg('l_discount')}                        AS avg_disc,
           COUNT(*)                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
