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


# ---------------------------------------------------------------------------
# Joins — reference §2.3: BatchExecHashJoin / BatchExecSortMergeJoin /
# BatchExecNestedLoopJoin + all six FlinkJoinType members
# (operators/join/FlinkJoinType.java:23-28). Catalyst picks the physical
# strategy; we steer it where scale demands (broadcast small dims).
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate                           AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3. Scale: customer is the small side -> broadcast to avoid
    shuffling orders/lineitem; the lineitem<->orders join shuffles on
    orderkey (co-partitioned keys, AQE coalesces). Top-10 via
    TakeOrderedAndProject — no global sort materialization."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        t["lineitem"]
        .where(F.col("l_shipdate") > cutoff)
        .join(t["orders"].where(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").alias("orderdate"), "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-table join. Scale: region/nation/supplier are dims ->
    broadcast all three; only customer⋈orders and orders⋈lineitem shuffle,
    both on their natural keys."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_join_left_outer",
    """
    SELECT o_orderkey, COUNT(l_orderkey) AS n_big_items
    FROM orders
    LEFT JOIN lineitem ON o_orderkey = l_orderkey AND l_quantity >= 45
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with join-level predicate (null-extending): counts
    qty>=45 lineitems per order, keeping orders with none."""
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    return (
        o.join(li, (F.col("o_orderkey") == F.col("l_orderkey")) & (F.col("l_quantity") >= 45), "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_big_items"))
        .orderBy("o_orderkey")
    )


@query(
    "q_join_right_outer",
    """
    SELECT o_orderkey, COUNT(l_orderkey) AS n_cheap_items
    FROM lineitem
    RIGHT JOIN orders ON o_orderkey = l_orderkey AND l_extendedprice < 5000
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"],
            (F.col("o_orderkey") == F.col("l_orderkey")) & (F.col("l_extendedprice") < 5000),
            "right",
        )
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_cheap_items"))
        .orderBy("o_orderkey")
    )


@query(
    "q_join_full_outer",
    """
    WITH big_cust AS (
      SELECT c_custkey AS k, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 5000 GROUP BY c_custkey
    ), big_ord AS (
      SELECT o_custkey AS k, COUNT(*) AS n_ord FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
    )
    SELECT COALESCE(big_cust.k, big_ord.k) AS custkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_ord, 0) AS n_ord
    FROM big_cust FULL JOIN big_ord ON big_cust.k = big_ord.k
    ORDER BY custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated subqueries — both sides produce
    unmatched rows (reference FlinkJoinType.FULL)."""
    t = load_tables(spark, sf_dir)
    big_cust = (
        t["customer"].where(F.col("c_acctbal") > 5000).groupBy(F.col("c_custkey").alias("k")).agg(F.count("*").alias("n_cust"))
    )
    big_ord = (
        t["orders"].where(F.col("o_totalprice") > 200000).groupBy(F.col("o_custkey").alias("k")).agg(F.count("*").alias("n_ord"))
    )
    return (
        big_cust.join(big_ord, big_cust.k == big_ord.k, "full")
        .select(
            F.coalesce(big_cust.k, big_ord.k).alias("custkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_ord"), F.lit(0)).alias("n_ord"),
        )
        .orderBy("custkey")
    )


@query(
    "q_join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — reference FlinkJoinType.SEMI /
    StreamingSemiAntiJoinOperator.java."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].where(F.col("o_totalprice") > 300000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — reference FlinkJoinType.ANTI."""
    t = load_tables(spark, sf_dir)
    f_orders = t["orders"].where(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_join_cross",
    """
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join (reference BatchExecNestedLoopJoin) — broadcast NLJ in
    Spark; only ever used dim×dim, never fact×fact."""
    t = load_tables(spark, sf_dir)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "q_join_theta",
    """
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    WHERE c_acctbal > 9000
    ORDER BY s_suppkey, c_custkey
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part (nationkey) + non-equi residual (acctbal <) —
    Catalyst plans the equi key as the shuffle/broadcast key and applies
    the inequality as a post-join filter, so it scales like an equi-join."""
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(
            t["customer"].where(F.col("c_acctbal") > 9000),
            (F.col("s_nationkey") == F.col("c_nationkey")) & (F.col("s_acctbal") < F.col("c_acctbal")),
        )
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Aggregations — reference §2.4: BatchExecHashAggregate /
# BatchExecSortAggregate, DecomposeGroupingSetsRule.scala (grouping sets),
# SplitAggregateRule.scala (distinct split — see operators/skew.py for the
# streaming equivalent; batch COUNT(DISTINCT) is Catalyst's Expand-based
# rewrite and AQE handles the shuffle skew).
# ---------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg. Scale: all four predicates push to
    the parquet scan; single-stage partial+final agg, no wide shuffle."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_agg_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS n_supp,
           COUNT(DISTINCT l_partkey)  AS n_part,
           COUNT(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi COUNT(DISTINCT) — the reference splits this via
    SplitAggregateRule to break hot keys; Catalyst's Expand rewrite +
    partial aggregation is the batch equivalent, and AQE splits any
    skewed shuffle partition at runtime."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — reference decomposes via Expand
    (DecomposeGroupingSetsRule.scala:205); Spark's Expand node is the same
    design: one pass over the input, rows multiplied per set."""
    li = load_tables(spark, sf_dir)["lineitem"]
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "q_rollup",
    f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_extendedprice')} AS sum_price, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_extendedprice").alias("sum_price"), F.count("*").alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q_cube",
    f"""
    SELECT o_orderstatus, o_orderpriority, {sql_dsum('o_totalprice')} AS sum_price, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice").alias("sum_price"), F.count("*").alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "q_having",
    f"""
    SELECT l_suppkey, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 15000
    ORDER BY l_suppkey
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("_sq"))
        .where(F.col("_sq") > 15000)
        .select("l_suppkey", F.col("_sq").cast("double").alias("sum_qty"))
        .orderBy("l_suppkey")
    )


@query(
    "q_pivot",
    f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — the reference expresses this as filtered aggs; Spark has a
    first-class relational pivot (same Expand-free single pass)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .orderBy("l_returnflag")
    )


@query(
    "q_stats_moments",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            - (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)) / COUNT(*))
           / (COUNT(*) - 1) AS var_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance via exact decimal moments (sum, sum-of-squares) so
    both engines evaluate the identical IEEE expression — the engine's
    public API exposes native var_samp/stddev (fp, order-dependent), this
    inventory query is the determinism-safe formulation."""
    li = load_tables(spark, sf_dir)["lineitem"]
    q = dec("l_quantity")
    s1 = F.sum(q).cast("double")
    s2 = F.sum(q * q).cast("double")
    n = F.count("*")
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            ((s2 - (s1 * s1) / n) / (n - F.lit(1))).alias("var_qty"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_minmax_by",
    """
    SELECT o_custkey,
           MAX(o_totalprice) AS best_price,
           ARG_MAX(o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100000000 + o_orderkey)
             AS best_order
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a deterministic (price, orderkey) tie-break — reference
    FirstValue/LastValue agg family."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_totalprice").alias("best_price"),
            F.max_by(
                "o_orderkey",
                (dec("o_totalprice") * 100).cast("bigint") * F.lit(100000000) + F.col("o_orderkey"),
            ).alias("best_order"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# OVER windows — reference §2.5: BatchExecOverAggregate.java + the frame zoo
# under operators/over/frame/ (Range/Row × Sliding/UnboundedPreceding/...),
# ranking functions (operators/rank/RankType.java), LEAD/LAG/FIRST/LAST
# (aggfunctions/LeadLagAggFunction.java, FirstValueAggFunction.java).
# Scale: one shuffle on the partition key per window spec; specs sharing a
# (partitionBy, orderBy) reuse the same sort. Partition-key cardinality
# must exceed executor count — all queries below partition on keys with
# O(table) cardinality, never on constants.
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    """
    SELECT o_orderkey,
           o_custkey,
           RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    ORDER BY o_custkey, rn
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    by_price = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    by_price_uk = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.rank().over(by_price).alias("rnk"),
            F.dense_rank().over(by_price).alias("drnk"),
            F.row_number().over(by_price_uk).alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "q_window_running_sum",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS UNBOUNDED PRECEDING running sum (reference
    RowUnboundedPrecedingOverFrame). Deterministic: the window order
    carries l_partkey as a final tie-breaker because the synthetic
    fixture duplicates (l_orderkey, l_linenumber) pairs — at sf0.1 one
    (suppkey, shipdate, orderkey, linenumber) group is genuinely tied
    with different measures, which flips ROWS-frame contents between
    engines without it; decimal sum exact at every prefix."""
    li = load_tables(spark, sf_dir)["lineitem"]
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(dec("l_quantity")).over(w).cast("double").alias("running_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "q_window_sliding_rows",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS window_price,
           COUNT(*) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS window_n
    FROM lineitem
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def q_window_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (reference RowSlidingOverFrame)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(-3, 1)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(dec("l_extendedprice")).over(w).cast("double").alias("window_price"),
            F.count("*").over(w).alias("window_n"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "q_window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_similar
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric key (reference RangeSlidingOverFrame) —
    frame contents depend only on values, so ties are harmless."""
    o = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice").rangeBetween(-1000, W.currentRow)
    return (
        o.select("o_orderkey", "o_custkey", F.count("*").over(w).alias("n_similar"))
        .orderBy("o_orderkey")
    )


@query(
    "q_window_lead_lag",
    """
    SELECT o_custkey, o_orderkey,
           LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
           LAG(o_totalprice, 2, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev2_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q_window_first_last",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ord,
           LAST_VALUE(o_orderkey)  OVER w AS last_ord,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ord
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ord"),
            F.last("o_orderkey").over(w).alias("last_ord"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_ord"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q_window_ntile_cume",
    """
    SELECT o_orderkey,
           NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile,
           PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS pct_rank,
           CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS cume
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / CUME_DIST — doubles here are single
    divisions of exact integers, deterministic in both engines."""
    o = load_tables(spark, sf_dir)["orders"]
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k / dedup — reference §2.6: BatchExecSort/SortLimit,
# rank operators (AppendOnlyTopNFunction etc.), StreamExecDeduplicate.
# ---------------------------------------------------------------------------


@query(
    "q_order_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT -> TakeOrderedAndProject: per-partition top-25
    then a driver-side merge of 25·P rows; never a global sort. This is
    the plan shape that survives 100 TB."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select("o_orderkey", "o_totalprice").orderBy(F.desc("o_totalprice"), "o_orderkey").limit(25)


@query(
    "q_topk_per_group",
    """
    SELECT c_nationkey, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    ORDER BY c_nationkey, rn
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — the reference's rank operators
    (AppendOnlyTopNFunction.java:48). Spark 3.5+/4 plans rn<=k as a
    WindowGroupLimit: per-partition partial top-k before the shuffle, so
    the shuffle carries k·groups rows, not the table."""
    c = load_tables(spark, sf_dir)["customer"]
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


@query(
    "q_dedup_keep_first",
    """
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup (reference StreamExecDeduplicate, keep-first) —
    the batch formulation; the streaming engine maps this to
    dropDuplicates with watermark (streaming/dedup.py)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_id", "event_type", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


@query(
    "q_dedup_keep_last",
    """
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-last dedup (reference ProcTimeDeduplicateKeepLastRow)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "event_type", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Set operations — reference §2.7: CommonExecUnion + Calcite rewrites of
# INTERSECT/EXCEPT (no dedicated exec nodes; same in Spark where they
# become joins/aggregates). UNION ALL is a zero-shuffle concatenation.
# ---------------------------------------------------------------------------


@query(
    "q_union_all",
    """
    SELECT k, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k ORDER BY k
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    u = (
        t["customer"].where(F.col("c_acctbal") > 0).select(F.col("c_nationkey").alias("k"))
        .unionAll(t["supplier"].select(F.col("s_nationkey").alias("k")))
    )
    return u.groupBy("k").agg(F.count("*").alias("n")).orderBy("k")


@query(
    "q_union_distinct",
    """
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      UNION
      SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000
    ) ORDER BY k
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"].where(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("k"))
        .union(t["supplier"].where(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("k")))
        .distinct()
        .orderBy("k")
    )


@query(
    "q_intersect",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9500
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"].where(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("k"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


@query(
    "q_except",
    """
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9800
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 4000
    ORDER BY k
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"].where(F.col("c_acctbal") > 9800).select(F.col("c_nationkey").alias("k"))
        .subtract(t["supplier"].where(F.col("s_acctbal") > 4000).select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Subqueries — reference §4.1 subquery-rewrite + decorrelation programs
# (FlinkStreamProgram.scala:51-105). Catalyst's RewriteSubquery does the
# same de-correlation; these run through the engine's SQL surface.
# ---------------------------------------------------------------------------


@query(
    "q_in_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
    ORDER BY o_orderkey
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    EngineSessionLike = load_tables(spark, sf_dir)
    EngineSessionLike["orders"].createOrReplaceTempView("orders")
    EngineSessionLike["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
        ORDER BY o_orderkey
        """
    )


@query(
    "q_scalar_subquery",
    """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice >
          (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1.05 FROM part)
    ORDER BY p_partkey
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    p.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice
        FROM part
        WHERE p_retailprice >
              (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1.05 FROM part)
        ORDER BY p_partkey
        """
    )


@query(
    "q_correlated_subquery",
    """
    SELECT o_orderkey
    FROM orders o
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 2
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o_orderkey
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery -> decorrelated into an aggregate+join
    by Catalyst (reference: FlinkDecorrelateProgram)."""
    o = load_tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey
        FROM orders o
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 2
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# Correlate / UNNEST — reference §2.2 CommonExecCorrelate (lateral table
# function) and SqlUnnestUtils. Spark: explode/posexplode.
# ---------------------------------------------------------------------------


@query(
    "q_explode_tokens",
    """
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT token) AS n_distinct
    FROM (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    )
    WHERE token <> ''
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of a tokenized column (reference UDTF correlate).
    Scale: explode multiplies rows ~100×; the group-by shuffles only
    (lang, token) pairs after partial aggregation."""
    d = load_tables(spark, sf_dir)["documents"]
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("lang")
        .agg(F.count("*").alias("n_tokens"), F.countDistinct("token").alias("n_distinct"))
        .orderBy("lang")
    )


@query(
    "q_posexplode",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
    FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)
    ORDER BY doc_id, pos
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return (
        d.where(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# Scalar function surface — reference §2.8 FlinkSqlOperatorTable (243 ops)
# + BuiltInFunctionDefinitions; the full name->Spark mapping lives in
# functions/registry.py, these queries exercise representative families
# end-to-end against the oracle.
# ---------------------------------------------------------------------------


@query(
    "q_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name)                         AS up,
           LOWER(p_brand)                        AS lo,
           SUBSTRING(p_name, 1, 4)               AS sub4,
           LENGTH(p_name)                        AS len,
           CONCAT_WS('-', p_brand, p_type)       AS cw,
           LPAD(p_brand, 12, '*')                AS lp,
           RPAD(p_type, 10, '.')                 AS rp,
           REPLACE(p_name, ' ', '_')             AS repl,
           REVERSE(p_type)                       AS rev,
           TRIM(CONCAT('  ', p_brand, ' '))      AS tr,
           STRPOS(p_name, 'red')                 AS pos_red,
           SPLIT_PART(p_name, ' ', 1)            AS first_word,
           ASCII(p_type)                         AS first_ascii,
           REPEAT(p_brand, 2)                    AS rep2,
           LEFT(p_name, 3)                       AS l3,
           RIGHT(p_name, 3)                      AS r3
    FROM part
    ORDER BY p_partkey
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (reference SqlFunctionUtils.java: CONCAT_WS,
    LPAD/RPAD, REPEAT, REVERSE, SPLIT_INDEX->split_part, INSTR->strpos...)."""
    p = load_tables(spark, sf_dir)["part"]
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("up"),
            F.lower("p_brand").alias("lo"),
            F.substring("p_name", 1, 4).alias("sub4"),
            F.length("p_name").alias("len"),
            F.concat_ws("-", "p_brand", "p_type").alias("cw"),
            F.lpad("p_brand", 12, "*").alias("lp"),
            F.rpad("p_type", 10, ".").alias("rp"),
            F.replace("p_name", F.lit(" "), F.lit("_")).alias("repl"),
            F.reverse("p_type").alias("rev"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("tr"),
            F.instr("p_name", "red").alias("pos_red"),
            F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
            F.ascii("p_type").alias("first_ascii"),
            F.repeat("p_brand", 2).alias("rep2"),
            F.left("p_name", F.lit(3)).alias("l3"),
            F.right("p_name", F.lit(3)).alias("r3"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q_regex_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
           regexp_replace(p_name, '[aeiou]', '#', 'g')      AS novowels,
           CASE WHEN regexp_matches(p_name, '^(red|blue)') THEN 1 ELSE 0 END AS is_colored
    FROM part
    ORDER BY p_partkey
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    return (
        p.select(
            "p_partkey",
            F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
            F.regexp_replace("p_name", r"[aeiou]", "#").alias("novowels"),
            F.when(F.col("p_name").rlike(r"^(red|blue)"), F.lit(1)).otherwise(F.lit(0)).alias("is_colored"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q_math_funcs",
    """
    SELECT o_orderkey,
           ABS(o_totalprice - 100000)                    AS dist,
           CAST(CEIL(o_totalprice) AS BIGINT)            AS c,
           CAST(FLOOR(o_totalprice) AS BIGINT)           AS f,
           SQRT(o_totalprice)                            AS sq,
           o_totalprice * o_totalprice                   AS sqr,
           MOD(o_orderkey, 7)                            AS m7,
           CAST(SIGN(o_totalprice - 200000) AS DOUBLE)   AS sgn,
           GREATEST(o_totalprice, 150000.0)              AS g,
           LEAST(o_totalprice, 150000.0)                 AS l
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family — restricted to IEEE-exact ops (abs/sqrt/floor/ceil/
    mod); libm-dependent fns (ln, exp, pow) are in the engine registry but
    excluded from oracle queries since their low bits are
    implementation-defined."""
    o = load_tables(spark, sf_dir)["orders"]
    tp = F.col("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            F.abs(tp - 100000).alias("dist"),
            F.ceil(tp).cast("bigint").alias("c"),
            F.floor(tp).cast("bigint").alias("f"),
            F.sqrt(tp).alias("sq"),
            (tp * tp).alias("sqr"),
            (F.col("o_orderkey") % 7).alias("m7"),
            F.signum(tp - 200000).alias("sgn"),
            F.greatest(tp, F.lit(150000.0)).alias("g"),
            F.least(tp, F.lit(150000.0)).alias("l"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_datetime_funcs",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)    AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT)   AS mo,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INT)     AS d,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INT)        AS dow,
           CAST(EXTRACT(DOY FROM o_orderdate) AS INT)     AS doy,
           date_trunc('month', o_orderdate)               AS month_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family (reference SqlDateTimeUtils.java). Note the DOW
    convention bridge: Spark dayofweek is 1=Sunday, DuckDB 0=Sunday."""
    o = load_tables(spark, sf_dir)["orders"]
    d = F.col("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            F.year(d).alias("y"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("d"),
            F.quarter(d).alias("q"),
            F.dayofweek(d).alias("dow"),
            F.dayofyear(d).alias("doy"),
            F.date_trunc("month", d).alias("month_start"),
            (d + F.expr("INTERVAL 90 DAYS")).alias("due"),
            F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("bigint").alias("days_since"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_case_null_funcs",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                        AS bucket,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           CASE WHEN c_acctbal > 9990 THEN NULL ELSE c_acctbal END AS capped,
           IFNULL(CASE WHEN c_acctbal > 9990 THEN NULL ELSE c_acctbal END, -1.0) AS capped_filled
    FROM customer
    ORDER BY c_custkey
    """,
)
def q_case_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    bal = F.col("c_acctbal")
    capped = F.when(bal > 9990, F.lit(None).cast("double")).otherwise(bal)
    return (
        c.select(
            "c_custkey",
            F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("bucket"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
            capped.alias("capped"),
            F.coalesce(capped, F.lit(-1.0)).alias("capped_filled"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_hash_funcs",
    """
    SELECT p_partkey,
           md5(p_name)                    AS h_md5,
           sha256(p_name)                 AS h_sha256,
           CAST(octet_length(CAST(p_name AS BLOB)) AS INT) AS blob_len,
           to_base64(CAST(p_name AS BLOB)) AS b64,
           UPPER(hex(CAST(p_brand AS BLOB))) AS hx
    FROM part
    ORDER BY p_partkey
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encode family (reference MD5/SHA2/TO_BASE64/HEX in
    FlinkSqlOperatorTable) — also the shared primitive for the MinHash /
    SimHash dedup operators (llm/dedup.py)."""
    p = load_tables(spark, sf_dir)["part"]
    return (
        p.select(
            "p_partkey",
            F.md5("p_name").alias("h_md5"),
            F.sha2("p_name", 256).alias("h_sha256"),
            F.length(F.col("p_name").cast("binary")).alias("blob_len"),
            F.base64(F.col("p_name").cast("binary")).alias("b64"),
            F.upper(F.hex(F.col("p_brand").cast("binary"))).alias("hx"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Array / map / row constructors and accessors — reference Table-API
# definitions BuiltInFunctionDefinitions.java:1198-1260 (array/map/row,
# at, cardinality, element, flatten). All scalar outputs so the hash
# compare stays representation-independent.
# ---------------------------------------------------------------------------
@query(
    "q_array_map_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           len([l_quantity, l_discount, l_tax]) AS arr_len,
           ([l_quantity, l_discount, l_tax])[2] AS arr_at_2,
           map(['q', 'd'], [l_quantity, l_discount])['d'][1] AS map_at_d,
           len(flatten([[l_quantity], [l_discount, l_tax]])) AS flat_len,
           struct_pack(q := l_quantity, f := l_returnflag).f AS row_field
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    arr = F.array("l_quantity", "l_discount", "l_tax")
    m = F.create_map(F.lit("q"), F.col("l_quantity"), F.lit("d"), F.col("l_discount"))
    return (
        li.where(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.size(arr).alias("arr_len"),
            F.element_at(arr, 2).alias("arr_at_2"),
            F.element_at(m, "d").alias("map_at_d"),
            F.size(F.flatten(F.array(F.array("l_quantity"), F.array("l_discount", "l_tax")))).alias(
                "flat_len"
            ),
            F.struct(F.col("l_quantity").alias("q"), F.col("l_returnflag").alias("f"))
            .getField("f")
            .alias("row_field"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
