"""Extended relational inventory: deeper TPC-H analogs, aggregate
variants, and operator-library-backed entries (as-of / range / salted /
distinct-split run through operators/, verified against plain SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.queries.numeric import (
    SQL_DISC_PRICE,
    dec,
    disc_price,
    dsum,
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


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS -> left-semi join (FlinkJoinType.SEMI)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, yr, CAST(SUM(dp) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr, {SQL_DISC_PRICE} AS dp
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, yr
    ORDER BY supp_nation, cust_nation, yr
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@query(
    "q9_product_type_profit",
    f"""
    SELECT n_name, yr, CAST(SUM(amount) AS DOUBLE) AS profit
    FROM (
      SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
             {SQL_DISC_PRICE}
             - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))
               * CAST(0.05 AS DECIMAL(18,2)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY n_name, yr
    ORDER BY n_name, yr
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp fixture: cost = 5% of retailprice)."""
    t = load_tables(spark, sf_dir)
    amount = disc_price() - dec("p_retailprice") * dec("l_quantity") * F.lit("0.05").cast(
        "decimal(18,2)"
    )
    return (
        t["part"]
        .where(F.col("p_name").like("%red%"))
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("n_name", "yr")
    )


@query(
    "q14_promo_revenue",
    f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE} END) AS DOUBLE)
           / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_pct,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc_price())).cast("double")
    total = F.sum(disc_price()).cast("double")
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * promo / total).alias("promo_pct"), F.count("*").alias("n"))
    )


@query(
    "q18_large_orders",
    f"""
    SELECT c_custkey, o_orderkey, {sql_dsum('l_quantity')} AS total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_tq"))
        .where(F.col("_tq") > 120)
        .select("c_custkey", "o_orderkey", F.col("_tq").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


@query(
    "q19_disjunctive_filter",
    f"""
    SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs — Catalyst pushes the common p_partkey equi
    key and keeps the disjunction as a join residual."""
    t = load_tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.sum(disc_price()).cast("double").alias("revenue"), F.count("*").alias("n"))
    )


@query(
    "q22_idle_customers",
    """
    SELECT c_nationkey % 5 AS cc, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    GROUP BY c_nationkey % 5
    ORDER BY cc
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: wealthy customers with no large orders (scalar
    subquery + anti join)."""
    t = load_tables(spark, sf_dir)
    pos = t["customer"].where(F.col("c_acctbal") > 0)
    avg_bal = pos.agg((F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("a"))
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(
            t["orders"].where(F.col("o_totalprice") > 250000),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 5).alias("cc"))
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("cc")
    )


@query(
    "q_star_join_region_revenue",
    f"""
    SELECT r_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def q_star_join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-star join; exercises Catalyst join reordering (the
    reference's opt-in Lopt reorder program, built-in here via CBO/AQE)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("r_name")
    )


@query(
    "q_listagg",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (reference ListAggFunction) with deterministic ordering."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)       AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation identical across engines;
    the engine also exposes percentile_approx as the 100 TB path)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
            F.expr("percentile(l_extendedprice, 0.75)").alias("p75_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_filter_clause_agg",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25)               AS n_big,
           COUNT(*) FILTER (WHERE l_discount = 0)                AS n_nodisc,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_filter_clause_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_quantity > 25)               AS n_big,
               COUNT(*) FILTER (WHERE l_discount = 0)                AS n_nodisc,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "q_bit_bool_agg",
    """
    SELECT o_orderpriority,
           bit_and(o_orderkey % 256) AS band,
           bit_or(o_orderkey % 256)  AS bor,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_bit_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    k = F.col("o_orderkey") % 256
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bit_and(k).alias("band"),
            F.bit_or(k).alias("bor"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2
    """,
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus")


@query(
    "q_limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(40).limit(20)


@query(
    "q_values_literal",
    """
    SELECT v.tier, COUNT(*) AS n
    FROM customer
    JOIN (VALUES ('AUTOMOBILE', 'retail'), ('BUILDING', 'construction'),
                 ('MACHINERY', 'industrial')) AS v(seg, tier)
      ON c_mktsegment = v.seg
    GROUP BY v.tier
    ORDER BY v.tier
    """,
)
def q_values_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal VALUES relation (reference CommonExecValues)."""
    t = load_tables(spark, sf_dir)
    v = spark.createDataFrame(
        [("AUTOMOBILE", "retail"), ("BUILDING", "construction"), ("MACHINERY", "industrial")],
        ["seg", "tier"],
    )
    return (
        t["customer"]
        .join(F.broadcast(v), F.col("c_mktsegment") == F.col("seg"))
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
        .orderBy("tier")
    )


@query(
    "q_nullsafe_join",
    """
    SELECT COUNT(*) AS n
    FROM (SELECT NULLIF(c_nationkey % 10, 0) AS k FROM customer) a
    JOIN (SELECT NULLIF(s_nationkey % 10, 0) AS k FROM supplier) b
      ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>); NULL keys match each other —
    unlike plain equality."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.nullif(F.col("c_nationkey") % 10, F.lit(0)).alias("k"))
    b = t["supplier"].select(F.nullif(F.col("s_nationkey") % 10, F.lit(0)).alias("k2"))
    return a.join(b, F.col("k").eqNullSafe(F.col("k2"))).agg(F.count("*").alias("n"))


# --- operator-library entries, oracle-verified against plain SQL ---


@query(
    "q_distinct_split_agg",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_distinct_split_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SplitAggregateRule analog (operators/aggregates.py): bucketed
    two-level COUNT(DISTINCT) — same answer as the plain form, skew-proof
    plan (oracle is the plain form)."""
    from reshape_on_flink_spark.operators.aggregates import split_count_distinct

    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        split_count_distinct(li, ["l_returnflag"], "l_partkey", n_buckets=32)
        .orderBy("l_returnflag")
    )


@query(
    "q_asof_operator",
    """
    SELECT user_id, event_id AS purchase_id, last_view_id
    FROM (
      SELECT user_id, event_id, event_type,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_id
      FROM events
    )
    WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_id
    """,
)
def q_asof_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/joins.asof_join run as an inventory query (temporal join
    semantics, TemporalRowTimeJoinOperator parity)."""
    from reshape_on_flink_spark.operators.joins import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    # strict=False (equal-ts views visible) tracks the window oracle,
    # which orders by (ts, event_id) and includes same-ts earlier views;
    # fixture timestamps are ns-unique so ties never materialize
    out = asof_join(
        purchases,
        views.withColumnRenamed("event_id", "view_id"),
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["view_id"],
        strict=False,
    )
    return out.select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("asof_view_id").alias("last_view_id")
    ).orderBy("user_id", "purchase_id")


@query(
    "q_range_join_operator",
    """
    SELECT v.user_id, COUNT(*) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND epoch(c.ts) >= epoch(v.ts) + 1
     AND epoch(c.ts) <= epoch(v.ts) + 300
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
)
def q_range_join_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/joins.range_join_bucketed as an inventory query
    (IntervalJoin parity with bounded fan-in)."""
    from reshape_on_flink_spark.operators.joins import range_join_bucketed

    ev = load_tables(spark, sf_dir)["events"]
    v = ev.where(F.col("event_type") == "view").select("user_id", "ts")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = range_join_bucketed(
        v,
        c.withColumnRenamed("c_user", "user_id").withColumnRenamed("c_ts", "ts2"),
        key="user_id",
        left_time="ts",
        right_time="ts2",
        lower_seconds=1,
        upper_seconds=300,
    )
    return joined.groupBy("user_id").agg(F.count("*").alias("n_pairs")).orderBy("user_id")


@query(
    "q_changelog_normalize",
    """
    WITH ch AS (
      SELECT user_id, event_id, value,
             CASE event_type WHEN 'error' THEN '-D' WHEN 'signup' THEN '-U'
                             WHEN 'view' THEN '+I' ELSE '+U' END AS _change_type
      FROM events),
    f AS (SELECT * FROM ch WHERE _change_type <> '-U'),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM f)
    SELECT user_id, event_id, value
    FROM r WHERE rn = 1 AND _change_type <> '-D'
    ORDER BY user_id
    """,
)
def q_changelog_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChangelogNormalize (reference StreamExecChangelogNormalize.java:61)
    over a RowKind-tagged stream derived from events: latest change per
    key wins, deletes remove the key, -U rows are dropped."""
    from reshape_on_flink_spark.operators.changelog import changelog_normalize

    ev = load_tables(spark, sf_dir)["events"]
    tagged = ev.select(
        "user_id",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "-D")
        .when(F.col("event_type") == "signup", "-U")
        .when(F.col("event_type") == "view", "+I")
        .otherwise("+U")
        .alias("_change_type"),
    )
    return changelog_normalize(tagged, ["user_id"], "event_id").orderBy("user_id")


# ---------------------------------------------------------------------------
# ANALYZE-style one-pass table profile (operators/profile.py)
# ---------------------------------------------------------------------------
def _profile_oracle_block(col: str, kind: str) -> str:
    base = f"""SELECT '{col}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({col}) AS n_nulls, COUNT(DISTINCT {col}) AS n_distinct"""
    if kind == "num":
        mm = f"CAST(MIN({col}) AS DOUBLE) AS min_num, CAST(MAX({col}) AS DOUBLE) AS max_num,\n       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
    elif kind == "ts":
        mm = f"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,\n       strftime(MIN({col}), '%Y-%m-%d %H:%M:%S') AS min_str, strftime(MAX({col}), '%Y-%m-%d %H:%M:%S') AS max_str"
    else:
        mm = f"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,\n       MIN({col}) AS min_str, MAX({col}) AS max_str"
    return f"{base},\n       {mm}\n    FROM orders"


@query(
    "q_profile_table",
    "\n    UNION ALL\n    ".join(
        _profile_oracle_block(c, k)
        for c, k in [
            ("o_orderkey", "num"),
            ("o_custkey", "num"),
            ("o_orderstatus", "str"),
            ("o_totalprice", "num"),
            ("o_orderdate", "ts"),
            ("o_orderpriority", "str"),
        ]
    )
    + "\n    ORDER BY col_name",
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (operators/profile.py): row
    count, nulls, exact NDV, typed min/max for every orders column in a
    SINGLE aggregation pass (one scan regardless of column count; the
    planner-statistics surface of the reference's ANALYZE TABLE)."""
    from reshape_on_flink_spark.operators.profile import profile_table

    o = load_tables(spark, sf_dir)["orders"]
    return profile_table(o).orderBy("col_name")


# ---------------------------------------------------------------------------
# SCD2 dimension history from a change stream (operators/changelog.py)
# ---------------------------------------------------------------------------
@query(
    "q_scd2_intervals",
    """
    WITH v AS (SELECT user_id, event_id, event_type, value,
                      epoch_us(ts) AS valid_from
               FROM events)
    SELECT user_id, event_id, event_type, value, valid_from,
           LEAD(valid_from) OVER w AS valid_to,
           (LEAD(valid_from) OVER w IS NULL) AS is_current
    FROM v WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension build
    (operators/changelog.scd2_intervals): every per-user change becomes
    a version row with [valid_from, valid_to) micros and is_current —
    the materialized form of the temporal-join version history. One
    key shuffle + one LEAD window; event_id rides as the version-order
    tie-breaker (same-microsecond changes stay deterministic)."""
    from reshape_on_flink_spark.operators.changelog import scd2_intervals

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros("ts").alias("seq_us"),
    )
    return scd2_intervals(
        ev, ["user_id"], "seq_us", attrs=["event_type", "value"],
        tie_cols=["event_id"],
    ).orderBy("user_id", "valid_from", "event_id")


# ---------------------------------------------------------------------------
# Fluent Table API facade (api.table — the pyflink Table surface,
# flink-python/pyflink/table/table.py): one pipeline exercising
# join-on-predicate, filter, group_by().select() with the string DSL,
# order_by and fetch — held to the same hash gate as the SQL route.
# ---------------------------------------------------------------------------
@query(
    "q_table_api_pipeline",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    LIMIT 5
    """,
)
def q_table_api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reshape_on_flink_spark.api.table import Table

    t = load_tables(spark, sf_dir)
    orders, customer = Table(t["orders"]), Table(t["customer"])
    return (
        orders.join(customer, "o_custkey = c_custkey")
        .filter("c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'")
        .group_by("o_orderpriority")
        .select(
            "o_orderpriority",
            "count(*) as n_orders",
            dsum("o_totalprice").alias("revenue"),
            F.countDistinct("c_nationkey").cast("bigint").alias("n_nations"),
        )
        .order_by("o_orderpriority")
        .fetch(5)
        .df
    )


# ---------------------------------------------------------------------------
# SIMILAR TO through the SQL dialect (SQL:2016 regex-with-LIKE-wildcards;
# Spark has no SIMILAR TO — the facade compiles it to anchored RLIKE,
# api/table_env._rewrite_similar_to). DuckDB's own SIMILAR TO deviates
# from the standard (no %/_ wildcards), so the oracle spells the
# equivalent anchored regexes with regexp_full_match — the conversion
# itself is what the hash gate checks.
# ---------------------------------------------------------------------------
@query(
    "q_similar_to",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN regexp_full_match(o_orderstatus, '(O|F)')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
    FROM orders
    WHERE regexp_full_match(o_orderpriority, '[12]-.*')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_similar_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reshape_on_flink_spark.api.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.create_temporary_view("orders", load_tables(spark, sf_dir)["orders"])
    return tenv.execute_sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN o_orderstatus SIMILAR TO '(O|F)' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_matched
        FROM orders
        WHERE o_orderpriority SIMILAR TO '[12]-%'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# SQL:2016 JSON constructors through the dialect (JSON_OBJECT /
# JSON_ARRAY / IS JSON -> to_json/try_parse_json rewrites,
# api/table_env._rewrite_json_constructors). DuckDB builds the same
# compact JSON strings natively — byte-identical, so the rewrite is
# value-hash-gated.
# ---------------------------------------------------------------------------
@query(
    "q_json_construct",
    """
    SELECT o_orderkey,
           json_object('priority', o_orderpriority,
                       'status', o_orderstatus,
                       'total_cents', CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                      )::VARCHAR AS payload,
           to_json([o_custkey, o_orderkey])::VARCHAR AS keys_arr,
           TRUE AS is_valid
    FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
    """,
)
def q_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reshape_on_flink_spark.api.table_env import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.create_temporary_view("orders", load_tables(spark, sf_dir)["orders"])
    return tenv.execute_sql(
        """
        SELECT o_orderkey,
               JSON_OBJECT('priority' VALUE o_orderpriority,
                           'status' VALUE o_orderstatus,
                           'total_cents' VALUE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS payload,
               JSON_ARRAY(o_custkey, o_orderkey) AS keys_arr,
               JSON_OBJECT('priority' VALUE o_orderpriority) IS JSON AS is_valid
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
        """
    )
