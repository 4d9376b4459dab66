"""TPC-DS-distinctive planner shapes, adapted to the driver fixtures.

The reference ships a 103-query TPC-DS correctness harness
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/, runner
TpcdsTestProgram.java:48-80, tolerant comparator TpcdsResultComparator.java).
Its *operator* content is already covered by our TPC-H-style inventory;
what TPC-DS adds are planner shapes TPC-H lacks. This module implements
one representative of each such shape on the fixture tables:

- multi-channel UNION ALL + ROLLUP with GROUPING() tags  (q5/q77 family)
- scalar subqueries inside CASE on a one-row driver      (q9)
- year-over-year self-join on an aggregated CTE          (q2/q75)
- cross-channel INTERSECT of customer sets               (q38/q87)
- ROLLUP + rank-within-grouping-level                    (q67)
- one CTE referenced 3x (rows + totals + scalar cutoff)  (q14/q23)
- same star aggregate instantiated per year, self-joined (q64)
- fact-to-fact chain with shifted-date condition         (q72)
- window-LAG growth compared across channels             (q31)
- exact-moment variance flag + consecutive-period join   (q39)
- MIN-date cohort join-back with COUNT(DISTINCT) grid    (q54 family)
- dual-ranking top-k union on return ratios              (q49)
- FULL OUTER JOIN channel-overlap census                 (q97)
- two shared CTEs filtering a two-channel UNION ALL      (q23 full form)
- correlated EXISTS AND (EXISTS OR EXISTS) census        (q10)
- self-EXISTS + NOT-EXISTS gated COUNT(DISTINCT)         (q16)
- ranked-subquery dimension gate + rollup + level rank   (q70)

Numeric discipline per queries.numeric (exact decimal sums, single IEEE
division). Scale notes (100 TB / 1000 executors) in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.queries.numeric import dec, disc_price, dsum, SQL_DISC_PRICE, sql_dsum
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
# TPC-DS q5/q77 family: per-channel sales/returns built as UNION ALL of
# tagged branches, rolled up across channels with a GROUPING() marker.
# Scale: each branch is a scan+projection (no shuffle); the union is
# partition-concatenation (free); the rollup is one hash-agg shuffle on
# the low-cardinality channel key — Expand doubles rows pre-shuffle but
# partial aggregation collapses them map-side.
# ---------------------------------------------------------------------------
@query(
    "q_ds_channel_rollup",
    f"""
    WITH channels AS (
      SELECT 'sold' AS channel, {SQL_DISC_PRICE} AS amount, l_quantity AS qty
      FROM lineitem WHERE l_returnflag <> 'R'
      UNION ALL
      SELECT 'returned' AS channel, {SQL_DISC_PRICE} AS amount, l_quantity AS qty
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT COALESCE(channel, 'ALL') AS channel,
           CAST(GROUPING(channel) AS INTEGER) AS is_total,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS amount_sum,
           {sql_dsum('qty')} AS qty_sum,
           COUNT(*) AS n
    FROM channels
    GROUP BY ROLLUP(channel)
    ORDER BY is_total, channel
    """,
)
def q_ds_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    sold = li.where(F.col("l_returnflag") != "R").select(
        F.lit("sold").alias("channel"), disc_price().alias("amount"), F.col("l_quantity").alias("qty")
    )
    ret = li.where(F.col("l_returnflag") == "R").select(
        F.lit("returned").alias("channel"), disc_price().alias("amount"), F.col("l_quantity").alias("qty")
    )
    return (
        sold.unionAll(ret)
        .rollup("channel")
        .agg(
            F.grouping("channel").cast("int").alias("is_total"),
            F.sum(F.col("amount").cast("decimal(18,4)")).cast("double").alias("amount_sum"),
            dsum("qty").alias("qty_sum"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("channel", F.lit("ALL")).alias("channel"),
            "is_total",
            "amount_sum",
            "qty_sum",
            "n",
        )
        .orderBy("is_total", "channel")
    )


# ---------------------------------------------------------------------------
# TPC-DS q9: a one-row SELECT whose projections are CASE WHEN (scalar
# subquery) THEN (scalar subquery) ELSE (scalar subquery) END per bucket.
# Spark plans each scalar subquery as an independent aggregate whose
# single-row result is broadcast into the driver row — we express that
# directly: per-bucket conditional aggregates in ONE pass over lineitem
# (better than TPC-DS's 15 separate subquery scans), cross-joined onto a
# one-row frame. Scale: single scan, map-side partial agg to 1 row.
# ---------------------------------------------------------------------------
@query(
    "q_ds_bucket_case",
    """
    WITH b AS (
      SELECT
        COUNT(CASE WHEN l_quantity BETWEEN 1 AND 20 THEN 1 END) AS c1,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 20
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 20
                 THEN CAST(l_discount AS DECIMAL(18,2)) END) AS DOUBLE) AS d1,
        COUNT(CASE WHEN l_quantity BETWEEN 21 AND 35 THEN 1 END) AS c2,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 35
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s2,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 35
                 THEN CAST(l_discount AS DECIMAL(18,2)) END) AS DOUBLE) AS d2,
        COUNT(CASE WHEN l_quantity > 35 THEN 1 END) AS c3,
        CAST(SUM(CASE WHEN l_quantity > 35
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s3,
        CAST(SUM(CASE WHEN l_quantity > 35
                 THEN CAST(l_discount AS DECIMAL(18,2)) END) AS DOUBLE) AS d3
      FROM lineitem
    )
    SELECT
      CASE WHEN c1 > 5000 THEN s1 / c1 ELSE d1 / c1 END AS bucket1,
      CASE WHEN c2 > 5000 THEN s2 / c2 ELSE d2 / c2 END AS bucket2,
      CASE WHEN c3 > 5000 THEN s3 / c3 ELSE d3 / c3 END AS bucket3
    FROM b
    """,
)
def q_ds_bucket_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]

    def bucket(i: int, cond):
        return [
            F.count(F.when(cond, 1)).alias(f"c{i}"),
            F.sum(F.when(cond, F.col("l_extendedprice").cast("decimal(18,2)")))
            .cast("double")
            .alias(f"s{i}"),
            F.sum(F.when(cond, F.col("l_discount").cast("decimal(18,2)")))
            .cast("double")
            .alias(f"d{i}"),
        ]

    q = F.col("l_quantity")
    b = li.agg(
        *bucket(1, q.between(1, 20)),
        *bucket(2, q.between(21, 35)),
        *bucket(3, q > 35),
    )
    return b.select(
        *[
            F.when(F.col(f"c{i}") > 5000, F.col(f"s{i}") / F.col(f"c{i}"))
            .otherwise(F.col(f"d{i}") / F.col(f"c{i}"))
            .alias(f"bucket{i}")
            for i in (1, 2, 3)
        ]
    )


# ---------------------------------------------------------------------------
# TPC-DS q2/q75 shape: aggregate a measure per period, then self-join
# period with period+1 and emit the ratio. Scale: the yearly agg reduces
# to ~tens of rows; the self-join is a broadcast of an already-tiny
# aggregate — no full-table shuffle beyond the first groupBy (which
# partial-aggregates map-side to one row per year per task).
# ---------------------------------------------------------------------------
@query(
    "q_ds_yoy_ratio",
    """
    WITH yearly AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1
    )
    SELECT cur.yr AS yr, prev.total AS prev_total, cur.total AS cur_total,
           cur.total / prev.total AS yoy_ratio
    FROM yearly cur JOIN yearly prev ON cur.yr = prev.yr + 1
    ORDER BY yr
    """,
)
def q_ds_yoy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    yearly = o.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        dsum("o_totalprice").alias("total")
    )
    cur, prev = yearly.alias("cur"), yearly.alias("prev")
    return (
        cur.join(F.broadcast(prev), F.col("cur.yr") == F.col("prev.yr") + 1)
        .select(
            F.col("cur.yr").alias("yr"),
            F.col("prev.total").alias("prev_total"),
            F.col("cur.total").alias("cur_total"),
            (F.col("cur.total") / F.col("prev.total")).alias("yoy_ratio"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# TPC-DS q38/q87 shape: COUNT of the INTERSECT of distinct customer sets
# from several channels. Spark rewrites INTERSECT to a left-semi join
# chain over hash-distinct inputs; all three legs shuffle on the same key
# so the joins co-locate (one exchange each, reused). Scale: distinct
# custkey sets are ~|customer| not |orders| — the semi joins operate on
# deduplicated keys, and AQE can pick broadcast legs if a channel is small.
# ---------------------------------------------------------------------------
@query(
    "q_ds_channel_intersect",
    """
    SELECT COUNT(*) AS n_common FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) t
    """,
)
def q_ds_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    high = o.where(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()
    finished = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return urgent.intersect(high).intersect(finished).agg(F.count("*").alias("n_common"))


# ---------------------------------------------------------------------------
# TPC-DS q67 shape: ROLLUP over product dims, then rank WITHIN each
# grouping level by the aggregated measure and keep the top-k. Scale:
# Expand multiplies rows by the number of grouping sets (3 here) before
# the shuffle, but map-side partial agg collapses to |brand × type| rows;
# the window re-shuffles only the aggregated rows on grouping_id.
# ---------------------------------------------------------------------------
@query(
    "q_ds_rollup_rank",
    f"""
    WITH agg AS (
      SELECT COALESCE(p_brand, 'ALL') AS brand, COALESCE(p_type, 'ALL') AS ptype,
             CAST(GROUPING(p_brand) * 2 + GROUPING(p_type) AS INTEGER) AS lvl,
             {sql_dsum('l_quantity')} AS qty_sum
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP(p_brand, p_type)
    )
    SELECT brand, ptype, lvl, qty_sum, rnk FROM (
      SELECT *, RANK() OVER (PARTITION BY lvl ORDER BY qty_sum DESC, brand, ptype) AS rnk
      FROM agg
    ) r WHERE rnk <= 5
    ORDER BY lvl, rnk, brand, ptype
    """,
)
def q_ds_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    joined = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    agg = (
        joined.rollup("p_brand", "p_type")
        .agg(
            (F.grouping("p_brand").cast("int") * 2 + F.grouping("p_type").cast("int")).alias(
                "lvl"
            ),
            dsum("l_quantity").alias("qty_sum"),
        )
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce("p_type", F.lit("ALL")).alias("ptype"),
            "lvl",
            "qty_sum",
        )
    )
    w = W.partitionBy("lvl").orderBy(F.desc("qty_sum"), "brand", "ptype")
    return (
        agg.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 5)
        .select("brand", "ptype", "lvl", "qty_sum", "rnk")
        .orderBy("lvl", "rnk", "brand", "ptype")
    )


# ---------------------------------------------------------------------------
# TPC-DS q47 shape: aggregate to a coarse grain (priority × month), then
# window over the aggregate — centered moving average via lag/lead — and
# keep the rows deviating most from their neighborhood. Scale: the window
# runs over the already-aggregated rows (|priorities| × |months|), so the
# second shuffle is tiny regardless of fact-table size; deviation ranking
# is a TakeOrderedAndProject over that small set.
# ---------------------------------------------------------------------------
@query(
    "q_ds_moving_avg_deviation",
    """
    WITH monthly AS (
      SELECT o_orderpriority AS prio,
             CAST(EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate)
                  AS INTEGER) AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2
    ),
    with_mavg AS (
      SELECT prio, ym, total,
             lag(total) OVER w AS prev_t,
             lead(total) OVER w AS next_t
      FROM monthly WINDOW w AS (PARTITION BY prio ORDER BY ym)
    )
    SELECT prio, ym, total,
           (prev_t + total + next_t) / 3 AS mavg,
           ABS(total - (prev_t + total + next_t) / 3) AS deviation
    FROM with_mavg
    WHERE prev_t IS NOT NULL AND next_t IS NOT NULL
    ORDER BY deviation DESC, prio, ym
    LIMIT 10
    """,
)
def q_ds_moving_avg_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("ym"),
    ).agg(dsum("o_totalprice").alias("total"))
    w = W.partitionBy("prio").orderBy("ym")
    with_mavg = monthly.select(
        "prio",
        "ym",
        "total",
        F.lag("total").over(w).alias("prev_t"),
        F.lead("total").over(w).alias("next_t"),
    ).where(F.col("prev_t").isNotNull() & F.col("next_t").isNotNull())
    mavg = (F.col("prev_t") + F.col("total") + F.col("next_t")) / 3
    return (
        with_mavg.select(
            "prio",
            "ym",
            "total",
            mavg.alias("mavg"),
            F.abs(F.col("total") - mavg).alias("deviation"),
        )
        .orderBy(F.desc("deviation"), "prio", "ym")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-DS q51 shape: two channels aggregated to daily grain, FULL OUTER
# joined on the grain, cumulative sums compared via windows. Scale: daily
# grains are tiny post-aggregation; the full-outer join and windows run
# over |days| rows. Cumulative sums are exact decimals, so the crossing
# predicate is deterministic.
# ---------------------------------------------------------------------------
@query(
    "q_ds_cumulative_cross",
    """
    WITH a AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 10000
                  + EXTRACT(MONTH FROM o_orderdate) * 100
                  + EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS amt
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    ),
    b AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 10000
                  + EXTRACT(MONTH FROM o_orderdate) * 100
                  + EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS amt
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    ),
    joined AS (
      SELECT COALESCE(a.d, b.d) AS d, a.amt AS a_amt, b.amt AS b_amt
      FROM a FULL OUTER JOIN b ON a.d = b.d
    ),
    cum AS (
      SELECT d,
             CAST(SUM(COALESCE(a_amt, 0)) OVER (ORDER BY d) AS DOUBLE) AS a_cum,
             CAST(SUM(COALESCE(b_amt, 0)) OVER (ORDER BY d) AS DOUBLE) AS b_cum
      FROM joined
    )
    SELECT d, a_cum, b_cum FROM cum WHERE a_cum > b_cum ORDER BY d LIMIT 50
    """,
)
def q_ds_cumulative_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    day = (
        F.year("o_orderdate") * 10000 + F.month("o_orderdate") * 100 + F.dayofmonth("o_orderdate")
    ).cast("int")

    def daily(cond) -> DataFrame:
        return (
            o.where(cond)
            .groupBy(day.alias("d"))
            .agg(F.sum(dec("o_totalprice")).alias("amt"))
        )

    a = daily(F.col("o_orderpriority") == "1-URGENT").withColumnRenamed("amt", "a_amt")
    b = daily(F.col("o_orderstatus") == "F").withColumnRenamed("amt", "b_amt")
    joined = (
        a.withColumnRenamed("d", "ad")
        .join(b.withColumnRenamed("d", "bd"), F.col("ad") == F.col("bd"), "full_outer")
        .select(F.coalesce("ad", "bd").alias("d"), "a_amt", "b_amt")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    w = W.orderBy("d")
    cum = joined.select(
        "d",
        F.sum(F.coalesce("a_amt", zero)).over(w).cast("double").alias("a_cum"),
        F.sum(F.coalesce("b_amt", zero)).over(w).cast("double").alias("b_cum"),
    )
    return cum.where(F.col("a_cum") > F.col("b_cum")).orderBy("d").limit(50)


# ---------------------------------------------------------------------------
# TPC-DS q66 shape: wide month-pivot — one row per group with 12 monthly
# amount columns. Spark's PIVOT (RelationalGroupedDataset.pivot with
# explicit values = no extra distinct-scan) compiles to a single
# hash-aggregate with 12 conditional sums: one shuffle on the group key,
# map-side partials, no row explosion. The oracle spells the same thing
# as SUM(CASE WHEN month = m ...) columns.
# ---------------------------------------------------------------------------
_MONTH_COLS_SQL = ",\n".join(
    f"""CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = {m}
         THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
         AS DOUBLE) AS m{m:02d}"""
    for m in range(1, 13)
)


@query(
    "q_ds_pivot_monthly",
    f"""
    SELECT o_orderpriority AS prio,
    {_MONTH_COLS_SQL}
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY prio
    """,
)
def q_ds_pivot_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    zero = F.lit(0).cast("decimal(18,2)")
    pivoted = (
        o.select(
            F.col("o_orderpriority").alias("prio"),
            F.month("o_orderdate").alias("m"),
            dec("o_totalprice").alias("amt"),
        )
        .groupBy("prio")
        .pivot("m", list(range(1, 13)))
        .agg(F.coalesce(F.sum("amt"), zero))
    )
    # a (prio, month) cell with no rows is null in PIVOT but 0 in the
    # oracle's SUM(CASE ... ELSE 0) spelling — align them
    return pivoted.select(
        "prio",
        *[
            F.coalesce(F.col(str(m)).cast("double"), F.lit(0.0)).alias(f"m{m:02d}")
            for m in range(1, 13)
        ],
    ).orderBy("prio")


# ---------------------------------------------------------------------------
# UNPIVOT (reverse of q66): wide monthly columns melted back to
# (group, month, amount) rows via df.unpivot — compiles to Expand (×12
# rows map-side, no shuffle); the oracle is the UNION ALL spelling.
# ---------------------------------------------------------------------------
@query(
    "q_ds_unpivot_monthly",
    f"""
    WITH wide AS (
      SELECT o_orderpriority AS prio,
      {_MONTH_COLS_SQL}
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT prio, month, amount FROM (
      {" UNION ALL ".join(
        f"SELECT prio, '{f'm{m:02d}'}' AS month, m{m:02d} AS amount FROM wide"
        for m in range(1, 13)
      )}
    ) t
    WHERE amount > 0
    ORDER BY prio, month
    """,
)
def q_ds_unpivot_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_ds_pivot_monthly(spark, sf_dir)
    return (
        wide.unpivot(
            "prio",
            [f"m{m:02d}" for m in range(1, 13)],
            "month",
            "amount",
        )
        .where(F.col("amount") > 0)
        .orderBy("prio", "month")
    )


# ---------------------------------------------------------------------------
# TPC-DS q34/q73: frequent-buyer shape — aggregate orders per customer,
# filter on the AGGREGATE (HAVING COUNT BETWEEN), then join back to the
# dimension for attributes. Scale: the agg shuffles on o_custkey once;
# the surviving key set is tiny (HAVING is highly selective), so AQE
# broadcasts it into the customer join — no second large shuffle.
# ---------------------------------------------------------------------------
@query(
    "q_ds_having_count_join_back",
    """
    WITH freq AS (
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey HAVING COUNT(*) BETWEEN 15 AND 20
    )
    SELECT c_custkey, c_name, n_orders
    FROM freq JOIN customer ON c_custkey = o_custkey
    ORDER BY n_orders DESC, c_custkey
    """,
)
def q_ds_having_count_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    freq = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders").between(15, 20))
    )
    return (
        freq.join(t["customer"], freq["o_custkey"] == F.col("c_custkey"))
        .select("c_custkey", "c_name", "n_orders")
        .orderBy(F.desc("n_orders"), "c_custkey")
    )


# ---------------------------------------------------------------------------
# TPC-DS q88: a grid of independent scalar COUNT subqueries cross-joined
# into one row (the planner must run N separate aggregate subtrees and
# combine single-row results). Kept as literal separate subtrees — the
# shape under test; q_ds_bucket_case already demonstrates the fused
# one-pass alternative. Scale: N scans in parallel, each reduced
# map-side to one row; the cross joins are single-row broadcasts.
# ---------------------------------------------------------------------------
@query(
    "q_ds_scalar_count_grid",
    """
    SELECT u.h_urgent, h.h_high, m.h_medium, n.h_notspec, l.h_low
    FROM (SELECT COUNT(*) AS h_urgent FROM orders WHERE o_orderpriority = '1-URGENT') u
    CROSS JOIN (SELECT COUNT(*) AS h_high FROM orders WHERE o_orderpriority = '2-HIGH') h
    CROSS JOIN (SELECT COUNT(*) AS h_medium FROM orders WHERE o_orderpriority = '3-MEDIUM') m
    CROSS JOIN (SELECT COUNT(*) AS h_notspec FROM orders WHERE o_orderpriority = '4-NOT SPECIFIED') n
    CROSS JOIN (SELECT COUNT(*) AS h_low FROM orders WHERE o_orderpriority = '5-LOW') l
    """,
)
def q_ds_scalar_count_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]

    def bucket(prio: str, alias: str) -> DataFrame:
        return o.where(F.col("o_orderpriority") == prio).agg(F.count("*").alias(alias))

    out = bucket("1-URGENT", "h_urgent")
    for prio, alias in [
        ("2-HIGH", "h_high"), ("3-MEDIUM", "h_medium"),
        ("4-NOT SPECIFIED", "h_notspec"), ("5-LOW", "h_low"),
    ]:
        out = out.crossJoin(bucket(prio, alias))
    return out


# ---------------------------------------------------------------------------
# TPC-DS q93: returns-adjusted net sales — total per order LEFT JOINed
# to the returned subset, netted with COALESCE, re-aggregated upward.
# Scale: both aggs shuffle on l_orderkey (same key -> AQE reuses the
# partitioning for the join); the orders join shuffles on o_orderkey.
# ---------------------------------------------------------------------------
@query(
    "q_ds_returns_net",
    f"""
    WITH tot AS (
      SELECT l_orderkey, {sql_dsum('l_quantity')} AS tot_qty
      FROM lineitem GROUP BY l_orderkey
    ),
    ret AS (
      SELECT l_orderkey, {sql_dsum('l_quantity')} AS ret_qty
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    ),
    net AS (
      SELECT t.l_orderkey, t.tot_qty - COALESCE(r.ret_qty, 0) AS net_qty
      FROM tot t LEFT JOIN ret r ON t.l_orderkey = r.l_orderkey
    )
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(net_qty AS DECIMAL(18,2))) AS DOUBLE) AS net_qty_sum
    FROM net JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def q_ds_returns_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    tot = li.groupBy("l_orderkey").agg(dsum("l_quantity").alias("tot_qty"))
    ret = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("ret_qty"))
    )
    net = tot.join(ret.withColumnRenamed("l_orderkey", "r_orderkey"),
                   tot["l_orderkey"] == F.col("r_orderkey"), "left").select(
        "l_orderkey",
        (F.col("tot_qty") - F.coalesce(F.col("ret_qty"), F.lit(0.0))).alias("net_qty"),
    )
    return (
        net.join(t["orders"], net["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("net_qty").cast("decimal(18,2)")).cast("double").alias("net_qty_sum"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# TPC-DS q99: lag-bucket matrix — day difference between order date and
# ship date bucketed into a CASE matrix of conditional counts per group.
# Scale: one fact-fact join (orderkey) then a single hash agg on the
# low-cardinality l_linestatus; the CASE buckets are map-side.
# ---------------------------------------------------------------------------
@query(
    "q_ds_ship_lag_matrix",
    """
    WITH lagged AS (
      SELECT l_linestatus,
             date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT l_linestatus,
           COUNT(CASE WHEN lag_days <= 30 THEN 1 END) AS d30,
           COUNT(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 END) AS d60,
           COUNT(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1 END) AS d90,
           COUNT(CASE WHEN lag_days > 90 THEN 1 END) AS d_over,
           COUNT(*) AS n
    FROM lagged GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q_ds_ship_lag_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lagged = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_linestatus",
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("lag_days"),
        )
    )

    def bucket(cond, alias):
        return F.count(F.when(cond, 1)).alias(alias)

    d = F.col("lag_days")
    return (
        lagged.groupBy("l_linestatus")
        .agg(
            bucket(d <= 30, "d30"),
            bucket((d > 30) & (d <= 60), "d60"),
            bucket((d > 60) & (d <= 90), "d90"),
            bucket(d > 90, "d_over"),
            F.count("*").alias("n"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# TPC-DS q58 shape (cross-channel tolerance compare): the same per-item
# aggregate computed in three channels, compared per item with every
# channel required inside a tolerance band of the three-channel average
# (tpcds-tool/query/query58.sql). The oracle spells it the original way
# (three subqueries self-joined on the item key); the Spark plan is the
# Spark-first rewrite — ONE conditional aggregation over (partkey)
# producing all three channel sums, so the fact is scanned and shuffled
# exactly once and the three-way join disappears entirely. Same rows:
# requiring all three sums non-null ≡ the inner three-way join.
# ---------------------------------------------------------------------------
@query(
    "q_ds_channel_tolerance",
    f"""
    WITH per AS (
      SELECT l_partkey, l_returnflag,
             CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS rev
      FROM lineitem GROUP BY 1, 2
    )
    SELECT a.l_partkey AS partkey,
           a.rev AS rev_a, n.rev AS rev_n, r.rev AS rev_r
    FROM per a
    JOIN per n ON n.l_partkey = a.l_partkey AND n.l_returnflag = 'N'
    JOIN per r ON r.l_partkey = a.l_partkey AND r.l_returnflag = 'R'
    WHERE a.l_returnflag = 'A'
      AND a.rev BETWEEN 0.9 * (a.rev + n.rev + r.rev) / 3
                    AND 1.1 * (a.rev + n.rev + r.rev) / 3
      AND n.rev BETWEEN 0.9 * (a.rev + n.rev + r.rev) / 3
                    AND 1.1 * (a.rev + n.rev + r.rev) / 3
      AND r.rev BETWEEN 0.9 * (a.rev + n.rev + r.rev) / 3
                    AND 1.1 * (a.rev + n.rev + r.rev) / 3
    ORDER BY partkey
    """,
)
def q_ds_channel_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]

    def chan(flag: str):
        # per-channel exact sum; NULL when the part has no rows in the
        # channel (≡ the original's inner join dropping that part)
        return F.sum(F.when(F.col("l_returnflag") == flag, disc_price())).cast("double")

    per = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        chan("A").alias("rev_a"), chan("N").alias("rev_n"), chan("R").alias("rev_r")
    )
    avg3 = (F.col("rev_a") + F.col("rev_n") + F.col("rev_r")) / 3
    return (
        per.where(
            F.col("rev_a").isNotNull()
            & F.col("rev_n").isNotNull()
            & F.col("rev_r").isNotNull()
            & F.col("rev_a").between(0.9 * avg3, 1.1 * avg3)
            & F.col("rev_n").between(0.9 * avg3, 1.1 * avg3)
            & F.col("rev_r").between(0.9 * avg3, 1.1 * avg3)
        )
        .select("partkey", "rev_a", "rev_n", "rev_r")
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# TPC-DS q11/q74 shape (per-customer YoY ratio filter): a per-customer,
# per-year, per-channel aggregate pivoted into 4 cells (2 channels x
# 2 years); keep customers whose urgent-channel YoY growth exceeds the
# standard channel's — with the first-year>0 guards of the original
# (query11.sql / query74.sql). The oracle spells it the original way
# (the yearly CTE self-joined 4x); the Spark plan is the Spark-first
# rewrite — ONE conditional aggregation keyed on o_custkey computes all
# 4 cells, so orders shuffles once and the join tree disappears
# (all-cells-non-null ≡ the original's inner 4-way join).
# ---------------------------------------------------------------------------
@query(
    "q_ds_yoy_customer_filter",
    """
    WITH yearly AS (
      SELECT o_custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'urgent' ELSE 'std' END AS chan,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
      GROUP BY 1, 2, 3
    )
    SELECT u1.o_custkey AS custkey,
           u2.total / u1.total AS urgent_growth,
           s2.total / s1.total AS std_growth
    FROM yearly u1
    JOIN yearly u2 ON u2.o_custkey = u1.o_custkey AND u2.chan = 'urgent' AND u2.yr = 1998
    JOIN yearly s1 ON s1.o_custkey = u1.o_custkey AND s1.chan = 'std' AND s1.yr = 1997
    JOIN yearly s2 ON s2.o_custkey = u1.o_custkey AND s2.chan = 'std' AND s2.yr = 1998
    WHERE u1.chan = 'urgent' AND u1.yr = 1997
      AND u1.total > 0 AND s1.total > 0
      AND u2.total / u1.total > s2.total / s1.total
    ORDER BY custkey
    """,
)
def q_ds_yoy_customer_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    yr = F.year("o_orderdate")

    def cell(is_urgent: bool, year: int):
        cond = (urgent if is_urgent else ~urgent) & (yr == year)
        # NULL when the customer has no orders in the cell (≡ the
        # original's inner join dropping that customer)
        return F.sum(F.when(cond, dec("o_totalprice"))).cast("double")

    cells = (
        o.where(yr.isin(1997, 1998))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            cell(True, 1997).alias("u1_t"),
            cell(True, 1998).alias("u2_t"),
            cell(False, 1997).alias("s1_t"),
            cell(False, 1998).alias("s2_t"),
        )
    )
    return (
        cells.where(
            F.col("u1_t").isNotNull() & F.col("u2_t").isNotNull()
            & F.col("s1_t").isNotNull() & F.col("s2_t").isNotNull()
            & (F.col("u1_t") > 0) & (F.col("s1_t") > 0)
            & (F.col("u2_t") / F.col("u1_t") > F.col("s2_t") / F.col("s1_t"))
        )
        .select(
            "custkey",
            (F.col("u2_t") / F.col("u1_t")).alias("urgent_growth"),
            (F.col("s2_t") / F.col("s1_t")).alias("std_growth"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# TPC-DS q64 shape (multi-year wide star join): the fact joined through
# every dimension (orders -> customer -> nation -> region, plus part and
# supplier), aggregated per (nation, year), then self-joined on adjacent
# years keeping nations whose average item price rose
# (tpcds-tool/query/query64.sql's two-year store-sales comparison).
# Scale: lineitem shuffles once on l_orderkey for the orders join; every
# dimension is broadcast (customer/nation/region/part/supplier are tiny
# next to the fact); the year self-join operates on |nations x years|.
# ---------------------------------------------------------------------------
@query(
    "q_ds_wide_star_yoy",
    f"""
    WITH priced AS (
      SELECT n_name,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
             CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) / COUNT(*) AS avg_price
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_retailprice > 900 AND s_acctbal > 0
      GROUP BY 1, 2
    )
    SELECT cur.n_name AS nation, cur.yr AS yr,
           prev.avg_price AS prev_avg, cur.avg_price AS cur_avg
    FROM priced cur
    JOIN priced prev ON prev.n_name = cur.n_name AND prev.yr = cur.yr - 1
    WHERE cur.avg_price > prev.avg_price
    ORDER BY nation, yr
    """,
)
def q_ds_wide_star_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    priced = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            F.broadcast(t["part"].where(F.col("p_retailprice") > 900)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(t["supplier"].where(F.col("s_acctbal") > 0)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg((F.sum(disc_price()).cast("double") / F.count("*")).alias("avg_price"))
    )
    cur, prev = priced.alias("cur"), priced.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("prev.n_name") == F.col("cur.n_name"))
            & (F.col("prev.yr") == F.col("cur.yr") - 1),
        )
        .where(F.col("cur.avg_price") > F.col("prev.avg_price"))
        .select(
            F.col("cur.n_name").alias("nation"),
            F.col("cur.yr").alias("yr"),
            F.col("prev.avg_price").alias("prev_avg"),
            F.col("cur.avg_price").alias("cur_avg"),
        )
        .orderBy("nation", "yr")
    )


# ---------------------------------------------------------------------------
# TPC-DS q78 shape (anti-join channels): sales kept only when NO return
# exists for the sale's order (query78.sql's ws/cs LEFT JOIN returns ...
# WHERE wr_order_number IS NULL), then aggregated per supplier. Scale:
# the distinct returned-order set is a fraction of lineitem; Spark plans
# a left-anti join co-partitioned on l_orderkey with the fact's existing
# shuffle — no broadcast assumption, AQE may pick one if the set is small.
# ---------------------------------------------------------------------------
@query(
    "q_ds_antijoin_returns",
    f"""
    WITH ret_orders AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT l_suppkey AS suppkey,
           COUNT(*) AS n_clean_items,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS clean_rev
    FROM lineitem
    WHERE l_orderkey NOT IN (SELECT l_orderkey FROM ret_orders)
    GROUP BY l_suppkey
    ORDER BY suppkey
    """,
)
def q_ds_antijoin_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    ret_orders = li.where(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    return (
        li.join(ret_orders, "l_orderkey", "left_anti")
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count("*").alias("n_clean_items"),
            F.sum(disc_price()).cast("double").alias("clean_rev"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-DS q35/q69 shape (EXISTS + NOT EXISTS demographics): customers
# that appear in one channel and not another, grouped by a demographic
# with count + exact-sum stats. Spark rewrites the correlated EXISTS /
# NOT EXISTS into a left-semi + left-anti join pair on c_custkey.
# Scale: both probe sides are distinct-custkey sets (customer-sized, not
# order-sized); the joins share the aggregate's c_custkey partitioning.
# ---------------------------------------------------------------------------
@query(
    "q_ds_exists_demographics",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_ds_exists_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(finished, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("bal_sum"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# TPC-DS q23 shape (frequent-item-set + best-customer subqueries): two
# aggregate-derived filter sets — items sold often, customers whose
# lifetime spend clears a fraction of the MAX spend (a scalar subquery
# over an aggregate) — then the fact restricted to both via semi joins
# (tpcds-tool/query/query23a.sql). Scale: the scalar MAX is a 1-row
# broadcast; both filter sets are aggregate-sized (|parts| / |customers|)
# and semi-join against the fact on its existing keys; no row explosion.
# ---------------------------------------------------------------------------
@query(
    "q_ds_frequent_item_best_customer",
    f"""
    WITH freq_parts AS (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 40
    ),
    spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders GROUP BY o_custkey
    ),
    best_customers AS (
      SELECT o_custkey FROM spend
      WHERE total > 0.5 * (SELECT MAX(total) FROM spend)
    )
    SELECT COUNT(*) AS n_items,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM freq_parts)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
    """,
)
def q_ds_frequent_item_best_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    freq_parts = li.groupBy("l_partkey").count().where(F.col("count") > 40).select("l_partkey")
    spend = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("total"))
    max_total = spend.agg(F.max("total").alias("max_total"))
    best = (
        spend.join(F.broadcast(max_total))
        .where(F.col("total") > 0.5 * F.col("max_total"))
        .select("o_custkey")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(freq_parts, "l_partkey", "left_semi")
        .join(best, "o_custkey", "left_semi")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(disc_price()).cast("double").alias("rev"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-DS q14/q23 shape: ONE expensive aggregated CTE referenced THREE
# times — as the row source, as a per-channel total (join back), and as
# a scalar threshold. Scale: Catalyst plans each reference; AQE reuses
# the exchange when the subtrees are identical, and both the channel
# total and the scalar threshold are broadcast-size aggregates — the big
# scan happens once per materialized reference, never per row.
# ---------------------------------------------------------------------------
@query(
    "q_ds_multi_cte_reuse",
    f"""
    WITH sales AS (
      SELECT p_brand, l_returnflag AS channel,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand, l_returnflag
    ),
    chan AS (SELECT channel, SUM(rev_dec) AS chan_dec FROM sales GROUP BY channel),
    thr AS (SELECT CAST(SUM(rev_dec) AS DOUBLE) / COUNT(*) AS t FROM sales)
    SELECT s.channel AS channel, s.p_brand AS p_brand,
           CAST(s.rev_dec AS DOUBLE) AS rev,
           CAST(s.rev_dec AS DOUBLE) / CAST(c.chan_dec AS DOUBLE) AS chan_share
    FROM sales s JOIN chan c ON s.channel = c.channel CROSS JOIN thr
    WHERE CAST(s.rev_dec AS DOUBLE) > t
    ORDER BY channel, p_brand
    """,
)
def q_ds_multi_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sales = (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", F.col("l_returnflag").alias("channel"))
        .agg(F.sum(dec("l_extendedprice")).alias("rev_dec"))
    )
    chan = sales.groupBy("channel").agg(F.sum("rev_dec").alias("chan_dec"))
    thr = sales.agg((F.sum("rev_dec").cast("double") / F.count("*")).alias("t"))
    return (
        sales.join(F.broadcast(chan), "channel")
        .crossJoin(F.broadcast(thr))
        .where(F.col("rev_dec").cast("double") > F.col("t"))
        .select(
            "channel",
            "p_brand",
            F.col("rev_dec").cast("double").alias("rev"),
            (F.col("rev_dec").cast("double") / F.col("chan_dec").cast("double")).alias(
                "chan_share"
            ),
        )
        .orderBy("channel", "p_brand")
    )


# ---------------------------------------------------------------------------
# TPC-DS q64 shape: the SAME star aggregate instantiated for two years
# and self-joined on the entity key with a cross-year condition, plus
# broadcast dims on the result. Scale: the per-(customer, year) aggregate
# shuffles once; the self-join co-locates on o_custkey (same hash
# partitioning both sides); customer and nation ride broadcasts.
# ---------------------------------------------------------------------------
@query(
    "q_ds_two_year_star_join",
    """
    WITH cy AS (
      SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY 1, 2
    )
    SELECT c_name, n_name,
           CAST(a.rev_dec AS DOUBLE) AS rev_y1, CAST(b.rev_dec AS DOUBLE) AS rev_y2
    FROM cy a JOIN cy b ON a.o_custkey = b.o_custkey
    JOIN customer ON c_custkey = a.o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE a.yr = 1995 AND b.yr = 1996
      AND CAST(b.rev_dec AS DOUBLE) > CAST(a.rev_dec AS DOUBLE)
    ORDER BY c_name
    """,
)
def q_ds_two_year_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cy = t["orders"].groupBy(
        "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    ).agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    a = cy.where(F.col("yr") == 1995).alias("a")
    b = cy.where(F.col("yr") == 1996).alias("b")
    return (
        a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"))
        .where(F.col("b.rev_dec").cast("double") > F.col("a.rev_dec").cast("double"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("a.o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "c_name",
            "n_name",
            F.col("a.rev_dec").cast("double").alias("rev_y1"),
            F.col("b.rev_dec").cast("double").alias("rev_y2"),
        )
        .orderBy("c_name")
    )


# ---------------------------------------------------------------------------
# TPC-DS q72 shape: a long fact-to-fact join chain with a shifted-date
# condition (inventory/catalog analog: shipments that slipped >60 days
# past order placement, excluding returns). Scale: the only
# big shuffle is lineitem⋈orders on orderkey; part/supplier/nation are
# broadcast; the date conditions are row-local post-join filters that
# Catalyst pushes into the join where possible.
# ---------------------------------------------------------------------------
@query(
    "q_ds_inventory_chain",
    """
    SELECT p_brand, n_name, COUNT(*) AS n_delayed
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_returnflag <> 'R'
    GROUP BY p_brand, n_name
    ORDER BY n_delayed DESC, p_brand, n_name
    LIMIT 100
    """,
)
def q_ds_inventory_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .where(
            (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
            & (F.col("l_returnflag") != "R")
        )
        .groupBy("p_brand", "n_name")
        .agg(F.count("*").alias("n_delayed"))
        .orderBy(F.desc("n_delayed"), "p_brand", "n_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-DS q31 shape: per-(entity, period) aggregates, window-LAG growth
# per channel, then a cross-channel self-join comparing growth rates.
# Scale: one agg shuffle on (nation, quarter, channel); the window and
# the self-join both repartition only the tiny aggregate.
# ---------------------------------------------------------------------------
@query(
    "q_ds_correlated_window_ratio",
    """
    WITH rev AS (
      SELECT c_nationkey AS nk,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS q,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'hi' ELSE 'lo' END AS chan,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) = 1995
      GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT nk, q, chan,
             CAST(rev_dec AS DOUBLE)
               / CAST(LAG(rev_dec) OVER (PARTITION BY nk, chan ORDER BY q) AS DOUBLE)
               AS growth
      FROM rev
    )
    SELECT h.nk AS nationkey, h.q AS quarter,
           h.growth AS hi_growth, l.growth AS lo_growth
    FROM g h JOIN g l ON h.nk = l.nk AND h.q = l.q
    WHERE h.chan = 'hi' AND l.chan = 'lo' AND h.growth > l.growth
    ORDER BY nationkey, quarter
    """,
)
def q_ds_correlated_window_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .where(F.year("o_orderdate").cast("int") == 1995)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.quarter("o_orderdate").cast("int").alias("q"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("hi")
            ).otherwise(F.lit("lo")).alias("chan"),
        )
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    w = W.partitionBy("nk", "chan").orderBy("q")
    g = rev.select(
        "nk", "q", "chan",
        (F.col("rev_dec").cast("double") / F.lag("rev_dec").over(w).cast("double")).alias(
            "growth"
        ),
    )
    h, lo = g.where(F.col("chan") == "hi").alias("h"), g.where(F.col("chan") == "lo").alias("l")
    return (
        h.join(lo, (F.col("h.nk") == F.col("l.nk")) & (F.col("h.q") == F.col("l.q")))
        .where(F.col("h.growth") > F.col("l.growth"))
        .select(
            F.col("h.nk").alias("nationkey"),
            F.col("h.q").alias("quarter"),
            F.col("h.growth").alias("hi_growth"),
            F.col("l.growth").alias("lo_growth"),
        )
        .orderBy("nationkey", "quarter")
    )


# ---------------------------------------------------------------------------
# TPC-DS q39 shape: per-(entity, period) variance flag from EXACT moment
# sums (decimal sum and sum-of-squares; stddev_samp's accumulation order
# differs across engines, so the variance is assembled from exact sums
# with a fixed IEEE expression tree), then a consecutive-period
# self-join of the flagged rows. Scale: one agg shuffle; the self-join
# repartitions only flagged aggregates.
# ---------------------------------------------------------------------------
@query(
    "q_ds_variance_flag_chain",
    """
    WITH m AS (
      SELECT l_suppkey AS sk, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS m,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ss
      FROM lineitem GROUP BY 1, 2
    ),
    v AS (
      SELECT sk, m, (ss - s * s / n) / (n - 1) AS var
      FROM m WHERE n >= 3
    ),
    f AS (SELECT sk, m, var FROM v WHERE var > 190.0)
    SELECT a.sk AS sk, a.m AS m1, b.m AS m2, a.var AS var1, b.var AS var2
    FROM f a JOIN f b ON a.sk = b.sk AND b.m = a.m + 1
    ORDER BY sk, m1
    """,
)
def q_ds_variance_flag_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    m = li.groupBy(
        F.col("l_suppkey").alias("sk"),
        F.month("l_shipdate").cast("int").alias("m"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("s"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("ss"),
    )
    v = m.where(F.col("n") >= 3).select(
        "sk", "m",
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias("var"),
    )
    f = v.where(F.col("var") > 190.0)
    a, b = f.alias("a"), f.alias("b")
    return (
        a.join(b, (F.col("a.sk") == F.col("b.sk")) & (F.col("b.m") == F.col("a.m") + 1))
        .select(
            F.col("a.sk").alias("sk"),
            F.col("a.m").alias("m1"),
            F.col("b.m").alias("m2"),
            F.col("a.var").alias("var1"),
            F.col("b.var").alias("var2"),
        )
        .orderBy("sk", "m1")
    )


# ---------------------------------------------------------------------------
# TPC-DS first-sale cohort shape (q54-adjacent): MIN(date) per customer
# defines the cohort, joined back to the fact for a cohort-year ×
# order-year grid with a COUNT(DISTINCT). Scale: the min-date aggregate
# and the fact shuffle on the same key (o_custkey) — co-located join;
# the distinct-count shuffles on the tiny (cohort, year) grid.
# ---------------------------------------------------------------------------
@query(
    "q_ds_first_purchase_cohort",
    """
    WITH first_o AS (
      SELECT o_custkey AS k, MIN(o_orderdate) AS first_dt FROM orders GROUP BY 1
    )
    SELECT CAST(EXTRACT(YEAR FROM f.first_dt) AS INTEGER) AS cohort_year,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders o JOIN first_o f ON o.o_custkey = f.k
    GROUP BY 1, 2
    ORDER BY cohort_year, order_year
    """,
)
def q_ds_first_purchase_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    first_o = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.min("o_orderdate").alias("first_dt")
    )
    return (
        o.join(first_o, F.col("o_custkey") == F.col("k"))
        .groupBy(
            F.year("first_dt").cast("int").alias("cohort_year"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("rev"),
        )
        .orderBy("cohort_year", "order_year")
    )


# ---------------------------------------------------------------------------
# TPC-DS q49 shape: per-entity return ratios ranked by TWO different
# orderings, keeping rows in the top-k of EITHER ranking. Scale: one agg
# shuffle to brand granularity; both windows repartition the same tiny
# aggregate (single exchange, two sorts).
# ---------------------------------------------------------------------------
@query(
    "q_ds_dual_rank_return_ratio",
    """
    WITH base AS (
      SELECT p_brand,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_ratio,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS amt_ratio
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand
    ),
    ranked AS (
      SELECT *, RANK() OVER (ORDER BY qty_ratio DESC, p_brand) AS qty_rank,
                RANK() OVER (ORDER BY amt_ratio DESC, p_brand) AS amt_rank
      FROM base
    )
    SELECT p_brand, qty_ratio, amt_ratio, qty_rank, amt_rank
    FROM ranked WHERE qty_rank <= 10 OR amt_rank <= 10
    ORDER BY p_brand
    """,
)
def q_ds_dual_rank_return_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ret_qty = F.sum(F.when(F.col("l_returnflag") == "R", dec("l_quantity")))
    ret_amt = F.sum(F.when(F.col("l_returnflag") == "R", dec("l_extendedprice")))
    base = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            (
                F.coalesce(ret_qty, F.lit(0).cast("decimal(18,2)")).cast("double")
                / F.sum(dec("l_quantity")).cast("double")
            ).alias("qty_ratio"),
            (
                F.coalesce(ret_amt, F.lit(0).cast("decimal(18,2)")).cast("double")
                / F.sum(dec("l_extendedprice")).cast("double")
            ).alias("amt_ratio"),
        )
    )
    ranked = base.select(
        "*",
        F.rank().over(W.orderBy(F.desc("qty_ratio"), "p_brand")).alias("qty_rank"),
        F.rank().over(W.orderBy(F.desc("amt_ratio"), "p_brand")).alias("amt_rank"),
    )
    return (
        ranked.where((F.col("qty_rank") <= 10) | (F.col("amt_rank") <= 10))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# TPC-DS q97 shape: channel-overlap census via FULL OUTER JOIN of two
# distinct key sets, counted by presence pattern. Scale: both distinct
# sets and the full join hash on the same key — one exchange per side,
# co-located join, three conditional counts in one pass.
# ---------------------------------------------------------------------------
@query(
    "q_ds_channel_overlap_census",
    """
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_orderpriority = '1-URGENT'),
         b AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_orderpriority = '5-LOW')
    SELECT COUNT(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN 1 END) AS both_ch,
           COUNT(CASE WHEN a.k IS NOT NULL AND b.k IS NULL THEN 1 END) AS only_a,
           COUNT(CASE WHEN a.k IS NULL AND b.k IS NOT NULL THEN 1 END) AS only_b
    FROM a FULL OUTER JOIN b ON a.k = b.k
    """,
)
def q_ds_channel_overlap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("ak")
    ).distinct()
    b = o.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("bk")
    ).distinct()
    return a.join(b, F.col("ak") == F.col("bk"), "full_outer").agg(
        F.count(F.when(F.col("ak").isNotNull() & F.col("bk").isNotNull(), 1)).alias("both_ch"),
        F.count(F.when(F.col("ak").isNotNull() & F.col("bk").isNull(), 1)).alias("only_a"),
        F.count(F.when(F.col("ak").isNull() & F.col("bk").isNotNull(), 1)).alias("only_b"),
    )


# ---------------------------------------------------------------------------
# TPC-DS q23 FULL form (tpcds-tool/query/query23.sql): TWO shared CTEs
# (frequent items, best customers — the latter itself gated by a scalar
# subquery over the first CTE's sibling) filtering TWO channel branches
# that UNION ALL into one aggregate. Extends q_ds_frequent_item_best_customer
# (the single-channel partial shape) with the full cross-channel reuse.
# Scale: both CTEs are aggregation-reduced key sets; `best` (customers
# above half the max spend) is tiny -> broadcast semi-join; `freq`
# can be large at 100 TB -> unhinted semi-join, AQE picks broadcast vs
# shuffle at runtime. Each branch is scan + two semi-joins; the final
# agg shuffles 2 rows.
# ---------------------------------------------------------------------------
@query(
    "q_ds_two_cte_union_channels",
    """
    WITH freq_parts AS (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 40
    ),
    spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders GROUP BY o_custkey
    ),
    best AS (
      SELECT o_custkey FROM spend WHERE total > 0.5 * (SELECT MAX(total) FROM spend)
    )
    SELECT channel, CAST(SUM(amt) AS DOUBLE) AS revenue, COUNT(*) AS n_items FROM (
      SELECT 'urgent' AS channel, CAST(l_extendedprice AS DECIMAL(18,2)) AS amt
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderpriority = '1-URGENT'
        AND l_partkey IN (SELECT l_partkey FROM freq_parts)
        AND o_custkey IN (SELECT o_custkey FROM best)
      UNION ALL
      SELECT 'low' AS channel, CAST(l_extendedprice AS DECIMAL(18,2)) AS amt
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderpriority = '5-LOW'
        AND l_partkey IN (SELECT l_partkey FROM freq_parts)
        AND o_custkey IN (SELECT o_custkey FROM best)
    ) GROUP BY channel ORDER BY channel
    """,
)
def q_ds_two_cte_union_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    freq = li.groupBy("l_partkey").count().where(F.col("count") > 40).select("l_partkey")
    spend = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("total"))
    mx = spend.agg(F.max("total").alias("mx"))
    best = (
        spend.join(F.broadcast(mx))
        .where(F.col("total") > 0.5 * F.col("mx"))
        .select("o_custkey")
    )

    def branch(prio: str, tag: str) -> DataFrame:
        return (
            li.join(
                o.where(F.col("o_orderpriority") == prio),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(freq, "l_partkey", "left_semi")
            .join(F.broadcast(best), "o_custkey", "left_semi")
            .select(F.lit(tag).alias("channel"), dec("l_extendedprice").alias("amt"))
        )

    return (
        branch("1-URGENT", "urgent")
        .unionAll(branch("5-LOW", "low"))
        .groupBy("channel")
        .agg(
            F.sum("amt").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# TPC-DS q10 shape: customer census gated by correlated EXISTS AND an
# OR of two more EXISTS over different fact paths. The OR-of-EXISTS is
# the planner-distinctive bit — Spark can't OR two semi-joins, so the
# Spark-first form is one semi-join against the UNION of the two
# aggregation-reduced key sets (same result set, one exchange).
# Scale: every key set is DISTINCT-reduced before joining; all joins
# hash on c_custkey; final agg on a 5-value segment key.
# ---------------------------------------------------------------------------
@query(
    "q_ds_correlated_exists_or",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(YEAR FROM o.o_orderdate) = 1995)
      AND (EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                   WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
           OR EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000))
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_ds_correlated_exists_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    k95 = (
        o.where(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    kret = (
        li.where(F.col("l_returnflag") == "R")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    khigh = (
        o.where(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    k_or = kret.unionAll(khigh).distinct()
    return (
        c.join(k95, F.col("c_custkey") == k95["k"], "left_semi")
        .join(k_or, F.col("c_custkey") == k_or["k"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# TPC-DS q16 shape: COUNT(DISTINCT order) over a fact join gated by a
# self-EXISTS (another line of the same order from a DIFFERENT supplier)
# and a self-NOT-EXISTS (no returned line in the order). The EXISTS
# condition is order-level, so it decorrelates to a semi-join against
# orders-with->=2-distinct-suppliers; the NOT EXISTS to an anti-join
# against orders-with-returns. Scale: both gate sets are agg-reduced to
# orderkeys; all three joins + the distinct-agg hash on l_orderkey, so
# AQE coalesces them into one exchange chain; final agg on the 5-value
# priority key.
# ---------------------------------------------------------------------------
@query(
    "q_ds_exists_notexists_distinct",
    """
    SELECT o_orderpriority, COUNT(DISTINCT l1.l_orderkey) AS n_orders
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_ds_exists_notexists_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    returned = (
        li.where(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    )
    return (
        li.join(
            o.where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(multi, "l_orderkey", "left_semi")
        .join(returned, "l_orderkey", "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-DS q70 shape: the GROUPING dimension itself is gated by a RANKED
# SUBQUERY (top-3 nations by revenue), then ROLLUP over (nation,
# segment) with a rank computed WITHIN each grouping level — the
# window's partition key is derived from GROUPING() flags. Scale: the
# gate subquery is an agg to |nations| rows ranked with one global
# window over ~25 rows (broadcast back); the main rollup is one Expand
# + hash-agg; the level rank partitions on (level, nation) — bounded
# cardinality.
# ---------------------------------------------------------------------------
@query(
    "q_ds_ranked_dim_rollup",
    """
    WITH nat_rev AS (
      SELECT c_nationkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY c_nationkey
    ),
    top_nat AS (
      SELECT c_nationkey FROM (
        SELECT c_nationkey, RANK() OVER (ORDER BY rev DESC, c_nationkey) AS r
        FROM nat_rev)
      WHERE r <= 3
    )
    SELECT n_name, mkt, lochierarchy, rev, rank_in_level FROM (
      SELECT COALESCE(n_name, 'ALL') AS n_name,
             COALESCE(c_mktsegment, 'ALL') AS mkt,
             CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS INTEGER) AS lochierarchy,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
             RANK() OVER (
               PARTITION BY GROUPING(n_name) + GROUPING(c_mktsegment),
                            CASE WHEN GROUPING(c_mktsegment) = 0 THEN n_name END
               ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC,
                        COALESCE(c_mktsegment, 'ALL')
             ) AS rank_in_level
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      WHERE c_nationkey IN (SELECT c_nationkey FROM top_nat)
      GROUP BY ROLLUP(n_name, c_mktsegment))
    ORDER BY lochierarchy DESC, n_name, rank_in_level
    """,
)
def q_ds_ranked_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o, c, n = t["orders"], t["customer"], t["nation"]
    nat_rev = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_nationkey")
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
    )
    top_nat = (
        nat_rev.select(
            "c_nationkey",
            F.rank().over(W.orderBy(F.desc("rev"), "c_nationkey")).alias("r"),
        )
        .where(F.col("r") <= 3)
        .select("c_nationkey")
    )
    base = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(top_nat), "c_nationkey", "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    level = (F.grouping("n_name") + F.grouping("c_mktsegment")).cast("int")
    rolled = base.rollup("n_name", "c_mktsegment").agg(
        level.alias("lochierarchy"),
        F.sum(dec("o_totalprice")).alias("rev_dec"),
        F.grouping("c_mktsegment").alias("_gm"),
    )
    wlevel = W.partitionBy(
        "lochierarchy",
        F.when(F.col("_gm") == 0, F.col("n_name")),
    ).orderBy(F.desc("rev_dec"), F.coalesce("c_mktsegment", F.lit("ALL")))
    return (
        rolled.select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("mkt"),
            "lochierarchy",
            F.col("rev_dec").cast("double").alias("rev"),
            F.rank().over(wlevel).alias("rank_in_level"),
        )
        .orderBy(F.desc("lochierarchy"), "n_name", "rank_in_level")
    )


# ---------------------------------------------------------------------------
# TPC-DS q29/q25 shape (three-fact lifecycle chain): the SAME fact table
# instantiated three times — sale, return of that sale (matched on
# order+item), and a LATER repurchase by the same customer of the same
# item (date inequality) — then a dim join and a three-measure aggregate.
# Scale: sale↔return joins on the near-unique (orderkey, partkey) pair
# (no fan-out); the repurchase is matched at (custkey, brand) grain (the
# fixture's analog of q29's exact-item rematch — exact-part repeats are
# vanishingly rare here), with multiplicity bounded by one customer's
# purchases within ONE brand;
# all three instances shuffle on join keys, the date predicate rides the
# join condition so no post-join filter blowup. tpcds-tool/query/query29.sql.
# ---------------------------------------------------------------------------
@query(
    "q_ds_lifecycle_chain",
    f"""
    WITH s AS (SELECT l_orderkey, l_partkey, l_quantity AS sold_qty, o_custkey
               FROM lineitem JOIN orders ON o_orderkey = l_orderkey
               WHERE l_returnflag <> 'R'),
    r AS (SELECT l_orderkey, l_partkey, l_quantity AS ret_qty, o_orderdate AS ret_date
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE l_returnflag = 'R'),
    rep AS (SELECT o_custkey, p_brand AS rep_brand, l_quantity AS rep_qty,
                   o_orderdate AS rep_date
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                          JOIN part ON p_partkey = l_partkey)
    SELECT p_brand,
           COUNT(*) AS n_chains,
           {sql_dsum('sold_qty')} AS sold_qty_sum,
           {sql_dsum('ret_qty')} AS ret_qty_sum,
           {sql_dsum('rep_qty')} AS rep_qty_sum
    FROM s
    JOIN r ON r.l_orderkey = s.l_orderkey AND r.l_partkey = s.l_partkey
    JOIN part ON p_partkey = s.l_partkey
    JOIN rep ON rep.o_custkey = s.o_custkey AND rep.rep_brand = p_brand
            AND rep.rep_date > r.ret_date
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def q_ds_lifecycle_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, o, p = t["lineitem"], t["orders"], t["part"]
    lo = li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    s = lo.where(F.col("l_returnflag") != "R").select(
        "l_orderkey", "l_partkey", F.col("l_quantity").alias("sold_qty"), "o_custkey"
    )
    r = lo.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("r_partkey"),
        F.col("l_quantity").alias("ret_qty"),
        F.col("o_orderdate").alias("ret_date"),
    )
    rep = lo.join(p, F.col("p_partkey") == F.col("l_partkey")).select(
        F.col("o_custkey").alias("rep_custkey"),
        F.col("p_brand").alias("rep_brand"),
        F.col("l_quantity").alias("rep_qty"),
        F.col("o_orderdate").alias("rep_date"),
    )
    chain = (
        s.join(
            r,
            (F.col("r_orderkey") == F.col("l_orderkey"))
            & (F.col("r_partkey") == F.col("l_partkey")),
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            rep,
            (F.col("rep_custkey") == F.col("o_custkey"))
            & (F.col("rep_brand") == F.col("p_brand"))
            & (F.col("rep_date") > F.col("ret_date")),
        )
    )
    return (
        chain.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_chains"),
            dsum("sold_qty").alias("sold_qty_sum"),
            dsum("ret_qty").alias("ret_qty_sum"),
            dsum("rep_qty").alias("rep_qty_sum"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# TPC-DS q30/q81 shape (entity vs group-average gate): per-customer
# return totals, compared against 1.2 × the AVERAGE of those totals
# within the customer's nation — an aggregate OF an aggregate joined
# back to its own first level, then the winner rows join the customer
# dim. Scale: level-1 agg shuffles on custkey; level-2 reduces to ≤25
# nation rows that BROADCAST back onto level 1 (plan never reshuffles
# the big side); dim join is on the already-reduced winner set.
# tpcds-tool/query/query30.sql.
# ---------------------------------------------------------------------------
@query(
    "q_ds_above_nation_avg_returns",
    f"""
    WITH ctr AS (
      SELECT o_custkey, c_nationkey, {sql_dsum('l_extendedprice', 2)} AS ret_amt
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE l_returnflag = 'R'
      GROUP BY o_custkey, c_nationkey),
    nat AS (SELECT c_nationkey,
                   CAST(SUM(CAST(ret_amt AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_amt
            FROM ctr GROUP BY c_nationkey)
    SELECT c_name, ctr.c_nationkey, ret_amt
    FROM ctr
    JOIN nat ON nat.c_nationkey = ctr.c_nationkey
    JOIN customer ON c_custkey = o_custkey
    WHERE ret_amt > 1.2 * avg_amt
    ORDER BY c_name
    """,
)
def q_ds_above_nation_avg_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    ctr = (
        li.where(F.col("l_returnflag") == "R")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("o_custkey", "c_nationkey")
        .agg(dsum("l_extendedprice").alias("ret_amt"))
    )
    # ret_amt is 2-decimal-exact; the level-2 sum stays decimal so the
    # 1.2×avg boundary comparison is order-independent too
    nat = ctr.groupBy("c_nationkey").agg(
        (F.sum(dec("ret_amt")).cast("double") / F.count("*")).alias("avg_amt")
    )
    return (
        ctr.join(F.broadcast(nat.withColumnRenamed("c_nationkey", "n_key")),
                 F.col("n_key") == F.col("c_nationkey"))
        .where(F.col("ret_amt") > 1.2 * F.col("avg_amt"))
        .join(c.select("c_custkey", "c_name"), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_nationkey", "ret_amt")
        .orderBy("c_name")
    )


# ---------------------------------------------------------------------------
# TPC-DS q13/q48 shape (multi-bracket disjunctive join predicate): the
# fact joins dims under an OR of AND-brackets that each mix columns
# from BOTH sides (demographics×sales brackets in q13) — the planner
# must keep the per-bracket conjuncts it CAN push (single-side) at the
# scans and evaluate only the genuinely cross-side residue post-join.
# Scale: order-side brackets prune before the join; the fact side
# streams through one broadcast-hash join with a residual OR filter —
# no bracket forces a cartesian or a second pass.
# ---------------------------------------------------------------------------
@query(
    "q_ds_bracketed_or_join",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {sql_dsum('l_quantity')} AS qty_sum,
           {sql_dsum('l_extendedprice')} AS price_sum
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE (o_orderstatus = 'F' AND o_totalprice BETWEEN 50000 AND 150000
           AND l_quantity BETWEEN 10 AND 30)
       OR (o_orderstatus = 'O' AND o_totalprice BETWEEN 150000 AND 300000
           AND l_quantity BETWEEN 30 AND 50)
       OR (o_orderstatus = 'P' AND l_discount BETWEEN 0.05 AND 0.08)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_ds_bracketed_or_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, o = t["lineitem"], t["orders"]
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    b1 = (
        (F.col("o_orderstatus") == "F")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("l_quantity").between(10, 30)
    )
    b2 = (
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(150000, 300000)
        & F.col("l_quantity").between(30, 50)
    )
    b3 = (F.col("o_orderstatus") == "P") & F.col("l_discount").between(0.05, 0.08)
    return (
        j.where(b1 | b2 | b3)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_quantity").alias("qty_sum"),
            dsum("l_extendedprice").alias("price_sum"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-DS q21 shape (before/after-event conditional ratio gate): per
# supplier, quantities shipped before vs after a pivot date as
# CONDITIONAL sums in one pass, keep suppliers whose after/before ratio
# sits in a band — aggregate once, HAVING on a ratio of two conditional
# aggregates (no self-join, no second scan). Scale: one agg shuffle on
# s_suppkey; the dim join attaches names to the already-reduced rows.
# tpcds-tool/query/query21.sql.
# ---------------------------------------------------------------------------
@query(
    "q_ds_before_after_ratio",
    """
    WITH agg AS (
      SELECT l_suppkey,
             CAST(SUM(CASE WHEN l_shipdate <  TIMESTAMP '1998-06-01 00:00:00'
                           THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS before_qty,
             CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
                           THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS after_qty
      FROM lineitem GROUP BY l_suppkey)
    SELECT s_name, before_qty, after_qty
    FROM agg JOIN supplier ON s_suppkey = l_suppkey
    WHERE before_qty > 0 AND after_qty > 0
      AND after_qty / before_qty BETWEEN 0.8 AND 0.95
    ORDER BY s_name
    """,
)
def q_ds_before_after_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, s = t["lineitem"], t["supplier"]
    pivot = "1998-06-01 00:00:00"
    agg = li.groupBy("l_suppkey").agg(
        F.sum(
            F.when(F.col("l_shipdate") < F.lit(pivot).cast("timestamp"), dec("l_quantity"))
        ).cast("double").alias("before_qty"),
        F.sum(
            F.when(F.col("l_shipdate") >= F.lit(pivot).cast("timestamp"), dec("l_quantity"))
        ).cast("double").alias("after_qty"),
    )
    return (
        agg.where(
            (F.col("before_qty") > 0)
            & (F.col("after_qty") > 0)
            & ((F.col("after_qty") / F.col("before_qty")).between(0.8, 0.95))
        )
        .join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", "before_qty", "after_qty")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# TPC-DS q98/q12/q20 shape (ratio-to-report): per-item revenue with its
# SHARE of the item-class total — an aggregate feeding an unbounded
# partition-total window over itself (revenueratio). Scale: one agg
# shuffle on the item key, then ONE window exchange on the class key
# whose partitions are class-sized; the share division happens on
# already-reduced rows. The window total is summed as DECIMAL (exact,
# order-free) so the share is engine-deterministic.
# tpcds-tool/query/query98.sql.
# ---------------------------------------------------------------------------
@query(
    "q_ds_revenue_share",
    f"""
    WITH rev AS (
      SELECT l_partkey, {sql_dsum('l_extendedprice')} AS rev
      FROM lineitem GROUP BY l_partkey),
    j AS (SELECT p_type, p_partkey, rev FROM rev JOIN part ON p_partkey = l_partkey)
    SELECT p_type, p_partkey, rev,
           rev / CAST(SUM(CAST(rev AS DECIMAL(18,2)))
                      OVER (PARTITION BY p_type) AS DOUBLE) AS class_share
    FROM j ORDER BY p_type, p_partkey
    """,
)
def q_ds_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, p = t["lineitem"], t["part"]
    rev = li.groupBy("l_partkey").agg(dsum("l_extendedprice").alias("rev"))
    j = rev.join(p, F.col("p_partkey") == F.col("l_partkey")).select(
        "p_type", "p_partkey", "rev"
    )
    total = F.sum(dec("rev")).over(W.partitionBy("p_type")).cast("double")
    return j.select(
        "p_type", "p_partkey", "rev", (F.col("rev") / total).alias("class_share")
    ).orderBy("p_type", "p_partkey")
