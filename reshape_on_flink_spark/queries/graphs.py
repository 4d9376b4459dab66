"""Graph library queries — the Gelly-adjacent breadth beyond
pagerank/SSSP/connected-components (flink-libraries/flink-gelly
``library/`` + ``metric/``): vertex degrees, triangle counting, label
propagation. Each runs the operators in operators/iterate.py over a
deterministic co-occurrence graph derived from the events fixture and
is hash-gated against a DuckDB replica.

The graph: users co-occurring in the same (minute, event_type) bucket.
Both engines derive it with the identical distinct-bucket self-join —
at sf0.01 that is 207 undirected edges over 150 users with 8 triangles
and real community structure (day/hour buckets were rejected: with 150
users they saturate to a near-complete graph).

Scale note: the bucket self-join is bounded by the max bucket size
(10 users at sf0.01 — pairs per bucket are quadratic in THAT, not in
the user count); a production co-occurrence projection caps or samples
oversized buckets exactly like llm/dedup's LSH hot-bucket cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# MATERIALIZED: DuckDB inlines CTEs by default, so an iterative oracle
# chain would re-evaluate this self-join exponentially many times
# (measured: the 3-round HITS oracle went 89s -> sub-second).
SQL_EDGES_CTE = """
    occ AS MATERIALIZED (
        SELECT DISTINCT date_trunc('minute', ts) AS h, event_type AS et,
                        user_id AS u
        FROM events),
    e AS MATERIALIZED (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM occ a JOIN occ b ON a.h = b.h AND a.et = b.et AND a.u < b.u)
"""


def cooccurrence_edges(events: DataFrame) -> DataFrame:
    """Canonical undirected (u < v) user co-occurrence edges."""
    occ = events.select(
        F.date_trunc("minute", "ts").alias("h"),
        F.col("event_type").alias("et"),
        F.col("user_id").alias("u"),
    ).distinct()
    b = occ.select(F.col("h"), F.col("et"), F.col("u").alias("v"))
    return (
        occ.join(b, ["h", "et"])
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


@query(
    "q_graph_degrees",
    f"""
    WITH {SQL_EDGES_CTE}
    SELECT node, out_deg, in_deg, deg FROM (
      SELECT COALESCE(o.node, i.node) AS node,
             COALESCE(o.out_deg, 0) AS out_deg,
             COALESCE(i.in_deg, 0) AS in_deg,
             COALESCE(o.out_deg, 0) + COALESCE(i.in_deg, 0) AS deg
      FROM (SELECT u AS node, COUNT(*) AS out_deg FROM e GROUP BY u) o
      FULL OUTER JOIN (SELECT v AS node, COUNT(*) AS in_deg FROM e GROUP BY v) i
        ON o.node = i.node)
    ORDER BY node
    """,
)
def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex degrees (gelly VertexDegrees) on the canonical edge list:
    two partial-agg shuffles + one key join, linear at any scale."""
    from reshape_on_flink_spark.operators.iterate import vertex_degrees

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return vertex_degrees(edges, src="u", dst="v").orderBy("node")


@query(
    "q_graph_triangles",
    f"""
    WITH {SQL_EDGES_CTE},
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
    pv AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
    SELECT node, COUNT(*) AS n_triangles FROM pv GROUP BY node ORDER BY node
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts (gelly TriangleListing/TriangleCount).
    The Spark side runs the DEGREE-ORDERED orientation (celebrity-vertex
    wedge bound — the 100 TB skew guard); the oracle enumerates by id
    order. The triangle set is orientation-independent, so the outputs
    hash-match — which doubles as a test that the degree orientation
    loses/duplicates nothing."""
    from reshape_on_flink_spark.operators.iterate import triangle_count

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return triangle_count(edges, src="u", dst="v", orient="degree").orderBy("node")


def _lp_oracle(rounds: int = 3) -> str:
    steps = [
        "l0 AS (SELECT node, node AS label FROM (SELECT u AS node FROM e UNION SELECT v FROM e))"
    ]
    for i in range(1, rounds + 1):
        steps.append(f"""c{i} AS (
      SELECT s.node, l.label AS nl, COUNT(*) AS c
      FROM sym s JOIN l{i - 1} l ON l.node = s.nbr GROUP BY s.node, l.label),
    b{i} AS (SELECT node, nl FROM (
      SELECT node, nl, ROW_NUMBER() OVER (PARTITION BY node
                                          ORDER BY c DESC, nl ASC) AS rn
      FROM c{i}) WHERE rn = 1),
    l{i} AS MATERIALIZED (SELECT l.node, COALESCE(b.nl, l.label) AS label
             FROM l{i - 1} l LEFT JOIN b{i} b USING (node))""")
    chain = ",\n    ".join(steps)
    return f"""
    WITH {SQL_EDGES_CTE},
    sym AS (SELECT u AS node, v AS nbr FROM e UNION SELECT v, u FROM e),
    {chain}
    SELECT node, label FROM l{rounds} ORDER BY node
    """


@query("q_graph_label_propagation", _lp_oracle())
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation, 3 supersteps (gelly
    LabelPropagation): most-frequent neighbor label with smallest-label
    tie-break — deterministic, so the full iterative computation is
    hash-gated against an unrolled SQL replica (the kmeans/PQ-training
    pattern applied to a graph algorithm)."""
    from reshape_on_flink_spark.operators.iterate import label_propagation

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return label_propagation(edges, rounds=3, src="u", dst="v").orderBy("node")


@query(
    "q_graph_jaccard",
    f"""
    WITH {SQL_EDGES_CTE},
    sym AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, COUNT(*) AS d FROM sym GROUP BY w),
    wsym AS (SELECT s.w, s.x,
                    CASE WHEN d > 1
                         THEN CAST(ROUND(1000000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT)
                         ELSE 0 END AS aw
             FROM sym s JOIN deg USING (w)),
    pairs AS (
      SELECT a.x AS u, b.x AS v, COUNT(*) AS shared, SUM(a.aw) AS aa_f
      FROM wsym a JOIN wsym b ON a.w = b.w AND a.x < b.x
      GROUP BY a.x, b.x)
    SELECT p.u, p.v, p.shared,
           CAST(p.shared AS DOUBLE) / (du.d + dv.d - p.shared) AS jaccard,
           CAST(aa_f AS DOUBLE) / 1000000000.0 AS adamic_adar
    FROM pairs p
    JOIN deg du ON du.w = p.u
    JOIN deg dv ON dv.w = p.v
    ORDER BY p.u, p.v
    """,
)
def q_graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood similarity (gelly JaccardIndex + AdamicAdar) over
    the co-occurrence graph: wedge generation at common neighbors, one
    pair-keyed aggregation; Adamic-Adar's 1/ln(deg) terms sum as 1e-9
    fixed-point integers so the iterative-free float reduction is
    order-independent and hash-gated."""
    from reshape_on_flink_spark.operators.iterate import neighborhood_similarity

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return neighborhood_similarity(edges, src="u", dst="v").orderBy("u", "v")


def _pagerank_oracle(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-point PageRank replica (see pagerank_fixed: every
    float intermediate is quantized to the 1e-9 grid, sums are integer
    reductions, so the unrolled SQL reproduces ranks bit-for-bit)."""
    steps = [
        """nodes AS (SELECT DISTINCT node FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)),
    ed AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e),
    odeg AS (SELECT s, COUNT(*) AS od FROM ed GROUP BY s),
    cnt AS (SELECT COUNT(*) AS nn FROM nodes),
    r0 AS (SELECT node, CAST(ROUND(1000000000.0 / nn) AS BIGINT) AS rf
           FROM nodes CROSS JOIN cnt)"""
    ]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        steps.append(f"""dg{i} AS (
      SELECT COALESCE(SUM(rf), 0) AS dang FROM {p} r
      LEFT JOIN odeg o ON o.s = r.node WHERE o.s IS NULL),
    c{i} AS (
      SELECT ed.d AS node,
             SUM(CAST(ROUND(CAST(rf AS DOUBLE) / od) AS BIGINT)) AS inf
      FROM ed JOIN {p} r ON r.node = ed.s JOIN odeg o ON o.s = ed.s
      GROUP BY ed.d),
    r{i} AS MATERIALIZED (
      SELECT n.node,
             CAST(ROUND((1.0 - {damping}) * 1000000000.0 / nn) AS BIGINT)
             + CAST(ROUND({damping} * CAST(dang AS DOUBLE) / nn) AS BIGINT)
             + COALESCE(CAST(ROUND({damping} * CAST(inf AS DOUBLE)) AS BIGINT), 0)
             AS rf
      FROM nodes n CROSS JOIN cnt CROSS JOIN dg{i} LEFT JOIN c{i} USING (node))""")
    chain = ",\n    ".join(steps)
    return f"""
    WITH {SQL_EDGES_CTE},
    {chain}
    SELECT node, rf AS rank_f, CAST(rf AS DOUBLE) / 1000000000.0 AS rank
    FROM r{iters} ORDER BY node
    """


@query("q_graph_pagerank", _pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank, 5 rounds, hash-gated: the iterative float
    algorithm made order-independent by 1e-9 quantization of every
    contribution (operators/iterate.pagerank_fixed) — upgrading the
    gelly PageRank row from tolerance-tested to value-hash-gated.
    Runs on the symmetrized co-occurrence graph."""
    from reshape_on_flink_spark.operators.iterate import pagerank_fixed

    events = load_tables(spark, sf_dir)["events"]
    e = cooccurrence_edges(events)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return pagerank_fixed(sym, iters=5, src="u", dst="v").orderBy("node")


@query(
    "q_graph_sssp",
    f"""
    WITH RECURSIVE {SQL_EDGES_CTE},
    sym AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
    walk(node, dist) AS (
      SELECT u, 0 FROM (SELECT MIN(u) AS u FROM e) WHERE u IS NOT NULL
      UNION
      SELECT s.nbr, w.dist + 1
      FROM walk w JOIN sym s ON s.node = w.node
      WHERE w.dist < 20
    )
    SELECT node, CAST(MIN(dist) AS DOUBLE) AS dist
    FROM walk GROUP BY node ORDER BY node
    """,
)
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths (hop count) from the smallest vertex
    id — gelly SingleSourceShortestPaths. Bellman-Ford rounds are
    deterministic for hop counts (min over exact values), so the
    iterative operator hash-matches a bounded recursive-CTE oracle."""
    from reshape_on_flink_spark.operators.iterate import sssp

    events = load_tables(spark, sf_dir)["events"]
    e = cooccurrence_edges(events)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    source = e.agg(F.min("u")).collect()[0][0]
    return sssp(sym, source, max_iters=20, src="u", dst="v").orderBy("node")


@query(
    "q_graph_clustering_coeff",
    f"""
    WITH {SQL_EDGES_CTE},
    deg AS (SELECT node, COUNT(*) AS d FROM
            (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
    pv AS (SELECT node, COUNT(*) AS t FROM
           (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri) GROUP BY node)
    SELECT deg.node, deg.d AS degree,
           COALESCE(pv.t, 0) AS n_triangles,
           CASE WHEN deg.d >= 2
                THEN 2.0 * COALESCE(pv.t, 0) / (deg.d * (deg.d - 1))
                ELSE 0.0 END AS coefficient
    FROM deg LEFT JOIN pv USING (node)
    ORDER BY node
    """,
)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (gelly LocalClusteringCoefficient):
    2·tri(v)/(deg(v)·(deg(v)-1)) — a ratio of exact integers, composing
    the degree-ordered triangle counter with neighbor-count degrees."""
    from reshape_on_flink_spark.operators.iterate import clustering_coefficient

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return clustering_coefficient(edges, src="u", dst="v").orderBy("node")


def _hits_oracle(iters: int = 3, scale: int = 1_000_000) -> str:
    """Unrolled fixed-point HITS replica (see operators/iterate.hits:
    integer half-step sums, exact HUGEINT sum-of-squares for the norm,
    one sqrt/divide per half-step re-quantized to the 1e-6 grid)."""
    steps = [
        f"""nodes AS (SELECT DISTINCT node FROM
             (SELECT u AS node FROM e UNION ALL SELECT v FROM e)),
    s0 AS (SELECT node, CAST({scale} AS BIGINT) AS hub_f,
                  CAST({scale} AS BIGINT) AS auth_f FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        p = f"s{i - 1}"
        steps.append(f"""ar{i} AS (
      SELECT e.v AS node, SUM(s.hub_f) AS raw
      FROM e JOIN {p} s ON s.node = e.u GROUP BY e.v),
    af{i} AS (SELECT n.node, CAST(COALESCE(raw, 0) AS BIGINT) AS f
              FROM nodes n LEFT JOIN ar{i} USING (node)),
    an{i} AS (SELECT sqrt(CAST(SUM(CAST(f AS HUGEINT) * f) AS DOUBLE)) AS nr
              FROM af{i}),
    aa{i} AS MATERIALIZED (SELECT node,
                     CASE WHEN nr > 0
                          THEN CAST(ROUND(CAST(f AS DOUBLE) / nr * {scale}.0) AS BIGINT)
                          ELSE 0 END AS auth_f
              FROM af{i} CROSS JOIN an{i}),
    hr{i} AS (
      SELECT e.u AS node, SUM(a.auth_f) AS raw
      FROM e JOIN aa{i} a ON a.node = e.v GROUP BY e.u),
    hf{i} AS (SELECT n.node, CAST(COALESCE(raw, 0) AS BIGINT) AS f
              FROM nodes n LEFT JOIN hr{i} USING (node)),
    hn{i} AS (SELECT sqrt(CAST(SUM(CAST(f AS HUGEINT) * f) AS DOUBLE)) AS nr
              FROM hf{i}),
    hh{i} AS MATERIALIZED (SELECT node,
                     CASE WHEN nr > 0
                          THEN CAST(ROUND(CAST(f AS DOUBLE) / nr * {scale}.0) AS BIGINT)
                          ELSE 0 END AS hub_f
              FROM hf{i} CROSS JOIN hn{i}),
    s{i} AS MATERIALIZED (SELECT h.node, h.hub_f, a.auth_f
             FROM hh{i} h JOIN aa{i} a USING (node))""")
    chain = ",\n    ".join(steps)
    return f"""
    WITH {SQL_EDGES_CTE},
    {chain}
    SELECT node, hub_f, auth_f,
           CAST(hub_f AS DOUBLE) / {scale}.0 AS hub,
           CAST(auth_f AS DOUBLE) / {scale}.0 AS authority
    FROM s{iters} ORDER BY node
    """


@query("q_graph_hits", _hits_oracle())
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities, 3 rounds, hash-gated (gelly HITS):
    the canonical u->v co-occurrence edges taken as a directed graph;
    fixed-point half-step sums + exact-integer norms make the full
    iterative computation engine-exact (operators/iterate.hits)."""
    from reshape_on_flink_spark.operators.iterate import hits

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return hits(edges, iters=3, src="u", dst="v").orderBy("node")


def _kcore_oracle(k: int = 2, rounds: int = 6) -> str:
    """Unrolled peeling replica. Peeling is monotone and idempotent at
    the fixed point, so ``rounds`` >= the fixture's peel depth (3 at
    sf0.01, 1 at sf0.1, measured) makes the bounded unroll EXACT — extra
    rounds are no-ops, not approximation error."""
    steps = ["p0 AS MATERIALIZED (SELECT u, v FROM e)"]
    for i in range(1, rounds + 1):
        steps.append(f"""k{i} AS MATERIALIZED (
      SELECT node FROM (SELECT node, COUNT(*) AS c FROM
        (SELECT u AS node FROM p{i - 1} UNION ALL SELECT v FROM p{i - 1})
        GROUP BY node) WHERE c >= {k}),
    p{i} AS MATERIALIZED (
      SELECT u, v FROM p{i - 1}
      WHERE u IN (SELECT node FROM k{i}) AND v IN (SELECT node FROM k{i}))""")
    chain = ",\n    ".join(steps)
    return f"""
    WITH {SQL_EDGES_CTE},
    {chain}
    SELECT node, COUNT(*) AS core_degree
    FROM (SELECT u AS node FROM p{rounds} UNION ALL SELECT v FROM p{rounds})
    GROUP BY node ORDER BY node
    """


@query("q_graph_kcore", _kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core membership with in-core degrees: iterative peeling run to
    the fixed point (operators/iterate.kcore_subgraph), hash-gated
    against a bounded unrolled peel (exact by idempotence)."""
    from reshape_on_flink_spark.operators.iterate import kcore_subgraph

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    core = kcore_subgraph(edges, k=2, src="u", dst="v")
    return (
        core.select(F.col("u").alias("node"))
        .union(core.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_degree"))
        .orderBy("node")
    )


def _coreness_oracle(rounds: int = 24) -> str:
    """Unrolled h-index iteration. Monotone non-increasing + idempotent
    at the fixed point (= the coreness), so ``rounds`` >= the fixture's
    convergence depth (7 at sf0.01, 21 at sf0.1, measured) is exact."""
    steps = [
        """sym2 AS MATERIALIZED (
      SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
    s0 AS MATERIALIZED (SELECT node, COUNT(*) AS val FROM sym2 GROUP BY node)"""
    ]
    for i in range(1, rounds + 1):
        steps.append(f"""s{i} AS MATERIALIZED (
      SELECT node, MAX(LEAST(rn, val)) AS val FROM (
        SELECT s.node, c.val,
               ROW_NUMBER() OVER (PARTITION BY s.node ORDER BY c.val DESC) AS rn
        FROM sym2 s JOIN s{i - 1} c ON c.node = s.nbr)
      GROUP BY node)""")
    chain = ",\n    ".join(steps)
    return f"""
    WITH {SQL_EDGES_CTE},
    {chain}
    SELECT node, val AS coreness FROM s{rounds} ORDER BY node
    """


@query("q_graph_coreness", _coreness_oracle())
def q_graph_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-core decomposition — every vertex's coreness — via the
    h-index fixed point (operators/iterate.coreness). Integer-exact, so
    the entire iterative computation is value-hash-gated."""
    from reshape_on_flink_spark.operators.iterate import coreness

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return coreness(edges, src="u", dst="v").orderBy("node")


@query(
    "q_graph_metrics",
    f"""
    WITH {SQL_EDGES_CTE},
    deg AS (SELECT node, COUNT(*) AS d FROM
            (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node)
    SELECT COUNT(*) AS vertex_count,
           CAST(SUM(d) / 2 AS BIGINT) AS edge_count,
           CAST(SUM(d) AS DOUBLE) / COUNT(*) AS avg_degree,
           CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS triplet_count,
           MAX(d) AS max_degree,
           CAST(MAX(d * (d - 1) / 2) AS BIGINT) AS max_triplets,
           CAST(SUM(d) AS DOUBLE) / (COUNT(*) * (COUNT(*) - 1)) AS density
    FROM deg
    """,
)
def q_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-graph metrics (gelly VertexMetrics): one row, exact
    integers + two IEEE divisions, hash-gated."""
    from reshape_on_flink_spark.operators.iterate import graph_metrics

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return graph_metrics(edges, src="u", dst="v")


@query(
    "q_graph_summarize",
    f"""
    WITH {SQL_EDGES_CTE},
    verts AS (SELECT DISTINCT node, node % 7 AS grp FROM
              (SELECT u AS node FROM e UNION SELECT v FROM e)),
    sv AS (SELECT grp, MIN(node) AS repr_id, COUNT(*) AS n_members
           FROM verts GROUP BY grp),
    se AS (
      SELECT a.grp AS src_value, b.grp AS dst_value, COUNT(*) AS n_edges
      FROM e JOIN verts a ON a.node = e.u JOIN verts b ON b.node = e.v
      GROUP BY a.grp, b.grp)
    SELECT se.src_value, se.dst_value, se.n_edges,
           s1.repr_id AS src_repr, s1.n_members AS src_members,
           s2.repr_id AS dst_repr, s2.n_members AS dst_members
    FROM se JOIN sv s1 ON s1.grp = se.src_value
            JOIN sv s2 ON s2.grp = se.dst_value
    ORDER BY se.src_value, se.dst_value
    """,
)
def q_graph_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph summarization (gelly Summarization.java): vertices grouped
    by a derived segment value (id mod 7), super-edges with edge counts,
    super-vertices with representative id + member count."""
    from reshape_on_flink_spark.operators.iterate import summarize_graph

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    verts = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("value", F.col("node") % 7)
    )
    sv, se = summarize_graph(verts, edges, src="u", dst="v")
    return (
        se.join(
            sv.select(
                F.col("group_value").alias("src_value"),
                F.col("repr_id").alias("src_repr"),
                F.col("n_members").alias("src_members"),
            ),
            "src_value",
        )
        .join(
            sv.select(
                F.col("group_value").alias("dst_value"),
                F.col("repr_id").alias("dst_repr"),
                F.col("n_members").alias("dst_members"),
            ),
            "dst_value",
        )
        .select(
            "src_value", "dst_value", "n_edges",
            "src_repr", "src_members", "dst_repr", "dst_members",
        )
        .orderBy("src_value", "dst_value")
    )


# Scatter-gather (Pregel) facade: SSSP expressed as min-distance message
# passing must reach the identical fixed point as the dedicated operator
# — same recursive-CTE oracle as q_graph_sssp, so the iteration model
# itself is value-hash-gated.
@query(
    "q_graph_pregel",
    f"""
    WITH RECURSIVE {SQL_EDGES_CTE},
    sym AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
    walk(node, dist) AS (
      SELECT u, 0 FROM (SELECT MIN(u) AS u FROM e) WHERE u IS NOT NULL
      UNION
      SELECT s.nbr, w.dist + 1
      FROM walk w JOIN sym s ON s.node = w.node
      WHERE w.dist < 20
    )
    SELECT node, CAST(MIN(dist) AS DOUBLE) AS dist
    FROM walk GROUP BY node ORDER BY node
    """,
)
def q_graph_pregel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-count SSSP via the gelly iteration-model facade
    (operators/iterate.scatter_gather = ScatterGatherIteration /
    VertexCentricIteration): scatter dist+1 along edges, gather min,
    update least — unreachable vertices filtered like the operator."""
    from reshape_on_flink_spark.operators.iterate import scatter_gather

    events = load_tables(spark, sf_dir)["events"]
    e = cooccurrence_edges(events)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nodes = sym.select(F.col("u").alias("node")).distinct()
    source = e.agg(F.min("u")).collect()[0][0]
    inf = float("inf")
    verts = nodes.withColumn(
        "value",
        F.when(F.col("node") == F.lit(source), 0.0).otherwise(F.lit(inf)),
    )
    out = scatter_gather(
        verts, sym,
        message=F.col("value") + 1.0,
        combine=F.min,
        update=lambda old, msg: F.least(old, F.coalesce(msg, old)),
        max_iters=20,
        src="u", dst="v",
    )
    return (
        out.where(F.col("value") != F.lit(inf))
        .select("node", F.col("value").alias("dist"))
        .orderBy("node")
    )


def _community_oracle(rounds: int = 3, delta: float = 0.5, scale: int = 1_000_000) -> str:
    """Unrolled fixed-point replica of operators/iterate.
    community_detection (gelly CommunityDetection.java): summed-score
    label pick (smallest label on ties = the reference TreeMap order),
    re-score to the label's highest single message, hop attenuation
    round(delta/superstep * scale) on label change — all integer."""
    steps = [
        f"""sym3 AS MATERIALIZED (
      SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
    s0 AS MATERIALIZED (
      SELECT node, node AS label, CAST({scale} AS BIGINT) AS score_f
      FROM (SELECT DISTINCT u AS node FROM e UNION SELECT v FROM e))"""
    ]
    for i in range(1, rounds + 1):
        att = int(round(delta / i * scale))
        steps.append(f"""m{i} AS (
      SELECT s.node, l.label, l.score_f
      FROM sym3 s JOIN s{i - 1} l ON l.node = s.nbr),
    p{i} AS (
      SELECT node, label, SUM(score_f) AS tot, MAX(score_f) AS hi
      FROM m{i} GROUP BY node, label),
    k{i} AS (
      SELECT node, label, hi FROM (
        SELECT node, label, hi,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY tot DESC, label ASC) AS rn
        FROM p{i}) WHERE rn = 1),
    s{i} AS MATERIALIZED (
      SELECT o.node,
             COALESCE(k.label, o.label) AS label,
             CAST(CASE WHEN k.label IS NULL THEN o.score_f
                  ELSE k.hi - CASE WHEN k.label <> o.label
                                   THEN {att} ELSE 0 END
                  END AS BIGINT) AS score_f
      FROM s{i - 1} o LEFT JOIN k{i} k USING (node))""")
    chain = ",\n    ".join(steps)
    return f"""
    WITH {SQL_EDGES_CTE},
    {chain}
    SELECT node, label FROM s{rounds} ORDER BY node
    """


@query("q_graph_community", _community_oracle())
def q_graph_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-attenuated community detection, 3 supersteps, hash-gated
    (gelly CommunityDetection; fixed-point scores make the float
    algorithm engine-exact — the pagerank_fixed/HITS device)."""
    from reshape_on_flink_spark.operators.iterate import community_detection

    events = load_tables(spark, sf_dir)["events"]
    edges = cooccurrence_edges(events)
    return community_detection(edges, rounds=3, src="u", dst="v").orderBy("node")


@query(
    "q_graph_bipartite_projection",
    """
    WITH be AS MATERIALIZED (
      SELECT DISTINCT user_id AS top_v,
             date_trunc('hour', ts) AS bot_v
      FROM events WHERE event_type = 'purchase')
    SELECT a.top_v AS u, b.top_v AS v, COUNT(*) AS n_shared
    FROM be a JOIN be b ON a.bot_v = b.bot_v AND a.top_v < b.top_v
    GROUP BY a.top_v, b.top_v
    ORDER BY u, v
    """,
)
def q_graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top projection of the user/purchase-hour bipartite graph (gelly
    BipartiteGraph.projectionTopSimple with shared-neighbor counts):
    users connected by purchasing in the same hour."""
    from reshape_on_flink_spark.operators.iterate import bipartite_projection

    events = load_tables(spark, sf_dir)["events"]
    be = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("top"),
        F.date_trunc("hour", "ts").alias("bottom"),
    )
    return bipartite_projection(be, side="top").orderBy("u", "v")
