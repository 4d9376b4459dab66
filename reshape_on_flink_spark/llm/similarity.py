"""Embedding similarity search: brute-force top-k and LSH-bucketed ANN.

100 TB design notes
-------------------
- **brute_force_topk** is exact: queries × corpus. It is the right tool
  when |queries| is small — the query side is broadcast, the corpus is
  scanned once, and the per-partition top-k (WindowGroupLimit) keeps the
  shuffle at k·|queries| rows. Cost is O(|corpus|·|queries|·dim) FLOPs,
  linear in corpus size for fixed queries.
- **random-hyperplane LSH** is the scale path for all-pairs / large query
  sets: 1 narrow map to compute the bucket key, 1 equi-join on buckets.
  Hyperplanes are seeded (numpy PCG64) and embedded as literals so the
  plan is deterministic and needs no broadcast variable.
- The dot-product kernel is `zip_with` + `aggregate` — pure Catalyst
  expressions, JVM-codegen'd, no Python. (A pandas-UDF matmul variant
  would batch better for dim >> 64; at dim 64 the expression kernel wins
  by skipping Arrow transfer entirely.)
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    """Exact left-fold dot product in DOUBLE (same fold order as the SQL
    oracle's list_sum/list_transform, so results are bit-identical)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (query_id, rank, neighbor_id, cos_sim); self-matches excluded;
    ties broken by neighbor id.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("qvec", "cvec").alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def brute_force_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via a vectorized numpy matmul kernel.

    Same contract as :func:`brute_force_topk` (query_id, rank,
    neighbor_id, cos_sim), but the scoring runs as one BLAS GEMM per
    Arrow batch instead of per-row Catalyst expressions — ~10-100×
    faster at dim >= 256 where FLOPs dominate and Arrow transfer
    amortizes. The small query side is collected and closure-captured
    (the same "queries fit in memory" contract the broadcast variant
    has); each corpus partition emits only its local top-k candidates
    per query, so the final shuffle carries k·|queries| rows per
    partition, then a window takes the global top-k.

    Float caveat: GEMM accumulation order differs from the left-fold
    expression kernel, so cos_sim can differ at ~1e-15 relative —
    results are NOT hash-identical to the oracle (tolerance-tested in
    tests/test_llm.py instead of the value-hash gate).
    """
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-300)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-300)
            sims = cn @ qn.T  # |corpus batch| × |queries|
            m = min(k + 1, sims.shape[0])  # +1 headroom for a self-match
            top = np.argpartition(-sims, m - 1, axis=0)[:m]
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                for i in top[:, j]:
                    if ids[i] != qid:
                        out_q.append(qid)
                        out_n.append(ids[i])
                        out_s.append(sims[i, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes for sign-LSH (deterministic across runs)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: str | Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) > 0."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, lit_plane) > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def _bucket_array(vec_col: str, n_tables: int, n_planes: int, dim: int, seed: int) -> Column:
    """Array of (table, bucket) structs — one sign-LSH bucket per table,
    each table seeded independently."""
    entries = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + t)
        entries.append(
            F.struct(F.lit(t).alias("table"), lsh_bucket(vec_col, planes).alias("bucket"))
        )
    return F.array(*entries)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH.

    Candidates = pairs sharing a bucket in ANY of ``n_tables`` independent
    hash tables (recall compounds: miss prob ≈ (1 - p^planes)^tables);
    then exact cosine re-rank within candidates. Physically: one narrow
    map to compute bucket arrays, explode (×tables), one equi-join on
    (table, bucket), distinct, re-rank — the all-pairs shuffle never
    happens. Tuning: more tables -> recall, more planes -> precision
    (smaller buckets). Recall vs brute_force_topk is asserted in
    tests/test_llm.py."""
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cvec"),
            F.explode(_bucket_array(vec_col, n_tables, n_planes, dim, seed)).alias("tb"),
        )
        .select("neighbor_id", "cvec", "tb.table", "tb.bucket")
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(_bucket_array(vec_col, n_tables, n_planes, dim, seed)).alias("tb"),
        )
        .select("query_id", "qvec", "tb.table", "tb.bucket")
    )
    cand = (
        q.join(c, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select("query_id", "neighbor_id", cosine("qvec", "cvec").alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def ivf_centroids(dim: int, n_cells: int, seed: int = 7) -> list[list[float]]:
    """Seeded random unit centroids for IVF coarse quantization.

    Production IVF trains centroids with k-means; means of floats are
    partition-order-dependent, which would break the bit-exact oracle
    contract, so the engine ships the (well-studied) random-centroid
    variant: assignment quality is lower per cell, compensated by nprobe.
    Swap in offline-trained centroid literals for a real deployment —
    the plan shape (assign -> cell equi-join -> re-rank) is identical."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_cells, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def _lit_2d(rows) -> Column:
    """2-D DOUBLE array literal in ONE py4j call. PySpark's ``lit()`` on
    a nested list recurses into one ``lit()`` per scalar — a cProfile of
    ``pq_encode`` showed ~7k py4j round trips, ~2 s of driver wall per
    plan BUILD (guide §7.3: driver-side single-threaded cost). A SQL
    literal string parses JVM-side instead. Bit-exactness: ``repr()``
    emits the shortest decimal that round-trips to the same IEEE-754
    double and ``Double.parseDouble`` returns the nearest double, so the
    parsed array is bit-identical to the lit() form. Non-finite values
    are rejected loudly: ``repr(inf)`` would render as a bare ``inf``
    token, which the SQL parser reads as an (unresolvable) column
    reference — codebooks/centroids are finite by construction, so a
    non-finite here is an upstream bug, not a value to encode."""

    return F.expr(_sql_2d(rows))


def _sql_d(x: float) -> str:
    if not math.isfinite(x):
        raise ValueError(f"_sql_d: non-finite codebook value {x!r}")
    return f"CAST({x!r} AS DOUBLE)"


def _sql_2d(rows) -> str:
    """SQL text of a 2-D DOUBLE array literal (see _lit_2d)."""
    return (
        "array("
        + ",".join("array(" + ",".join(_sql_d(x) for x in row) + ")" for row in rows)
        + ")"
    )


def _lit_1d_long(vals) -> Column:
    """1-D BIGINT array literal in ONE py4j call (see _lit_2d)."""
    return F.expr(_sql_1d_long(vals))


def _sql_1d_long(vals) -> str:
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _cell_of(vec_col: str | Column, centroids: list[list[float]]) -> Column:
    """Nearest cell id — defined as probe_cells(...)[0] so corpus
    assignment and query probing share one ordering spec (desc dot,
    desc cell on float ties)."""
    return F.element_at(_probe_cells(vec_col, centroids, 1), 1)


def _probe_cells(vec_col: str | Column, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the nprobe nearest cell ids (by centroid dot product).
    The centroid table enters the plan as ONE 2-D array literal scanned
    by transform() — not one Column per centroid (see pq_encode on why:
    identical arithmetic, ~n_cells·dim fewer py4j/tree nodes)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    pairs = F.transform(
        _lit_2d([float(x) for x in cen] for cen in centroids),
        lambda cen, i: F.struct(dot(v, cen).alias("d"), i.alias("cell")),
    )
    ordered = F.reverse(F.array_sort(pairs))  # by d desc, cell desc tiebreak
    return F.slice(ordered, 1, nprobe).getField("cell")


def kmeans_train(
    corpus: DataFrame,
    n_cells: int,
    dim: int,
    n_iters: int = 5,
    seed: int = 7,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's-style training for IVF coarse quantizers,
    deterministic by construction (median update rule).

    Each iteration is one narrow map (cell assignment via centroid
    literals) + one hash agg: vectors posexplode to (cell, pos, val) and
    take the exact MEDIAN per (cell, pos) — the shuffle carries
    n_cells x dim grouped partials, and the driver collects exactly
    n_cells x dim doubles per round. At 100 TB you train on a sample
    (corpus.sample) with the identical loop; assignment of the full
    corpus happens once afterwards inside ann_ivf_trained_topk.

    Determinism contract (what restores the cross-engine hash gate):
    a float MEAN is partition-order-dependent, so trained centroids
    weren't bit-stable across engines or runs. The median involves no
    float reduction at all — both engines sort the identical doubles and
    pick (or average two of) them — and the re-normalized coordinates
    are quantized to 1e-6, absorbing last-ulp drift in the norm's
    64-term sum. The spherical k-medians update is a well-known robust
    variant; recall-vs-seeded tests hold as for means.

    Empty cells keep their previous centroid. Centroids are
    re-normalized each round (spherical — matches the cosine metric IVF
    probes with), then rounded to 1e-6.
    """
    cents = ivf_centroids(dim, n_cells, seed)
    for _ in range(n_iters):
        # two selects: a multi-name generator alias (posexplode) in the
        # same projection as the struct-sort expression of _cell_of
        # makes Spark lose the struct field names
        assigned = corpus.select(
            _cell_of(vec_col, cents).alias("cell"), F.col(vec_col).alias("v")
        ).select("cell", F.posexplode("v").alias("pos", "val"))
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.median("val").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        seen: set[int] = set()
        for r in rows:
            new[r["cell"]][r["pos"]] = r["m"]
            seen.add(r["cell"])
        arr = np.asarray(new)
        norms = np.linalg.norm(arr, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        arr = np.round(arr / norms, 6)
        cents = [
            arr[i].tolist() if i in seen else cents[i] for i in range(n_cells)
        ]
    return cents


def inertia(corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> float:
    """Mean assignment dissimilarity (1 - cosine to own centroid) —
    the training-progress metric for spherical k-means."""
    cents = centroids
    best_dot = F.greatest(
        *[dot(vec_col, F.array(*[F.lit(float(x)) for x in c])) for c in cents]
    )
    sim = best_dot / F.greatest(norm(vec_col), F.lit(1e-12))
    return float(
        corpus.select(F.avg(F.lit(1.0) - sim).alias("j")).collect()[0]["j"]
    )


def ann_ivf_trained_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    seed: int = 7,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with k-means-trained centroids: same plan shape as
    ann_ivf_topk (assign -> cell equi-join -> exact re-rank), but the
    quantizer is trained with kmeans_train first — higher recall per
    probed cell. Training cost is n_iters small jobs; the serving plan
    is unchanged, so all scale arguments of ann_ivf_topk carry over."""
    cents = kmeans_train(corpus, n_cells, dim, n_iters=n_iters, seed=seed, vec_col=vec_col)
    return _ivf_topk_with_centroids(corpus, queries, cents, k, nprobe, id_col, vec_col)


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: corpus rows live in their nearest centroid's cell;
    each query probes its ``nprobe`` nearest cells; exact cosine re-rank
    within the probed candidates.

    Physically: corpus gets ONE narrow map (cell assignment) and the
    candidate set is an equi-join on cell id — at 100 TB the corpus scan
    partitions by cell (write bucketed-by-cell parquet to make the probe
    a partition-pruned read), and the shuffle carries |corpus|·(hit
    cells/n_cells) rows instead of |corpus|·|queries|."""
    cents = ivf_centroids(dim, n_cells, seed)
    return _ivf_topk_with_centroids(corpus, queries, cents, k, nprobe, id_col, vec_col)


def _ivf_topk_with_centroids(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _cell_of(vec_col, cents).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(_probe_cells(vec_col, cents, nprobe)).alias("cell"),
    )
    cand = (
        q.join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
    )
    scored = cand.select("query_id", "neighbor_id", cosine("qvec", "cvec").alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def quantize_embeddings(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector int8 scalar quantization (the storage/compression path
    of an ANN index: 4x smaller than float32, dot products on int8).

    ``scale = max(|v|)/127`` per vector; ``q_i = round(v_i / scale)`` in
    [-127, 127]. Adds ``scale`` (DOUBLE) and ``q`` (array<int>). Pure
    expressions — map-only, no shuffle, codegen'd; reconstruction is
    ``q_i * scale``.

    Determinism: both engines compute the same double divisions and
    round half-away-from-zero, so the oracle reproduces q bit-exactly.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = emb.withColumn("_v", v).withColumn(
        "scale",
        F.greatest(
            F.array_max(F.transform(F.col("_v"), F.abs)) / F.lit(127.0),
            F.lit(1e-12),
        ),
    )
    return out.withColumn(
        "q", F.transform(F.col("_v"), lambda x: F.round(x / F.col("scale")).cast("int"))
    ).drop("_v")


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over the int8-quantized index (search on the
    compressed representation): corpus vectors are reduced to
    (scale, int8 codes) — 4x less data scanned per query — and scored
    as reconstructed doubles (``code * scale``). Same contract as
    :func:`brute_force_topk`; recall vs the exact search is ~1.0 (int8
    reconstruction perturbs cosines by <1%), pinned by
    ``test_quantized_topk_recall``.

    100 TB: the quantized index is the stored artifact; the scan reads
    int8 codes instead of float32, and the per-partition top-k shape is
    identical to the exact path.
    """
    qz = quantize_embeddings(corpus, vec_col=vec_col, id_col=id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.transform("q", lambda x: x.cast("double") * F.col("scale")).alias("cvec"),
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(qz)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("qvec", "cvec").alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third ANN index family beside sign-LSH
# and IVF: vectors compress to m sub-space codes (here 8 codes over a
# 64-dim vector = 8 bytes vs 256), and queries score candidates from a
# per-query lookup table without touching raw vectors.
# ---------------------------------------------------------------------------

#: fixed-point scale for PQ partial dots / norms: per-subspace doubles
#: are quantized to 1e-9 BIGINTs before the cross-subspace sum, which
#: makes the (order-free) integer sum bit-identical across engines.
PQ_SCALE = 1_000_000_000


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Sample-initialized codebooks: subvector s of the ``k_codes``
    lowest-id corpus rows is codeword (s, code). Deterministic and
    data-adaptive (sampling init is standard PQ practice; k-means
    refinement would break the float-reduction determinism contract —
    see kmeans_train — and sampling already matches the fixture's
    distribution). Returns books[s][code] = list of dim/m floats.

    Ids need not be dense or zero-based: the sample is the ``k_codes``
    lowest ids whatever their values (hashes, UUIDs-as-longs, offsets).
    A corpus smaller than ``k_codes`` is a loud error — a short/empty
    codebook would otherwise surface as an opaque index-out-of-range
    far downstream in pq_encode."""
    d_sub = dim // m
    rows = (
        corpus.orderBy(id_col)
        .select(vec_col)
        .limit(k_codes)
        .collect()
    )
    if len(rows) < k_codes:
        raise ValueError(
            f"pq_codebooks: corpus has {len(rows)} rows but k_codes="
            f"{k_codes}; PQ needs at least k_codes vectors to sample"
        )
    return [
        [[float(r[0][s * d_sub + j]) for j in range(d_sub)] for r in rows]
        for s in range(m)
    ]


def pq_codebooks_trained(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """K-medians-refined PQ codebooks: sample-init (pq_codebooks), then
    ``n_iters`` rounds of (assign each subvector to its nearest codeword,
    replace each codeword with the per-coordinate exact MEDIAN of its
    assigned subvectors, quantize to 1e-6).  The same determinism
    contract as kmeans_train: the median involves no partition-order-
    dependent float reduction, so trained books are bit-stable across
    runs and engines and the downstream search stays hash-gated.

    One job per round: every row explodes to m (subspace, code, coord,
    val) quads via a single array-of-structs literal plan (no self-join
    with the encode output), one hash agg computes the m x k_codes x
    d_sub medians, and the driver collects exactly that many doubles
    (1024 at the defaults) — bounded regardless of corpus size.  At
    100 TB train on corpus.sample(...) with the identical loop; serving
    (pq_encode / pq_topk) is unchanged.

    Empty codes keep their previous codeword (standard k-means practice,
    same rule as kmeans_train)."""
    d_sub = dim // m
    books = pq_codebooks(corpus, m, k_codes, dim, id_col, vec_col)
    for _ in range(n_iters):
        quads = F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    F.expr(_code_of_sql(vec_col, books[s], s, d_sub)).alias("code"),
                    _sub_slice(vec_col, s, d_sub).alias("sv"),
                )
                for s in range(m)
            ]
        )
        rows = (
            corpus.select(F.explode(quads).alias("a"))
            .select("a.s", "a.code", F.posexplode("a.sv").alias("pos", "val"))
            .groupBy("s", "code", "pos")
            .agg(F.median("val").alias("med"))
            .collect()
        )
        new = [[list(cw) for cw in book] for book in books]
        for r in rows:
            new[r["s"]][r["code"]][r["pos"]] = float(np.round(r["med"], 6))
        books = new
    return books


def _sub_slice(vec_col: str, s: int, d_sub: int) -> Column:
    return F.slice(F.col(vec_col), s * d_sub + 1, d_sub)


def _fold_l2(sub: Column, cw: Column) -> Column:
    """Σ (sub_j - cw_j)² — elementwise zip then left fold, double math."""
    diff2 = F.zip_with(
        sub, cw, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
    )
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def _fold_dot(sub: Column, cw: Column) -> Column:
    prods = F.zip_with(sub, cw, lambda a, b: a.cast("double") * b)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


# --- SQL-string compiles of the PQ per-subspace expressions -------------
#
# Each lambda-form builder above (`F.transform(..., lambda ...)` wrapping
# `_fold_l2` / `_fold_dot`) costs tens of py4j round trips PER CALL while
# the plan is built — ~1 s of single-threaded driver wall across the
# m-subspace loops of pq_encode/pq_topk (guide §7.3, same finding as
# _lit_2d). The functions below emit the IDENTICAL Catalyst tree as one
# SQL string parsed JVM-side: same zip_with/aggregate fold order, same
# double casts, `0.0D` parses to the same DoubleType literal as
# F.lit(0.0), int literals stay IntegerType, and named_struct/array_sort/
# element_at map 1:1 onto the Column-API nodes — so the arithmetic is
# bit-identical (the oracle hash gate on the similarity family is the
# proof). Keep the Column forms above: they document the semantics and
# serve the non-PQ callers.


def _sub_slice_sql(vec_col: str, s: int, d_sub: int) -> str:
    return f"slice(`{vec_col}`, {s * d_sub + 1}, {d_sub})"


def _code_of_sql(vec_col: str, book: list[list[float]], s: int, d_sub: int) -> str:
    """SQL text of pq_encode's per-subspace nearest-codeword id:
    element_at(array_sort(transform(B, (cw,i) -> struct(L2, i))), 1).code
    with L2 = aggregate(zip_with(sub, cw, (a,b)->(a-b)^2), 0.0, +)."""
    sub = _sub_slice_sql(vec_col, s, d_sub)
    l2 = (
        f"aggregate(zip_with({sub}, cw, (a, b) -> "
        "(CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), 0.0D, "
        "(acc, x) -> acc + x)"
    )
    return (
        f"element_at(array_sort(transform({_sql_2d(book)}, "
        f"(cw, i) -> named_struct('d', {l2}, 'code', i))), 1).code"
    )


def _lut_of_sql(vec_col: str, book: list[list[float]], s: int, d_sub: int) -> str:
    """SQL text of pq_topk's per-subspace fixed-point LUT:
    transform(B, cw -> CAST(round(dot(sub, cw) * PQ_SCALE) AS BIGINT))."""
    sub = _sub_slice_sql(vec_col, s, d_sub)
    dot_ = (
        f"aggregate(zip_with({sub}, cw, (a, b) -> CAST(a AS DOUBLE) * b), "
        "0.0D, (acc, x) -> acc + x)"
    )
    return (
        f"transform({_sql_2d(book)}, "
        f"cw -> CAST(round({dot_} * {PQ_SCALE}) AS BIGINT))"
    )


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[Column, ...] = (),
) -> DataFrame:
    """(neighbor_id, c0..c{m-1}): per-subspace nearest-codeword ids
    (argmin L2, code-asc tie-break via the struct sort). Map-only
    expressions — the encode stage fuses into the scan; the emitted
    codes are the stored index (m ints per vector).

    Each subspace's codebook enters the plan as ONE 2-D array literal
    scanned by transform() — not one Column per codeword. The per-
    codeword formulation built m·k_codes·d_sub literal nodes (thousands
    of py4j calls to construct, a giant tree for every Catalyst pass);
    this form is ~100× smaller to build and plan with byte-identical
    arithmetic (same zip/fold order)."""
    m = len(books)
    d_sub = len(books[0][0])  # noqa: F841  (shape doc; slices derive from it)

    # one JVM-side expr() parse per subspace instead of a lambda tree
    # built node-by-node over py4j (see _code_of_sql)
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        *extra_cols,
        *[
            F.expr(_code_of_sql(vec_col, books[s], s, d_sub)).alias(f"c{s}")
            for s in range(m)
        ],
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance PQ search: corpus rows are scored from their
    codes alone via per-query lookup tables (dot(q_sub, codeword) per
    subspace), cos ≈ Σ_s LUT_s[code_s] / (|q|·|reconstruction|).

    100 TB: the candidate scan reads m ints per vector (the compressed
    index) instead of the float array — the same broadcast-queries /
    per-partition-top-k shape as quantized_topk, with 8x less data
    motion than int8 and 32x less than float32. Cross-subspace sums run
    on 1e-9 fixed-point BIGINTs (exact, order-free), so the whole
    pipeline is hash-gated against a DuckDB replica.
    """
    import math

    if books is None:
        books = pq_codebooks(corpus, m, k_codes, dim, id_col, vec_col)
    d_sub = dim // m
    enc = pq_encode(corpus, books, id_col, vec_col)
    # reconstruction norm^2 per row: literal lookup of per-codeword
    # norms (fixed-point), exact integer sum across subspaces. One array
    # literal per subspace (see pq_encode on why not per-codeword nodes).
    n2_sql = [
        _sql_1d_long(
            int(math.floor(sum(x * x for x in books[s][c]) * PQ_SCALE + 0.5))
            for c in range(k_codes)
        )
        for s in range(m)
    ]
    recon2f = F.expr(
        "CAST(0 AS BIGINT)"
        + "".join(f" + element_at({n2_sql[s]}, (`c{s}` + 1))" for s in range(m))
    )
    enc = enc.withColumn("_r2f", recon2f)

    qlut = [
        F.expr(_lut_of_sql(vec_col, books[s], s, d_sub)).alias(f"ql{s}")
        for s in range(m)
    ]
    q = queries.select(
        F.col(id_col).alias("query_id"), norm(vec_col).alias("_qn"), *qlut
    )
    adf = F.expr(
        "CAST(0 AS BIGINT)"
        + "".join(f" + element_at(`ql{s}`, (`c{s}` + 1))" for s in range(m))
    )
    cos_pq = (adf.cast("double") / F.lit(float(PQ_SCALE))) / (
        F.col("_qn")
        * F.sqrt(F.greatest(F.col("_r2f").cast("double") / F.lit(float(PQ_SCALE)), F.lit(1e-12)))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(enc)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos_pq.alias("cos_pq"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_pq"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_pq", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_pq")
    )


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The PQ serving shape: codes-only asymmetric scoring produces a
    ``shortlist`` per query, then ONLY those candidates join back to
    their raw vectors for an exact cosine re-rank — PQ is the candidate
    generator, exactness comes from the re-rank (IVF-PQ style). Data
    motion: the full scan touches m ints per vector; raw vectors move
    for |queries|·shortlist rows only. Recall@k is pinned in
    tests/test_llm.py (shortlist-50 recovers ~0.9 of true top-5 on the
    fixture, vs ~0.3 for raw PQ ranking)."""
    cand = pq_topk(
        corpus, queries, k=shortlist, m=m, k_codes=k_codes, dim=dim,
        id_col=id_col, vec_col=vec_col, books=books,
    ).select("query_id", "neighbor_id")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cosine("qvec", "cvec").alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    shortlist: int = 50,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the production ANN index layout — coarse cells prune the
    scan, PQ codes score the survivors from the compressed index, exact
    cosine re-ranks the shortlist. Composes this module's IVF
    (cell assignment / nprobe probing) and PQ (codebooks, asymmetric
    LUT scoring) stages end to end.

    100 TB data motion: the index is (cell, m code-ints) per vector;
    search touches nprobe/n_cells of it via a cell equi-join (never a
    cross join), scores from codes alone, and moves raw vectors only
    for |queries|·shortlist re-rank rows. Every stage is deterministic
    (seeded centroids, sample-init codebooks, fixed-point LUT sums),
    so the full pipeline is hash-gated against a DuckDB replica.
    """
    import math

    cents = ivf_centroids(dim, n_cells, seed)
    books = pq_codebooks(corpus, m, k_codes, dim, id_col, vec_col)
    d_sub = dim // m
    enc = pq_encode(
        corpus, books, id_col, vec_col,
        extra_cols=(_cell_of(vec_col, cents).alias("cell"),),
    )
    n2_sql = [
        _sql_1d_long(
            int(math.floor(sum(x * x for x in books[s][c]) * PQ_SCALE + 0.5))
            for c in range(k_codes)
        )
        for s in range(m)
    ]
    recon2f = F.expr(
        "CAST(0 AS BIGINT)"
        + "".join(f" + element_at({n2_sql[s]}, (`c{s}` + 1))" for s in range(m))
    )
    enc = enc.withColumn("_r2f", recon2f)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        norm(vec_col).alias("_qn"),
        F.col(vec_col).alias("qvec"),
        *[
            F.expr(_lut_of_sql(vec_col, books[s], s, d_sub)).alias(f"ql{s}")
            for s in range(m)
        ],
        F.explode(_probe_cells(vec_col, cents, nprobe)).alias("cell"),
    )
    adf = F.expr(
        "CAST(0 AS BIGINT)"
        + "".join(f" + element_at(`ql{s}`, (`c{s}` + 1))" for s in range(m))
    )
    cos_pq = (adf.cast("double") / F.lit(float(PQ_SCALE))) / (
        F.col("_qn")
        * F.sqrt(F.greatest(F.col("_r2f").cast("double") / F.lit(float(PQ_SCALE)), F.lit(1e-12)))
    )
    scored = (
        F.broadcast(q)
        .join(enc, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos_pq.alias("cos_pq"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_pq"), F.asc("neighbor_id"))
    cand = (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    qraw = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    craw = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    rescored = (
        cand.join(F.broadcast(qraw), "query_id")
        .join(craw, "neighbor_id")
        .select("query_id", "neighbor_id", cosine("qvec", "cvec").alias("cos_sim"))
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rescored.select(
            "query_id", "neighbor_id", "cos_sim", F.row_number().over(w2).alias("rank")
        )
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    dup_threshold: float = 0.95,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k highest-cosine neighbors whose similarity is BELOW the
    near-duplicate threshold — similar enough to be hard, not so
    similar they are actually positives (the standard dense-retrieval
    negative-mining recipe; pairs with llm/pack.contrastive_pairs,
    whose ring negatives this upgrades).

    Exact baseline (broadcast queries x corpus scan, the
    brute_force_topk shape). Scale path: run the IVF/PQ shortlist first
    (ann_ivf_topk / pq re-rank) and apply the same threshold filter on
    the shortlist — identical semantics over the candidates it keeps.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("qvec", "cvec").alias("cos_sim"))
        .where(F.col("cos_sim") < F.lit(dup_threshold))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
