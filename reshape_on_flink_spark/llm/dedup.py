"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

100 TB design notes
-------------------
- **exact_dedup** groups on md5(text), never on the full text: the shuffle
  carries 16-byte keys instead of documents. Keeper choice (min id) is a
  deterministic tie-break so reruns are stable.
- **MinHash/LSH**: signatures are NUM_HASHES ints per doc (constant size);
  the all-pairs problem is reduced to equality joins on (band, band_key) —
  a plain shuffle join whose key cardinality grows with corpus size, so it
  parallelizes; no O(n²) stage exists anywhere. Near-dup clusters beyond
  pairs need iterative connected components — out of scope here (the pair
  table + keeper-min is the 1-hop approximation).
- **Hot-bucket cap**: a band bucket with B members would emit B² rows
  inside ONE join key — the classic LSH skew bomb (near-identical
  boilerplate puts millions of web docs in the same bucket in EVERY
  band, so per-bucket truncation would silently exempt exactly those
  docs from dedup). Every candidate generator therefore switches any
  bucket larger than ``max_bucket_size`` to a *star* formulation:
  (min-id pivot, member) pairs — linear in B, connectivity through the
  pivot preserved for :func:`dedup_clusters`, per-task input bounded by
  max(B, cap²). Capped-bucket row counts are surfaced via
  ``df.observe`` (named ``lsh_bucket_cap_*``). Trade-off (documented,
  tested): within an oversized bucket, member↔member pairs whose
  similarity passes the downstream check but whose pivot pairs don't
  are not emitted — acceptable because oversized buckets are by
  construction near-clone cliques.
- **SimHash** is one groupBy over (doc, bit) — linear, and the banding
  trick reuses the LSH join shape for Hamming-neighbor candidates.
- All hashes derive from `hash60` (md5-based) so every stage is
  reproducible across engines and runs — no JVM-specific `hash()`.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.llm.text import hash60, shingle_array, spread, tokens

#: MinHash parameters. (a, b) pairs are fixed literals so Spark and the
#: SQL oracle agree; P is small enough that a*(h%P)+b stays in int64.
MINHASH_P = 1_000_000_007
MINHASH_PARAMS: tuple[tuple[int, int], ...] = tuple(
    (2 * i + 3, 7919 * (i + 1) + 17) for i in range(16)
)
ROWS_PER_BAND = 2  # 16 hashes -> 8 bands of 2

SIMHASH_BITS = 48  # bits of hash60 used for the simhash fingerprint

#: Default per-(band, band_key) membership bound before a bucket switches
#: from all-pairs to the linear star formulation. 64 members = at most
#: 2016 pairs per bucket key; large enough that real small-SF fixtures
#: never trip it (oracle parity), small enough that one reducer never
#: sees a quadratic blowup.
DEFAULT_BUCKET_CAP = 64

_OBS_SEQ = itertools.count()


_spread = spread  # shared with llm.text


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct text with the keeper id and
    multiplicity. Group key is md5(text) (narrow shuffle)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) rows.

    posexplode + lead-window formulation: every stage (generator, window,
    distinct) is whole-stage-codegen'd. The pure-expression alternative
    (transform over a token array + array_distinct) avoids the doc-keyed
    shuffle but runs interpreted — measured 2.7x slower at sf0.1; the
    shuffle moves only ~30-byte rows, so codegen wins."""
    tok = _spread(df).select(
        F.col(id_col).alias("doc_id"), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (
        tok.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("shingle"),
            F.lead("tok", n - 1).over(w).alias("_t"),
        )
        .where(F.col("_t").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )


def minhash_sig_array(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sigs: array<long>[16]): md5 each distinct shingle once,
    then 16 plain MIN aggregates in one groupBy — fully codegen'd, one
    aggregate shuffle of 24-byte rows. (16 separate
    array_min(transform(...)) exprs defeat Catalyst CSE and recompute the
    md5s 16x; a single aggregate/zip_with fold runs interpreted — both
    measured slower.)"""
    h = (hash60(F.col("shingle")) % MINHASH_P).alias("h")
    hashed = shingles(df, n, text_col, id_col).select("doc_id", h)
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    return (
        hashed.groupBy("doc_id")
        .agg(*mins)
        .select("doc_id", F.array(*[f"s{i}" for i in range(len(MINHASH_PARAMS))]).alias("sigs"))
    )


def minhash_signatures(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, i, sig) rows — posexplode of the signature array (for
    inspection/oracle parity; the join pipeline uses the array form)."""
    return minhash_sig_array(df, n).select(
        "doc_id", F.posexplode("sigs").alias("i", "sig")
    )


def lsh_bands(sig_array_df: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) from the signature array: band_key joins
    the band's ROWS_PER_BAND signature values."""
    n_bands = len(MINHASH_PARAMS) // ROWS_PER_BAND
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ":",
                    *[
                        F.element_at("sigs", b * ROWS_PER_BAND + j + 1).cast("string")
                        for j in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig_array_df.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", "bk.band", "bk.band_key"
    )


def _capped_bucket_pairs(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    max_bucket_size: int,
) -> DataFrame:
    """Candidate pairs within each bucket, skew-bounded (shared engine for
    the minhash/simhash/embedding LSH joins).

    ``df`` has one row per (bucket member); buckets are the ``key_cols``
    groups; ``payload_cols[0]`` is the id (orderable, unique). Buckets
    with ≤ max_bucket_size members produce exact all-pairs via a
    self-join; larger buckets produce (pivot=min-id, member) star pairs —
    linear, one window pass. Returns columns ``a_<col>``/``b_<col>`` for
    every payload col, with a_id < b_id. The window shuffles on exactly
    the join key, so the self-join reuses its exchange; the star branch
    adds no shuffle at all.

    Reference analog: the Reshape controller's whole premise is that one
    overloaded reducer must shed load (README.md:15-23) — here the shed
    happens statically in the plan instead of at runtime.
    """
    id_col = payload_cols[0]
    w = W.partitionBy(*key_cols)
    pivot_struct = F.min(F.struct(*payload_cols)).over(w)
    sized = df.select(
        *key_cols,
        *payload_cols,
        F.count(F.lit(1)).over(w).alias("_bsz"),
        pivot_struct.alias("_pivot"),
    )
    small = sized.where(F.col("_bsz") <= max_bucket_size)
    big = sized.where(F.col("_bsz") > max_bucket_size).observe(
        f"lsh_bucket_cap_{next(_OBS_SEQ)}",
        F.count(F.lit(1)).alias("capped_member_rows"),
        F.max("_bsz").alias("max_bucket_size_seen"),
    )
    a = small.select(*key_cols, *[F.col(c).alias(f"a_{c}") for c in payload_cols])
    b = small.select(*key_cols, *[F.col(c).alias(f"b_{c}") for c in payload_cols])
    all_pairs = a.join(b, key_cols).where(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
    star = big.where(F.col(id_col) != F.col("_pivot")[id_col]).select(
        *key_cols,
        *[F.col("_pivot")[c].alias(f"a_{c}") for c in payload_cols],
        *[F.col(c).alias(f"b_{c}") for c in payload_cols],
    )
    out_cols = [f"a_{c}" for c in payload_cols] + [f"b_{c}" for c in payload_cols]
    return all_pairs.select(*out_cols).union(star.select(*out_cols))


def lsh_candidates(band_df: DataFrame, max_bucket_size: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """Distinct candidate pairs (d1 < d2) sharing at least one band.

    Buckets larger than ``max_bucket_size`` emit linear star pairs
    instead of all-pairs (see module docstring, "Hot-bucket cap")."""
    pairs = _capped_bucket_pairs(
        band_df, ["band", "band_key"], ["doc_id"], max_bucket_size
    )
    return (
        pairs.select(F.col("a_doc_id").alias("d1"), F.col("b_doc_id").alias("d2"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame, n: int = 3, max_bucket_size: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """Candidate pairs with their estimated Jaccard (matching signature
    fraction). Returns (d1, d2, est_jaccard). Only the candidate pairs
    (post-LSH) ever compare full signatures — two broadcast-size joins of
    the compact (doc_id, sigs) table."""
    # the signature table is reused three times (bands, d1 side, d2 side)
    # and is tiny relative to the corpus (16 longs per doc) — persist it
    sig = minhash_sig_array(df, n).persist()
    cand = lsh_candidates(lsh_bands(sig), max_bucket_size)
    s1 = sig.select(F.col("doc_id").alias("d1"), F.col("sigs").alias("sigs1"))
    s2 = sig.select(F.col("doc_id").alias("d2"), F.col("sigs").alias("sigs2"))
    n_hashes = len(MINHASH_PARAMS)
    matches = F.size(
        F.filter(F.zip_with("sigs1", "sigs2", lambda a, b: a == b), lambda x: x)
    )
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", (matches / F.lit(float(n_hashes))).alias("est_jaccard"))
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame, n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for given (d1, d2) pairs: |∩| / |∪| over the
    distinct shingle sets. Used to verify LSH candidates."""
    sh = shingles(df, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh1 = sh.select(F.col("doc_id").alias("d1"), "shingle")
    sh2 = sh.select(F.col("doc_id").alias("d2"), "shingle")
    common = (
        pairs.join(sh1, "d1").join(sh2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(common, ["d1", "d2"], "left")
        .na.fill({"n_common": 0})
        .join(sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2")), "d2")
        .select(
            "d1",
            "d2",
            (F.col("n_common").cast("double") / (F.col("n1") + F.col("n2") - F.col("n_common")))
            .alias("jaccard"),
        )
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: for each bit position, sum ±1 over token
    hashes; bit set iff the sum is positive. Returns (doc_id, simhash).

    Computed as one narrow expression chain per row (hash each token
    once, fold the ±1 bit-vectors element-wise, then pack the sign bits)
    — no explode, no shuffle; at 100 TB this is a map-only stage fused
    into the scan. An earlier explode-based formulation (rows × 48 bits)
    was 15× slower at sf0.1."""
    df = _spread(df)
    hashes = F.transform(tokens(text_col), hash60)
    zeros = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)
    bit_idx = F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))
    sums = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc, bit_idx, lambda a, b: a + F.when((h.bitwiseAND(_pow2(b))) != 0, 1).otherwise(-1)
        ),
    )
    packed = F.aggregate(
        F.zip_with(sums, bit_idx, lambda s, b: F.when(s > 0, _pow2(b)).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("doc_id"), packed.alias("simhash"))


#: powers of two as a literal array — avoids shiftleft-by-column (the
#: Python API only accepts int shift amounts)
_POW2 = [1 << b for b in range(SIMHASH_BITS)]


def _pow2(b):  # b: 0-based bit index column
    return F.element_at(F.array(*[F.lit(p).cast("long") for p in _POW2]), b + 1)


def simhash_near_duplicates(
    sim_df: DataFrame, max_hamming: int = 3, max_bucket_size: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """Hamming-ball candidate pairs via 4-chunk banding (any doc pair
    within Hamming distance 3 of a 48-bit fingerprint shares at least one
    of 4 12-bit chunks... chunk width 12). Returns (d1, d2, hamming).

    Oversized chunk buckets fall back to star pairs (module docstring,
    "Hot-bucket cap")."""
    chunk_width = SIMHASH_BITS // 4
    chunks = F.array(*[F.lit(c) for c in range(4)])
    banded = sim_df.select(
        "doc_id",
        "simhash",
        F.explode(chunks).alias("chunk"),
    ).select(
        "doc_id",
        "simhash",
        "chunk",
        F.expr(f"shiftright(simhash, chunk * {chunk_width}) & {(1 << chunk_width) - 1}").alias("chunk_val"),
    )
    pairs = _capped_bucket_pairs(
        banded, ["chunk", "chunk_val"], ["doc_id", "simhash"], max_bucket_size
    )
    return (
        pairs.select(
            F.col("a_doc_id").alias("d1"),
            F.col("b_doc_id").alias("d2"),
            F.bit_count(F.col("a_simhash").bitwiseXOR(F.col("b_simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(pairs: DataFrame, max_iters: int = 25) -> DataFrame:
    """Connected components over near-duplicate pairs -> cluster keeper
    per doc: (doc_id, keeper_id) where keeper is the minimum id reachable
    through the pair graph.

    Delegates to operators.iterate.connected_components (large-star/
    small-star, O(log n) rounds on any graph shape — an earlier
    min-label propagation here needed O(diameter) rounds, pathological
    on chain-shaped near-dup graphs)."""
    from reshape_on_flink_spark.operators.iterate import connected_components

    return connected_components(pairs, max_iters=max_iters).select(
        F.col("node").alias("doc_id"), F.col("component").alias("keeper_id")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup — the semantic layer of the dedup stack
# (exact/MinHash/SimHash catch textual clones; this catches paraphrases).
# ---------------------------------------------------------------------------


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dup: (a_id, b_id, cos_sim) for every
    a<b pair with cosine >= threshold.

    O(N²·dim) — correct and fine up to ~10⁵ vectors per run; beyond that
    use :func:`embedding_near_dups_lsh`. The kernel is the same codegen'd
    zip_with/aggregate fold as similarity.cosine (bit-identical to the
    DuckDB oracle's list_sum fold). The theta self-join (a_id < b_id)
    halves the pair count; Spark plans it as a broadcast nested-loop when
    one side fits, else a cartesian over range blocks."""
    from reshape_on_flink_spark.llm.similarity import dot, norm

    a = emb.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"), norm(vec_col).alias("a_norm")
    )
    b = emb.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"), norm(vec_col).alias("b_norm")
    )
    # Norms are computed once per vector (N HOF folds), not once per pair
    # (N² folds) — the pair stage runs only the dot product. sqrt(a)*sqrt(b)
    # is the exact same IEEE op sequence as the inline cosine / the oracle.
    return (
        F.broadcast(a)
        .join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (dot("a_vec", "b_vec") / (F.col("a_norm") * F.col("b_norm"))).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def embedding_near_dups_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Approximate near-dup pairs at corpus scale: sign-LSH bucket join
    for candidates (linear shuffle, no O(N²) stage), exact cosine
    re-check. Recall vs the exact operator is asserted in
    tests/test_llm.py; raise n_tables for higher recall. Oversized
    buckets fall back to star pairs (module docstring, "Hot-bucket
    cap")."""
    from reshape_on_flink_spark.llm.similarity import _bucket_array, cosine

    tagged = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.explode(_bucket_array(vec_col, n_tables, n_planes, dim, seed)).alias("tb"),
    ).select("_id", "_vec", "tb.table", "tb.bucket")
    cand = _capped_bucket_pairs(
        tagged, ["table", "bucket"], ["_id", "_vec"], max_bucket_size
    ).dropDuplicates(["a__id", "b__id"])
    return cand.select(
        F.col("a__id").alias("a_id"),
        F.col("b__id").alias("b_id"),
        cosine("a__vec", "b__vec").alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)


# ---------------------------------------------------------------------------
# Passage-level (sub-document) dedup — the CCNet paragraph-dedup analog
# ---------------------------------------------------------------------------

#: Tokens per passage block. Real pipelines hash paragraphs (newline
#: splits); for whitespace-only corpora the fixed-size token block is the
#: standard analog (e.g. 100-token spans in suffix-array dedup papers).
PASSAGE_BLOCK = 16


def passage_blocks(
    df: DataFrame,
    block: int = PASSAGE_BLOCK,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into consecutive ``block``-token passages:
    (doc_id, block_idx, n_total, block_text, block_hash) rows; the last
    block may be short, empty docs yield none.

    Row-local (tokenize, per-row index sequence, explode, slice) — fuses
    into the scan with no shuffle; ``n_total`` (blocks in the doc) is
    carried from the explode so downstream stages never join it back.
    Mirrors the slicing arithmetic of ``text.chunk_documents`` (stride ==
    size, i.e. non-overlapping).
    """
    from reshape_on_flink_spark.llm.text import seq1

    if block < 1:
        raise ValueError(f"block must be >= 1, got {block}")
    base = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
    n_blocks = F.ceil(F.size("tk") / F.lit(block)).cast("int")
    e = base.select(
        "doc_id",
        "tk",
        n_blocks.cast("long").alias("n_total"),
        F.explode(seq1(n_blocks)).alias("i"),
    )
    blk = F.slice(F.col("tk"), (F.col("i") - 1) * block + 1, block)
    return e.select(
        "doc_id",
        (F.col("i") - 1).cast("long").alias("block_idx"),
        "n_total",
        F.array_join(blk, " ").alias("block_text"),
        F.md5(F.array_join(blk, " ")).alias("block_hash"),
    )


def passage_dedup(
    df: DataFrame,
    block: int = PASSAGE_BLOCK,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide passage dedup (CCNet-style, Wenzek et al. 2019 §3.1,
    done there on paragraph hashes; reference analog: the reference has no
    sub-document dedup — this is a training-pipeline extension): every
    passage keeps only its globally-first occurrence (min (doc_id,
    block_idx)); surviving passages are reassembled per document.

    Output: (doc_id, n_total, n_kept, clean_text) — documents whose every
    passage is a duplicate drop out entirely.

    Scale: two shuffles, both on bounded keys — (1) first-occurrence
    choice is a row_number window on the 16-byte ``block_hash`` (partition
    size == duplicate multiplicity, linear work per key); (2) reassembly
    groups on ``doc_id`` (partition size == blocks per doc). Neither key
    ever concentrates a corpus-sized group, so the plan survives 100 TB;
    the passage stream itself is narrow (see :func:`passage_blocks`).
    """
    b = passage_blocks(df, block=block, text_col=text_col, id_col=id_col)
    w = W.partitionBy("block_hash").orderBy("doc_id", "block_idx")
    kept = b.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    ordered = F.array_sort(F.collect_list(F.struct("block_idx", "block_text")))
    return kept.groupBy("doc_id", "n_total").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(ordered, lambda s: s["block_text"]), " "
        ).alias("clean_text"),
    )


def corpus_minhash_overlap(
    df: DataFrame,
    group_col: str = "source",
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-to-corpus overlap estimation from sketches alone: each
    group's SHINGLE SET gets one corpus-level MinHash signature (the MIN
    over every member document's shingle hashes — set union commutes
    with min), and every group pair's Jaccard similarity is estimated
    as the fraction of matching components. The planning metric for
    cross-corpus dedup ("how much of B is already in A?") WITHOUT any
    pairwise document work.

    Scale: one aggregate shuffle of (group, 16 longs) — map-side partial
    MIN, state per group is 16 numbers; the pair comparison runs on
    |groups|² tiny rows. Output: (src_a, src_b, est_jaccard),
    src_a < src_b.
    """
    h = (hash60(F.col("shingle")) % MINHASH_P).alias("h")
    hashed = shingles(df, n, text_col, id_col).join(
        df.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("_g")),
        "doc_id",
    ).select("_g", h)
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    k = len(MINHASH_PARAMS)
    sigs = hashed.groupBy("_g").agg(*mins)
    long = sigs.select(
        "_g",
        F.posexplode(F.array(*[f"s{i}" for i in range(k)])).alias("i", "sig"),
    )
    # pair on the component index (EQUI-join — 16 keys × |groups| rows
    # per key; an inequality-only pair join would plan as a cartesian,
    # which the plan lint forbids even at this tiny cardinality)
    a = long.select(F.col("_g").alias("src_a"), "i", F.col("sig").alias("sig_a"))
    b = long.select(F.col("_g").alias("src_b"), "i", F.col("sig").alias("sig_b"))
    return (
        a.join(b, "i")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            (
                F.sum((F.col("sig_a") == F.col("sig_b")).cast("int")).cast("double")
                / F.lit(k)
            ).alias("est_jaccard")
        )
    )
