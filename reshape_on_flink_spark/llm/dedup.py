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
- **SimHash** is one groupBy over (doc, bit) — linear, and the banding
  trick reuses the LSH join shape for Hamming-neighbor candidates.
- All hashes derive from `hash60` (md5-based) so every stage is
  reproducible across engines and runs — no JVM-specific `hash()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.llm.text import hash60, tokens

#: MinHash parameters. (a, b) pairs are fixed literals so Spark and the
#: SQL oracle agree; P is small enough that a*(h%P)+b stays in int64.
MINHASH_P = 1_000_000_007
MINHASH_PARAMS: tuple[tuple[int, int], ...] = tuple(
    (2 * i + 3, 7919 * (i + 1) + 17) for i in range(16)
)
ROWS_PER_BAND = 2  # 16 hashes -> 8 bands of 2

SIMHASH_BITS = 48  # bits of hash60 used for the simhash fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct text with the keeper id and
    multiplicity. Group key is md5(text) (narrow shuffle)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with posexplode + lead windows so the identical SQL shape exists
    in the oracle; the window partition is the document — embarrassingly
    parallel."""
    tok = df.select(F.col(id_col).alias("doc_id"), F.posexplode(tokens(text_col)).alias("pos", "tok"))
    w = W.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (
        tok.select("doc_id", F.concat_ws(" ", *parts).alias("shingle"), *[
            F.lead("tok", i).over(w).alias(f"_t{i}") for i in range(1, n)
        ])
        .where(F.col(f"_t{n-1}").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )


def minhash_signatures(shingle_df: DataFrame) -> DataFrame:
    """(doc_id, i, sig): sig_i = min over shingles of (a_i·(h60%P)+b_i)%P."""
    params = F.array(
        *[F.struct(F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b"))
          for i, (a, b) in enumerate(MINHASH_PARAMS)]
    )
    h = hash60(F.col("shingle")) % MINHASH_P
    return (
        shingle_df.select("doc_id", h.alias("h"), F.explode(params).alias("p"))
        .select("doc_id", F.col("p.i").alias("i"), ((F.col("p.a") * F.col("h") + F.col("p.b")) % MINHASH_P).alias("hv"))
        .groupBy("doc_id", "i")
        .agg(F.min("hv").alias("sig"))
    )


def lsh_bands(sig_df: DataFrame) -> DataFrame:
    """(doc_id, band, band_key): band_key concatenates the band's
    signature values in hash-index order."""
    band = (F.col("i") / ROWS_PER_BAND).cast("int")
    return (
        sig_df.select("doc_id", band.alias("band"), "i", "sig")
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ":",
                F.min_by("sig", "i").cast("string"),
                F.max_by("sig", "i").cast("string"),
            ).alias("band_key")
        )
    )


def lsh_candidates(band_df: DataFrame) -> DataFrame:
    """Distinct candidate pairs (d1 < d2) sharing at least one band."""
    left = band_df.select(F.col("doc_id").alias("d1"), "band", "band_key")
    right = band_df.select(F.col("doc_id").alias("d2"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def minhash_near_duplicates(df: DataFrame, n: int = 3) -> DataFrame:
    """Candidate pairs with their estimated Jaccard (matching signature
    fraction). Returns (d1, d2, est_jaccard)."""
    sig = minhash_signatures(shingles(df, n))
    cand = lsh_candidates(lsh_bands(sig))
    s1 = sig.select(F.col("doc_id").alias("d1"), "i", F.col("sig").alias("sig1"))
    s2 = sig.select(F.col("doc_id").alias("d2"), "i", F.col("sig").alias("sig2"))
    n_hashes = len(MINHASH_PARAMS)
    return (
        cand.join(s1, "d1")
        .join(s2, ["d2", "i"])
        .groupBy("d1", "d2")
        .agg(
            (F.sum(F.when(F.col("sig1") == F.col("sig2"), 1).otherwise(0)) / F.lit(float(n_hashes)))
            .alias("est_jaccard")
        )
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
    hashes; bit set iff the sum is positive. Returns (doc_id, simhash)."""
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok"))
    h = hash60(F.col("tok"))
    bits = F.array(*[F.lit(b) for b in range(SIMHASH_BITS)])
    contrib = (
        tok.select("doc_id", h.alias("h"), F.explode(bits).alias("b"))
        .select(
            "doc_id",
            "b",
            F.when(F.expr("shiftright(h, b) & 1") == 1, 1).otherwise(-1).alias("c"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("c").alias("s"))
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def simhash_near_duplicates(sim_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming-ball candidate pairs via 4-chunk banding (any doc pair
    within Hamming distance 3 of a 48-bit fingerprint shares at least one
    of 4 12-bit chunks... chunk width 12). Returns (d1, d2, hamming)."""
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
    left = banded.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("h1"), "chunk", "chunk_val")
    right = banded.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("h2"), "chunk", "chunk_val")
    return (
        left.join(right, ["chunk", "chunk_val"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
