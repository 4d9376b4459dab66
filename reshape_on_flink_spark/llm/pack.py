"""Training-corpus assembly: sequence packing and weighted domain mixing.

The two operations that sit between a curated corpus and a training run:

- :func:`pack_sequences` — concatenate-and-chunk packing: documents are
  laid out contiguously in a deterministic order and cut into
  fixed-length token windows ("packs"), the standard pretraining
  sequence-packing scheme (a document may straddle two packs; the
  attention mask handles boundaries downstream).
- :func:`domain_mix_sample` — deterministic weighted sampling per
  domain: each domain (language, source, ...) keeps a configured
  fraction of its documents, chosen by a hash of the key rather than an
  RNG, so the sample is reproducible row-for-row on any cluster layout
  and in any engine (the DuckDB oracle computes the identical sample).

Both are pure Spark SQL expressions — no UDFs, fully codegen'd.

Scale (100 TB): packing partitions by the stream column (e.g. lang) —
the running token-offset window runs per stream, so parallelism equals
the number of streams and no global single-partition window exists
(callers wanting one global stream shard it first; documented).
Sampling is map-only (a hash comparison per row), zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.llm.text import hash60, token_count


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    *,
    stream_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: Column | None = None,
) -> DataFrame:
    """Assign each document its packing position in fixed-length windows.

    Documents are concatenated per ``stream_col`` in ``order_col`` order
    and cut every ``seq_len`` tokens. Returns the input plus:

    - ``n_tokens``     — the document's token count
    - ``tok_offset``   — tokens before this document in its stream
    - ``pack_id``      — window index of the document's FIRST token
    - ``pack_offset``  — position of the first token within that pack
    - ``n_packs_spanned`` — how many windows the document touches

    Determinism: the layout is a pure function of (stream, order) — no
    RNG, no partition-order dependence — so the DuckDB oracle reproduces
    it exactly with a running-sum window.

    100 TB: one window per stream key (language/source cardinality —
    dozens to thousands of streams), each a running SUM over a sorted
    range — Spark executes it as one shuffle on the stream key plus a
    sorted streaming frame; no global window, no explode.
    """
    nt = n_tokens if n_tokens is not None else token_count(text_col)
    w = (
        W.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = docs.withColumn("n_tokens", nt.cast("long"))
    cum = F.sum("n_tokens").over(w)
    out = out.withColumn("tok_offset", cum - F.col("n_tokens"))
    return (
        out.withColumn("pack_id", F.floor(F.col("tok_offset") / seq_len))
        .withColumn("pack_offset", F.col("tok_offset") % seq_len)
        .withColumn(
            "n_packs_spanned",
            F.when(F.col("n_tokens") == 0, F.lit(1)).otherwise(
                F.floor((F.col("tok_offset") + F.col("n_tokens") - 1) / seq_len)
                - F.col("pack_id")
                + 1
            ).cast("long"),
        )
    )


def domain_mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    *,
    domain_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted per-domain sampling (data mixing).

    A document survives iff ``hash60(key) % resolution <
    rate(domain) * resolution`` — the standard hash-threshold sampler:
    reproducible across runs, engines, and cluster layouts; changing one
    domain's rate leaves every other domain's sample identical (rates
    are monotone: raising a rate only ADDS documents). Unknown domains
    get ``default_rate``.

    100 TB: map-only — one md5 + one comparison per row, no shuffle; the
    sampled fraction flows straight into downstream stages.
    """
    h = F.pmod(hash60(F.col(key_col).cast("string")), F.lit(resolution))
    rate = None
    for dom, r in sorted(rates.items()):
        thresh = F.lit(int(r * resolution))
        cond = F.col(domain_col) == dom
        rate = F.when(cond, thresh) if rate is None else rate.when(cond, thresh)
    rate = (
        rate.otherwise(F.lit(int(default_rate * resolution)))
        if rate is not None
        else F.lit(int(default_rate * resolution))
    )
    return docs.where(h < rate)


def streaming_pack(
    docs,
    seq_len: int,
    *,
    stream_col: str = "lang",
    order_cols: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming sequence packing: continuous corpus assembly.

    The streaming form of :func:`pack_sequences` —
    ``applyInPandasWithState`` keyed on ``stream_col``; state is one
    long (the stream's cumulative token offset), each micro-batch sorts
    its rows by ``order_cols`` and folds them onto the offset. Given
    order-respecting arrival per stream (the replay harness guarantees
    it), stream output == batch output row-for-row.

    State: O(1) per stream key — a single offset — so this runs
    indefinitely at any scale; packs are emitted as metadata the moment
    their documents arrive.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    order_cols = order_cols or [id_col]
    out_schema = StructType(
        [
            StructField(stream_col, StringType()),
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
            StructField("tok_offset", LongType()),
            StructField("pack_id", LongType()),
            StructField("pack_offset", LongType()),
            StructField("n_packs_spanned", LongType()),
        ]
    )
    state_schema = StructType([StructField("offset", LongType())])

    def fold(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (offset,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(order_cols)
            n_tok = (
                pdf[text_col].str.split().map(len).astype("int64")
                if len(pdf)
                else pd.Series([], dtype="int64")
            )
            starts = n_tok.cumsum() - n_tok + offset
            ends = starts + n_tok.clip(lower=1) - 1  # zero-token docs span 1
            out = pd.DataFrame(
                {
                    stream_col: pdf[stream_col].values,
                    id_col: pdf[id_col].values,
                    "n_tokens": n_tok.values,
                    "tok_offset": starts.values,
                    "pack_id": (starts // seq_len).values,
                    "pack_offset": (starts % seq_len).values,
                    "n_packs_spanned": (ends // seq_len - starts // seq_len + 1).values,
                }
            )
            if len(pdf):
                offset = int(starts.iloc[-1] + n_tok.iloc[-1])
            yield out
        state.update((offset,))

    return (
        docs.select(stream_col, id_col, text_col, *[c for c in order_cols if c != id_col])
        .groupBy(stream_col)
        .applyInPandasWithState(fold, out_schema, state_schema, "append", "NoTimeout")
    )


def train_val_test_split(
    docs: DataFrame,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    key_col: str = "doc_id",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment by hash threshold — the
    held-out-set selector beside :func:`domain_mix_sample`. Stable
    under corpus growth: a document's split never changes when other
    documents are added/removed (it depends only on its own key), which
    is what prevents silent eval-set contamination across corpus
    versions. Map-only, zero shuffles, engine-reproducible."""
    h = F.pmod(hash60(F.col(key_col).cast("string")), F.lit(resolution))
    t_val = int(val_rate * resolution)
    t_test = t_val + int(test_rate * resolution)
    split = (
        F.when(h < t_val, F.lit("val"))
        .when(h < t_test, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return docs.withColumn("split", split)


def stratified_bottom_k(
    docs: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-stratum uniform sample: the k smallest
    hash60(key) per stratum (bottom-k / min-wise sampling). Unlike a
    rate-based sampler this guarantees EXACTLY min(k, |stratum|) rows
    per stratum — the balanced-eval-set selector. One shuffle on the
    strata key; Spark executes the rank filter as WindowGroupLimit
    (per-partition top-k before the exchange), so the shuffle carries
    ~k rows per (partition, stratum), not the stratum."""
    h = hash60(F.col(key_col).cast("string"))
    w = W.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def assign_shards(
    df: DataFrame,
    n_shards: int = 16,
    seed: int = 0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic output sharding: ``shard = hash60(seed:key) %
    n_shards`` — the corpus-shuffle-and-shard step before a partitioned
    training-data write (`df.write.partitionBy("shard")` or
    `repartition("shard")`). Map-only; the hash both *shuffles* (orders
    docs pseudo-randomly within a shard via the full hash) and *shards*
    (uniform assignment independent of input order), so reruns and
    backfills land every doc in the same place.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = hash60(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))
    return df.withColumn("shuffle_hash", h).withColumn(
        "shard", F.pmod(F.col("shuffle_hash"), F.lit(n_shards)).cast("int")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    seed: int = 0,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest (doc count + token sum) for the shard
    assignment above — the bookkeeping a 100 TB corpus write emits next
    to its data. One aggregation shuffle on the n_shards-ary key."""
    return (
        assign_shards(df, n_shards=n_shards, seed=seed, key_col=key_col)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(text_col)).alias("n_tokens"),
        )
    )


def domain_mix_epochs(
    docs: DataFrame,
    epochs: dict[str, float],
    *,
    domain_col: str = "lang",
    key_col: str = "doc_id",
    default_epochs: float = 1.0,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Epoch-based domain mixing with UPSAMPLING (DoReMi/Pile-style
    domain weights above 1): a document with weight ``w`` appears
    ``floor(w)`` times always, plus once more iff
    ``hash60(key) % resolution < frac(w) * resolution`` — the
    deterministic fractional epoch. ``w < 1`` degrades to the
    hash-threshold downsampler (:func:`domain_mix_sample` semantics);
    copies carry ``copy_idx`` (0-based) so downstream packing/shuffling
    can separate them.

    100 TB: map-only explode — each row expands to its own copies inside
    its partition (fan-out = w, no shuffle, no skew concentration).
    """
    from reshape_on_flink_spark.llm.text import seq1

    h = F.pmod(hash60(F.col(key_col).cast("string")), F.lit(resolution))
    n_copies = None
    for dom, w in sorted(epochs.items()):
        if w < 0:
            raise ValueError(f"epochs must be >= 0, got {dom}={w}")
        base, frac = int(w), w - int(w)
        n = F.lit(base) + (h < F.lit(int(frac * resolution))).cast("int")
        cond = F.col(domain_col) == dom
        n_copies = F.when(cond, n) if n_copies is None else n_copies.when(cond, n)
    base, frac = int(default_epochs), default_epochs - int(default_epochs)
    dflt = F.lit(base) + (h < F.lit(int(frac * resolution))).cast("int")
    n_copies = dflt if n_copies is None else n_copies.otherwise(dflt)
    return (
        docs.withColumn("_n", n_copies)
        .select("*", F.explode(seq1(F.col("_n"))).alias("_i"))
        .withColumn("copy_idx", F.col("_i") - 1)
        .drop("_n", "_i")
    )


def length_bucket_batches(
    docs: DataFrame,
    batch_size: int = 8,
    edges: tuple[int, ...] = (16, 32, 64),
    n_shards: int = 4,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-bucketed batch assembly: group documents of similar token
    count into fixed-size batches so per-batch padding (to the batch
    max) stays small — the dynamic-batching layout every training /
    batch-inference loader wants. Returns one row per batch:
    (bucket, shard, batch_idx, n_docs, max_tokens, sum_tokens,
    pad_frac) where ``pad_frac = 1 - sum/(max*n)``.

    Scale: bucket count is tiny (len(edges)+1), so batching directly per
    bucket would funnel the corpus through a handful of window
    partitions; the ``shard`` key (hash60 % n_shards) fans each bucket
    out to n_shards independent deterministic sub-streams — set n_shards
    ~ cluster parallelism and each window partition holds
    |corpus|/(buckets*shards). Assignment is a row_number window + one
    aggregation, both on the same (bucket, shard) key: one shuffle.
    """
    arr = F.array(*[F.lit(int(e)) for e in edges])
    nt = token_count(text_col).cast("long")
    bucket = F.size(F.filter(arr, lambda e: e <= nt))
    shard = F.pmod(hash60(F.col(key_col).cast("string")), F.lit(n_shards))
    tagged = docs.select(
        F.col(key_col),
        nt.alias("n_tokens"),
        bucket.alias("bucket"),
        shard.alias("shard"),
    )
    w = W.partitionBy("bucket", "shard").orderBy(key_col)
    batched = tagged.withColumn(
        "batch_idx", F.floor((F.row_number().over(w) - 1) / batch_size)
    )
    return batched.groupBy("bucket", "shard", "batch_idx").agg(
        F.count("*").alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.round(
            F.lit(1.0)
            - F.sum("n_tokens").cast("double")
            / (F.max("n_tokens") * F.count("*")).cast("double"),
            6,
        ).alias("pad_frac"),
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    *,
    domain_col: str = "lang",
    key_col: str = "doc_id",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-LM standard:
    sample domain d with share proportional to (n_d/N)^alpha — alpha<1
    flattens toward uniform, up-weighting tail domains; mT5/XLM-R style).

    Closed form: rate_d = min(1, c0 * n_d^(alpha-1)) with
    c0 = budget_frac * N / sum_e(n_e^alpha) — expected kept fraction is
    ``budget_frac`` when no per-domain cap binds (caps can only lower
    it; documented standard behavior). alpha=0.5 is computed as
    1/sqrt(n) (sqrt is IEEE correctly-rounded, so both engines produce
    bit-identical rates; other alphas go through pow with the same
    caveat as any cross-engine float).

    Execution: one domain-count agg (tiny) + a broadcast rate join +
    the map-only hash-threshold sampler of :func:`domain_mix_sample` —
    no data-sized shuffle at any corpus size.
    """
    from reshape_on_flink_spark.llm.text import hash60

    counts = docs.groupBy(domain_col).agg(F.count("*").alias("__n"))
    if abs(alpha - 0.5) < 1e-12:
        pow_a = F.sqrt(F.col("__n").cast("double"))
    else:
        pow_a = F.pow(F.col("__n").cast("double"), F.lit(alpha))
    totals = counts.agg(
        F.sum("__n").cast("double").alias("__tot"),
        F.sum(pow_a).alias("__sum_pa"),
    )
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            domain_col,
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("__tot")
                / F.col("__sum_pa")
                * (pow_a / F.col("__n").cast("double")),
            ).alias("__rate"),
        )
        .withColumn(
            "__thresh", F.floor(F.col("__rate") * F.lit(float(resolution))).cast("long")
        )
    )
    h = F.pmod(hash60(F.col(key_col).cast("string")), F.lit(resolution))
    return (
        docs.join(F.broadcast(rates), domain_col)
        .where(h < F.col("__thresh"))
        .drop("__rate", "__thresh")
    )


def contrastive_pairs(
    docs: DataFrame,
    min_jaccard: float = 0.5,
    n_buckets: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Contrastive training pairs for embedding models: (anchor,
    positive, negative, est_jaccard). Positives are MinHash-LSH
    near-duplicate candidates at ``est_jaccard >= min_jaccard``
    (llm/dedup.minhash_near_duplicates — the banded equi-join, never
    all-pairs); negatives are DETERMINISTIC hash-ring picks: the
    minimum-hash document of the bucket ``hash60(anchor||'#neg') %
    n_buckets`` — pseudorandom per anchor, reproducible across engines
    and runs. (The negative is uniform over a fixed per-bucket choice;
    hard-negative mining would swap this stage for an ANN lookup —
    llm/similarity — without touching the positives side.)

    Scale: the bucket->negative table is ``n_buckets`` rows computed by
    one pass over ids (two tiny aggs), then BROADCAST — no data-sized
    join for negatives at any corpus size.
    """
    from reshape_on_flink_spark.llm.dedup import minhash_near_duplicates
    from reshape_on_flink_spark.llm.text import hash60

    pos = minhash_near_duplicates(docs).where(F.col("est_jaccard") >= min_jaccard)
    ring = docs.select(
        F.col(id_col), hash60(F.col(id_col).cast("string")).alias("rh")
    )
    bmin = ring.groupBy((F.col("rh") % n_buckets).alias("bucket")).agg(
        F.min("rh").alias("mrh")
    )
    bneg = (
        bmin.join(ring, (F.col("rh") == F.col("mrh")) & (F.col("rh") % n_buckets == F.col("bucket")))
        .groupBy("bucket")
        .agg(F.min(id_col).alias("negative"))
    )
    probe = F.pmod(
        hash60(F.concat(F.col("d1").cast("string"), F.lit("#neg"))), F.lit(n_buckets)
    )
    return (
        pos.withColumn("bucket", probe)
        .join(F.broadcast(bneg), "bucket")
        .select(
            F.col("d1").alias("anchor"),
            F.col("d2").alias("positive"),
            "negative",
            "est_jaccard",
        )
    )
