"""End-to-end training-data curation pipeline — the operators of this
package composed the way a 100 TB corpus run would chain them:

    raw documents
      -> quality gate        (llm/text.quality_features: cheap, codegen'd,
                              runs first so everything downstream shrinks)
      -> language ID         (llm/text.lang_id)
      -> exact dedup         (md5 groupBy; keeper = min doc_id)
      -> near-dup clustering (MinHash -> LSH bands -> candidate pairs ->
                              connected components; keeper = min reachable)
      -> curated corpus + per-language stats

Stage order is the scale argument: each stage is strictly cheaper per row
than the next, so the expensive ones (shingling, pair join) see only
survivors. Every stage is a DataFrame transform — one lazy plan per
stage, shuffles only on md5 keys / LSH bands / cluster labels; the whole
pipeline is oracle-verified end-to-end (q_llm_pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.llm import dedup as D
from reshape_on_flink_spark.llm import text as T

#: quality gate thresholds (tuned for the synthetic corpus; a production
#: run would sweep these against a labeled sample)
MIN_TOKENS = 5
MIN_CHARS = 20


def curate(documents: DataFrame) -> DataFrame:
    """Curated corpus: the surviving documents with ``predicted_lang``
    and ``n_tokens`` attached. Deterministic: every keeper choice is a
    min-id rule."""
    enriched = T.spread(documents).select(
        "doc_id",
        "text",
        T.lang_id("text").alias("predicted_lang"),
        T.token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    quality = enriched.where(
        (F.col("n_tokens") >= MIN_TOKENS) & (F.col("n_chars") >= MIN_CHARS)
    )
    # exact dedup: keeper = min doc_id per md5(text)
    exact_keeper = quality.withColumn(
        "_keep_id",
        F.min("doc_id").over(W.partitionBy(F.md5("text"))),
    )
    exact = exact_keeper.where(F.col("doc_id") == F.col("_keep_id")).drop("_keep_id")
    # near-dup clustering over the exact survivors
    pairs = D.lsh_candidates(D.lsh_bands(D.minhash_sig_array(exact)))
    clusters = D.dedup_clusters(pairs)  # (doc_id, keeper_id) for paired docs
    merged = exact.join(clusters, "doc_id", "left")
    return merged.where(
        F.col("keeper_id").isNull() | (F.col("keeper_id") == F.col("doc_id"))
    ).select("doc_id", "predicted_lang", "n_tokens")


def corpus_stats(documents: DataFrame) -> DataFrame:
    """Per-language stats of the curated corpus (the pipeline's
    oracle-gated reporting surface)."""
    return (
        curate(documents)
        .groupBy("predicted_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("predicted_lang")
    )


#: assembly defaults (mirrored in the q_corpus_assembly oracle)
ASSEMBLY_RATES = {"en": 0.8, "de": 0.5, "fr": 0.25, "zh": 0.4}
ASSEMBLY_DEFAULT_RATE = 0.1
CHUNK_SIZE, CHUNK_STRIDE, SEQ_LEN = 32, 24, 128


def assemble_packs(documents: DataFrame) -> DataFrame:
    """The ASSEMBLY half of the corpus story (curate() is the cleaning
    half): weighted domain mixing -> normalization -> token-count gate
    -> overlapping context-window chunking -> per-stream sequence
    packing of the chunks. Output: one row per chunk with its packed
    position ((doc_id, chunk_id, lang, n_tokens, tok_offset, pack_id,
    pack_offset)).

    Scale shape, stage by stage: mixing is a map-only hash threshold
    (shrinks everything downstream for free); normalization and the
    gate fuse into the same scan; chunking is row-local explode (lang
    rides through via carry_cols — NO join-back shuffle); packing is
    the single shuffle of the whole pipeline, on the low-cardinality
    stream key with a sorted running frame. One shuffle end-to-end.
    """
    from reshape_on_flink_spark.llm.pack import domain_mix_sample, pack_sequences

    # no spread(): all pre-pack stages keep the scan's partitioning (at
    # 100 TB the parquet split count IS the parallelism); the packing
    # window's exchange is the pipeline's only shuffle, pinned in
    # tests/test_plans.py::test_assembly_pipeline_single_shuffle.
    mixed = domain_mix_sample(
        documents.select("doc_id", "lang", "text"),
        ASSEMBLY_RATES,
        default_rate=ASSEMBLY_DEFAULT_RATE,
    )
    norm = T.normalize_text(mixed).select(
        "doc_id", "lang", F.col("norm_text").alias("text")
    )
    gated = norm.where(T.token_count("text") >= MIN_TOKENS)
    chunks = T.chunk_documents(
        gated, size=CHUNK_SIZE, stride=CHUNK_STRIDE, carry_cols=("lang",)
    )
    ordered = chunks.withColumn(
        "seq_key", F.col("doc_id") * F.lit(1000) + F.col("chunk_id")
    )
    packed = pack_sequences(
        ordered,
        SEQ_LEN,
        stream_col="lang",
        order_col="seq_key",
        n_tokens=F.col("n_tokens"),
    )
    return packed.select(
        "doc_id", "chunk_id", "lang", "n_tokens", "tok_offset",
        "pack_id", "pack_offset",
    )
