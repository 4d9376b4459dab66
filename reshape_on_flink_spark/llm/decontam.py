"""Benchmark decontamination: flag training docs sharing token n-grams
with an evaluation/benchmark set (the standard 8-13-gram collision scrub
run before pretraining).

Spark shape: the benchmark side is reduced to its DISTINCT n-gram set
and broadcast (benchmarks are MB-scale against a 100 TB corpus); the
corpus side explodes its n-grams only into a broadcast LEFT SEMI join —
no shuffle of corpus data at all, and the explode is pipelined (never
materialized). Contamination is a per-doc flag, aggregated by the
caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reshape_on_flink_spark.llm.text import shingle_array


def ngram_set(df: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Distinct token n-grams of a corpus, one per row (column ``ng``)."""
    return (
        df.select(F.explode(shingle_array(text_col, n)).alias("ng")).distinct()
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark_ngrams: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """IDs of corpus docs containing at least one benchmark n-gram.

    ``benchmark_ngrams`` is the output of :func:`ngram_set` (or any
    single-column ``ng`` DataFrame); it is broadcast, so the corpus scan
    is embarrassingly parallel — one pass, zero shuffles.
    """
    exploded = corpus.select(
        F.col(id_col), F.explode(shingle_array(text_col, n)).alias("ng")
    )
    return (
        exploded.join(F.broadcast(benchmark_ngrams), "ng", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame | None = None,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_ngrams: DataFrame | None = None,
) -> DataFrame:
    """Corpus with a boolean ``contaminated`` column.

    Pass either ``benchmark`` (raw docs — the n-gram set is derived) or
    ``benchmark_ngrams`` (a prebuilt/persisted :func:`ngram_set` result;
    the benchmark set is static per run, so callers scrubbing many
    corpus shards should build it once, ``persist()`` it, and reuse).

    The flag join is left unhinted: the hit set's size is data-dependent
    (usually tiny -> AQE broadcasts it; pathological contamination ->
    shuffle join stays safe).
    """
    if benchmark_ngrams is None:
        if benchmark is None:
            raise ValueError("pass benchmark or benchmark_ngrams")
        benchmark_ngrams = ngram_set(benchmark, n, text_col)
    hits = contaminated_ids(
        corpus, benchmark_ngrams, n, id_col, text_col
    ).withColumn("contaminated", F.lit(True))
    return corpus.join(hits, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )
