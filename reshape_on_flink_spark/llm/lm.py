"""Unigram/bigram LM perplexity scoring — the classic corpus-quality
signal (docs whose cross-entropy under the corpus's own n-gram model is
an outlier are boilerplate, gibberish, or wrong-language).

Spark-first shape with an explicit SKEW SPLIT on the token join — the
same hot-key problem the reference's Reshape controller solves at
runtime (README.md:15-23), handled here statically in the plan:

1. tokenize + explode -> (doc_id, tok); count tokens -> vocab table.
2. The token join (every token row needs its corpus count) is Zipf-hot:
   "the" alone can be percent-scale of a 100 TB corpus, so a plain
   shuffle join lands it on one reducer. Split: the TOP-K frequent
   tokens broadcast (map-side join covers the hot mass — Zipf means a
   few thousand heads cover most rows), the long tail (uniform by
   construction) takes the shuffle join.
3. Per-token log-prob is QUANTIZED to fixed-point (round(ln(p)·1e6) as
   BIGINT) before the per-doc sum: double summation is order-dependent
   across engines, int64 summation is exact, so the oracle hash-matches.

Cross-entropy here is add-nothing MLE (every token seen in the corpus
by construction — the model is trained on the data being scored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reshape_on_flink_spark.llm.text import spread, tokens

#: fixed-point scale for per-token log-probs (µ-nats)
LP_SCALE = 1_000_000


def _skew_split_count_join(
    rows: DataFrame, keys: list[str], hot_k: int
) -> DataFrame:
    """Join every row of ``rows`` with its group count over ``keys``,
    splitting the Zipf-hot join: the ``hot_k`` most frequent keys ride a
    broadcast (map-side) join, the near-uniform tail takes the shuffle
    join. Returns rows + ``cnt``. Deterministic head selection (count
    desc, keys as tie-break)."""
    counts = rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    hot = counts.orderBy(F.desc("cnt"), *keys).limit(hot_k)
    hot_rows = rows.join(F.broadcast(hot), keys)
    cold_rows = rows.join(F.broadcast(hot.select(*keys)), keys, "left_anti").join(
        counts, keys
    )
    return hot_rows.unionByName(cold_rows)


def _per_doc_xent(scored: DataFrame, n_alias: str) -> DataFrame:
    """Fixed-point per-token log-probs -> per-doc mean cross-entropy."""
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias(n_alias),
        (-F.sum("lp").cast("double") / F.lit(float(LP_SCALE)) / F.count(F.lit(1))).alias(
            "xent"
        ),
    )


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_vocab_k: int = 10_000,
) -> DataFrame:
    """(doc_id, n_tokens, xent): per-doc cross-entropy in nats under the
    corpus unigram MLE model. Lower = more stereotypical text.

    ``hot_vocab_k``: vocabulary head size that rides the broadcast
    (map-side) join; the tail join shuffles on near-uniform keys.
    """
    tok = spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    )
    with_cnt = _skew_split_count_join(tok, ["tok"], hot_vocab_k)
    # corpus size as a broadcast 1-row aggregate — stays in-plan
    total = tok.agg(F.count(F.lit(1)).alias("_total"))
    lp = F.round(
        F.log(F.col("cnt").cast("double") / F.col("_total").cast("double"))
        * F.lit(LP_SCALE)
    ).cast("long")
    scored = with_cnt.crossJoin(F.broadcast(total)).select("doc_id", lp.alias("lp"))
    return _per_doc_xent(scored, "n_tokens")


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_vocab_k: int = 10_000,
) -> DataFrame:
    """(doc_id, n_bigrams, xent): per-doc conditional cross-entropy in
    nats under the corpus bigram MLE model — p(w_i | w_{i-1}) =
    c(w_{i-1} w_i) / c(w_{i-1} ·), counted over adjacent pairs. Docs
    with < 2 tokens are absent (no bigrams).

    Same skew-split shape as the unigram scorer, applied twice: the
    bigram-count join splits on (w1, w2), the context-count join on w1
    (both Zipf-hot: 'of the' / 'the'). The pair stream comes from one
    lead() window per doc — the same shingle shuffle the MinHash
    pipeline already pays."""
    from pyspark.sql import Window as W

    tok = spread(df).select(
        F.col(id_col).alias("doc_id"), F.posexplode(tokens(text_col)).alias("pos", "w1")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tok.select("doc_id", "w1", F.lead("w1").over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
    )
    with_n2 = _skew_split_count_join(pairs, ["w1", "w2"], hot_vocab_k).withColumnRenamed(
        "cnt", "n2"
    )
    ctx = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    hot_ctx = ctx.orderBy(F.desc("n1"), "w1").limit(hot_vocab_k)
    with_both = with_n2.join(F.broadcast(hot_ctx), "w1").unionByName(
        with_n2.join(F.broadcast(hot_ctx.select("w1")), "w1", "left_anti").join(
            ctx, "w1"
        )
    )
    lp = F.round(
        F.log(F.col("n2").cast("double") / F.col("n1").cast("double")) * F.lit(LP_SCALE)
    ).cast("long")
    scored = with_both.select("doc_id", lp.alias("lp"))
    return _per_doc_xent(scored, "n_bigrams")
