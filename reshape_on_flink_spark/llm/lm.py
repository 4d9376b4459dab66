"""Unigram LM perplexity scoring — the classic corpus-quality signal
(docs whose cross-entropy under the corpus's own unigram model is an
outlier are boilerplate, gibberish, or wrong-language).

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
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus size as a broadcast 1-row aggregate — stays in-plan
    total = vocab.agg(F.sum("cnt").alias("_total"))
    # deterministic head selection: count desc, token as tie-break
    hot = vocab.orderBy(F.desc("cnt"), "tok").limit(hot_vocab_k)

    hot_rows = tok.join(F.broadcast(hot), "tok")  # map-side, covers Zipf head
    cold_rows = tok.join(F.broadcast(hot.select("tok")), "tok", "left_anti").join(
        vocab, "tok"
    )  # tail: near-uniform shuffle keys
    lp = F.round(
        F.log(F.col("cnt").cast("double") / F.col("_total").cast("double"))
        * F.lit(LP_SCALE)
    ).cast("long")
    scored = (
        hot_rows.unionByName(cold_rows)
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum("lp").cast("double") / F.lit(float(LP_SCALE)) / F.count(F.lit(1))).alias(
            "xent"
        ),
    )
