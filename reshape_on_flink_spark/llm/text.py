"""Text-analysis operators: tokenize, quality, language ID, fingerprint.

All pure Spark SQL expressions (no UDFs): tokenization is `split`,
language ID is a stopword-hit argmax over higher-order array functions,
the fingerprint is a polynomial rolling hash folded with `aggregate`.
Scale: every operator is row-local (narrow) — zero shuffles; Catalyst
fuses them into the scan's WholeStageCodegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small and deterministic — the point is the
#: operator shape (argmax over per-language hit counts), not NLP quality.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "es": ("el", "la", "de", "y", "que", "es", "un", "una", "en", "los"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "dans"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "人", "这", "他"),
}

#: Modulus for the rolling fingerprint — small enough that acc*31 + h60
#: never overflows int64 in either engine.
FP_MOD = 1_000_000_007


def spread(df):
    """Repartition small single-file scans to full parallelism before
    CPU-bound per-row stages (tokenize/shingle/hash are interpreted
    higher-order functions — a 1-partition input serializes them).
    Inputs with enough partitions pass through untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization, empty tokens removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string: first 15 hex digits
    of md5, base-16 decoded. Chosen because DuckDB computes the identical
    value via ('0x' || substr(md5(x),1,15))::BIGINT — the cross-engine
    primitive under MinHash/SimHash/fingerprint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seq1(stop: Column) -> Column:
    """``sequence(1, stop)`` that is EMPTY when stop < 1. Spark's
    ``sequence(1, 0)`` yields a *descending* ``[1, 0]`` (not ``[]``),
    which sends out-of-range indexes into ``element_at`` on short/empty
    documents — every 1..stop index loop must go through this guard."""
    return F.when(stop >= 1, F.sequence(F.lit(1), stop)).otherwise(
        F.array().cast("array<int>")
    )


def shingle_array(col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array — computed entirely
    row-locally (no explode, no shuffle): the scale-path input to
    MinHash/SimHash."""
    toks = tokens(col)
    idx = seq1(F.size(toks) - (n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token stats, stopword ratio.

    Mirrors the common pretraining-corpus filters (length bounds, symbol
    ratios, stopword presence).
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    en_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS["en"])))
    return df.select(
        "*",
        F.length(text_col).alias("q_n_chars"),
        n_tok.alias("q_n_tokens"),
        (total_len.cast("double") / F.greatest(n_tok, F.lit(1))).alias("q_avg_token_len"),
        (en_hits.cast("double") / F.greatest(n_tok, F.lit(1))).alias("q_stopword_ratio"),
        F.size(F.array_distinct(toks)).alias("q_n_distinct_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.greatest(n_tok, F.lit(1))).alias(
            "q_distinct_ratio"
        ),
    )


def _stopword_hits(toks: Column, stopwords: tuple[str, ...]) -> Column:
    # nb: the lambda must be unary — PySpark binds extra lambda params as
    # positional lambda variables, not Python closures
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))


def lang_scores(col: str | Column = "text") -> dict[str, Column]:
    """Per-language stopword hit counts."""
    toks = tokens(col)
    return {lang: _stopword_hits(toks, sw) for lang, sw in STOPWORDS.items()}


def lang_id(col: str | Column = "text") -> Column:
    """argmax over language scores; ties broken by language-code order
    (deterministic). Unknown when no stopword hits at all."""
    scores = lang_scores(col)
    best = None
    best_lang = None
    for lang in sorted(scores):  # fixed order => deterministic tie-break
        s = scores[lang]
        if best is None:
            best, best_lang = s, F.lit(lang)
        else:
            gt = s > best
            best_lang = F.when(gt, F.lit(lang)).otherwise(best_lang)
            best = F.when(gt, s).otherwise(best)
    return F.when(best > 0, best_lang).otherwise(F.lit("und"))


def fingerprint(col: str | Column = "text") -> Column:
    """Rolling polynomial hash over token hashes:
    ``fold(tokens, 0, (acc, t) -> (acc*31 + hash60(t)) % FP_MOD)``.
    Order-sensitive (a true document fingerprint, not a bag hash)."""
    hashes = F.transform(tokens(col), hash60)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % FP_MOD,
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1):
    fraction of tokens taken by the most frequent token, fraction of
    2-grams taken by the most frequent 2-gram, and the fraction of
    2-grams that occur more than once (counted with multiplicity).
    High values flag boilerplate / spam for corpus filtering.

    Implementation note (measured, sf0.1/5k docs): this is the one text
    operator where an Arrow-batched pandas UDF beats Catalyst
    higher-order functions — per-element lambda aggregation over structs
    is interpreted (no codegen), costing ~14 s where hash-map counting
    in the UDF takes ~1 s. Still row-local: no shuffle, Arrow-bounded
    memory, same 100 TB shape as the pure-SQL variant. Tokenization
    matches ``tokens()`` exactly (ASCII ``\\s+`` split, empties
    dropped)."""

    @F.pandas_udf(
        "r_top_token_frac double, r_top_2gram_frac double, r_dup_2gram_frac double"
    )
    def _rep(texts: pd.Series) -> pd.DataFrame:
        import re as _re
        from collections import Counter

        out = []
        for t in texts:
            toks = [x for x in _re.split(r"\s+", t or "", flags=_re.ASCII) if x]
            n = len(toks)
            if n == 0:
                out.append((0.0, 0.0, 0.0))
                continue
            top = max(Counter(toks).values()) / n
            if n == 1:
                out.append((top, 0.0, 0.0))
                continue
            c2 = Counter(zip(toks, toks[1:]))
            n2 = n - 1
            out.append(
                (
                    top,
                    max(c2.values()) / n2,
                    sum(v for v in c2.values() if v > 1) / n2,
                )
            )
        return pd.DataFrame(
            out,
            columns=["r_top_token_frac", "r_top_2gram_frac", "r_dup_2gram_frac"],
        )

    return (
        df.withColumn("__rep", _rep(F.col(text_col)))
        .select("*", "__rep.*")
        .drop("__rep")
    )


#: PII patterns restricted to constructs shared by Java regex (Spark)
#: and RE2 (DuckDB): no lookarounds, no backreferences. Scrub order
#: matters (email before ip before phone) — replacements contain no
#: digits, so later patterns can't re-match scrubbed spans.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d[\d-]{7,}\d", "<PHONE>"),
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact email / IPv4 / phone-shaped spans, keeping per-kind match
    counts (the audit trail a curation pipeline logs). Row-local
    regexp_replace chain — narrow, codegen-friendly, no Python."""
    out = df
    scrubbed = F.col(text_col)
    for kind, (pat, repl) in PII_PATTERNS.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(scrubbed, F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("scrubbed", scrubbed)


#: GPT-2-style pre-tokenizer regex, restricted to constructs shared by
#: Java regex (Spark) and RE2 (DuckDB): contractions, space-prefixed
#: letter runs, digit runs, punctuation runs. No lookarounds, no \p
#: classes — byte-identical token streams across engines.
BPE_SPLIT_REGEX = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(col: str | Column = "text") -> Column:
    """BPE-ish pre-tokenization (the split step every BPE/WordPiece
    tokenizer runs before merges): array of raw token strings. The merge
    table itself is model-specific — plug a real tokenizer into a pandas
    UDF for exact token ids; this column gives the scale-relevant stats
    (token counts, length histograms) with zero Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_REGEX), 0)


def bpe_token_count(col: str | Column = "text") -> Column:
    return F.size(bpe_tokens(col))


#: Normalization steps shared by Java regex (Spark) and RE2 (DuckDB):
#: strip C0/C1 control chars (keep \t\n\r), collapse runs of whitespace
#: to one space, trim. Unicode NFC is available as an opt-in pandas-UDF
#: stage (``nfc=True``) — Spark has no JVM-side normalizer, so NFC is
#: the one Python step in the chain (Arrow-batched stdlib
#: unicodedata; DuckDB's nfc_normalize mirrors it in the oracle).
CONTROL_CHARS_REGEX = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def _nfc(col: Column) -> Column:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc_udf(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return nfc_udf(col)


def normalize_text(df: DataFrame, text_col: str = "text", nfc: bool = False) -> DataFrame:
    """Row-local text cleanup: optional Unicode NFC, control-char strip,
    whitespace collapse, trim — emitted as ``norm_text`` with a
    ``changed`` flag. The regex chain is map-only codegen fused into the
    scan at any scale; NFC (off by default) adds one Arrow-batched
    pandas stage, still map-only (no shuffle, partitioning unchanged)."""
    src = _nfc(F.col(text_col)) if nfc else F.col(text_col)
    cleaned = F.regexp_replace(src, CONTROL_CHARS_REGEX, "")
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return df.withColumn("norm_text", collapsed).withColumn(
        "changed", F.col("norm_text") != F.col(text_col)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Context-window chunking — split each document into overlapping
    token windows of ``size`` tokens advancing by ``stride`` (the
    pretraining-corpus assembly step upstream of sequence packing,
    ``llm/pack.py``). Output: (doc_id, chunk_id, n_tokens, chunk_text).

    A document with n tokens yields ``1 + ceil((n - size)/stride)``
    chunks (one chunk when n <= size, including empty docs); the last
    chunk may be short. Entirely row-local — tokenize, per-row index
    sequence, explode, slice — so it fuses into the scan with NO shuffle
    at any scale: 100 TB of documents chunk at scan speed, and the
    output inherits the input partitioning (no skew: a single huge doc
    expands to n/stride rows inside its own partition).

    ``carry_cols`` ride through the explode unchanged (e.g. the stream
    key for downstream packing) — carrying them here is free; joining
    them back later would cost a shuffle.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), *carry_cols, toks.alias("tk"))
    n = F.size(F.col("tk"))
    # integer ceil: 1 + (n - size + stride - 1) div stride, guarded at 1
    n_chunks = F.when(n <= F.lit(size), F.lit(1)).otherwise(
        F.lit(1) + ((n - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    )
    e = base.select("doc_id", *carry_cols, "tk", F.explode(seq1(n_chunks)).alias("i"))
    chunk = F.slice(F.col("tk"), (F.col("i") - 1) * stride + 1, size)
    return e.select(
        "doc_id",
        *carry_cols,
        (F.col("i") - 1).cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def terms(col: str | Column = "text") -> Column:
    """Lowercased alphabetic terms (runs of a-z), empties removed —
    the normalized vocabulary stream for TF-IDF / keyword extraction.
    Mirrored in SQL as string_split_regex(lower(text), '[^a-z]+')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z]+"), lambda t: t != "")


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_vocab_k: int = 10_000,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords: score = tf · ln(N/df),
    quantized to fixed-point µ-units (round(score·1e6) as BIGINT — the
    same cross-engine determinism device as ``llm/lm.py``) and ranked
    (score desc, term asc) per document.

    Scale shape: the document-frequency join is Zipf-hot ('the' appears
    in every document), so it rides the same skew-split as the LM
    scorers — head terms broadcast map-side, tail terms shuffle on
    near-uniform keys. N is a broadcast 1-row aggregate. The final
    per-doc top-k is a row_number window partitioned by doc_id —
    high-cardinality partition key, no skew.
    """
    from pyspark.sql import Window as W

    from reshape_on_flink_spark.llm.lm import LP_SCALE, _skew_split_count_join

    tok = spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(terms(text_col)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf has one row per (doc, term): the per-term row count IS the
    # document frequency, so the skew-split count join yields df directly.
    with_df = _skew_split_count_join(tf, ["term"], hot_vocab_k).withColumnRenamed(
        "cnt", "df"
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("_n").cast("double") / F.col("df").cast("double"))
        * F.lit(LP_SCALE)
    ).cast("long")
    scored = with_df.crossJoin(F.broadcast(n_docs)).select(
        "doc_id", "term", "tf", "df", score.alias("score_fp")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score_fp"), "term")
    return scored.select(
        "*", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Linear quality classifier (fastText-style scorer, fixed weights)
# ---------------------------------------------------------------------------

#: Fixed logistic-regression weights over the quality_features columns.
#: Literal constants shared with the SQL oracle; in production these come
#: from an offline-trained model (fastText / DSIR-style) — the operator
#: shape (row-local featurize + dot + sigmoid) is identical.
QC_BIAS = -3.0
QC_W_LOG_TOKENS = 0.35
QC_W_AVG_LEN = 0.25
QC_W_STOPWORD = 6.0
QC_W_DISTINCT = 1.5
QC_KEEP_THRESHOLD = 0.6


def quality_classifier(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model-based quality scoring: a fixed-weight logistic regression
    over :func:`quality_features` (the CCNet/fastText quality-classifier
    stage of a pretraining pipeline, distilled to its dataflow shape).

    Adds ``qc_score`` (sigmoid of the linear response, rounded to 6 dp so
    Spark and the DuckDB oracle agree bit-for-bit after the gate's 1e-9
    rounding) and ``qc_keep``. Entirely row-local expression math — no
    UDF, no shuffle; classifies 100 TB at scan speed.
    """
    f = quality_features(df, text_col)
    z = (
        F.lit(QC_BIAS)
        + F.lit(QC_W_LOG_TOKENS) * F.log(F.lit(1.0) + F.col("q_n_tokens"))
        + F.lit(QC_W_AVG_LEN) * F.col("q_avg_token_len")
        + F.lit(QC_W_STOPWORD) * F.col("q_stopword_ratio")
        + F.lit(QC_W_DISTINCT) * F.col("q_distinct_ratio")
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return f.withColumn("qc_score", score).withColumn(
        "qc_keep", F.col("qc_score") >= QC_KEEP_THRESHOLD
    )
