"""Sketch aggregates: HyperLogLog distinct counting + Count-Min heavy
hitters + histogram quantiles — fixed-size mergeable state, the
approximate-aggregation tier every 100 TB engine needs. The reference
Flink version exposes NO approximate aggregates (grep APPROX in
flink-table/flink-table-planner-blink/.../functions/sql/
FlinkSqlOperatorTable.java — absent; Flink grew APPROX_COUNT_DISTINCT
later), so this tier is a beyond-reference addition in the same spirit
as the dedup/ANN stack: capabilities a 100 TB training-data engine
needs that the reference leaves to user code.

Why not Spark's approx_count_distinct / DuckDB's approx_distinct: their
internal HLL implementations differ, so results can never hash-match
across engines. These sketches are built from the repo's shared
md5→int60 primitive (llm/text.hash60) with integer-exact register
arithmetic, so the DuckDB oracle reproduces the sketch STATE bit-for-bit
and the estimates to the quantized digit — approximate in cardinality,
exact in computation.

Determinism devices:
- register scan: rho = position of the first 1-bit in the 50-bit suffix
  via lpad(bin(w)) + instr — byte-identical string ops in both engines;
- the harmonic sum Σ 2^-rho is computed as Σ 2^(51-rho) in BIGINT
  (every term integer-exact, order-free) and divided once in double;
- estimates are emitted in fixed-point milli-units (round(E·1000)), the
  same quantization the LM scorers use.

Scale shape: HLL registers partial-aggregate map-side (MAX per bucket
commutes), so the shuffle carries ≤ m=1024 rows per group regardless of
input size — count-distinct without the distinct shuffle. The CMS is a
fixed 4×256 grid per measured column: the classic bounded-state answer
to the same hot-key detection problem the Reshape controller
(streaming/reshape.py) solves by observation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.llm.text import hash60

# ---- HyperLogLog ----------------------------------------------------------

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 buckets
HLL_W_BITS = 50  # hash60 >> p fits in 50 bits
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _rho(w: Column) -> Column:
    """1-based position of the first 1-bit in the 50-bit suffix
    (= leading zeros + 1); 51 when the suffix is all zeros."""
    pos = F.instr(F.lpad(F.bin(w), HLL_W_BITS, "0"), "1")
    return F.when(pos == 0, F.lit(HLL_W_BITS + 1)).otherwise(pos)


def hll_registers(
    df: DataFrame, group_cols: list[str], col: str
) -> DataFrame:
    """(group..., _b, _reg): the HLL register table — MAX(rho) per
    (group, bucket). Map-side partial MAX means the exchange carries at
    most m rows per group whatever the input size."""
    h = hash60(F.col(col).cast("string"))
    bucket = h.bitwiseAND(HLL_M - 1)
    w = F.shiftright(h, HLL_P)
    rows = df.select(
        *group_cols, bucket.alias("_b"), _rho(w).alias("_rho")
    )
    return rows.groupBy(*group_cols, "_b").agg(F.max("_rho").alias("_reg"))


def hll_count_distinct(
    df: DataFrame, group_cols: list[str], col: str
) -> DataFrame:
    """(group..., hll_est_milli, hll_buckets_used): HLL cardinality
    estimate per group in fixed-point milli-units, with the standard
    linear-counting correction for the small range. ~2% typical error
    at p=10; state is 1024 small ints per group."""
    return hll_estimate(hll_registers(df, group_cols, col), group_cols)


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to a coarser grouping by MAX per
    bucket. MAX is associative/commutative, so merged registers are
    IDENTICAL to registers computed directly on the coarse group
    (pinned in tests) — store per-(day, dim) sketches once, roll up to
    any coarser cube cell without rescanning the data. This
    re-aggregability is the whole point of sketch state at 100 TB."""
    return regs.groupBy(*group_cols, "_b").agg(F.max("_reg").alias("_reg"))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers -> (group..., hll_est_milli, hll_buckets_used)."""
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_W_BITS + 1} - _reg AS INT))")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("_s_present"),
        F.count(F.lit(1)).alias("_present"),
    )
    two51 = 1 << (HLL_W_BITS + 1)
    s_total = F.col("_s_present") + (F.lit(HLL_M) - F.col("_present")) * F.lit(two51)
    zeros = F.lit(HLL_M) - F.col("_present")
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * two51) / s_total.cast("double")
    )
    est = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est * 1000).cast("long").alias("hll_est_milli"),
        F.col("_present").alias("hll_buckets_used"),
    )


# ---- Count-Min sketch -----------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_cell(col: Column, i: int) -> Column:
    return F.pmod(hash60(F.concat(F.lit(f"{i}:"), col.cast("string"))), F.lit(CMS_WIDTH))


def cms_sketch(df: DataFrame, col: str) -> DataFrame:
    """(row, cell, cnt): the CMS grid — depth×width counters, each value
    incrementing one cell per row. Fixed 4×256 state regardless of input
    size; counters partial-aggregate map-side (SUM commutes)."""
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _cms_cell(F.col(col), i).alias("cell"))
            for i in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, col: str
) -> DataFrame:
    """candidates + ``cms_est``: min over the value's depth cells —
    the classic overestimate-only point query (est >= true count,
    error <= 2n/width with prob 1-2^-depth). The sketch side is 1024
    rows — broadcast, so estimation is map-side on the candidates."""
    cells = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("row"), _cms_cell(F.col(col), i).alias("cell"))
                for i in range(CMS_DEPTH)
            ]
        )
    ).alias("rc")
    probes = candidates.select("*", cells).select(
        *candidates.columns, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(*candidates.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame, col: str, threshold: int
) -> DataFrame:
    """(value, cms_est): candidates whose CMS estimate reaches
    ``threshold``. CMS never underestimates, so recall is 1 — the
    sketch-based analog of the Reshape controller's hot-key detection
    (streaming/reshape.py), with O(1) state instead of observed
    per-batch counts."""
    sketch = cms_sketch(df, col)
    cands = df.select(F.col(col).alias("value")).distinct()
    est = cms_estimate(sketch, cands, "value")
    return est.where(F.col("cms_est") >= threshold)


# ---- Histogram quantile sketch --------------------------------------------

HIST_WIDTH = 10_000.0  # value-space bucket width (caller-tunable)


def histogram_sketch(
    df: DataFrame, group_cols: list[str], col: str, width: float = HIST_WIDTH
) -> DataFrame:
    """(group..., bucket, cnt): equi-width histogram — the quantile
    sketch companion to HLL/CMS. Counts partial-aggregate map-side and
    merge by SUM (losslessly re-aggregable like the HLL registers);
    state is value_range/width counters per group."""
    b = F.floor(F.col(col).cast("double") / F.lit(width)).cast("long")
    return (
        df.select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    width: float = HIST_WIDTH,
) -> DataFrame:
    """(group..., q, est): quantile estimates from the histogram — the
    upper edge of the first bucket whose cumulative count reaches q·n.
    Error is bounded by one bucket width; everything is integer
    arithmetic over exact counts (deterministic, oracle-replicable),
    unlike t-digest/KLL whose internals are engine-specific."""
    w = W.partitionBy(*group_cols).orderBy("bucket")
    cum = sketch.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(W.partitionBy(*group_cols)).alias("n"),
    )
    quantiles = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    probes = cum.select(*group_cols, "bucket", "cum", "n", quantiles)
    hits = probes.where(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n"))
    )
    return (
        hits.groupBy(*group_cols, "q")
        .agg(F.min("bucket").alias("_b"))
        .select(
            *group_cols,
            "q",
            ((F.col("_b") + 1) * F.lit(width)).alias("est"),
        )
    )


# ---- Bloom filter ---------------------------------------------------------
# Set-membership sketch: m bits as m/32 words (32 bits per BIGINT word —
# the sign bit stays clear, so `1 << bit` is in-range for BOTH engines;
# DuckDB raises on 1::BIGINT << 63), k md5-derived hash functions.
# Build is a tiny aggregation (≤ m/32 rows shuffle regardless of input
# size); the finished filter is a ~m/8-byte array BROADCAST to every
# probe task, so membership tests are map-only — the bounded-state
# replacement for a broadcast semi-join when the reference set outgrows
# the broadcast threshold (decontamination against a large benchmark
# suite being the canonical corpus use). False positives only, rate
# ≈ (1 - e^{-kn/m})^k; never false negatives — both properties tested.
# Same determinism contract as the other sketches: hash60-based
# positions, integer-exact word arithmetic, oracle-replicable
# bit-for-bit.

BLOOM_M = 4096  # bits
BLOOM_WORD_BITS = 32
BLOOM_WORDS = BLOOM_M // BLOOM_WORD_BITS
BLOOM_K = 3


def _bloom_pos(col: Column, i: int) -> Column:
    """Bit position of hash function ``i``: hash60('i:'||x) % m."""
    return F.pmod(hash60(F.concat_ws(":", F.lit(str(i)), col)), F.lit(BLOOM_M))


def _bit_mask(p: Column) -> Column:
    """``1 << (p % 32)`` as exact integer arithmetic. ``F.shiftleft``
    only takes a literal shift amount, so the mask is ``pow(2, bit)`` —
    exact in double for bits 0..31, then cast back to long."""
    return F.pow(F.lit(2.0), (p % BLOOM_WORD_BITS).cast("int")).cast("long")


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """Build the filter over ``df[col]``: one row, ``bloom``
    array<long> of BLOOM_WORDS words. Two-stage agg: per-word bit_or
    (≤ BLOOM_WORDS shuffle rows), then densify into the array."""
    pos = df.select(
        F.explode(
            F.array(*[_bloom_pos(F.col(col), i) for i in range(BLOOM_K)])
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / BLOOM_WORD_BITS).cast("int").alias("w"),
            _bit_mask(F.col("p")).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1)),
        lambda i: F.coalesce(F.element_at(F.col("wm"), i), F.lit(0).cast("long")),
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(dense.alias("bloom"))


def bloom_might_contain(col: Column) -> Column:
    """Membership predicate against a broadcast ``bloom`` array column
    (crossJoin(broadcast(bloom_build(...))) upstream): true iff ALL k
    bits are set. Pure expressions — map-only at any scale."""
    checks = []
    for i in range(BLOOM_K):
        p = _bloom_pos(col, i)
        word = F.element_at(F.col("bloom"), ((p / BLOOM_WORD_BITS).cast("int") + 1))
        checks.append(word.bitwiseAND(_bit_mask(p)) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def hll_set_estimates(
    df: DataFrame, col: str, part_col: str, a_val, b_val
) -> DataFrame:
    """Set-operation cardinality from sketches alone: distinct-count
    estimates for partition A, partition B, their union (register
    merge), and the INTERSECTION via inclusion–exclusion
    (|A∩B| ≈ |A| + |B| − |A∪B|, floored at 0 — the standard HLL
    intersection estimator; error grows as the Jaccard similarity
    shrinks, documented trade-off). All arithmetic is the engine-shared
    integer register math, so the oracle reproduces every estimate to
    the milli-unit. One register-table pass; merge/estimate stages
    carry ≤ m rows each."""
    regs_a = hll_registers(df.where(F.col(part_col) == a_val), [], col)
    regs_b = hll_registers(df.where(F.col(part_col) == b_val), [], col)
    regs_u = hll_merge(regs_a.unionByName(regs_b), [])
    est_a = hll_estimate(regs_a, []).select(
        F.col("hll_est_milli").alias("est_a_milli")
    )
    est_b = hll_estimate(regs_b, []).select(
        F.col("hll_est_milli").alias("est_b_milli")
    )
    est_u = hll_estimate(regs_u, []).select(
        F.col("hll_est_milli").alias("est_union_milli")
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .select(
            "*",
            F.greatest(
                F.col("est_a_milli") + F.col("est_b_milli") - F.col("est_union_milli"),
                F.lit(0).cast("long"),
            ).alias("est_intersect_milli"),
        )
    )
