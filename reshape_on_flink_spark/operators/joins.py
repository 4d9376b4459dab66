"""Join operators beyond Spark's built-ins: as-of, bucketed-range, salted.

Reference parity:
- as-of      -> temporal/versioned join, ``TemporalRowTimeJoinOperator.java:78``
- range      -> interval join, ``TimeIntervalJoin.java:51``
- salted     -> the Reshape mechanism's batch cousin for *joins* (AQE
                covers most cases; explicit salting is for extreme keys)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, the latest right row with
    ``right_time < left_time`` (``<=`` when strict=False), per key.

    Implementation is the union + carry-forward formulation: tag both
    inputs, union, sort per key by (time, side), and carry the last right
    payload forward with last_value(ignore nulls). Cost: ONE shuffle +
    sort on the key — the same plan shape as a window aggregate. The
    naive alternative (theta join + row_number) shuffles both tables AND
    explodes matches before ranking; at 100 TB the union formulation is
    the only one that bounds intermediate size. (pd.merge_asof via
    applyInPandas would also work but leaves the JVM.)

    Left rows keep all their columns; right payload columns arrive as
    ``asof_<name>`` (null when no prior right row exists).
    """
    # side marker resolves equal-timestamp ordering: strict puts left
    # rows first (a right row at t must NOT be visible to a left row at
    # t), non-strict puts right rows first (version AT t is valid)
    l_marked = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    r_marked = right.withColumn("_t", F.col(right_time)).withColumn("_side", F.lit(0))

    # align schemas for the union: missing columns become nulls
    l_aligned = l_marked.select(
        "_t",
        "_side",
        F.col(key).alias("_k"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rp_{c}") for c in right_payload],
    )
    r_aligned = r_marked.select(
        "_t",
        "_side",
        F.col(key).alias("_k"),
        F.lit(None).cast(l_marked.select(F.struct(*[F.col(c) for c in left.columns])).dtypes[0][1]).alias("_lrow"),
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
    )
    unioned = l_aligned.unionByName(r_aligned)
    order = [F.col("_t")] + ([F.col("_side").desc()] if strict else [F.col("_side")])
    w = W.partitionBy("_k").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    carried = unioned.select(
        "_side",
        "_lrow",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(f"_rp_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_payload
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        "_lrow.*", *[f"asof_{c}" for c in right_payload]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Equi-key join with a time-band predicate
    ``l.t + lower <= r.t <= l.t + upper``, bucketized.

    A plain theta band join degenerates: Spark equi-joins on ``key`` only
    and filters the band after, so one hot key fans in every pair. Adding
    a coarse time bucket to the join key bounds per-task fan-in to
    2 buckets x band width. Bucket width = band width, so each left row
    joins exactly 2 right buckets (explode factor 2, constant).
    """
    width = max(upper_seconds - lower_seconds, 1)
    l_bucket = F.floor((F.unix_micros(F.col(left_time)) / 1_000_000 + lower_seconds) / width)
    r_bucket = F.floor(F.unix_micros(F.col(right_time)) / 1_000_000 / width)
    l_exp = left.withColumn("_b", F.explode(F.array(l_bucket.cast("long"), l_bucket.cast("long") + 1)))
    r_b = right.withColumn("_b", r_bucket.cast("long"))
    lt_us = F.unix_micros(F.col(left_time))
    rt_us = F.unix_micros(F.col(right_time))
    return (
        l_exp.join(
            r_b,
            (l_exp[key] == r_b[key])
            & (l_exp["_b"] == r_b["_b"])
            & (rt_us >= lt_us + lower_seconds * 1_000_000)
            & (rt_us <= lt_us + upper_seconds * 1_000_000),
        )
        .drop(r_b[key])  # keep one unambiguous key column
        .drop("_b")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant inner equi-join: salt the (large, skewed) left side
    by a random-free deterministic hash of its rows, replicate the right
    side n_salts times, join on (key, salt).

    Prefer AQE's skew-join splitting (on by default in this engine) —
    this explicit form is for the cases AQE can't fix: a single key
    larger than any split threshold, or non-shuffle joins. Cost: right
    side is replicated n_salts x (use only when |right| << |left|).
    """
    l_salted = left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        l_salted.join(r_replicated, [key, "_salt"])
        .drop("_salt")
    )
