"""Aggregation operators: the distinct-split (skew) rewrite.

Reference: ``SplitAggregateRule.scala`` (enabled at
``FlinkStreamRuleSets.scala:363``) — Flink splits COUNT(DISTINCT) into a
two-level aggregation on a hash bucket of the distinct column so a hot
group key doesn't serialize on one worker. Catalyst performs an
Expand-based rewrite for *multiple* distinct aggs but not this bucketed
split for a single skewed group; this operator is the explicit form, and
the one the streaming engine uses (Structured Streaming forbids distinct
aggregates entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_buckets: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Two-level COUNT(DISTINCT):

    level 1: groupBy(group, bucket(distinct_col)) -> count distinct
             within the bucket (bucket fan-out breaks the hot group);
    level 2: groupBy(group) -> sum of per-bucket counts (exact, because
             buckets partition the distinct value space).

    Both levels get map-side partial aggregation; the worst-case reducer
    now sees |group|/n_buckets of the hot key's values.
    """
    bucket = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_buckets))
    level1 = (
        df.groupBy(*group_cols, bucket.alias("_bucket"))
        .agg(F.count_distinct(F.col(distinct_col)).alias("_partial"))
    )
    return level1.groupBy(*group_cols).agg(F.sum("_partial").cast("long").alias(out_col))


def split_sum_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_buckets: int = 64,
    out_col: str = "sum_distinct",
) -> DataFrame:
    """SUM(DISTINCT x) via the same bucketed split (buckets partition the
    value space, so per-bucket distinct sums add exactly)."""
    bucket = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_buckets))
    level1 = (
        df.groupBy(*group_cols, bucket.alias("_bucket"))
        .agg(F.sum_distinct(F.col(distinct_col)).alias("_partial"))
    )
    return level1.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))
