"""Changelog (CDC) operators — the reference's RowKind model, made explicit.

Reference: ``RowKind.java:31-52`` (+I insert, -U update-before, +U
update-after, -D delete), ``StreamExecChangelogNormalize.java:61`` (dedup
an upsert stream into a clean changelog) and
``StreamExecDropUpdateBefore.java`` / ``DropUpdateBeforeFunction.java``.

This engine does not thread retractions through every operator (Spark's
output modes replace that machinery — SURVEY.md §1.1); instead changelogs
are *data*: an explicit ``_change_type`` column, with operators to
normalize, filter, snapshot, and diff. This is also how Delta/Iceberg CDF
expose changes, so the model is the ecosystem-native one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: RowKind.java:31-52
INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE = "+I", "-U", "+U", "-D"
CHANGE_COL = "_change_type"


def drop_update_before(df: DataFrame, change_col: str = CHANGE_COL) -> DataFrame:
    """Strip -U rows (DropUpdateBeforeFunction): downstream consumers that
    key on the primary key don't need the retraction half of an update."""
    return df.where(F.col(change_col) != UPDATE_BEFORE)


def changelog_normalize(
    df: DataFrame, keys: list[str], seq_col: str, change_col: str = CHANGE_COL
) -> DataFrame:
    """Materialize the current table state from a changelog: keep each
    key's latest change (by seq_col), drop keys whose latest change is a
    delete (StreamExecChangelogNormalize semantics).

    One shuffle on the key; Spark 3.5+ plans the rn=1 filter as
    WindowGroupLimit (per-partition partial top-1 before the shuffle)."""
    w = W.partitionBy(*keys).orderBy(F.desc(seq_col))
    return (
        df.where(F.col(change_col) != UPDATE_BEFORE)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(change_col) != DELETE))
        .drop("_rn", change_col)
    )


def snapshot_diff(
    before: DataFrame, after: DataFrame, keys: list[str], compare: list[str]
) -> DataFrame:
    """Diff two snapshots into a changelog (+I / -U / +U / -D rows) — the
    inverse of changelog_normalize, useful for CDC tests and for emitting
    changes from batch recomputations. One full-outer join on the keys."""
    b = before.select(*keys, *compare).alias("b")
    a = after.select(*keys, *compare).alias("a")
    cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"a.{k}")) for k in keys]
    joined = b.join(a, cond, "full_outer")
    b_key = F.col(f"b.{keys[0]}")
    a_key = F.col(f"a.{keys[0]}")
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"b.{c}").eqNullSafe(F.col(f"a.{c}"))

    inserts = joined.where(b_key.isNull()).select(
        F.lit(INSERT).alias(CHANGE_COL), *[F.col(f"a.{c}").alias(c) for c in keys + compare]
    )
    deletes = joined.where(a_key.isNull()).select(
        F.lit(DELETE).alias(CHANGE_COL), *[F.col(f"b.{c}").alias(c) for c in keys + compare]
    )
    updates_before = joined.where(b_key.isNotNull() & a_key.isNotNull() & changed).select(
        F.lit(UPDATE_BEFORE).alias(CHANGE_COL), *[F.col(f"b.{c}").alias(c) for c in keys + compare]
    )
    updates_after = joined.where(b_key.isNotNull() & a_key.isNotNull() & changed).select(
        F.lit(UPDATE_AFTER).alias(CHANGE_COL), *[F.col(f"a.{c}").alias(c) for c in keys + compare]
    )
    return inserts.unionByName(updates_before).unionByName(updates_after).unionByName(deletes)


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    attrs: list[str] | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change stream:
    each key's versions get ``valid_from`` (its change time),
    ``valid_to`` (the NEXT version's change time, null while current)
    and ``is_current`` — the standard warehouse dimension-history shape
    (reference analog: the versioned-table side of `FOR SYSTEM_TIME AS
    OF` temporal joins, `StreamExecTemporalJoin`; this operator
    MATERIALIZES that version history as a table).

    One shuffle on the key; the interval close is a single LEAD window
    over it (partition size = versions per key). Joinable back via
    ``operators/joins.asof_join`` or a plain range predicate.

    ``(keys, seq_col)`` must totally order the versions; when the
    change stream can carry two versions of a key at the same sequence
    value, pass ``tie_cols`` (e.g. the change id) — they extend the
    window order AND the output (consumers need them to disambiguate
    the zero-length interval the tie produces). Same tie-ambiguity
    class as the window-frame queries' l_partkey fix.
    """
    tie_cols = list(tie_cols or [])
    cols = attrs if attrs is not None else [
        c for c in df.columns if c not in keys and c != seq_col and c not in tie_cols
    ]
    w = W.partitionBy(*keys).orderBy("valid_from", *tie_cols)
    return df.select(
        *keys, *tie_cols, *cols, F.col(seq_col).alias("valid_from")
    ).select(
        "*",
        F.lead("valid_from").over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
