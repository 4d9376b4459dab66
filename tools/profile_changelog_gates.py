"""Decompose the changelog-gate bench entries: prep vs pandas replay vs
post-processing (§1 of the optimization guide — measure before changing).

For each gate this times, via the noop sink after one warm pass:
  full   — the registered query exactly as benched
  prep   — only the changelog-construction subplan (window + union today)

Run on a QUIET box. Usage: python tools/profile_changelog_gates.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from reshape_on_flink_spark.queries import merged
from reshape_on_flink_spark.session import get_spark, load_tables

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    fn()  # warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best:7.3f} s", flush=True)
    return best


def main():
    spark = get_spark("profile_changelog_gates")
    queries, _ = merged()

    ev = load_tables(spark, SF_DIR)["events"]

    # --- shared preps (mirrors the gate queries' construction) ---
    base_wagg = ev.select(
        "user_id", "event_id",
        F.col("ts").cast("long").cast("double").alias("t"),
        F.floor(F.col("value") * 100).cast("double").alias("amt"),
    )
    w_t = W.partitionBy("user_id").orderBy("t", "event_id")
    seqd = base_wagg.withColumn("rn", F.row_number().over(w_t))
    ins = seqd.select(
        "user_id", F.lit("+I").alias("_change_type"), "t", "amt",
        (F.col("rn") * 2).cast("long").alias("oseq"),
    )
    dels = seqd.where(F.col("event_id") % 3 == 0).select(
        "user_id", F.lit("-D").alias("_change_type"), "t", "amt",
        (F.col("rn") * 2 + 1).cast("long").alias("oseq"),
    )
    prep_union = ins.unionByName(dels)

    for name in (
        "q_changelog_window_agg",
        "q_changelog_session_agg",
        "q_retractable_topn",
        "q_updatable_topn",
        "q_changelog_join_transitions",
    ):
        spark.sparkContext.setJobDescription(f"full:{name}")
        timed(f"{name} FULL", lambda n=name: noop(queries[n](spark, SF_DIR)))

    spark.sparkContext.setJobDescription("prep:union-window (wagg shape)")
    timed("prep only: window+union changelog (wagg)", lambda: noop(prep_union))

    # operator-only: replay over a pre-materialized changelog
    from reshape_on_flink_spark.streaming.changelog import window_agg_changelog

    mat = prep_union.localCheckpoint()
    spark.sparkContext.setJobDescription("op:window_agg_changelog on ckpt input")
    timed(
        "op only: window_agg_changelog (tumble) on ckpt",
        lambda: noop(
            window_agg_changelog(
                mat, "user_id", "t",
                {"cnt": ("count", None), "amt_sum": ("sum", "amt"),
                 "amt_max": ("max", "amt")},
                size=3600.0, order_by="oseq",
            )
        ),
    )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
