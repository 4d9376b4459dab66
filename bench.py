"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via the noop sink (full execution, no driver
collect). The headline set spans the engine's surface: scan-agg, joins,
windows, streaming semantics, dedup/LSH, similarity, text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q_agg_distinct",
    "q_window_running_sum",
    "q_topk_per_group",
    "q_tumble_window",
    "q_session_window",
    "q_interval_join",
    "q_stream_static_join",
    "q_dedup_exact",
    "q_minhash_near_dups",
    "q_simhash",
    "q_similarity_topk",
    "q_text_quality",
    "q_fingerprint",
    # round-2 additions (recorded in BASELINE.md: headline set extended)
    "q_repetition_filter",
    "q_decontaminate",
    "q_match_recognize_nested",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from reshape_on_flink_spark.queries import merged
    from reshape_on_flink_spark.session import get_spark

    queries, _ = merged()
    spark = get_spark("bench")
    # warm the JVM + fs cache outside the measured window: file-index the
    # bench tables and run two representative queries at sf0.001 so
    # whole-stage-codegen compilation and the noop sink are JIT'd before
    # any measured run (BASELINE methodology: warm JVM)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for warm_q in (
            "q1_pricing_summary", "q_simhash", "q_text_quality", "q_minhash_near_dups",
            "q_repetition_filter", "q_decontaminate", "q_match_recognize_nested",
        ):
            queries[warm_q](spark, warm_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Reshape skew layer: replay the events stream through the adaptive
    # salted aggregation with the controller on vs off (same result set;
    # measures the mechanism's overhead at this SF — its win shows on
    # skewed clusters where one reducer would otherwise serialize)
    import shutil

    from reshape_on_flink_spark.session import load_tables
    from reshape_on_flink_spark.streaming.reshape import ReshapeConf, ReshapeStreamingAgg
    from reshape_on_flink_spark.streaming.source import chunked_replay

    events = load_tables(spark, sf_dir)["events"]
    for label, enabled in (("skew_replay_plain", False), ("skew_replay_reshape", True)):
        replay_dir = os.path.join(".tmp", f"bench_{label}")
        ckpt = os.path.join(".tmp", f"bench_{label}_ckpt")
        shutil.rmtree(ckpt, ignore_errors=True)
        stream = chunked_replay(spark, events, replay_dir, n_chunks=5)
        agg = ReshapeStreamingAgg(
            "user_id", "value", "event_id", ReshapeConf(enabled=enabled, parallelism=32, freq_ms=0)
        )
        t0 = time.perf_counter()
        agg.attach(stream, ckpt).awaitTermination(300)
        timings[label] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(replay_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wallclock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cores": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
                "spark_version": spark.version,
            }
        )
    )


if __name__ == "__main__":
    main()
