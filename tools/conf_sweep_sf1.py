"""Round-14 config sweep (verdict item 8 / guide §9): shuffle codec
(lz4 default vs zstd) and spark.sql.join.preferSortMergeJoin (true
default vs false = allow shuffled-hash) measured at sf1, where shuffle
bytes are real — sf0.1 cannot distinguish these from noise.

Codec and SMJ-preference are session-static (codec is read by the
shuffle serializer at executor setup; join planning happens per query),
so each variant runs in its OWN Spark session, sequentially, with the
same warm+min-of-reps methodology per query inside the session. Usage:

    python tools/conf_sweep_sf1.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

# shuffle-heavy representatives: TPC-H joins/aggs, distinct, LSH
# banded join, broadcast-semi decontaminate, window/topk, plus one
# keyed-Python stage (changelog) as the Arrow-boundary control
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q_agg_distinct",
    "q_topk_per_group",
    "q_dedup_exact",
    "q_minhash_near_dups",
    "q_similarity_topk",
    "q_decontaminate",
    "q_corpus_assembly",
    "q_changelog_window_agg",
]

VARIANTS = {
    "base": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "zstd_shj": {
        "spark.io.compression.codec": "zstd",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
}


def run_variant(name: str, confs: dict[str, str]) -> dict[str, float]:
    from pyspark.sql import SparkSession

    from reshape_on_flink_spark.queries import merged
    from reshape_on_flink_spark.session import get_spark

    # codec is context-static: each variant gets its own fresh context
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(f"conf_sweep_{name}", extra_confs=confs)
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = merged()

    def run(q):
        queries[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for q in QUERIES:  # warm
        run(q)
    samples: dict[str, list[float]] = {q: [] for q in QUERIES}
    for _ in range(REPS):
        for q in QUERIES:
            spark.sparkContext.setJobDescription(f"{name}:{q}")
            t0 = time.perf_counter()
            run(q)
            samples[q].append(time.perf_counter() - t0)
    spark.stop()
    return {q: round(min(s), 3) for q, s in samples.items()}


def main() -> None:
    out = {}
    for name, confs in VARIANTS.items():
        out[name] = run_variant(name, confs)
        print(json.dumps({name: out[name]}), flush=True)
    base = out["base"]
    for name in out:
        tot = sum(out[name].values())
        print(f"{name:10s} total={tot:7.2f}s " + " ".join(
            f"{q}:{base[q] / out[name][q]:.2f}x" for q in QUERIES
        ), flush=True)


if __name__ == "__main__":
    main()
