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
    # round-12 rotation (verdict r11 #8: cycle the oldest-unchecked
    # queries to the front). Recomputed from the committed
    # CORRECTNESS_r*.json files: the new round-12 gate first (no
    # driver row yet), then every query whose latest driver row is
    # round 3 (the stalest evidence in the ledger), then round-4
    # rows to fill the 50-slot cap (+10 queued spares beyond it).
    "q_cep_timeout_group_until",
    "q_cep_timeout_group_opt",
    "q_cep_timeout_greedy",
    # latest driver evidence: round 3
    "q_bpe_token_stats",
    "q_decontaminate",
    "q_dedup_clusters",
    "q_fingerprint",
    "q_lang_id",
    "q_llm_pipeline",
    "q_minhash_near_dups",
    "q_ngram_jaccard",
    "q_pii_scrub",
    "q_repetition_filter",
    "q_simhash",
    "q_similarity_ann_lsh",
    "q_similarity_ivf",
    "q_similarity_ivf_trained",
    "q_similarity_topk",
    "q_text_quality",
    # latest driver evidence: round 4
    "q10_returned_items",
    "q11_important_supply",
    "q12_priority_class",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q1_pricing_summary",
    "q20_supply_candidates",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q_dialect_catalog_roundtrip",
    "q_distinct_rows",
    "q_domain_mix_sample",
    "q_ds_antijoin_returns",
    "q_ds_bucket_case",
    "q_ds_channel_intersect",
    "q_ds_channel_tolerance",
    "q_ds_cumulative_cross",
    "q_ds_exists_demographics",
    "q_ds_frequent_item_best_customer",
    "q_ds_pivot_monthly",
    "q_ds_returns_net",
    "q_ds_rollup_rank",
    "q_ds_scalar_count_grid",
    "q_ds_ship_lag_matrix",
    "q_ds_unpivot_monthly",
    "q_ds_wide_star_yoy",
    "q_ds_yoy_customer_filter",
    "q_embedding_near_dup",
    "q_embedding_quantize",
    "q_filter_clause_agg",
    "q_join_full_outer",
    "q_join_left_outer",
    "q_join_right_outer",
    "q_join_semi",
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
