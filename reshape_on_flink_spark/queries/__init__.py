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
    # round-13 rotation (verdict r12 #7: keep cycling — recomputed from
    # the committed CORRECTNESS_r*.json ledgers this round). After the
    # r11+r12 driver runs, no query is driver-unchecked and the stalest
    # evidence is: 19 queries last seen in round 4, then 50 last seen in
    # round 5 (rounds 3-and-earlier all refreshed by r12). Order below =
    # the full round-4 block, then round-5 alphabetical to fill the
    # 50-slot cap (+19 queued spares past it). New round-13 gate queries
    # (no driver row yet) are prepended as they land.
    "q_cep_timeout_group_not",
    "q_cep_timeout_group_greedy",
    "q_cep_timeout_group_times",
    "q_cep_timeout_comb_greedy",
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
    "q_minhash_signatures",
    "q_multimodal_features",
    "q_multimodal_meta",
    "q_nullsafe_join",
    "q_quantized_topk",
    "q_sequence_pack",
    "q_star_join_region_revenue",
    # latest driver evidence: round 5
    "q_bigram_perplexity",
    "q_bloom_decontam",
    "q_cms_heavy_hitters",
    "q_contamination_rate",
    "q_corpus_assembly",
    "q_corpus_overlap_minhash",
    "q_corpus_trigram_topk",
    "q_curation_v2",
    "q_dedup_keep_best",
    "q_doc_chunks",
    "q_domain_upsample",
    "q_ds_above_nation_avg_returns",
    "q_ds_before_after_ratio",
    "q_ds_bracketed_or_join",
    "q_ds_channel_overlap_census",
    "q_ds_correlated_exists_or",
    "q_ds_correlated_window_ratio",
    "q_ds_dual_rank_return_ratio",
    "q_ds_exists_notexists_distinct",
    "q_ds_first_purchase_cohort",
    "q_ds_inventory_chain",
    "q_ds_lifecycle_chain",
    "q_ds_multi_cte_reuse",
    "q_ds_ranked_dim_rollup",
    "q_ds_revenue_share",
    "q_ds_two_cte_union_channels",
    "q_ds_two_year_star_join",
    "q_ds_variance_flag_chain",
    "q_funnel_conversion",
    "q_hist_quantiles",
    "q_hll_distinct",
    "q_hll_intersect_est",
    "q_hll_rollup",
    "q_join_anti",
    "q_join_cross",
    "q_length_batches",
    "q_passage_dedup",
    "q_profile_table",
    "q_quality_classifier",
    "q_quality_percentile_gate",
    "q_scd2_intervals",
    "q_shard_manifest",
    "q_similarity_ivfpq",
    "q_similarity_pq",
    "q_similarity_pq_rerank",
    "q_stratified_sample",
    "q_text_normalize",
    "q_tfidf_top_terms",
    "q_train_val_test_split",
    "q_unigram_perplexity",
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
