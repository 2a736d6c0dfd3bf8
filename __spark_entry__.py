"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's canonical migrate
flow) on sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle; the registry lives in
``node_mongo2influx_spark/plans/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _registry():
    from node_mongo2influx_spark.plans import load_registry

    return load_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg["migrate_events"].fn(spark, "/root/testdata/sf0.001")


#: Round-4 window ordering. The driver checks a 50-query prefix, so each
#: round the prefix leads with queries that lack a driver-green row for
#: their CURRENT code: (a) changed or added this round, (b) never green
#: with their current oracle, then (c) everything whose last green row is
#: r1/r2-era (i.e. outside round 3's window — CORRECTNESS_r03's keys),
#: and finally the r3-green remainder.
#: 65 queries lack a driver row for their current code but the window is
#: 50 — so rank by what a driver row would PROVE: (1) full-oracle queries
#: with no row ever (hash match = strongest evidence), (2) the two whose
#: current oracle never got a row in r3, (3) changed-code queries that
#: have old green rows (local gate re-verified them; q5/q3 first — they
#: are headline), (4) rows-only tiers last (a driver row only proves
#: rows > 0; their real gates are the pytest recall/accuracy checks).
_RECHECK_FIRST = (
    # (0) VERDICT r3 item #1: the two multimodal queries whose current
    # oracles have never had a driver row — pinned to the very front so
    # later registry growth can never push them past the window edge.
    "multimodal_frame_sample",
    "multimodal_features",
    # (0b) added after the r3 snapshot — no driver row exists yet
    "bm25_multi_query_topk",
    "dedup_modality_agreement",
    "rollup_incremental_refresh",
    "sft_render_truncate",
    "sliding_distinct_users",
    "winsorize_by_type",
    "entity_resolution_pairs",
    "k_anonymity_audit",
    "pagerank_cust_supp",
    "dup_transitivity_audit",
    "seasonal_baseline_residual",
    "unpivot_event_matrix",
    # (1) full-oracle, never ANY driver row — round-4 first half
    "doc_chunk_overlap",
    "training_order_shuffle",
    "corpus_segment_dedup",
    "dedup_incremental_delta",
    "cooccurrence_topk",
    "doc_char_entropy",
    "pii_redaction_stats",
    "doc_perplexity_bigram",
    "multimodal_mime_sniff",
    "multimodal_image_dims",
    "minhash_band_agreement",
    "ann_recall_probe",
    "quality_lang_matrix",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_promo_part_suppliers",
    "bpe_merge_pair_stats",
    "url_domain_stats",
    "dedup_url_canonical",
    "embedding_norm_qa",
    "window_cume_ntile",
    "events_user_funnel",
    "orders_fill_rate_asof",
    "ohlc_vwap_hourly",
    "locf_forward_fill",
    "recursive_event_chains",
    "lateral_top_orders",
    "variant_json_typed",
    # (1) full-oracle, never ANY driver row — round-4 second half
    "domain_mixture_weights",
    "quota_sample_per_source",
    "length_bucket_padding_stats",
    "word_subsample_weights",
    "bm25_keyword_topk",
    "cdc_chunking",
    "embedding_gram_matrix",
    "random_projection_jl",
    "cdc_shared_chunks",
    "gopher_quality_flags",
    "cooccurrence_pmi",
    "mad_robust_outliers",
    "retention_cohorts",
    "multimodal_audio_meta",
    "cusum_drift_alarms",
    "rfm_segmentation",
    "rolling_median_value",
    "feature_hashing_vectors",
    "hybrid_retrieval_rrf",
    "table_diff_checksum",
    "dq_expectations",
    "null_safe_join_probe",
    "cusum_drift_chunked",
    # (3) changed code, stale-but-green old rows (headline first)
    "q5_revenue_by_nation",
    "q3_top_unshipped_revenue",
    "q7_nation_trade_flow",
    "q15_top_supplier",
    "tfidf_top_terms",
    "q16_supplier_variety",
    # (4) rows-only tiers — pytest gates are their real check
    "dedup_minhash_lsh",
    "knn_cosine_pq",
    "knn_cosine_ivfpq",
    "semantic_dedup_ivf",
    "embedding_pca_project",
    "approx_top_words",
)

#: Queries with a green row in CORRECTNESS_r03.json (r3's 50-query
#: window) — their current code already has a fresh witness, so they sort
#: last; the r1/r2-era remainder goes in between.
_R3_GREEN = frozenset({
    "train_val_test_split", "pack_sequences", "window_range_moving_avg",
    "q10_returned_revenue", "q12_priority_by_returnflag",
    "q14_promo_revenue_pct", "q18_large_volume_customers",
    "window_lead_lag_delta", "doc_repetition_ratio", "label_centroid_cosine",
    "q9_profit_by_nation_year", "top_bigrams", "skew_salted_rollup",
    "q4_order_priority_check", "q13_customer_order_histogram",
    "q19_disjunctive_revenue", "q22_dormant_high_balance",
    "batch_session_windows", "embedding_neardup_ivf",
    "range_join_clicks_near_purchase", "q17_small_quantity_revenue",
    "q8_market_share", "dedup_filtered_corpus", "q21_waiting_supplier",
    "dedup_containment_pairs", "split_contamination_audit",
    "pack_sequences_ffd", "null_semantics_probe", "distinct_users_per_type",
    "scalar_string_math", "scalar_date_json", "pivot_event_matrix",
    "grouping_sets_explicit", "percentiles_by_type", "correlated_max_order",
    "udaf_geomean_value", "udtf_explode_props", "approx_percentiles_by_type",
    "grouped_zscore", "approx_distinct_users", "array_functions",
    "hypertable_rollup_5min", "sessionize_events", "gapfill_minutely",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_clusters",
    "dedup_clusters_lsh",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    reg = _registry()
    ordered = [n for n in _RECHECK_FIRST if n in reg]
    ordered += [
        n for n in reg if n not in _RECHECK_FIRST and n not in _R3_GREEN
    ]
    ordered += [n for n in reg if n in _R3_GREEN and n not in _RECHECK_FIRST]
    return {name: reg[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: qd.oracle for name, qd in _registry().items() if qd.oracle is not None
    }
