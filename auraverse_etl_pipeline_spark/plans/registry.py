"""Query registry: every engine capability is exposed as a named query.

Each entry pairs a PySpark DataFrame-API implementation with (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string that
DuckDB can run on the same parquet tables. The driver compares the two
at sf=0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- every floating-point aggregate is summed as DECIMAL (exact, order-
  independent) and cast back to DOUBLE, so the hash cannot be broken by
  partial-aggregation order;
- every top-k / limit has a total deterministic ordering (explicit
  tie-break keys).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Modules that register queries on import.
_QUERY_MODULES = (
    "auraverse_etl_pipeline_spark.plans.analytics",
    "auraverse_etl_pipeline_spark.plans.ingest_queries",
    "auraverse_etl_pipeline_spark.plans.llm_queries",
    "auraverse_etl_pipeline_spark.plans.streaming_queries",
    "auraverse_etl_pipeline_spark.plans.pipeline_queries",
)


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    description: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, description: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, description=description)
        return fn

    return deco


#: Enumeration priority. The external driver scores a bounded prefix of
#: the registry (50 rows per round), so with ``len(all_queries())``
#: queries (194 at round-12 start — the count grows as tiers land)
#: full single-round attestation is impossible — the order rotates so
#: the least-recently-scored queries enumerate first each round.
#:
#: - ``_NEEDS_FRESH_SCORE``: brand-new or rewritten after their last
#:   green driver row — these go first. EVERY ROUND START: run
#:   ``tools/refresh_ledger.py`` to fold the latest
#:   CORRECTNESS_r{N}.json into ``_LAST_GREEN``, then reset this tuple
#:   to just the names that came back red or get rewritten/added this
#:   round.
#: - everything else is ordered by ``_LAST_GREEN`` (the latest round
#:   whose CORRECTNESS_r0N.json carries a green row for the name):
#:   oldest evidence enumerates first. Round-12 window arithmetic: the
#:   oldest cohorts were 6 r7 + 47 r8 = 53 names against the 50-slot
#:   window, so round 12 ran as a consolidation round — every new
#:   query spills one more r8 name to round 13.
#: GROWTH POLICY (round 13): at ~200 queries the 50-slot window already
#: puts re-scoring on a ~4-round cadence, so registry growth is capped
#: at 2-3 names per round and ONLY for a genuinely new capability tier
#: (a maintenance/audit surface or a cross-tier composition that exists
#: nowhere else) — never a fourth configuration of an existing tier.
#: A new configuration of an existing operator belongs in pytest, where
#: coverage is free; a new registry name costs one stale slot per round
#: forever.
_NEEDS_FRESH_SCORE: tuple[str, ...] = (
    # round 18 start: CORRECTNESS_r17.json folded into _LAST_GREEN
    # (50 scored, 50 hash-green, zero red; all 207 names green at
    # latest evidence). Round 18 is optimization round 2 of 2 — the
    # growth policy and the round contract both forbid new queries, so
    # this tuple is empty and the window re-fronts the oldest-evidence
    # cohorts (r13/r14). The exact-substring family registration note
    # from round 17 (run_stream_substring_gate as the novelty-gate
    # registration pattern) stays in git history for any future build
    # work; nothing is staged this round.
)

#: name → latest round with a green (or rows-only-recorded) driver row,
#: from CORRECTNESS_r0{1..10}.json. Regenerate each round with
#: ``tools/refresh_ledger.py``. Names absent here and not in
#: ``_NEEDS_FRESH_SCORE`` (i.e. never scored) sort first.
_LAST_GREEN = {
    # round 13
    "compact_decisions": 13,
    "q44_global_ids": 13,
    "q45_messy_date_ladder": 13,
    "q46_approx_percentile_scale_path": 13,
    "q47_cascade_delete_audit": 13,
    "q48_gap_filled_daily_revenue": 13,
    "q49_shuffled_hash_strategy": 13,
    "stream_ivf_assign": 13,
    "stream_semdedup_gate": 13,
    # round 14
    "corpus_data_card": 14,
    "corpus_snapshot_diff": 14,
    "curation_funnel": 14,
    "dedup_embedding_clean": 14,
    "dedup_incremental_minhash": 14,
    "dedup_lsh_quality_audit": 14,
    "dedup_minhash_pairs": 14,
    "fixture_schema_field_types": 14,
    "ingest_url_canonicalize": 14,
    "mix_length_buckets": 14,
    "mix_stratified_quota": 14,
    "mix_temperature_sampling": 14,
    "mix_weighted_sample": 14,
    "multimodal_bmp_features": 14,
    "multimodal_feature_digest": 14,
    "multimodal_resize_digest": 14,
    "q09_nation_year_profit": 14,
    "q28_sketch_distinct_users": 14,
    "q54_user_value_anomalies": 14,
    "sim_contrastive_pairs": 14,
    "sim_hybrid_search": 14,
    "sim_ivfpq_rebalance": 14,
    "sim_random_projection": 14,
    "sim_retrieval_quality_audit": 14,
    "sim_topk_ivf": 14,
    "sql_udaf_source_stats": 14,
    "stream_bm25_index": 14,
    "stream_compaction_dedup": 14,
    "stream_enriched_segment_revenue": 14,
    "stream_incremental_dedup": 14,
    "stream_ingest_fragment_summary": 14,
    "stream_logreg_gate": 14,
    "stream_purchase_attribution": 14,
    "stream_quality_gate": 14,
    "text_bm25_index": 14,
    "text_bm25_merge": 14,
    "text_bm25_search": 14,
    "text_bpe_train": 14,
    "text_fim_transform": 14,
    "text_line_dedup": 14,
    "text_logreg_quality": 14,
    "text_pmi_phrases": 14,
    "text_span_corruption": 14,
    "text_tfidf_keywords": 14,
    "text_unigram_encode": 14,
    "text_unigram_train": 14,
    "text_wordpiece_encode": 14,
    "text_wordpiece_train": 14,
    # round 15
    "converted_documents": 15,
    "corpus_domain_blocklist": 15,
    "corpus_domain_card": 15,
    "dedup_containment_join": 15,
    "dedup_prefix_jaccard_join": 15,
    "dedup_semdedup": 15,
    "embedding_data_card": 15,
    "fixture_fragment_summary": 15,
    "fixture_record_summary": 15,
    "fragment_spans": 15,
    "fragment_summary": 15,
    "index_retire_ids": 15,
    "ingest_jsonl_roundtrip": 15,
    "mix_dsir_select": 15,
    "multimodal_jpeg_features": 15,
    "pipeline_corpus_to_index": 15,
    "q01_pricing_summary": 15,
    "q02_top_revenue_orders": 15,
    "q03_region_nation_revenue": 15,
    "q04_revenue_forecast": 15,
    "q05_returned_customers": 15,
    "q06_priority_with_big_items": 15,
    "q07_acctbal_by_region": 15,
    "q08_parts_by_brand": 15,
    "q10_top3_orders_per_customer": 15,
    "q11_running_revenue": 15,
    "q13_order_count_histogram": 15,
    "q14_rollup_priority_status": 15,
    "q15_cube_flag_status": 15,
    "q17_customers_without_orders": 15,
    "q18_large_quantity_orders": 15,
    "q50_bipartite_pagerank": 15,
    "q51_conversion_funnel": 15,
    "q55_stock_threshold_suppliers": 15,
    "sim_ann_recall_audit": 15,
    "sim_hashed_embeddings": 15,
    "sim_quantizer_drift_audit": 15,
    "sim_retrain_audit": 15,
    "sim_sq_codes": 15,
    "sim_sq_search": 15,
    "sql_lateral_fragment_summary": 15,
    "stream_domain_gate": 15,
    "stream_url_frontier": 15,
    "text_bpe_encode": 15,
    "text_bytebpe_encode": 15,
    "text_bytebpe_train": 15,
    "text_lm_buckets": 15,
    "text_lm_perplexity": 15,
    "text_pack_manifest": 15,
    "text_pack_sequences": 15,
    # round 16
    "dedup_cluster_representatives": 16,
    "dedup_connected_components": 16,
    "dedup_corpus_clean": 16,
    "dedup_decontaminate": 16,
    "dedup_embedding_cosine": 16,
    "dedup_exact_groups": 16,
    "dedup_exact_stats": 16,
    "dedup_ngram_jaccard": 16,
    "dedup_simhash_pairs": 16,
    "ingest_warc_roundtrip": 16,
    "pipeline_crawl_to_corpus": 16,
    "q12_orders_monthly_kpis": 16,
    "q16_repeat_buyers_setop": 16,
    "q19_event_lag_lead": 16,
    "q20_hourly_event_windows": 16,
    "q21_churned_buyers_setop": 16,
    "q22_asof_last_order": 16,
    "q23_events_json_extract": 16,
    "q24_user_sessions": 16,
    "q25_salted_flag_totals": 16,
    "q26_range_join_daytime_events": 16,
    "q27_rollup_cascade_daily": 16,
    "q29_sliding_event_windows": 16,
    "q30_grouping_sets_revenue": 16,
    "q31_pivot_daily_event_matrix": 16,
    "q32_variant_json_extract": 16,
    "q33_hll_sketch_union": 16,
    "q34_full_outer_user_reconciliation": 16,
    "q35_profile_orders": 16,
    "q36_trailing_7day_revenue": 16,
    "q37_percentile_ladder": 16,
    "q38_changeset_apply": 16,
    "sim_compressed_tick": 16,
    "sim_ivf_rebalance": 16,
    "sim_ivfsq_search": 16,
    "sim_pq_drift_audit": 16,
    "sim_topk_cosine": 16,
    "stream_lm_quality_gate": 16,
    "text_bpe_token_budget": 16,
    "text_fingerprints": 16,
    "text_lang_guess": 16,
    "text_length_histogram": 16,
    "text_paragraph_dedup": 16,
    "text_pii_redaction": 16,
    "text_quality_scores": 16,
    "text_rare_bigram_filter": 16,
    "text_repeated_ngrams": 16,
    "text_repetition_filter": 16,
    "text_token_stats": 16,
    "text_vocab_topk": 16,
    # round 17
    "dedup_bloom_audit": 17,
    "dedup_bloom_bits": 17,
    "dedup_bloom_decontaminate": 17,
    "dedup_containment_audit": 17,
    "dedup_embedding_lsh": 17,
    "dedup_embedding_signlsh": 17,
    "dedup_hot_bucket_audit": 17,
    "dedup_merge_index": 17,
    "dedup_minhash_md5_pairs": 17,
    "dedup_prefix_join_audit": 17,
    "mix_cluster_balanced": 17,
    "mix_curriculum_order": 17,
    "mix_token_budget": 17,
    "multimodal_frame_manifest": 17,
    "multimodal_media_features": 17,
    "multimodal_pair_dedup": 17,
    "multimodal_png_features": 17,
    "multimodal_wav_features": 17,
    "q39_scd2_history": 17,
    "q40_referential_audit": 17,
    "q41_unpivot_metrics": 17,
    "q42_customer_value_distribution": 17,
    "q43_exact_correlation": 17,
    "q52_duplicate_lineage": 17,
    "q53_cohort_retention": 17,
    "sim_compressed_append": 17,
    "sim_index_fsck": 17,
    "sim_ivf_assign": 17,
    "sim_ivf_index_search": 17,
    "sim_ivf_lloyd": 17,
    "sim_ivf_occupancy_audit": 17,
    "sim_ivfpq_search": 17,
    "sim_pq_codes": 17,
    "sim_pq_lloyd": 17,
    "sim_pq_search": 17,
    "sim_range_search": 17,
    "stream_dedup_events": 17,
    "stream_hourly_event_windows": 17,
    "stream_sliding_windows": 17,
    "stream_user_running_totals": 17,
    "stream_user_sessions": 17,
    "text_char_entropy": 17,
    "text_chunk_documents": 17,
    "text_cms_token_counts": 17,
    "text_gopher_filter": 17,
    "text_lm_trigram": 17,
    "text_nb_classifier": 17,
    "text_span_dedup": 17,
    "text_span_dedup_apply": 17,
    "text_unicode_normalize": 17,
}




#: Within a freshness tier: oracle-gated queries precede rows-only ones
#: (a rows-only row is the weakest evidence, so it should never crowd
#: out a hashable one), then by defining module.
_MODULE_PRIORITY = {
    "llm_queries": 0,
    "streaming_queries": 1,
    "ingest_queries": 2,
    "analytics": 3,
}


def all_queries() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry,
    ordered least-recently-driver-scored first (see the evidence ledger
    above), oracle-gated before rows-only within a tier, stable within
    a tier preserving registration order."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Tolerate not-yet-built modules during incremental bring-up,
            # but never mask a broken transitive import.
            if exc.name != mod:
                raise

    def rank(item: tuple[str, QueryDef]) -> tuple[int, int, int]:
        name, qd = item
        if name in _NEEDS_FRESH_SCORE:
            tier = 0
        else:
            # never-scored → 1; then oldest green evidence first.
            tier = _LAST_GREEN.get(name, 0) + 1
        module = qd.fn.__module__.rsplit(".", 1)[-1]
        return (tier, 0 if qd.oracle is not None else 1, _MODULE_PRIORITY.get(module, 9))

    return dict(sorted(REGISTRY.items(), key=rank))
