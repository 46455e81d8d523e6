"""Physical-plan regression tests: the scale properties SCALE.md claims
must be visible in the executed plans, so a refactor that silently
de-optimizes a query (loses a broadcast, un-pushes a filter, adds a
shuffle) fails here rather than in production."""

from __future__ import annotations

import pytest

from auraverse_etl_pipeline_spark.plans.registry import all_queries

QS = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_every_dim(spark, sf_dir):
    plan = _plan(QS["q03_region_nation_revenue"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing big enough to SMJ at test SF
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pricing_summary_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(QS["q01_pricing_summary"].fn(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_scan_prunes_columns(spark, sf_dir):
    """q01 touches 7 lineitem columns; the parquet ReadSchema must not
    include untouched wide columns like l_comment."""
    plan = _plan(QS["q01_pricing_summary"].fn(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_quantity" in read_schema


def test_minhash_band_join_is_equality_join(spark, sf_dir):
    """The LSH candidate join must be a hash/SMJ equality join — a
    nested-loop means someone broke the banding into a theta join."""
    plan = _plan(QS["dedup_minhash_pairs"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_minhash_band_table_is_cached(spark, sf_dir):
    """The band table feeds the hot-bucket count plus both sides of the
    self-join; losing the cache re-runs the minhash min-aggregation per
    consumer (the round-2 bench regression)."""
    plan = _plan(QS["dedup_minhash_pairs"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in plan
    spark.catalog.clearCache()


def test_sketch_aggs_never_mix_distinct_with_percentiles(spark, sf_dir):
    """q28 keeps the distinct aggregate and the percentile family in
    separate aggregations joined on the group key: one combined groupBy
    forces an expand + sort-aggregate that drags every percentile
    buffer through the distinct's row multiplication (measured 2-3x at
    sf0.1)."""
    plan = _plan(QS["q28_sketch_distinct_users"].fn(spark, sf_dir))
    assert "Expand" not in plan


def test_percentile_ladder_is_single_histogram_pass(spark, sf_dir):
    """q37 computes the whole ladder from one cumulative histogram —
    the plan must carry no percentile_disc aggregate buffers."""
    plan = _plan(QS["q37_percentile_ladder"].fn(spark, sf_dir))
    assert "percentile_disc" not in plan


def test_incremental_index_match_joins_are_equality_joins(spark, sf_dir):
    """The index match must stay equality-join-shaped (band join + two
    signature joins): a nested loop or cartesian means the banding
    degenerated, which at corpus scale is the difference between a
    daily job and an impossible one."""
    plan = _plan(QS["dedup_incremental_minhash"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_line_dedup_shuffles_hashes_not_text(spark, sf_dir):
    """text_line_dedup's document-frequency aggregation groups on
    md5(line). The hot-set join is deliberately NOT broadcast-hinted
    (a web-scale boilerplate tail exceeds broadcast limits); at this SF
    AQE must still pick a broadcast on its own, and no plan node may
    degenerate to a nested loop."""
    plan = _plan(QS["text_line_dedup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pack_manifest_single_exchange(spark, sf_dir):
    """The packing manifest is one per-source window + per-row explode:
    exactly one data exchange (the window's hash partitioning) — a
    second one means the split logic grew a shuffle it doesn't need."""
    plan = _plan(QS["text_pack_manifest"].fn(spark, sf_dir))
    assert plan.count("Exchange ") == 1


def test_range_join_is_not_nested_loop(spark, sf_dir):
    """q26's bucketed range join exists precisely to avoid the BNLJ a
    naive theta join produces."""
    plan = _plan(QS["q26_range_join_daytime_events"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the containment filter must run post-join, not as a join condition
    # of a nested loop over the full input
    assert "BroadcastNestedLoopJoin" not in plan or "_b" in plan


def test_asof_window_single_shuffle(spark, sf_dir):
    """The window as-of join is one exchange (hash by key) + sort; a
    second data exchange means the union/window structure regressed."""
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.operators.asof import as_of_join_window

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    plan = _plan(
        as_of_join_window(ev, orders, on="ts", right_on="o_orderdate",
                          by_left="user_id", by_right="o_custkey", right_cols=[])
    )
    # count data-moving exchanges (hashpartitioning), ignoring AQE reuse
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan[:2000]


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The eval shingle set must broadcast — a sort-merge join here
    means the 100 TB training side would shuffle its shingles."""
    plan = _plan(QS["dedup_decontaminate"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_referential_audit_broadcasts_dims(spark, sf_dir):
    """Every FK check is a broadcast anti-join; the fact side must
    never shuffle for the audit."""
    plan = _plan(QS["q40_referential_audit"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_redaction_is_shuffle_free(spark, sf_dir):
    """The scrub is a pure map stage: scan -> project, no Exchange."""
    plan = _plan(QS["text_pii_redaction"].fn(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan


def test_mixture_sample_pushes_nothing_to_python(spark, sf_dir):
    """Deterministic hash sampling is pure JVM expression work — no
    Python eval nodes, no exchange."""
    plan = _plan(QS["mix_weighted_sample"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_global_ids_avoid_single_partition_exchange(spark, sf_dir):
    """The whole point of the two-pass id assignment: the data path must
    not funnel through Exchange SinglePartition (the tiny per-partition
    offsets table is allowed to — it has one row per partition)."""
    from auraverse_etl_pipeline_spark.operators.ids import assign_global_ids
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(assign_global_ids(docs, ["doc_id"]))
    # the offsets branch is a broadcast exchange; the main data path
    # must show range partitioning, not a global sort into one task
    assert "rangepartitioning" in plan.lower()
    main_path = plan.split("BroadcastExchange")[0]
    assert "Exchange SinglePartition" not in main_path, main_path[:1500]


def test_plan_summary_reads_the_flagship_plan(spark, sf_dir):
    """plan_summary must report the star join's known shape: broadcasts
    for every dim, no nested loops, no global funnel, pushed filters
    visible at the scan."""
    from auraverse_etl_pipeline_spark.plans.inspect import plan_summary

    s = plan_summary(QS["q03_region_nation_revenue"].fn(spark, sf_dir), run=True)
    assert s["broadcast_hash_joins"] >= 4
    assert s["nested_loop_joins"] == 0
    assert s["single_partition_exchanges"] == 0
    assert s["codegen_stages"] >= 1
    assert any(f for f in s["pushed_filters"] if f)


def test_shuffle_hash_hint_is_honored(spark, sf_dir):
    """q49's strategy hint must produce a ShuffledHashJoin, not an SMJ
    (and obviously not a broadcast of the hinted side)."""
    from auraverse_etl_pipeline_spark.plans.inspect import plan_summary

    s = plan_summary(QS["q49_shuffled_hash_strategy"].fn(spark, sf_dir))
    assert s["shuffled_hash_joins"] >= 1
    assert s["sort_merge_joins"] == 0


def test_partition_pruning_static_and_dynamic(spark, sf_dir, tmp_path):
    """A partitioned layout must prune: a literal predicate shows up as
    a static PartitionFilter (only matching directories scanned), and a
    selective dim join plants a dynamicpruning expression - the two
    mechanisms that turn a 100 TB partitioned table into a small scan."""
    import pyspark.sql.functions as F2

    from auraverse_etl_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = str(tmp_path / "ev_part")
    ev.write.partitionBy("event_type").parquet(d)
    fact = spark.read.parquet(d)

    static = fact.filter("event_type = 'purchase'").agg(F2.count("*"))
    p1 = _plan(static)
    pf = p1.split("PartitionFilters: [", 1)[1].split("]")[0]
    assert "event_type" in pf and "purchase" in pf, pf

    dim = spark.createDataFrame(
        [("purchase", 1.5), ("view", 1.0)], "event_type string, weight double"
    ).filter("weight > 1.2")
    dyn = fact.join(dim, "event_type").agg(F2.count("*"))
    dyn.collect()
    assert "dynamicpruning" in _plan(dyn), _plan(dyn)[:1500]


def test_gram_operators_cache_the_exploded_table(spark, sf_dir):
    """Each corpus-gram operator (bigram model, repeated n-grams, span
    report) consumes the exploded gram table twice — the cache must be
    in the executed plan or the tokenize+NGram stage runs per consumer
    (the text_span_dedup 2x-scan regression caught in round 4)."""
    for name in ("text_rare_bigram_filter", "text_repeated_ngrams", "text_span_dedup"):
        plan = _plan(QS[name].fn(spark, sf_dir))
        assert "InMemoryTableScan" in plan, name
        spark.catalog.clearCache()


def test_span_dedup_shuffles_hashes_not_text(spark, sf_dir):
    """The span report's shuffles carry (doc_id, pos, md5) triples; the
    raw text/gram strings must never reach an Exchange."""
    plan = _plan(QS["text_span_dedup"].fn(spark, sf_dir))
    for exch in plan.split("Exchange hashpartitioning")[1:]:
        keys = exch[:120]
        assert "text" not in keys and "gram#" not in keys, keys
    spark.catalog.clearCache()


def test_range_search_is_broadcast_scan_only(spark, sf_dir):
    """Radius search must stay a broadcast nested-loop over the corpus
    scan with NO shuffle exchange — the zero-shuffle retrieval claim."""
    plan = _plan(QS["sim_range_search"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_frame_manifest_has_no_exchange(spark, sf_dir):
    """Frame fan-out is scan + generate: any Exchange is a regression."""
    plan = _plan(QS["multimodal_frame_manifest"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_signbucket_lsh_stays_jvm_side(spark, sf_dir):
    """The deterministic sign-LSH tier's selling point: banding, join
    and verify all codegen'd — no Python workers, equality joins only,
    band table cached for the self-join."""
    plan = _plan(QS["dedup_embedding_signlsh"].fn(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan
    spark.catalog.clearCache()


def test_span_apply_reassembly_has_no_sort_exchange(spark, sf_dir):
    """apply_span_dedup reassembles with a hash aggregate + in-group
    array_sort; a global Sort before the final aggregate means someone
    rewrote it with orderBy (the line-dedup lesson)."""
    plan = _plan(QS["text_span_dedup_apply"].fn(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "InMemoryTableScan" in plan
    final_agg = plan.split("HashAggregate")[0]  # text above the top agg
    assert "Sort [doc_id" not in final_agg
    spark.catalog.clearCache()


def test_bloom_probe_broadcasts_filter_words(spark, sf_dir):
    """The Bloom words table must broadcast to the probe join (that IS
    the operator's reason to exist), the verify join must not broadcast
    the corpus side, and the whole path stays JVM-side."""
    plan = _plan(QS["dedup_bloom_decontaminate"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_pq_search_broadcasts_lut_and_stays_jvm_side(spark, sf_dir):
    """ADC must scan only the code table with the per-query LUT
    broadcast — no Python workers, no cartesian expansion, decimal
    partials in the aggregate."""
    plan = _plan(QS["sim_pq_search"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_nb_score_broadcasts_model(spark, sf_dir):
    """The classifier model (num_buckets rows) broadcasts; the only
    Python in the plan is the Arrow batch over the model table's logs,
    never over corpus-sized rows."""
    plan = _plan(QS["text_nb_classifier"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_bm25_search_broadcasts_query_terms(spark, sf_dir):
    """BM25 search: the corpus-sized postings scan joins the weighted
    query terms as a BROADCAST (no corpus-side shuffle before the
    fixed-width score aggregate), the idf logs are the only Python
    (Arrow batch over the tiny query-term table), and nothing is a
    sort-merge or nested-loop join."""
    plan = _plan(QS["text_bm25_search"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 1-row corpus-stats crossJoin on the
    # tiny query-term side — never against anything corpus-sized.
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_pagerank_rounds_stay_jvm_side(spark, sf_dir):
    """Each PageRank round must be pure joins/aggregates: no Python
    workers, no cartesian, and vertex-bounded state behind a
    localCheckpoint scan."""
    plan = _plan(QS["q50_bipartite_pagerank"].fn(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # final round's plan reads the checkpointed previous round, not a
    # re-derivation of the whole loop
    assert "Scan ExistingRDD" in plan


def test_prefix_join_joins_on_shingles_only(spark, sf_dir):
    """The prefix join's candidate stage must be an equality join on
    the shingle (never a nested-loop/cartesian pairing), with the
    shingle table cached for the verify lookups."""
    plan = _plan(QS["dedup_prefix_jaccard_join"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan
    # Frequency ordering (round 6): the prefix cut must be a row_number
    # window ordered by ascending document frequency. A regression to
    # lexicographic array_sort/slice prefixes has no df_global column
    # and fails here loudly.
    window_lines = [
        ln for ln in plan.splitlines() if "Window [row_number()" in ln
    ]
    assert window_lines, "prefix cut lost its row_number window"
    assert all("df_global" in ln for ln in window_lines)
    # The prefix subplan (df aggregate + enrich join + window) is the
    # expensive stage and is consumed by both sides of the candidate
    # self-join — it must come from the cache, not be recomputed: both
    # join inputs scan an in-memory (doc_id-alias, shingle) relation.
    im_lines = [ln for ln in plan.splitlines() if "InMemoryTableScan [id" in ln]
    assert sum("shingle" in ln for ln in im_lines) >= 2


def test_hybrid_search_keeps_both_retrievers_broadcast(spark, sf_dir):
    """Hybrid retrieval: the corpus side must never shuffle before
    either retriever's aggregate — query terms and query vectors both
    broadcast; the only Python is the idf Arrow batch."""
    plan = _plan(QS["sim_hybrid_search"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_embedding_data_card_approx_path_drops_histogram_window(spark, sf_dir):
    """quartiles='approx' is the 100 TB spelling: the norm quartiles
    must come from one bounded-memory percentile_approx aggregate — no
    cumulative-histogram sort window, no per-norm groupBy state. The
    exact path keeps its window (the oracle-gated spelling)."""
    from auraverse_etl_pipeline_spark.operators.similarity import (
        embedding_data_card,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    approx = embedding_data_card(emb, quartiles="approx")
    plan = _plan(approx)
    assert "percentile_approx" in plan
    assert "Window" not in plan  # the q37-shape cumulative sort-window is gone
    approx.release_caches()
    exact = embedding_data_card(emb, quartiles="exact")
    plan = _plan(exact)
    assert "Window" in plan and "percentile_approx" not in plan
    exact.release_caches()


def test_lm_scoring_broadcasts_model_tables(spark, sf_dir):
    """The LM gate's corpus side: model tables broadcast (never a
    corpus-shuffling SMJ), transitions from array slicing (no window),
    the only Python an Arrow batch over model-sized tables."""
    plan = _plan(QS["text_lm_perplexity"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan  # libm logs are Arrow-batched


def test_dsir_broadcasts_lambda_table(spark, sf_dir):
    """DSIR scoring: the corpus joins the bucket-bounded lambda table
    as a broadcast — never an SMJ shuffling corpus tokens — and the
    only Python is the Arrow batch over that small table."""
    plan = _plan(QS["mix_dsir_select"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lm_percentile_buckets_avoid_global_sort(spark, sf_dir):
    """perplexity_buckets(method='percentile') is the 100 TB spelling:
    one percentile_approx aggregate + a broadcast boundary frame — no
    ntile window, no global range-partitioned sort of the corpus."""
    import pyspark.sql.functions as F

    from auraverse_etl_pipeline_spark.operators.lm import (
        lm_score_report,
        perplexity_buckets,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
    scores = lm_score_report(docs, ref)
    out = perplexity_buckets(scores, n_buckets=3, method="percentile")
    plan = _plan(out)
    assert "percentile_approx" in plan
    assert "ntile(" not in plan  # the window fn call; percentile_approx
    # contains "ntile" as a substring, so match the call spelling
    assert "rangepartitioning" not in plan.lower()
    scores.release_caches()


def test_containment_join_plan_shape(spark, sf_dir):
    """The containment candidate stage must be an equality join on the
    shingle (never nested-loop), with the frequency-ordered row_number
    prefix cut on the contained side only and the shingle table cached
    for the verify lookups."""
    plan = _plan(QS["dedup_containment_join"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan
    window_lines = [ln for ln in plan.splitlines() if "Window [row_number()" in ln]
    assert window_lines and all("df_global" in ln for ln in window_lines)


def test_hashed_embeddings_stay_native(spark, sf_dir):
    """The hashing-trick embedding is pure JVM expression work: one
    aggregate exchange, no Python eval nodes anywhere."""
    plan = _plan(QS["sim_hashed_embeddings"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_crawl_to_corpus_funnel_plan(spark, sf_dir):
    """The e2e composition: no cartesian/per-row Python; the two
    corpus-text checkpoints (re-ingested text, re-assembled docs) plus
    the fixed-width flag frame and LM scores are cache-bounded
    (InMemoryTableScan), and the corpus only enters Python through the
    Arrow mapInPandas ingest tier."""
    plan = _plan(QS["pipeline_crawl_to_corpus"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "InMemoryTableScan" in plan
    assert "MapInPandas" in plan
    assert "ntile(" not in plan  # no global-sort window anywhere


def test_unigram_viterbi_is_single_plan_no_python(spark, sf_dir):
    """The composition-Viterbi E-step must stay one declarative JVM
    plan: broadcast composition literal, no Python stage, no
    cartesian; and the train query's returned model is checkpointed
    (model-sized, corpus lineage cut)."""
    import pyspark.sql.functions as F

    from auraverse_etl_pipeline_spark.operators.unigram import (
        seed_counts,
        viterbi_segment,
        word_table,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = word_table(docs)
    model = seed_counts(words).withColumn("logp", F.lit(-1.0))
    plan = _plan(viterbi_segment(words, model))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # the composition literal

    train_plan = _plan(QS["text_unigram_train"].fn(spark, sf_dir))
    assert "Scan ExistingRDD" in train_plan or "LogicalRDD" in train_plan  # checkpointed


def test_domain_card_single_scan_and_released_cache(spark, sf_dir):
    """domain_card: the flag table is cached (two consumers — rates +
    histogram) and carries a release handle; no Python past the WARC
    re-ingest; quartiles come from window sums, not percentile states."""
    plan = _plan(QS["corpus_domain_card"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in plan  # flags cached
    assert "percentile" not in plan.lower()  # cumulative histogram, no sketch
    assert "CartesianProduct" not in plan

    from auraverse_etl_pipeline_spark.operators.quality import domain_card

    docs = spark.createDataFrame(
        [(0, "a b c", "http://x.y.net/doc/0")],
        "doc_id bigint, text string, target_uri string",
    )
    out = domain_card(docs)
    assert callable(out.release_caches)
    out.collect()
    out.release_caches()


def test_domain_blocklist_probe_broadcasts_filter(spark, sf_dir):
    """The Bloom probe must broadcast the filter words (num_bits/63
    rows) — a shuffle join on the filter would defeat the tier."""
    plan = _plan(QS["corpus_domain_blocklist"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_unigram_bnlj_only_on_stat_frames(spark, sf_dir):
    """The only nested-loop joins in the unigram trainer are the 1-row
    stat-frame folds (the logp total, the prune char count) — never a
    data×data pairing."""
    plan = _plan(QS["text_unigram_train"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # trained model is checkpointed, so the returned plan carries no
    # BNLJ at all; the in-flight folds were audited via the un-
    # checkpointed builders in test_unigram_viterbi_is_single_plan.
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_wordpiece_encode_plan_shape(spark, sf_dir):
    """WordPiece encode: broadcast composition literal, equality joins
    only, no Python anywhere (the trainer's per-round work happens at
    build time against checkpointed state)."""
    plan = _plan(QS["text_wordpiece_encode"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan


def test_ivfpq_rebalance_bnlj_only_stat_folds(spark, sf_dir):
    """sim_ivfpq_rebalance embeds the rebalance subplan under several
    consumers (probes, candidates, centroid union), so the 1-row
    max_id crossJoin fold replicates — every BroadcastNestedLoopJoin
    must still be that fold (bounded count, rebalance caches in
    force), never a data×data pairing."""
    plan = _plan(QS["sim_ivfpq_rebalance"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # asg/hot/subs caches
    assert plan.count("BroadcastNestedLoopJoin") <= 16


def test_q55_decorrelates_to_joins(spark, sf_dir):
    """The nested IN / scalar-subquery / correlated-EXISTS ladder must
    decorrelate: semi joins present, no CartesianProduct anywhere, and
    the scalar threshold folds through a 1-row aggregate (never a
    per-row re-evaluation)."""
    plan = _plan(QS["q55_stock_threshold_suppliers"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan


def test_sq8_bnlj_only_on_broadcast_stat_frames(spark, sf_dir):
    """SQ8's nested-loop joins are exactly the blessed classes: the
    1-row stats-frame crossJoin (encode + reconstruction) and the
    bounded broadcast query frame (the cosine_top_k scan pattern) —
    every BNLJ side is a BroadcastExchange, never a data×data pair,
    and the corpus-sized code table scans once with no shuffle before
    the per-query top-k window."""
    codes_plan = _plan(QS["sim_sq_codes"].fn(spark, sf_dir))
    assert "CartesianProduct" not in codes_plan
    assert codes_plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row stats frame
    search_plan = _plan(QS["sim_sq_search"].fn(spark, sf_dir))
    assert "CartesianProduct" not in search_plan
    assert search_plan.count("BroadcastNestedLoopJoin") <= 3  # stats x2 + query frame
    assert "BatchEvalPython" not in codes_plan + search_plan


def test_ivfsq_bnlj_only_on_broadcast_folds(spark, sf_dir):
    """IVF,SQ8's nested-loop joins are the blessed classes only — the
    1-row stats folds (encode + probed-cell reconstruction) and the
    broadcast query/centroid frames of the probe stage; every
    corpus-sized join (cell membership, codes, rerank corpus) is an
    equality hash join, never a data×data loop."""
    plan = _plan(QS["sim_ivfsq_search"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 5
    assert plan.count("BroadcastHashJoin") >= 4  # cells, codes, rerank joins
    assert "SortMergeJoin" not in plan


def test_paragraph_dedup_hash_shuffle_only(spark, sf_dir):
    """Paragraph dedup must shuffle hashes + positions, never text as
    a grouping key, and carry no cartesian/Python nodes; the winner
    join is left un-hinted for AQE."""
    plan = _plan(QS["text_paragraph_dedup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_bytebpe_train_returns_model_sized_plan(spark, sf_dir):
    """Byte-BPE training collects only the merge table (model-sized,
    like centroids): the returned plan is a local relation with no
    corpus lineage at all."""
    plan = _plan(QS["text_bytebpe_train"].fn(spark, sf_dir))
    assert "parquet" not in plan.lower()
    assert "CartesianProduct" not in plan


def test_lloyd_assignment_rule_in_sync_across_oracles():
    """The clamped-cosine cell-assignment rule (least(1.0, cos) DESC,
    ties to the lowest cell) is pinned by ivf_assign and replicated
    verbatim in every Lloyd-consuming oracle builder; this guard fails
    if any copy's clamp or tie-break spelling drifts one-sidedly."""
    import re

    pat = re.compile(
        r"ROW_NUMBER\(\) OVER \(PARTITION BY \S+ "
        r"ORDER BY least\(CAST\(1\.0 AS DOUBLE\), "
        r"list_cosine_similarity\(\S+, \S+\.centroid\)\) DESC, "
        r"\S+\.cell\) AS rn"
    )
    for name in ("sim_topk_ivf", "sim_ivf_lloyd", "dedup_semdedup"):
        sql = " ".join(QS[name].oracle.split())
        assert pat.search(sql), f"{name}: clamped assignment spelling drifted"


def test_ivf_occupancy_bnlj_only_stat_fold(spark, sf_dir):
    """The occupancy audit's only non-equality join is the broadcast
    1-row max/median stats frame folded back over the per-cell counts
    (the pinned stat-fold pattern); the corpus-sized work is one hash
    aggregate over the assignments — never a sort, never a data×data
    pair. The cached nlist-row count table keeps the assignments scan
    single-pass; every BNLJ builds from a broadcast (the centroid fold
    inside ivf_assign and the 1-row stats frame). String count is 3
    because the plan printer embeds the cached relation's child (which
    holds the centroid fold) under BOTH InMemoryTableScans — physically
    it runs once."""
    df = QS["sim_ivf_occupancy_audit"].fn(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastNestedLoopJoin") == 3
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") == 2  # count table cached, both consumers hit it
    df.release_caches()


def test_multimodal_pair_dedup_edges_are_equality_joins(spark, sf_dir):
    """Image edges join on the sha256 digest and caption edges on the
    shingle — both equality joins; payload bytes are digested map-side
    and never shuffled. The returned labels plan is the CC operator's
    checkpointed output, so the shape to guard is the edge build."""
    from auraverse_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").limit(50)
    pairs = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("text").alias("caption"),
    )
    sha = pairs.select("pair_id", F.sha2("payload", 256).alias("s"))
    grp = (
        sha.groupBy("s")
        .agg(F.min("pair_id").alias("id1"), F.count(F.lit(1)).alias("n"))
        .filter("n > 1")
    )
    img_edges = sha.join(grp, "s").filter("pair_id > id1")
    cap_edges = ngram_jaccard_pairs(
        pairs, threshold=0.5, n=3, text_col="caption", id_col="pair_id"
    )
    for df in (img_edges, cap_edges):
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_index_retire_audit_plan_is_disk_backed(spark, sf_dir):
    """index_retire_ids returns an audit over the POST-RETIRE disk
    state: parquet scans + hash aggregates + one vocabulary-sized
    full-outer join, unioned — never a nested loop, never a residue of
    the (eager, side-effect) index builds in the returned plan."""
    plan = _plan(QS["index_retire_ids"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") >= 4  # members, postings, dfs+stats, log


def test_quantizer_drift_audit_plan_shape(spark, sf_dir):
    """The drift audit is two fixed-width hash aggregates over the
    decisions-log scan — no window sort over the log, no joins, no
    Python in the plan."""
    plan = _plan(QS["sim_quantizer_drift_audit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_retrain_audit_plan_is_disk_backed(spark, sf_dir):
    """sim_retrain_audit returns the POST-RETRAIN members read back
    from the rewritten disk table — a parquet scan with casts, never a
    residue of the (eager, side-effect) Lloyd re-fit in the returned
    plan."""
    plan = _plan(QS["sim_retrain_audit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "Scan parquet" in plan


def test_retrieval_quality_audit_bnlj_only_stat_folds(spark, sf_dir):
    """The nDCG audit's BroadcastNestedLoopJoins are all bounded
    folds: the k-row discount table and 1-row idcg/stat frames
    broadcast against system×query-sized rankings — never a data×data
    pair. Pin the audited count so a refactor that grows it fails
    here."""
    plan = _plan(QS["sim_retrieval_quality_audit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 6
    spark.catalog.clearCache()


def test_compressed_append_plan_is_disk_backed(spark, sf_dir):
    """sim_compressed_append scores the POST-APPEND disk state: the
    returned plan is parquet scans + hash joins/aggregates over the
    four rewritten surfaces — no Python, no nested-loop join, never a
    residue of the (eager, side-effect) append itself."""
    plan = _plan(QS["sim_compressed_append"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "Scan parquet" in plan


def test_index_fsck_bnlj_only_stat_fold(spark, sf_dir):
    """The composed fsck's one BroadcastNestedLoopJoin is bm25_fsck's
    1-row stats×derived fold; everything else is id/term hash
    aggregates and anti-joins over the index tables. Pin the count so
    a refactor that grows it fails here."""
    plan = _plan(QS["sim_index_fsck"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BatchEvalPython" not in plan
    spark.catalog.clearCache()
