"""Registry entries for the Structured Streaming surface.

Each query builds a *streaming* plan over the events files, executes it
to completion with Trigger.AvailableNow (``run_stream_to_memory``), and
returns the materialized result — so the driver's DuckDB oracle gate
checks the streaming operators end-to-end: a streaming plan replayed
over static files must produce exactly the batch answer.

Float discipline: the stateful running-totals operator accumulates in
Python floats, whose addition order is arrival order — not the oracle's
order. The source ``value`` column carries exactly 2 decimals, so state
accumulates integer cents and divides once on emit; exact on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from auraverse_etl_pipeline_spark.plans.analytics import DSUM
from auraverse_etl_pipeline_spark.plans.registry import query
from auraverse_etl_pipeline_spark.streaming.ops import (
    dedup_events_within_watermark,
    sessionize_events_stream,
    user_running_totals,
    windowed_event_counts,
)
from auraverse_etl_pipeline_spark.streaming.runner import run_stream_to_memory
from auraverse_etl_pipeline_spark.streaming.sources import stream_events


@query(
    "stream_hourly_event_windows",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           {DSUM('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="streaming tumbling 1h windows replayed over static files == batch q20",
)
def stream_hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(windowed_event_counts(ev), "complete", "s_hourly_windows")


@query(
    "stream_user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
    description="native session_window (30-min gap) streaming sessionization; "
    "oracle = lag/cumsum sessionization with Spark's gap semantics "
    "(a gap of exactly 30min starts a new session; session_end = last event + gap)",
)
def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(sessionize_events_stream(ev), "complete", "s_user_sessions")


@query(
    "stream_dedup_events",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    """,
    description="dropDuplicatesWithinWatermark recovers exactly-once from a "
    "doubled (at-least-once) stream",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    doubled = ev.unionByName(ev)  # simulate redelivery
    out = run_stream_to_memory(
        dedup_events_within_watermark(doubled), "append", "s_dedup_events"
    )
    return out.select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "stream_user_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY user_id
    """,
    description="custom stateful operator (applyInPandasWithState): per-user "
    "running totals; final emission per user == batch groupBy",
)
def stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    out = run_stream_to_memory(user_running_totals(ev), "update", "s_user_totals")
    # Update mode emits one cumulative row per user per micro-batch; the
    # final state is the row with the highest n_events per user.
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


@query(
    "stream_sliding_windows",
    oracle=f"""
    WITH grid AS (
        SELECT s AS window_start
        FROM generate_series(TIMESTAMP '2023-12-31 23:15:00',
                             TIMESTAMP '2024-01-31 00:00:00',
                             INTERVAL 15 MINUTE) AS t(s)
    )
    SELECT CAST(g.window_start AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events,
           {DSUM('e.value')} AS sum_value
    FROM grid g JOIN events e
      ON e.ts >= g.window_start AND e.ts < g.window_start + INTERVAL 1 HOUR
    GROUP BY 1
    """,
    description="streaming sliding windows (1h every 15min) replayed over "
    "static files == the batch grid-join oracle",
)
def stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    agg = windowed_event_counts(ev, window="1 hour", slide="15 minutes")
    out = run_stream_to_memory(agg, "complete", "s_sliding_windows")
    # the operator keeps the event_type dimension; roll it up (decimal
    # re-sum keeps the total exact) to match the per-window oracle
    return out.groupBy("window_start").agg(
        F.sum("n_events").alias("n_events"),
        F.sum(F.col("sum_value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
    )


@query(
    "stream_purchase_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           v.event_id AS view_id,
           CAST(v.ts AS TIMESTAMP) AS view_ts
    FROM events p JOIN events v
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
    description="stream-stream interval join (purchase attribution to "
    "preceding views, watermark-bounded state) replayed == batch theta join",
)
def stream_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.streaming.ops import purchase_attribution_join

    ev = stream_events(spark, sf_dir)
    return run_stream_to_memory(purchase_attribution_join(ev), "append", "s_attribution")


@query(
    "stream_enriched_segment_revenue",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user,
           {DSUM('value', 6)} AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
    description="stream-static enrichment: the event stream joins the "
    "static customer dimension per micro-batch (dimension broadcast - the "
    "stream side never shuffles for the join) before a grouped revenue "
    "rollup; replayed over static files == the batch join",
)
def stream_enriched_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    ev = stream_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.min("user_id").cast("bigint").alias("min_user"),
        F.max("user_id").cast("bigint").alias("max_user"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
    )
    return run_stream_to_memory(agg, "complete", "s_enriched_segment")


@query(
    "stream_ingest_fragment_summary",
    oracle="""
    SELECT 'RAW_TEXT' AS format_type, COUNT(*) AS n_fragments
    FROM documents
    """,
    description="the reference's WHOLE ingest pipeline as a streaming "
    "job: raw documents land as micro-batches, the Arrow-batched "
    "detector suite runs per batch (mapInPandas is stateless, so it "
    "streams unchanged), and the A1 summary aggregate accumulates in "
    "complete mode - replayed over the static corpus it must equal the "
    "batch fragment_summary exactly",
)
def stream_ingest_fragment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.ingest.pipeline import (
        detect_fragments,
        summarize_fragments,
    )
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = stream_documents(spark, sf_dir)
    agg = summarize_fragments(detect_fragments(docs))
    return run_stream_to_memory(agg, "complete", "s_ingest_summary")


def _incremental_minhash_oracle() -> str:
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _minhash_index_oracle_sql,
    )

    return _minhash_index_oracle_sql()


@query(
    "stream_incremental_dedup",
    oracle=_incremental_minhash_oracle(),
    description="incremental dedup as a STREAMING job: new documents "
    "land as micro-batches, compute stateless per-row MinHash "
    "signatures, and band-join against the STATIC persisted corpus "
    "index (stream-static join - no stream-stream state); the only "
    "stateful operator is the per-pair dedup aggregate. Replayed over "
    "the same injected-copy fixture it must equal the batch "
    "dedup_incremental_minhash exactly (same md5 oracle)",
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.dedup import minhash_index
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import (
        stream_match_minhash_index,
    )
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    corpus = load_table(spark, sf_dir, "documents")
    # cache the static side: every micro-batch's stream-static join
    # consumes it (twice — band explode + signature join), and without
    # the cache each batch would re-run the corpus minhash aggregation,
    # defeating the operator's whole point. run_stream_to_memory is
    # synchronous, so the release pairs cleanly after the replay.
    index = minhash_index(corpus, n=3, hash_fn="md5").cache()

    new_batch = (
        stream_documents(spark, sf_dir)
        .filter(F.col("doc_id") < 50)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    matches = stream_match_minhash_index(
        new_batch, index, est_threshold=0.5, n=3, hash_fn="md5"
    )
    result = run_stream_to_memory(matches, "complete", "s_incremental_dedup")
    index.unpersist()
    return result


def _compaction_oracle() -> str:
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _stream_compaction_oracle_sql,
    )

    return _stream_compaction_oracle_sql()


@query(
    "stream_compaction_dedup",
    oracle=_compaction_oracle(),
    description="the CLOSED incremental-dedup loop as a streaming "
    "job (foreachBatch): each micro-batch matches against the "
    "parquet index as of batches 1..N-1 plus itself, then appends "
    "its own signature delta into the index - so a batch-2 duplicate "
    "of a batch-1 document IS caught, where stream_incremental_dedup "
    "only ever matches a static day-1 index. Matches are "
    "canonicalized (id1 < id2, max-est), making the total output "
    "invariant to batch boundaries; the oracle replays the full "
    "corpus-wide canonical pair set under the md5 base hash",
)
def stream_compaction_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.streaming.ops import (
        run_stream_dedup_compaction,
    )
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = stream_documents(spark, sf_dir).select("doc_id", "text")
    copies = (
        stream_documents(spark, sf_dir)
        .filter(F.col("doc_id") < 50)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    root = scratch_dir(prefix="compaction_")
    run_stream_dedup_compaction(
        docs.unionByName(copies),
        index_path=f"{root}/index",
        matches_path=f"{root}/matches",
        est_threshold=0.5,
        n=3,
        hash_fn="md5",
    )
    return (
        spark.read.parquet(f"{root}/matches")
        .groupBy("id1", "id2")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def _quality_gate_oracle() -> str:
    # same rule spelling as text_gopher_filter's oracle, aggregated;
    # thresholds come from quality.py's shared constants
    from auraverse_etl_pipeline_spark.operators.quality import gopher_fail_reason_sql
    from auraverse_etl_pipeline_spark.plans.llm_queries import _EN_LIST, _TOKS

    return f"""
    WITH m AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_words,
               length(regexp_replace(text, '\\s', '', 'g')) / len({_TOKS}) AS mean_word_len,
               CAST(len(list_intersect(list_distinct({_TOKS}), {_EN_LIST})) AS BIGINT)
                 AS stopword_hits
        FROM documents
    )
    SELECT fail_reason, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (SELECT {gopher_fail_reason_sql()} AS fail_reason FROM m)
    GROUP BY fail_reason
    """


@query(
    "stream_quality_gate",
    oracle=_quality_gate_oracle(),
    description="the curation quality gate as a STREAMING job: "
    "documents land as micro-batches, the Gopher decision "
    "(operators/quality.py gopher_report - one stateless projection "
    "shared with the batch query) runs per row, and a complete-mode "
    "aggregate keeps the running reject tally by first failing rule. "
    "Replayed over static files it must equal the batch gate exactly",
)
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.quality import gopher_report
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = stream_documents(spark, sf_dir)
    gate = (
        gopher_report(docs)
        .groupBy("fail_reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return run_stream_to_memory(gate, "complete", "s_quality_gate")


def _stream_bm25_oracle() -> str:
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _BM25_SEARCH_ORACLE,
    )

    return _BM25_SEARCH_ORACLE


@query(
    "stream_bm25_index",
    oracle=_stream_bm25_oracle(),
    description="continuous lexical indexing (foreachBatch): each "
    "micro-batch folds into a growing BM25 index laid out as Lucene-"
    "style append-only segments (postings delta + vocabulary-sized df "
    "segment + 1-row stats segment; within-batch first-writer-wins, "
    "index-wins anti-join against batches 1..N-1 - re-ingested docs "
    "add nothing), consolidated at read time by the segment identity "
    "(disjoint doc sets => dfs and stats ADD). The oracle is the "
    "INVARIANT: searching the streaming-built index must equal "
    "text_bm25_search's batch answer on the same corpus, despite the "
    "batching and the injected re-ingest duplicates",
)
def stream_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.operators.retrieval import bm25_search
    from auraverse_etl_pipeline_spark.plans.llm_queries import _BM25_QUERIES
    from auraverse_etl_pipeline_spark.streaming.ops import (
        load_stream_bm25_index,
        run_stream_bm25_indexing,
    )
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = stream_documents(spark, sf_dir).select("doc_id", "text")
    # re-ingest the first 50 documents under their ORIGINAL ids: the
    # index-wins path must drop them or dl/df/avgdl would all shift
    copies = (
        stream_documents(spark, sf_dir)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    root = scratch_dir(prefix="bm25_stream_")
    run_stream_bm25_indexing(
        docs.unionByName(copies), index_path=f"{root}/index"
    )
    idx = load_stream_bm25_index(spark, f"{root}/index")
    queries = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id bigint, text string"
    )
    return bm25_search(queries, idx, k=10)


def _stream_ivf_oracle() -> str:
    # the persistable-IVF CTE block (sample quantizer over vec_id>=10,
    # new batch = vec_id<10) replays quantizer + exact-fold assignment
    from auraverse_etl_pipeline_spark.plans.llm_queries import _IVF_CTES

    return (
        _IVF_CTES
        + """
    , allv AS (
        SELECT id, v FROM c
        UNION ALL
        SELECT query_id AS id, qv AS v FROM q
    )
    SELECT id AS vec_id, CAST(cell AS INTEGER) AS cell FROM (
        SELECT allv.id, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY allv.id
                   ORDER BY list_cosine_similarity(allv.v, cent.centroid) DESC,
                            cent.cell) AS rn
        FROM allv CROSS JOIN cent
    ) WHERE rn = 1
    """
    )


@query(
    "stream_ivf_assign",
    oracle=_stream_ivf_oracle(),
    description="continuous embedding indexing (foreachBatch) - the "
    "vector twin of stream_compaction_dedup (MinHash) and "
    "stream_bm25_index (lexical): new vectors stream in as micro-"
    "batches, each batch is cell-assigned against the PERSISTED "
    "centroids (ivf_assign, no quantizer refit) behind within-batch "
    "first-writer-wins and index-wins anti-join dedup, and appended "
    "into the index's cell partitions - so batch-N vectors are "
    "searchable after batch N. Injected re-ingest duplicates (corpus "
    "ids re-sent in the stream) must add nothing. The oracle replays "
    "the full post-stream assignments table: every corpus AND "
    "streamed vector exactly once with its exact-fold argmax cell",
)
def stream_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.plans.llm_queries import _IVF_NLIST
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf_index(
        emb.filter(F.col("vec_id") >= 10), nlist=_IVF_NLIST, quantizer="sample"
    )
    root = scratch_dir(prefix="ivf_stream_")
    idx.save(f"{root}/index")
    # stage the stream: two new-vector chunks (one file = one micro-
    # batch) plus re-ingested corpus ids that index-wins must drop
    chunks = f"{root}/chunks"
    emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").coalesce(
        1
    ).write.mode("append").parquet(chunks)
    (
        emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 15))
        .select("vec_id", "embedding")
        .coalesce(1)
        .write.mode("append")
        .parquet(chunks)
    )
    svec = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    run_stream_ivf_assign(svec, index_path=f"{root}/index")
    return spark.read.parquet(f"{root}/index/assignments").select(
        F.col("id").alias("vec_id"), F.col("cell").cast("int").alias("cell")
    )


def _lm_quality_gate_oracle() -> str:
    # Gopher spelling shared with _quality_gate_oracle; the LM chain is
    # llm_queries._LM_CTES verbatim (same model slice, same DECIMAL
    # partials), so the streaming decisions must replay exactly.
    from auraverse_etl_pipeline_spark.operators.lm import LM_XENT_MAX
    from auraverse_etl_pipeline_spark.operators.quality import gopher_fail_reason_sql
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _EN_LIST,
        _LM_CTES,
        _TOKS,
    )

    return (
        _LM_CTES
        + f""",
    m AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_words,
               length(regexp_replace(text, '\\s', '', 'g')) / len({_TOKS}) AS mean_word_len,
               CAST(len(list_intersect(list_distinct({_TOKS}), {_EN_LIST})) AS BIGINT)
                 AS stopword_hits
        FROM documents
    )
    SELECT fail_reason, fluent, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (
        SELECT {gopher_fail_reason_sql()} AS fail_reason,
               (x.xent IS NOT NULL AND x.xent <= {LM_XENT_MAX!r}) AS fluent
        FROM m JOIN xents x USING (doc_id)
    )
    GROUP BY fail_reason, fluent
    """
    )


@query(
    "stream_lm_quality_gate",
    oracle=_lm_quality_gate_oracle(),
    description="the streaming curation gate with the FULL batch gate "
    "set: Gopher rules PLUS the bigram-LM fluency score in one "
    "foreachBatch projection, so the streaming path enforces exactly "
    "what the batch curation_funnel / crawl_to_corpus_funnel gates "
    "enforce (batch/stream gate parity). The LM is trained ONCE on the "
    "static trusted slice and joined stream-static as two broadcast "
    "vocabulary-bounded model tables; the per-document transition sum "
    "is batch-local, so no doc-keyed state store entry ever exists. "
    "Per-doc decisions land as fixed-width parquet rows; the query "
    "reports the running (fail_reason, fluent) tally",
)
def stream_lm_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.operators.lm import BigramLm, ngram_lm_train
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_lm_quality_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
    lm = ngram_lm_train(ref)
    cached = BigramLm(
        bigrams=lm.bigrams.cache(),
        contexts=lm.contexts.cache(),
        stats=lm.stats.cache(),
    )
    root = scratch_dir(prefix="lm_gate_")
    try:
        run_stream_lm_quality_gate(
            stream_documents(spark, sf_dir),
            cached,
            decisions_path=f"{root}/decisions",
        )
    finally:
        for t in (cached.bigrams, cached.contexts, cached.stats):
            # the bigrams frame carries a chained release handle for the
            # internal bigram-count cache created inside ngram_lm_train —
            # route through it so that cache doesn't outlive the query.
            release = getattr(t, "release_caches", None)
            if callable(release):
                release()
            t.unpersist()
    return (
        spark.read.parquet(f"{root}/decisions")
        .groupBy("fail_reason", "fluent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def _logreg_gate_oracle() -> str:
    """The batch logreg training chain (shared with
    text_logreg_quality) plus the streamed decisions' running tally —
    batch/stream gate parity at the oracle level."""
    from auraverse_etl_pipeline_spark.plans.llm_queries import _logreg_sa_chain

    from auraverse_etl_pipeline_spark.operators.classifier import LOGREG_FIXED_POINT

    fx = repr(LOGREG_FIXED_POINT)
    return (
        _logreg_sa_chain()
        + f"""
    SELECT score > 0 AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(floor(score * {fx}) AS DECIMAL(38,0))) AS DOUBLE) / {fx}
             AS score_sum
    FROM sa GROUP BY 1
    """
    )


@query(
    "stream_logreg_gate",
    oracle=_logreg_gate_oracle(),
    description="the fasttext-style classifier gate on the stream "
    "path: the logistic-regression model trains ONCE offline (the "
    "text_logreg_quality trainer on the static even-id slice of the "
    "marker fixture) and every micro-batch of documents scores "
    "against it via a stream-static broadcast join - a stateless "
    "per-document projection, so no state-store entry ever exists "
    "and the gate is safe on an unbounded stream (exactly how a "
    "production quality classifier deploys: retrain offline, score "
    "continuously). Per-doc decisions land as fixed-width parquet "
    "rows; the query reports the (predicted, n_docs, score_sum) "
    "tally, fixed-point-summed (floor(score*2^40) as exact "
    "DECIMAL(38,0), one division) so the hash is order-independent "
    "and engine-portable",
)
def stream_logreg_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.operators.classifier import logreg_train
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _LOGREG_BUCKETS,
        _LOGREG_ITERS,
        _LOGREG_LR,
        _NB_NEG_SUFFIX,
        _NB_POS_SUFFIX,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_logreg_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    def with_markers(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.concat(
                "text",
                F.when(F.col("doc_id") % 3 == 0, F.lit(_NB_POS_SUFFIX)).otherwise(
                    F.lit(_NB_NEG_SUFFIX)
                ),
            ).alias("text"),
        )

    docs = with_markers(load_table(spark, sf_dir, "documents"))
    model = logreg_train(
        docs.filter(F.col("doc_id") % 2 == 0),
        F.col("doc_id") % 3 == 0,
        True,
        num_buckets=_LOGREG_BUCKETS,
        lr=_LOGREG_LR,
        iters=_LOGREG_ITERS,
        decay=True,
    ).cache()
    root = scratch_dir(prefix="logreg_gate_")
    try:
        run_stream_logreg_gate(
            with_markers(stream_documents(spark, sf_dir)),
            model,
            decisions_path=f"{root}/decisions",
            num_buckets=_LOGREG_BUCKETS,
        )
    finally:
        model.unpersist()
    from auraverse_etl_pipeline_spark.operators.classifier import LOGREG_FIXED_POINT

    fx = F.lit(LOGREG_FIXED_POINT)
    return (
        spark.read.parquet(f"{root}/decisions")
        .groupBy("predicted")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum(F.floor(F.col("score") * fx).cast("decimal(38,0)")).cast("double")
                / fx
            ).alias("score_sum"),
        )
    )


def _domain_gate_oracle() -> str:
    """Identical to the batch twin's oracle — the stream/batch parity
    contract (the logreg-gate pattern): decisions tallied per domain
    must equal the batch funnel exactly."""
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _domain_blocklist_oracle,
    )

    return _domain_blocklist_oracle()


@query(
    "stream_domain_gate",
    oracle=_domain_gate_oracle(),
    description="the domain-blocklist gate on the stream path: the "
    "Bloom filter builds ONCE from the blocklist (offline, like the "
    "logreg model), every micro-batch of crawl documents extracts its "
    "registrable domain from the target URI, probes the broadcast "
    "filter map-side and exact-verifies only flagged domains - a "
    "stateless per-document projection, no state store, safe on an "
    "unbounded stream (a crawl frontier applying a blocklist "
    "continuously). Per-doc decisions land as fixed-width parquet "
    "rows; the query reports the per-domain attrition tally and the "
    "oracle is byte-identical to the batch twin corpus_domain_"
    "blocklist - stream/batch gate parity at the oracle level",
)
def stream_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _BLOCK_BITS,
        _BLOCK_HASHES,
        _BLOCKED_DOMAINS,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_domain_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    from auraverse_etl_pipeline_spark.plans.llm_queries import _domain_uri

    def with_uri(df: DataFrame) -> DataFrame:
        return df.select("doc_id", "text", _domain_uri().alias("target_uri"))

    root = scratch_dir(prefix="domain_gate_")
    run_stream_domain_gate(
        with_uri(stream_documents(spark, sf_dir)),
        _BLOCKED_DOMAINS,
        decisions_path=f"{root}/decisions",
        num_bits=_BLOCK_BITS,
        num_hashes=_BLOCK_HASHES,
    )
    return (
        spark.read.parquet(f"{root}/decisions")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("bloom_flagged"),
            F.sum(F.when(F.col("blocked"), 1).otherwise(0)).cast("bigint").alias("blocked"),
            F.sum(F.when(~F.col("blocked"), 1).otherwise(0)).cast("bigint").alias("kept"),
            F.sum(F.when(~F.col("blocked") & F.col("gopher"), 1).otherwise(0))
            .cast("bigint")
            .alias("kept_gopher"),
        )
    )


def _url_frontier_oracle() -> str:
    """Batch spelling of the frontier's final contents: canonical URL →
    first discovering doc id (batches arrive in id order over the
    staged corpus, so cross-batch first-wins == global min)."""
    from auraverse_etl_pipeline_spark.functions.urls import canonical_url_sql
    from auraverse_etl_pipeline_spark.plans.llm_queries import _messy_url_sql

    return f"""
    WITH raw AS (SELECT doc_id, {_messy_url_sql()} AS raw_url FROM documents),
    c AS (SELECT doc_id, {canonical_url_sql('raw_url')} AS canon_url FROM raw)
    SELECT canon_url, CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM c GROUP BY canon_url
    """


@query(
    "stream_url_frontier",
    oracle=_url_frontier_oracle(),
    description="continuous crawl-frontier URL dedup - the URL-tier "
    "closed incremental loop next to the MinHash/BM25/IVF ones: each "
    "micro-batch of discovered raw URLs canonicalizes (lowercase, "
    "default-port/fragment strip, utm_* drop, query sort) and only "
    "never-seen canonical forms append to the frontier parquet "
    "(within-batch first-writer-wins, index-wins anti-join vs batches "
    "1..N-1, eager lineage cut before the read-then-append - the "
    "pinned foreachBatch gotcha). A URL discovered in batch N is "
    "never re-fetched later; the oracle is the batch canonical-min "
    "spelling over the same messy fixture",
)
def stream_url_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.plans.llm_queries import _messy_url_sql
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_url_frontier
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    root = scratch_dir(prefix="url_frontier_")
    urls = stream_documents(spark, sf_dir).select(
        "doc_id", F.expr(_messy_url_sql()).alias("raw_url")
    )
    run_stream_url_frontier(urls, frontier_path=f"{root}/frontier")
    return spark.read.parquet(f"{root}/frontier")


#: Streaming SemDeDup gate constants, shared Spark/oracle.
_SDG_NLIST = 8
_SDG_TAU = 0.9


def _stream_semdedup_oracle() -> str:
    """DuckDB replay of the full streaming SemDeDup run: day-1 corpus
    build (sample quantizer + the batch drop rule), then each
    micro-batch's decisions in arrival order — id anti-join, clamped
    argmax assignment, index-wins content dedup against the members as
    of that batch, and the batch twin's declarative centrality rule
    within the batch."""
    clamp = "least(CAST(1.0 AS DOUBLE), list_cosine_similarity({a}, {b}))"
    c0 = clamp.format(a="x.v", b="y.v")

    def assign(src: str, name: str) -> str:
        cs = clamp.format(a=f"{src}.v", b="cent.centroid")
        return f"""
    {name} AS MATERIALIZED (
        SELECT id, v, cell, cs FROM (
            SELECT {src}.id, {src}.v, cent.cell, {cs} AS cs,
                   ROW_NUMBER() OVER (PARTITION BY {src}.id
                       ORDER BY {cs} DESC, cent.cell) AS rn
            FROM {src} CROSS JOIN cent
        ) WHERE rn = 1
    )"""

    def batch_round(n: int, prev_members: str) -> str:
        return f"""
    n{n} AS (SELECT * FROM b{n} WHERE id NOT IN (SELECT id FROM {prev_members})),
    {assign(f"n{n}", f"a{n}").strip()},
    i{n} AS (
        SELECT DISTINCT x.id
        FROM a{n} x JOIN {prev_members} y ON x.cell = y.cell
        WHERE {c0} >= {_SDG_TAU!r}
    ),
    r{n} AS (SELECT * FROM a{n} WHERE id NOT IN (SELECT id FROM i{n})),
    bl{n} AS (
        SELECT DISTINCT CASE WHEN x.cs > y.cs THEN x.id
                             WHEN x.cs < y.cs THEN y.id
                             ELSE greatest(x.id, y.id) END AS id
        FROM r{n} x JOIN r{n} y ON x.cell = y.cell AND x.id < y.id
        WHERE {c0} >= {_SDG_TAU!r}
    ),
    k{n} AS (SELECT * FROM r{n} WHERE id NOT IN (SELECT id FROM bl{n})),
    m{n} AS MATERIALIZED (
        SELECT id, v, cell, cs FROM {prev_members}
        UNION ALL SELECT id, v, cell, cs FROM k{n}
    ),
    d{n} AS (
        SELECT id, cell, cs,
               CASE WHEN id IN (SELECT id FROM i{n}) THEN 'index_dup'
                    WHEN id IN (SELECT id FROM bl{n}) THEN 'batch_dup'
                    ELSE 'kept' END AS reason
        FROM a{n}
    )"""

    return f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c AS (SELECT vec_id AS id, v FROM base WHERE vec_id >= 20 AND vec_id < 220),
    cent AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cell,
               v AS centroid
        FROM (SELECT id, v FROM c ORDER BY id LIMIT {_SDG_NLIST})
    ),
    {assign("c", "a0").strip()},
    bl0 AS (
        SELECT DISTINCT CASE WHEN x.cs > y.cs THEN x.id
                             WHEN x.cs < y.cs THEN y.id
                             ELSE greatest(x.id, y.id) END AS id
        FROM a0 x JOIN a0 y ON x.cell = y.cell AND x.id < y.id
        WHERE {c0} >= {_SDG_TAU!r}
    ),
    m0 AS MATERIALIZED (SELECT * FROM a0 WHERE id NOT IN (SELECT id FROM bl0)),
    b1 AS (
        SELECT vec_id + 200000 AS id, list_transform(v, x -> x + 0.05) AS v
        FROM base WHERE vec_id IN (20, 21)
        UNION ALL
        SELECT vec_id + 210000, list_reverse(v) FROM base WHERE vec_id IN (0, 1, 2)
        UNION ALL
        SELECT 210003, list_transform(list_reverse(v), x -> x + 0.05)
        FROM base WHERE vec_id = 2
        UNION ALL
        SELECT 25, v FROM base WHERE vec_id = 25
    ),
    {batch_round(1, "m0").strip()},
    b2 AS (
        SELECT 300000 AS id, list_transform(list_reverse(v), x -> x + 0.05) AS v
        FROM base WHERE vec_id = 0
        UNION ALL
        SELECT 300030, list_transform(v, x -> x + 0.05) FROM base WHERE vec_id = 30
        UNION ALL
        SELECT 310003, list_reverse(v) FROM base WHERE vec_id = 3
    ),
    {batch_round(2, "m1").strip()}
    SELECT id AS vec_id, CAST(cell AS BIGINT) AS cell, cs AS centroid_cos,
           reason = 'kept' AS kept, reason
    FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
    """


@query(
    "stream_semdedup_gate",
    oracle=_stream_semdedup_oracle(),
    description="continuous SEMANTIC dedup (foreachBatch) - the "
    "SemDeDup twin of stream_compaction_dedup and the eighth closed "
    "incremental loop: a day-1 corpus index (persisted sample-"
    "quantizer centroids + the batch drop rule's kept members) gates "
    "arriving embedding micro-batches - clamped argmax cell "
    "assignment against the PERSISTED centroids (no refit), "
    "index-wins content dedup against in-cell accepted members "
    "(already-accepted vectors are never retracted - the append-safe "
    "streaming deviation, documented on the operator), then the batch "
    "twin's declarative centrality rule WITHIN the batch; survivors "
    "append into the members' cell partitions so a batch-1 survivor "
    "catches its batch-2 near-duplicate. Fixtures force every verdict "
    "class: corpus near-dups (index_dup), novel directions (kept), a "
    "within-batch near-pair (batch_dup), a cross-batch near-pair "
    "(index_dup vs a STREAMED member), and a re-ingested corpus id "
    "(silently skipped, no decision row). DuckDB replays the build "
    "and both batches decision-for-decision",
)
def stream_semdedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_index,
        semdedup_clusters,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_semdedup_gate

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 220))
    idx = ivf_index(corpus, nlist=_SDG_NLIST, quantizer="sample")
    verd = semdedup_clusters(corpus, threshold=_SDG_TAU, index=idx)
    members = (
        verd.filter("kept")
        .select(
            F.col("vec_id").alias("id"),
            F.col("cell").cast("int").alias("cell"),
            "centroid_cos",
        )
        .join(
            corpus.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
            "id",
        )
        .select("id", "v", "cell", "centroid_cos")
    )
    root = scratch_dir(prefix="semdedup_stream_")
    # model-sized centroids: ONE file (the fb6c50e rule — a multi-task
    # commit of nlist rows is pure overhead, and every micro-batch
    # re-lists this directory); members clustered by cell before the
    # partitioned write (the r13 IvfIndex.save rule: one writer per
    # cell per task, one file per cell for the per-batch in-cell scans)
    idx.centroids.coalesce(1).write.parquet(f"{root}/index/centroids")
    members.repartition("cell").write.partitionBy("cell").parquet(
        f"{root}/index/members"
    )
    plus = lambda c: F.transform(c, lambda x: x + F.lit(0.05))
    b1 = (
        emb.filter(F.col("vec_id").isin(20, 21))
        .select((F.col("vec_id") + 200000).alias("vec_id"), plus("embedding").alias("embedding"))
        .unionByName(
            emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
                (F.col("vec_id") + 210000).alias("vec_id"),
                F.reverse("embedding").alias("embedding"),
            )
        )
        .unionByName(
            emb.filter(F.col("vec_id") == 2).select(
                F.lit(210003).cast("bigint").alias("vec_id"),
                plus(F.reverse("embedding")).alias("embedding"),
            )
        )
        .unionByName(emb.filter(F.col("vec_id") == 25).select("vec_id", "embedding"))
    )
    b2 = (
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.lit(300000).cast("bigint").alias("vec_id"),
            plus(F.reverse("embedding")).alias("embedding"),
        )
        .unionByName(
            emb.filter(F.col("vec_id") == 30).select(
                F.lit(300030).cast("bigint").alias("vec_id"),
                plus("embedding").alias("embedding"),
            )
        )
        .unionByName(
            emb.filter(F.col("vec_id") == 3).select(
                F.lit(310003).cast("bigint").alias("vec_id"),
                F.reverse("embedding").alias("embedding"),
            )
        )
    )
    chunks = f"{root}/chunks"
    # The DECISIONS depend on batch order (a b1 survivor gates its b2
    # near-dup) and the oracle hard-codes b1-before-b2 — stage with
    # pinned mtimes (no sleeps; see stage_ordered_batches).
    from auraverse_etl_pipeline_spark.streaming.sources import (
        stage_ordered_batches,
    )

    stage_ordered_batches([b1, b2], chunks)
    svec = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    run_stream_semdedup_gate(svec, index_path=f"{root}/index", threshold=_SDG_TAU)
    return spark.read.parquet(f"{root}/index/decisions").select(
        F.col("id").alias("vec_id"),
        F.col("cell").cast("bigint").alias("cell"),
        "centroid_cos",
        "kept",
        "reason",
    )


def _compact_decisions_oracle() -> str:
    # batch-1 verdicts reuse the exact Gopher spelling of
    # _quality_gate_oracle (shared constants via gopher_fail_reason_sql);
    # batch-2 is the re-score rule over the doc_id % 3 slice; the
    # compaction is arg-max-per-id on batch_id, spelled as a window.
    from auraverse_etl_pipeline_spark.operators.quality import gopher_fail_reason_sql
    from auraverse_etl_pipeline_spark.plans.llm_queries import _EN_LIST, _TOKS

    return f"""
    WITH m AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_words,
               length(regexp_replace(text, '\\s', '', 'g')) / len({_TOKS}) AS mean_word_len,
               CAST(len(list_intersect(list_distinct({_TOKS}), {_EN_LIST})) AS BIGINT)
                 AS stopword_hits
        FROM documents
    ),
    b1 AS (
        SELECT doc_id, CAST(1 AS BIGINT) AS batch_id,
               fr AS fail_reason, fr = 'ok' AS kept
        FROM (SELECT doc_id, {gopher_fail_reason_sql()} AS fr FROM m)
    ),
    b2 AS (
        SELECT doc_id, CAST(2 AS BIGINT) AS batch_id,
               CASE WHEN n_chars < 200 THEN 'too_short' ELSE 'ok' END AS fail_reason,
               n_chars >= 200 AS kept
        FROM documents WHERE doc_id % 3 = 0
    ),
    log AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
    SELECT doc_id, batch_id, fail_reason, kept FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY batch_id DESC) AS rn
        FROM log
    ) WHERE rn = 1
    """


@query(
    "compact_decisions",
    oracle=_compact_decisions_oracle(),
    description="RETENTION for the gates' append-only verdict logs: "
    "every run_stream_*_gate loop appends one decision row per "
    "document per scoring forever, so a re-scored corpus accretes "
    "superseded rows and micro-batch small files - at 100 TB the "
    "decisions log outgrows the index it audits. compact_decisions "
    "keeps the LATEST verdict per id (one max_by hash aggregate, "
    "never a window sort over the full log) and rewrites the log "
    "with bounded file sizes, in place behind the eager-"
    "localCheckpoint lineage cut. Fixture: a full Gopher scoring "
    "(batch 1, the stream_quality_gate spelling) overlaid by a "
    "re-score of the doc_id % 3 slice (batch 2); the oracle replays "
    "latest-per-id over the union",
)
def compact_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.operators.quality import gopher_report
    from auraverse_etl_pipeline_spark.sources.sinks import compact_decisions as compact
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    b1 = gopher_report(docs).select(
        "doc_id",
        F.lit(1).cast("bigint").alias("batch_id"),
        "fail_reason",
        F.col("keep").alias("kept"),
    )
    b2 = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.lit(2).cast("bigint").alias("batch_id"),
        F.when(F.col("n_chars") < 200, F.lit("too_short"))
        .otherwise(F.lit("ok"))
        .alias("fail_reason"),
        (F.col("n_chars") >= 200).alias("kept"),
    )
    path = scratch_dir(prefix="decisions_log_")
    b1.write.mode("append").parquet(path)  # two appends = two scoring
    b2.write.mode("append").parquet(path)  # runs accreting one log
    compacted = compact(
        spark, path, order_col="batch_id", id_cols=("doc_id",)
    )
    return compacted.select("doc_id", "batch_id", "fail_reason", "kept")
