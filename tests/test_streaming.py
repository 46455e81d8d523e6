"""Streaming-surface tests beyond the oracle gate: genuinely incremental
multi-batch execution (maxFilesPerTrigger=1 over chunked input), state
carried across micro-batches, and cross-batch dedup."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from auraverse_etl_pipeline_spark.sources.tables import load_table
from auraverse_etl_pipeline_spark.streaming import (
    dedup_events_within_watermark,
    run_stream_to_memory,
    stream_events,
    user_running_totals,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def chunked_events_dir(spark, sf_dir, tmp_path_factory):
    """Events split into 3 parquet files in ts order (each written
    separately so modification times order the stream), ts re-encoded
    as raw nanos to match the driver's on-disk layout."""
    out = str(tmp_path_factory.mktemp("events_chunks"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.unix_micros("ts") * F.lit(1000)
    )
    n = ev.count()
    ordered = ev.withColumn("_chunk", F.ntile(3).over(Window.orderBy("ts")))
    for i in (1, 2, 3):
        (
            ordered.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
    assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) >= 3
    return out, n


def test_multi_batch_windows_match_batch(spark, sf_dir, chunked_events_dir):
    """3 micro-batches (one file each) through the windowed aggregation
    must converge to exactly the single-batch answer."""
    path, _ = chunked_events_dir
    sev = stream_events(spark, path, max_files_per_trigger=1)
    got = run_stream_to_memory(windowed_event_counts(sev), "complete", "t_mb_windows")
    bev = load_table(spark, sf_dir, "events")
    want = (
        bev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .count()
    )
    assert got.count() == want
    # every (window, type) count agrees with batch
    batch = (
        bev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    diff = (
        got.select("window_start", "event_type", "n_events")
        .exceptAll(batch.select("window_start", "event_type", F.col("n").alias("n_events")))
        .count()
    )
    assert diff == 0


def test_stateful_totals_accumulate_across_batches(spark, chunked_events_dir):
    """applyInPandasWithState must carry state across micro-batches:
    with 3 single-file triggers, users emit multiple cumulative rows and
    the per-user max equals the final total."""
    path, n = chunked_events_dir
    sev = stream_events(spark, path, max_files_per_trigger=1)
    out = run_stream_to_memory(user_running_totals(sev), "update", "t_mb_totals").cache()
    # state crossed batches: some user emitted more than once
    emissions = out.groupBy("user_id").count()
    assert emissions.agg(F.max("count")).first()[0] >= 2
    # cumulative counts are monotone → per-user max == total events
    finals = out.groupBy("user_id").agg(F.max("n_events").alias("n"))
    assert finals.agg(F.sum("n")).first()[0] == n


def test_dedup_suppresses_cross_batch_redelivery(spark, chunked_events_dir):
    """An event redelivered in a LATER micro-batch (within the watermark)
    must be suppressed by dropDuplicatesWithinWatermark state."""
    path, n = chunked_events_dir
    sev = stream_events(spark, path, max_files_per_trigger=1)
    doubled = sev.unionByName(sev)
    out = run_stream_to_memory(
        dedup_events_within_watermark(doubled), "append", "t_mb_dedup"
    )
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_foreach_batch_sink_exactly_once(spark, sf_dir, chunked_events_dir, tmp_path):
    """The foreachBatch parquet sink must (a) land every input row
    exactly once across micro-batches, (b) be idempotent: re-writing a
    batch_id replaces its partition instead of duplicating it."""
    from auraverse_etl_pipeline_spark.streaming.sinks import (
        foreach_batch_writer,
        partitioned_parquet_sink,
    )

    path, n = chunked_events_dir
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    sev = stream_events(spark, path, max_files_per_trigger=1)
    q = partitioned_parquet_sink(sev, out, ckpt)
    q.awaitTermination(120)
    q.stop()
    back = spark.read.parquet(out)
    assert back.count() == n
    batches = [r.batch_id for r in back.select("batch_id").distinct().collect()]
    assert len(batches) >= 3  # genuinely incremental
    # replay batch 0 with different content → its partition is replaced
    replay = spark.read.parquet(out).filter(F.col("batch_id") == batches[0]).drop("batch_id").limit(1)
    foreach_batch_writer(out)(replay, batches[0])
    again = spark.read.parquet(out)
    assert again.filter(F.col("batch_id") == batches[0]).count() == 1
    assert again.filter(F.col("batch_id") != batches[0]).count() == back.filter(F.col("batch_id") != batches[0]).count()


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row arriving after the watermark has passed its window must be
    ignored: its window's state was evicted and never re-emits. (The
    drop engages once the watermark advanced in a PRIOR batch — within
    the same batch as the advancing data, Spark still accepts it.)"""
    import pyspark.sql.functions as F2

    def chunk(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
        ).select(
            "event_id",
            (F2.unix_micros(F2.col("ts_s").cast("timestamp")) * 1000).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(str(tmp_path / "late_events"))
        import time

        time.sleep(1.2)  # distinct mod times => deterministic batch order

    # batch 0: 00:10 and 06:00 -> watermark will advance to 05:00
    chunk([(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
           (2, "2024-01-01 06:00:00", 1, "click", 1.0, "{}")])
    # batch 1: fresh row; 00:00-window state is evicted this batch
    chunk([(3, "2024-01-01 07:00:00", 1, "click", 1.0, "{}")])
    # batch 2: ONLY a late row far behind the watermark -> dropped
    chunk([(4, "2024-01-01 00:30:00", 1, "click", 99.0, "{}")])
    sev = stream_events(spark, str(tmp_path / "late_events"), max_files_per_trigger=1)
    out = run_stream_to_memory(
        windowed_event_counts(sev, watermark="1 hour"), "update", "t_late_drop"
    )
    rows = out.collect()
    h0 = [r for r in rows if r.window_start.hour == 0]
    # exactly one emission for the 00:00 window, from batch 0 only
    assert [(r.n_events, r.sum_value) for r in h0] == [(1, 1.0)], rows
    assert any(r.window_start.hour == 7 for r in rows)


def test_session_window_late_row_dropped(spark, tmp_path):
    """Session-window twin of the late-drop test: once the watermark
    passed a closed session's end, a late row inside that session must
    be ignored — the session finalized with its on-time events only and
    its state was evicted (append mode: Spark rejects update mode for
    streaming session windows). Were the late row accepted, it would
    finalize immediately as an extra already-behind-watermark session
    row — so its absence proves the drop."""
    import pyspark.sql.functions as F2

    from auraverse_etl_pipeline_spark.streaming.ops import sessionize_events_stream

    def chunk(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
        ).select(
            "event_id",
            (F2.unix_micros(F2.col("ts_s").cast("timestamp")) * 1000).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(str(tmp_path / "late_sessions"))
        import time

        time.sleep(1.2)

    # b0: a 2-event session at 00:00 for user 1, plus an advancing row
    # (other user) pushing the watermark to 05:00
    chunk([(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
           (2, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
           (3, "2024-01-01 06:00:00", 2, "click", 1.0, "{}")])
    # b1: fresh row; user 1's closed session is evicted this batch
    chunk([(4, "2024-01-01 07:00:00", 2, "click", 1.0, "{}")])
    # b2: ONLY a late row that would extend user 1's 00:00 session
    chunk([(5, "2024-01-01 00:20:00", 1, "click", 99.0, "{}")])

    sev = stream_events(spark, str(tmp_path / "late_sessions"), max_files_per_trigger=1)
    out = run_stream_to_memory(
        sessionize_events_stream(sev, gap="30 minutes", watermark="1 hour"),
        "append",
        "t_late_sessions",
    )
    u1 = [r for r in out.collect() if r.user_id == 1]
    # exactly one emission for user 1's session, from b0 only: 2 events,
    # value 2.0, session end = last on-time event + gap — the late row
    # (event 5, value 99) neither extended nor re-emitted it
    assert [(r.n_events, float(r.sum_value)) for r in u1] == [(2, 2.0)], u1
    assert u1[0].session_end.strftime("%H:%M") == "00:40"


def test_dedup_state_evicted_after_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps dedup state only within the
    watermark: a redelivery arriving AFTER the watermark passed the
    original event's time must not be absorbed by (already-evicted)
    state — Spark drops it as late data instead. Either way the row
    emits at most once, and state provably did not outlive the
    watermark (the stream would otherwise need unbounded memory)."""
    import pyspark.sql.functions as F2

    def chunk(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
        ).select(
            "event_id",
            (F2.unix_micros(F2.col("ts_s").cast("timestamp")) * 1000).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(str(tmp_path / "late_dedup"))
        import time

        time.sleep(1.2)

    # b0: original event + advancing row -> watermark reaches 05:00
    chunk([(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
           (2, "2024-01-01 06:00:00", 1, "click", 1.0, "{}")])
    # b1: fresh row; event 1's dedup state is evicted this batch
    chunk([(3, "2024-01-01 07:00:00", 1, "click", 1.0, "{}")])
    # b2: redelivery of event 1, far behind the watermark
    chunk([(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}")])

    sev = stream_events(spark, str(tmp_path / "late_dedup"), max_files_per_trigger=1)
    out = run_stream_to_memory(
        dedup_events_within_watermark(sev, watermark="1 hour"), "append", "t_late_dedup"
    )
    rows = out.collect()
    # every id emitted exactly once; the post-eviction redelivery was
    # dropped as late data, not deduped by retained state
    assert sorted(r.event_id for r in rows) == [1, 2, 3], rows


def test_left_outer_attribution_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter stream-stream join semantics: matched purchases emit
    immediately; an unattributed purchase emits a NULL-view row only
    after the watermark passes it; a tail purchase still inside the
    watermark when the stream ends never emits."""
    import pyspark.sql.functions as F2

    from auraverse_etl_pipeline_spark.streaming.ops import purchase_attribution_join

    def chunk(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
        ).select(
            "event_id",
            (F2.unix_micros(F2.col("ts_s").cast("timestamp")) * 1000).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("append").parquet(str(tmp_path / "attr_events"))
        import time

        time.sleep(1.2)

    # b0: matched pair (user 1), unattributed purchase (user 2)
    chunk([
        (10, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (11, "2024-01-01 00:30:00", 1, "purchase", 5.0, "{}"),
        (12, "2024-01-01 00:45:00", 2, "purchase", 7.0, "{}"),
    ])
    # b1: late-hour activity on both sides -> watermark (2h) advances to
    # ~04:00, past user 2's purchase; user 3's pair matches inner-style
    chunk([
        (13, "2024-01-01 06:00:00", 3, "view", 0.0, "{}"),
        (14, "2024-01-01 06:10:00", 3, "purchase", 9.0, "{}"),
    ])
    # b2: one more batch so the advanced watermark evicts + emits
    chunk([(15, "2024-01-01 06:30:00", 4, "view", 0.0, "{}")])

    sev = stream_events(spark, str(tmp_path / "attr_events"), max_files_per_trigger=1)
    out = run_stream_to_memory(
        purchase_attribution_join(sev, join_type="leftOuter"), "append", "t_attr_outer"
    )
    rows = {(r.purchase_id, r.view_id) for r in out.collect()}
    assert (11, 10) in rows, rows        # matched pair
    assert (12, None) in rows, rows      # unattributed, watermark passed
    assert (14, 13) in rows, rows        # matched in later batch
    # no purchase after the final watermark may emit a NULL row twice
    assert len([p for p, v in rows if p == 12]) == 1


def test_streaming_ingest_accumulates_across_batches(spark, sf_dir, tmp_path):
    """The detector pipeline must stream: documents arriving in three
    separate micro-batches produce exactly the batch answer over the
    whole corpus."""
    from auraverse_etl_pipeline_spark.ingest.pipeline import (
        detect_fragments,
        summarize_fragments,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 60")
    chunk_dir = tmp_path / "doc_chunks"
    for lo, hi in [(0, 20), (20, 40), (40, 60)]:
        import time

        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(str(chunk_dir))
        time.sleep(1.2)  # distinct mod times => deterministic batch order

    sdocs = stream_documents(spark, str(chunk_dir), max_files_per_trigger=1)
    got = run_stream_to_memory(
        summarize_fragments(detect_fragments(sdocs)), "complete", "t_stream_ingest"
    )
    expect = summarize_fragments(detect_fragments(docs))
    g = {(r.format_type, r.n_fragments) for r in got.collect()}
    e = {(r.format_type, r.n_fragments) for r in expect.collect()}
    assert g == e and len(g) > 0


def test_stream_incremental_dedup_multi_batch(spark, sf_dir, tmp_path):
    """The stream-static index match must be genuinely incremental:
    new documents arriving in three micro-batches accumulate to exactly
    the batch operator's answer against the same persisted index."""
    import time

    from auraverse_etl_pipeline_spark.operators.dedup import (
        minhash_index,
        minhash_match_index,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import stream_match_minhash_index
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    corpus = load_table(spark, sf_dir, "documents")
    index = minhash_index(corpus, n=3, hash_fn="md5")
    new_docs = corpus.filter("doc_id < 30").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )

    chunk_dir = tmp_path / "new_doc_chunks"
    for lo, hi in [(100000, 100010), (100010, 100020), (100020, 100030)]:
        new_docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").withColumn(
            "source", F.lit("s")
        ).withColumn("lang", F.lit("en")).withColumn(
            "n_chars", F.length("text").cast("long")
        ).coalesce(1).write.mode("append").parquet(str(chunk_dir))
        time.sleep(1.2)

    sdocs = stream_documents(spark, str(chunk_dir), max_files_per_trigger=1)
    got = run_stream_to_memory(
        stream_match_minhash_index(sdocs, index, est_threshold=0.5, n=3, hash_fn="md5"),
        "complete",
        "t_stream_incr_dedup",
    )
    want = minhash_match_index(new_docs, index, est_threshold=0.5, n=3, hash_fn="md5")
    g = {(r.new_id, r.indexed_id, r.est_jaccard) for r in got.collect()}
    w = {(r.new_id, r.indexed_id, r.est_jaccard) for r in want.collect()}
    assert g == w and len(g) >= 30


def test_stream_compaction_dedup_catches_cross_batch_duplicates(spark, tmp_path):
    """The closed loop's defining property, which the static-index
    stream cannot have: a batch-2 duplicate of a batch-1 document is
    caught, because batch 1 compacted its signatures into the index
    before batch 2 matched. Also: within-batch duplicates are caught,
    canonical output carries no self/duplicate rows, and the persisted
    index ends with exactly one signature row per unique doc_id."""
    import time

    from auraverse_etl_pipeline_spark.streaming.ops import (
        run_stream_dedup_compaction,
    )

    text_a = "the quick brown fox jumps over the lazy sleeping dog today"
    text_b = "completely different content about distributed query engines and shuffles"
    text_c = "a third unrelated document mentioning parquet files and row groups"
    batch1 = [(1, text_a), (2, text_b), (7, text_b)]  # 2↔7: within-batch dup
    batch2 = [(3, text_a), (4, text_c)]  # 3: cross-batch dup of 1
    schema = "doc_id long, text string"
    chunk_dir = tmp_path / "doc_chunks"
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(chunk_dir)
        )
        time.sleep(1.2)

    root = tmp_path / "compaction"
    sdocs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    run_stream_dedup_compaction(
        sdocs,
        index_path=str(root / "index"),
        matches_path=str(root / "matches"),
        est_threshold=0.5,
        n=3,
        hash_fn="md5",
    )
    got = {
        (r.id1, r.id2): r.est_jaccard
        for r in spark.read.parquet(str(root / "matches")).collect()
    }
    assert got == {(1, 3): 1.0, (2, 7): 1.0}
    index = spark.read.parquet(str(root / "index"))
    assert index.count() == 5  # one signature row per unique doc
    assert index.select("doc_id").distinct().count() == 5


def test_stream_quality_gate_multi_batch(spark, sf_dir, tmp_path):
    """The streaming Gopher gate replayed over three micro-batches must
    equal the batch decision aggregate over the same documents."""
    import time

    from auraverse_etl_pipeline_spark.operators.quality import gopher_report
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 90")
    chunk_dir = tmp_path / "gate_chunks"
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(str(chunk_dir))
        time.sleep(1.2)

    sdocs = stream_documents(spark, str(chunk_dir), max_files_per_trigger=1)
    got = run_stream_to_memory(
        gopher_report(sdocs)
        .groupBy("fail_reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")),
        "complete",
        "t_stream_gate",
    )
    want = (
        gopher_report(docs)
        .groupBy("fail_reason")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    g = {(r.fail_reason, r.n_docs) for r in got.collect()}
    w = {(r.fail_reason, r.n_docs) for r in want.collect()}
    assert g == w and sum(n for _, n in g) == 90


def test_stream_bm25_indexing_multi_batch_index_wins(spark, tmp_path):
    """Segment-building property: a batch-2 re-ingest of a batch-1
    document (even with changed text) adds NOTHING — doc ids stay
    unique across segments, so the read-time segment sums reproduce
    the exact single-build index over first-seen texts."""
    import time

    from auraverse_etl_pipeline_spark.operators.retrieval import bm25_index
    from auraverse_etl_pipeline_spark.streaming.ops import (
        load_stream_bm25_index,
        run_stream_bm25_indexing,
    )

    batch1 = [(1, "alpha beta beta"), (2, "beta gamma")]
    batch2 = [(2, "CHANGED text entirely"), (3, "alpha delta")]
    schema = "doc_id long, text string"
    chunk_dir = tmp_path / "bm25_chunks"
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(chunk_dir)
        )
        time.sleep(1.2)
    sdocs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    run_stream_bm25_indexing(sdocs, index_path=str(tmp_path / "idx"))
    idx = load_stream_bm25_index(spark, str(tmp_path / "idx"))
    postings = {(r.id, r.term): (r.tf, r.dl) for r in idx.postings.collect()}
    expected_docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma"), (3, "alpha delta")], schema
    )
    ref = bm25_index(expected_docs)
    assert postings == {
        (r.id, r.term): (r.tf, r.dl) for r in ref.postings.collect()
    }
    assert {r.term: r.df for r in idx.dfs.collect()} == {
        r.term: r.df for r in ref.dfs.collect()
    }
    assert idx.stats.collect() == ref.stats.collect()


def test_stream_ivf_assign_multi_batch_no_refit(spark, tmp_path):
    """The streaming IVF write path: batch-2 vectors land in the right
    cells against the ORIGINAL centroids (no refit — the centroids
    table is byte-identical after the stream), a re-ingested corpus id
    adds nothing, and the final index holds exactly one row per id."""
    import time

    from auraverse_etl_pipeline_spark.operators.similarity import (
        IvfIndex,
        ivf_index,
        ivf_search,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_ivf_assign

    # 4 corpus vectors on two axes -> sample quantizer (nlist=2) makes
    # cells out of the two lowest-id vectors: cell 0 = +x, cell 1 = +y.
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),
            (11, [0.0, 1.0]),
            (12, [0.9, 0.1]),
            (13, [0.1, 0.9]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    root = tmp_path / "ivf"
    ivf_index(corpus, nlist=2, quantizer="sample").save(str(root))
    cent_before = {
        (r.cell, tuple(r.centroid))
        for r in spark.read.parquet(str(root / "centroids")).collect()
    }

    # batch 1: one +x vector; batch 2: one +y vector, a re-ingested
    # corpus id (must be dropped), and a within-batch duplicate id
    batch1 = [(20, [0.8, 0.2]), (21, [0.8, 0.2])]
    batch2 = [(22, [0.2, 0.8]), (10, [0.0, 1.0]), (21, [0.8, 0.2])]
    schema = "vec_id bigint, embedding array<float>"
    chunks = tmp_path / "vec_chunks"
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(chunks))
        time.sleep(1.2)
    svec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    run_stream_ivf_assign(svec, index_path=str(root))

    rows = spark.read.parquet(str(root / "assignments")).collect()
    cells = {r.id: r.cell for r in rows}
    assert len(rows) == len(cells) == 7  # 4 corpus + 3 streamed, no dups
    assert cells[20] == cells[21] == cells[10] == cells[12] == cells[10]
    assert cells[20] == 0 and cells[22] == 1
    # re-ingested id 10 kept its ORIGINAL vector (+x), not the +y resend
    v10 = next(tuple(r.v) for r in rows if r.id == 10)
    assert v10 == (1.0, 0.0)
    # no refit: centroids byte-identical
    cent_after = {
        (r.cell, tuple(r.centroid))
        for r in spark.read.parquet(str(root / "centroids")).collect()
    }
    assert cent_after == cent_before
    # and the streamed vectors are searchable through the normal path
    idx = IvfIndex.load(spark, str(root))
    queries = spark.createDataFrame(
        [(100, [0.79, 0.21])], "vec_id bigint, embedding array<float>"
    )
    got = ivf_search(queries, idx, k=3, nprobe=1).collect()
    assert {r.neighbor_id for r in got} <= {10, 12, 20, 21}
    assert len(got) == 3


def test_stream_lm_quality_gate_multi_batch(spark, sf_dir, tmp_path):
    """Batch/stream gate parity for the FULL gate set: the streaming
    Gopher+LM gate over three micro-batches must produce exactly the
    per-document decisions of the batch spelling (gopher_report joined
    with ngram_lm_score against the same pre-trained model) — the LM
    transition sum is batch-local, so micro-batch boundaries must not
    change any xent."""
    import time

    from auraverse_etl_pipeline_spark.operators.lm import (
        LM_XENT_MAX,
        BigramLm,
        ngram_lm_score,
        ngram_lm_train,
    )
    from auraverse_etl_pipeline_spark.operators.quality import gopher_report
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import (
        run_stream_lm_quality_gate,
    )
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 90")
    ref = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
    lm = ngram_lm_train(ref)
    cached = BigramLm(
        bigrams=lm.bigrams.cache(),
        contexts=lm.contexts.cache(),
        stats=lm.stats.cache(),
    )
    chunk_dir = tmp_path / "lm_gate_chunks"
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(str(chunk_dir))
        time.sleep(1.2)

    try:
        run_stream_lm_quality_gate(
            stream_documents(spark, str(chunk_dir), max_files_per_trigger=1),
            cached,
            decisions_path=str(tmp_path / "decisions"),
        )
        got = {
            (r.doc_id, r.fail_reason, r.gopher_keep, r.xent, r.fluent)
            for r in spark.read.parquet(str(tmp_path / "decisions")).collect()
        }
        sc = ngram_lm_score(docs, cached).select(
            F.col("id").alias("doc_id"), "xent"
        )
        want = {
            (r.doc_id, r.fail_reason, r.keep, r.xent,
             r.xent is not None and r.xent <= LM_XENT_MAX)
            for r in gopher_report(docs).join(sc, "doc_id").collect()
        }
    finally:
        for t in (cached.bigrams, cached.contexts, cached.stats):
            release = getattr(t, "release_caches", None)
            if callable(release):
                release()  # chains to ngram_lm_train's internal cache
            t.unpersist()
    assert len(got) == 90
    assert got == want


def test_stream_logreg_gate_multi_batch(spark, sf_dir, tmp_path):
    """Batch/stream parity for the classifier gate: the streaming
    logreg gate over three micro-batches must produce exactly the
    per-document decisions of the batch logreg_score against the same
    pre-trained model — scoring is a stateless projection, so
    micro-batch boundaries must not change any score."""
    import time

    from auraverse_etl_pipeline_spark.operators.classifier import (
        logreg_score,
        logreg_train,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_logreg_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 90").select(
        "doc_id",
        F.concat(
            "text",
            F.when(F.col("doc_id") % 3 == 0, F.lit(" quality education")).otherwise(
                F.lit(" casino spam")
            ),
        ).alias("text"),
    )
    model = logreg_train(
        docs, F.col("doc_id") % 3 == 0, True, num_buckets=256, lr=8.0,
        iters=3, decay=True,
    ).cache()
    chunk_dir = tmp_path / "logreg_gate_chunks"
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(str(chunk_dir))
        time.sleep(1.2)

    try:
        run_stream_logreg_gate(
            stream_documents(spark, str(chunk_dir), max_files_per_trigger=1),
            model,
            decisions_path=str(tmp_path / "decisions"),
            num_buckets=256,
        )
        got = {
            (r.doc_id, r.score, r.prob, r.predicted)
            for r in spark.read.parquet(str(tmp_path / "decisions")).collect()
        }
        want = {
            (r.id, r.score, r.prob, r.predicted)
            for r in logreg_score(docs, model, num_buckets=256).collect()
        }
    finally:
        model.unpersist()
    assert len(got) == 90
    assert got == want


def test_stream_domain_gate_multi_batch(spark, sf_dir, tmp_path):
    """Batch/stream parity for the domain-blocklist gate: the
    streaming gate over three micro-batches must produce exactly the
    per-domain tally of the batch funnel — the Bloom probe and verify
    are stateless projections, so micro-batch boundaries must not
    change any decision."""
    import time

    from auraverse_etl_pipeline_spark.operators.quality import (
        domain_blocklist_funnel,
    )
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_domain_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stream_documents

    def with_uri(df):
        return df.select(
            "doc_id",
            "text",
            F.concat(
                F.lit("http://docs."),
                F.col("source"),
                F.lit(".net/doc/"),
                F.col("doc_id").cast("string"),
            ).alias("target_uri"),
        )

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 90")
    blocked = ["src1.net", "src4.net", "absent.example"]

    chunk_dir = tmp_path / "domain_gate_chunks"
    for lo, hi in [(0, 30), (30, 60), (60, 90)]:
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(str(chunk_dir))
        time.sleep(1.2)

    run_stream_domain_gate(
        with_uri(stream_documents(spark, str(chunk_dir), max_files_per_trigger=1)),
        blocked,
        decisions_path=str(tmp_path / "decisions"),
    )
    dec = spark.read.parquet(str(tmp_path / "decisions"))
    assert dec.count() == 90
    got = {
        (r.domain, r.n_docs, r.blocked, r.kept): r.kept_gopher
        for r in dec.groupBy("domain").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("blocked"), 1).otherwise(0)).cast("bigint").alias("blocked"),
            F.sum(F.when(~F.col("blocked"), 1).otherwise(0)).cast("bigint").alias("kept"),
            F.sum(F.when(~F.col("blocked") & F.col("gopher"), 1).otherwise(0))
            .cast("bigint")
            .alias("kept_gopher"),
        ).collect()
    }
    want = {
        (r.domain, r.n_docs, r.blocked, r.kept): r.kept_gopher
        for r in domain_blocklist_funnel(with_uri(docs), blocked).collect()
    }
    assert got == want
    assert any(k[2] > 0 for k in got)  # the blocklist actually blocked


def test_stream_url_frontier_multi_batch(spark, sf_dir, tmp_path):
    """Cross-batch frontier dedup: a canonical URL discovered in batch
    1 must NOT re-enter the frontier when batch 2 rediscovers it under
    a different raw spelling; within-batch duplicates keep the lowest
    doc id; and the final frontier equals the batch canonical-min."""
    import time

    from auraverse_etl_pipeline_spark.functions.urls import canonical_url
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_url_frontier

    rows = [
        # batch 1: two spellings of ONE canonical + a unique
        (0, "HTTP://A.One.NET:80/x?b=2&a=1#f"),
        (1, "http://a.one.net/x?a=1&b=2"),
        (2, "https://b.two.net/y"),
        # batch 2: rediscovers batch-1's canonical + adds one new
        (3, "http://a.one.net:80/x?utm_source=z&a=1&b=2"),
        (4, "https://c.three.net/z?q=1"),
    ]
    chunk_dir = tmp_path / "url_chunks"
    for lo, hi in [(0, 3), (3, 5)]:
        spark.createDataFrame(
            rows[lo:hi], "doc_id bigint, raw_url string"
        ).coalesce(1).write.mode("append").parquet(str(chunk_dir))
        time.sleep(1.2)

    stream = (
        spark.readStream.schema("doc_id long, raw_url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    run_stream_url_frontier(stream, frontier_path=str(tmp_path / "frontier"))
    got = {
        r.canon_url: r.first_doc_id
        for r in spark.read.parquet(str(tmp_path / "frontier")).collect()
    }
    assert got == {
        "http://a.one.net/x?a=1&b=2": 0,   # batch-1 winner, batch-2 rediscovery dropped
        "https://b.two.net/y": 2,
        "https://c.three.net/z?q=1": 4,
    }
    # sanity: all three raw spellings of the first URL canonicalize equal
    c = spark.createDataFrame(
        [(r,) for _, r in rows[:2] + [rows[3]]], "u string"
    ).select(canonical_url("u").alias("c")).distinct()
    assert c.count() == 1


def test_stream_semdedup_gate_multi_batch(spark, tmp_path):
    """The streaming SemDeDup gate end to end on hand-built geometry:
    corpus near-dups drop as index_dup, novel directions survive, a
    within-batch near-pair drops its MORE-central member (the batch
    twin's rule), a batch-2 near-dup of a batch-1 STREAMED survivor
    drops (cross-batch), a near-dup of a DROPPED batch-1 vector does
    NOT re-drop against it (only members gate), and re-ingested ids
    (corpus or streamed) write no decision row. Decision parity with
    the batch twin is pinned on the arrival-more-central construction
    (the one case where the append-safe index-wins deviation cannot
    differ from the symmetric batch rule)."""
    import time

    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_index,
        semdedup_clusters,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_semdedup_gate

    # sample quantizer nlist=2: centroids = vectors of ids 10 (+x) and
    # 11 (+y); no corpus pair reaches tau=0.9, so day-1 keeps everyone
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [0.0, 1.0, 0.0, 0.0]),
            (12, [0.8, 0.6, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    verd = semdedup_clusters(corpus, threshold=0.9, index=idx)
    assert all(r.kept for r in verd.collect())
    members = (
        verd.select("vec_id", F.col("cell").cast("int").alias("cell"), "centroid_cos")
        .join(corpus, "vec_id")
        .select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
            "cell", "centroid_cos",
        )
    )
    root = tmp_path / "semdedup"
    idx.centroids.write.parquet(str(root / "centroids"))
    members.write.partitionBy("cell").parquet(str(root / "members"))

    batch1 = [
        (20, [0.999, 0.01, 0.0, 0.0]),   # near-dup of centroid 10 -> index_dup
        (21, [0.0, 0.1, 0.0, 0.995]),    # novel w-direction -> kept
        (22, [0.0, 0.3, 0.9, 0.0]),      # within-batch pair, less central -> kept
        (23, [0.0, 0.32, 0.9, 0.0]),     # same pair, MORE central -> batch_dup
        (24, [0.84, 0.55, 0.0, 0.0]),    # more-central near-dup of member 12 -> index_dup
        (11, [9.0, 9.0, 9.0, 9.0]),      # re-ingested corpus id: skipped silently
    ]
    batch2 = [
        (30, [0.0, 0.31, 0.9, 0.0]),     # near-dup of STREAMED member 22 -> index_dup
        (31, [0.0, 0.1, 0.0, -0.995]),   # anti-parallel to 21 -> novel, kept
        (21, [9.0, 9.0, 9.0, 9.0]),      # re-ingested streamed id: skipped silently
    ]
    from auraverse_etl_pipeline_spark.streaming.sources import stage_ordered_batches

    schema = "vec_id bigint, embedding array<double>"
    chunks = tmp_path / "sem_chunks"
    stage_ordered_batches(
        [spark.createDataFrame(rows, schema) for rows in (batch1, batch2)],
        str(chunks),
    )
    svec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    run_stream_semdedup_gate(svec, index_path=str(root), threshold=0.9)

    dec = {r.id: r for r in spark.read.parquet(str(root / "decisions")).collect()}
    assert set(dec) == {20, 21, 22, 23, 24, 30, 31}  # no rows for re-ingests
    assert dec[20].reason == "index_dup" and not dec[20].kept
    assert dec[21].reason == "kept" and dec[21].kept
    assert dec[22].reason == "kept"
    assert dec[23].reason == "batch_dup" and not dec[23].kept
    assert dec[24].reason == "index_dup"
    assert dec[30].reason == "index_dup"  # caught by batch-1 survivor 22
    assert dec[31].reason == "kept"
    mem_ids = {r.id for r in spark.read.parquet(str(root / "members")).collect()}
    assert mem_ids == {10, 11, 12, 21, 22, 31}

    # decision parity vs the batch twin on the more-central-arrival
    # construction: the twin over corpus+24 drops exactly 24 too
    twin = semdedup_clusters(
        corpus.unionByName(
            spark.createDataFrame([(24, [0.84, 0.55, 0.0, 0.0])], schema)
        ),
        threshold=0.9,
        index=idx,
    )
    twin_dropped = {r.vec_id for r in twin.collect() if not r.kept}
    assert twin_dropped == {24}


def test_stream_semdedup_gate_fresh_index(spark, tmp_path):
    """A gate started with centroids only (no members written yet)
    must not throw: batch 1 plays the within-batch rule against
    itself, its survivors found the members table, and batch 2 gates
    against them — the fresh-index posture of the other loops."""
    import time

    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_semdedup_gate

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "fresh"
    idx.centroids.write.parquet(str(root / "centroids"))  # NO members
    batch1 = [(20, [0.0, 0.3, 0.9, 0.0]), (21, [0.0, 0.32, 0.9, 0.0])]
    batch2 = [(30, [0.0, 0.31, 0.9, 0.0])]
    from auraverse_etl_pipeline_spark.streaming.sources import stage_ordered_batches

    schema = "vec_id bigint, embedding array<double>"
    chunks = tmp_path / "fresh_chunks"
    stage_ordered_batches(
        [spark.createDataFrame(rows, schema) for rows in (batch1, batch2)],
        str(chunks),
    )
    svec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    run_stream_semdedup_gate(svec, index_path=str(root), threshold=0.9)
    dec = {r.id: r.reason for r in spark.read.parquet(str(root / "decisions")).collect()}
    assert dec == {20: "kept", 21: "batch_dup", 30: "index_dup"}
    mem_ids = {r.id for r in spark.read.parquet(str(root / "members")).collect()}
    assert mem_ids == {20}


def test_semdedup_gate_append_crash_window_is_fsck_silent(spark, tmp_path):
    """The gate's members-FIRST write order (optimization r18,
    restoring the pre-r17 posture without its second checkpoint): a
    crash between the member append and the decision append leaves a
    member with NO decision row. Pinned here, against the exact
    post-crash disk state: (a) that state is fsck-SILENT — every
    gate_index_fsck check reads 0, because kept_decision_without_member
    is reserved for the retire-skip signature — and (b) it HEALS
    invisibly: the orphan id's re-arrival is index-wins skipped (no
    duplicate member row, still no decision row), so the window closes
    with no operator action. (c) The contrast: a genuine retire-skip
    (kept decision left behind after the member is erased) DOES raise
    kept_decision_without_member, so the two root causes stay
    attributable — the round-17 verdict's crash-window ambiguity,
    resolved by the write order instead of by documentation."""
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import (
        gate_index_fsck,
        run_stream_semdedup_gate,
    )
    from auraverse_etl_pipeline_spark.streaming.sources import stage_ordered_batches

    schema = "vec_id bigint, embedding array<double>"
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])], schema
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "crashwin"
    idx.centroids.write.parquet(str(root / "centroids"))
    chunks = tmp_path / "crashwin_chunks"
    stage_ordered_batches(
        [spark.createDataFrame([(20, [0.0, 0.3, 0.9, 0.0])], schema)],
        str(chunks),
    )
    svec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    run_stream_semdedup_gate(svec, index_path=str(root), threshold=0.9)

    # simulate the crash: the batch-2 member append committed, the
    # decision append did not — id 40's member row exists, no verdict
    cell0 = spark.read.parquet(str(root / "centroids")).collect()[0].cell
    spark.createDataFrame(
        [(40, [0.0, 0.0, 0.0, 1.0], int(cell0), 0.0)],
        "id bigint, v array<double>, cell int, centroid_cos double",
    ).write.mode("append").partitionBy("cell").parquet(str(root / "members"))

    fsck = gate_index_fsck(spark, str(root))
    checks = {r.check: r.violations for r in fsck.collect()}
    fsck.release_caches()
    assert all(v == 0 for v in checks.values()), checks  # (a) fsck-silent

    # (b) the window heals on re-arrival: index-wins drops id 40
    # silently — one member row, still no decision row, fsck still 0
    chunks2 = tmp_path / "crashwin_chunks2"
    stage_ordered_batches(
        [spark.createDataFrame([(40, [0.0, 0.0, 0.0, 1.0])], schema)],
        str(chunks2),
    )
    svec2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks2))
    )
    run_stream_semdedup_gate(svec2, index_path=str(root), threshold=0.9)
    members = spark.read.parquet(str(root / "members"))
    assert members.filter("id = 40").count() == 1
    dec_ids = {r.id for r in spark.read.parquet(str(root / "decisions")).collect()}
    assert dec_ids == {20}
    fsck = gate_index_fsck(spark, str(root))
    checks = {r.check: r.violations for r in fsck.collect()}
    fsck.release_caches()
    assert all(v == 0 for v in checks.values()), checks

    # (c) contrast — the retire-skip signature still fires: erase kept
    # id 20's member rows but leave its decision row behind
    survivors = members.filter("id <> 20").localCheckpoint()
    survivors.write.mode("overwrite").partitionBy("cell").parquet(
        str(root / "members")
    )
    fsck = gate_index_fsck(spark, str(root))
    checks = {r.check: r.violations for r in fsck.collect()}
    fsck.release_caches()
    assert checks["kept_decision_without_member"] == 1, checks


def test_semdedup_gate_rebalance_gate_composition(spark, tmp_path):
    """The documented operational loop end to end: gate a batch,
    rebalance the persisted index when a cell runs hot (the
    ivf_occupancy trigger), gate another batch against the REBALANCED
    index. Pins: (a) no member is lost or retracted by the rebalance,
    (b) a member that MOVED cells is still searchable (its batch-2
    near-dup drops as index_dup), (c) a batch-1 STREAMED survivor is
    still searchable after the rebalance, (d) the cold cell's
    partition is untouched (dynamic partition overwrite), (e) the
    over-cap list empties."""
    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_index,
        ivf_occupancy,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import (
        rebalance_gate_index,
        run_stream_semdedup_gate,
    )
    from auraverse_etl_pipeline_spark.streaming.sources import stage_ordered_batches

    import math

    def xz(deg):  # unit vector in the x-z plane
        return [math.cos(math.radians(deg)), 0.0, math.sin(math.radians(deg)), 0.0]

    # sample quantizer nlist=2: centroids = vectors of ids 10 (+x) and
    # 11 (+y). Corpus spreads the x-z plane 30 degrees apart, so no
    # pair reaches tau=0.9 (cos30 = .866) and day-1 keeps everyone:
    # cell 0 holds {10, 12, 13, 14}, cell 1 holds {11}.
    corpus = spark.createDataFrame(
        [(10, xz(0)), (11, [0.0, 1.0, 0.0, 0.0]), (12, xz(30)),
         (13, xz(60)), (14, xz(90))],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    members = idx.assignments.join(
        corpus.select(F.col("vec_id").alias("id")), "id"
    ).join(F.broadcast(idx.centroids), "cell").select(
        "id", "v", "cell",
        F.least(
            F.lit(1.0),
            F.aggregate(
                F.zip_with("v", "centroid", lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        ).alias("centroid_cos"),
    )
    root = tmp_path / "rebal_gate"
    idx.centroids.write.parquet(str(root / "centroids"))
    members.write.partitionBy("cell").parquet(str(root / "members"))

    schema = "vec_id bigint, embedding array<double>"
    batch1 = [
        (20, xz(62)),                 # near-dup of member 13 -> index_dup
        (21, [0.0, 0.0, 0.0, 1.0]),   # novel w-direction -> kept, lands cell 0
    ]
    chunks1 = tmp_path / "rg_chunks1"
    stage_ordered_batches([spark.createDataFrame(batch1, schema)], str(chunks1))
    s1 = spark.readStream.schema(schema).parquet(str(chunks1))
    run_stream_semdedup_gate(s1, index_path=str(root), threshold=0.9)

    # cell 0 now holds {10, 12, 13, 14, 21}: the occupancy audit fires
    occ = {r.cell: r for r in ivf_occupancy(
        spark.read.parquet(str(root / "members")).select("id", "v", "cell"), cap=3
    ).collect()}
    assert occ[0].over_cap and occ[0].n_members == 5 and not occ[1].over_cap
    cold_before = sorted(
        (r.id, r.centroid_cos)
        for r in spark.read.parquet(str(root / "members")).filter("cell = 1").collect()
    )

    split = rebalance_gate_index(spark, str(root), max_cell_size=3)
    assert split == [0]
    mem = spark.read.parquet(str(root / "members"))
    by_cell: dict[int, set[int]] = {}
    for r in mem.collect():
        by_cell.setdefault(r.cell, set()).add(r.id)
    # sub-centroids are the two lowest-id hot members (10, 12); 10 and
    # the tie-broken 21 stay on the surviving cell id, 12/13/14 move
    assert by_cell == {0: {10, 21}, 1: {11}, 2: {12, 13, 14}}
    assert {r.cell for r in spark.read.parquet(str(root / "centroids")).collect()} == {0, 1, 2}
    occ2 = ivf_occupancy(mem.select("id", "v", "cell"), cap=3).collect()
    assert not any(r.over_cap for r in occ2)  # trigger list emptied
    cold_after = sorted(
        (r.id, r.centroid_cos) for r in mem.filter("cell = 1").collect()
    )
    assert cold_after == cold_before  # cold partition byte-level untouched

    batch2 = [
        (30, xz(58)),                      # near-dup of MOVED member 13 -> index_dup
        (31, [0.01, 0.0, 0.0, 0.99995]),   # near-dup of streamed survivor 21 -> index_dup
        (32, [0.0, -1.0, 0.0, 0.0]),       # anti-parallel to 11, lands cell 0 -> kept
    ]
    chunks2 = tmp_path / "rg_chunks2"
    stage_ordered_batches([spark.createDataFrame(batch2, schema)], str(chunks2))
    s2 = spark.readStream.schema(schema).parquet(str(chunks2))
    run_stream_semdedup_gate(s2, index_path=str(root), threshold=0.9)

    dec = {r.id: r.reason for r in spark.read.parquet(str(root / "decisions")).collect()}
    assert dec == {
        20: "index_dup", 21: "kept",
        30: "index_dup", 31: "index_dup", 32: "kept",
    }
    final_ids = {r.id for r in spark.read.parquet(str(root / "members")).collect()}
    assert final_ids == {10, 11, 12, 13, 14, 21, 32}  # nothing retracted


def test_rebalance_gate_index_noop_below_cap(spark, tmp_path):
    """A rebalance whose cap nothing exceeds must return [] and leave
    every file byte-untouched (no rewrite, no centroid churn) — the
    cheap idle path the operational loop hits most days."""
    import glob
    import os

    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import rebalance_gate_index

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.9, 0.1])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "noop_gate"
    idx.centroids.write.parquet(str(root / "centroids"))
    idx.assignments.withColumn("centroid_cos", F.lit(1.0)).write.partitionBy(
        "cell"
    ).parquet(str(root / "members"))
    mtimes = {
        f: os.stat(f).st_mtime
        for f in glob.glob(str(root / "**" / "*.parquet"), recursive=True)
    }
    assert rebalance_gate_index(spark, str(root), max_cell_size=10) == []
    after = {
        f: os.stat(f).st_mtime
        for f in glob.glob(str(root / "**" / "*.parquet"), recursive=True)
    }
    assert after == mtimes


def test_rebalance_gate_index_fresh_gate_noop(spark, tmp_path):
    """A maintenance cron firing before the gate's first batch (the
    fresh-gate posture: centroids persisted, no members directory yet)
    must no-op instead of throwing."""
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import rebalance_gate_index

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    root = tmp_path / "fresh_rebal"
    ivf_index(corpus, nlist=2, quantizer="sample").centroids.write.parquet(
        str(root / "centroids")
    )
    assert rebalance_gate_index(spark, str(root), max_cell_size=3) == []


def test_rebalance_gate_index_crash_recovery(spark, tmp_path):
    """The staged-commit protocol heals every crash window on the next
    maintenance call. Window A: crash after the pending-centroids
    marker but before the members write — the marker is discarded and
    the re-run redoes the whole rebalance (deterministic, so it lands
    on the same final state). Window B: crash after the members write
    but before the live-centroids overwrite — the marker promotes
    (members already carry staged-only cells) and nothing re-splits.
    Window C: crash mid-centroids-overwrite with the live table
    destroyed — the marker is the only copy and promotes. In every
    window: no member lost, no stale empty centroid left behind, no
    leftover marker."""
    import math
    import shutil

    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import rebalance_gate_index

    def xz(deg):
        return [math.cos(math.radians(deg)), 0.0, math.sin(math.radians(deg)), 0.0]

    corpus = spark.createDataFrame(
        [(10, xz(0)), (11, [0.0, 1.0, 0.0, 0.0]), (12, xz(30)),
         (13, xz(60)), (14, xz(90))],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    members = idx.assignments.join(
        corpus.select(F.col("vec_id").alias("id")), "id"
    ).join(F.broadcast(idx.centroids), "cell").select(
        "id", "v", "cell",
        F.least(
            F.lit(1.0),
            F.aggregate(
                F.zip_with("v", "centroid", lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        ).alias("centroid_cos"),
    )
    base = tmp_path / "base"
    idx.centroids.write.parquet(str(base / "centroids"))
    members.repartition("cell").write.partitionBy("cell").parquet(
        str(base / "members")
    )

    # clean run on a copy -> the intended committed state (cell 0 is
    # 4 members over a cap of 3 and splits deterministically)
    clean = tmp_path / "clean"
    shutil.copytree(base, clean)
    assert rebalance_gate_index(spark, str(clean), max_cell_size=3) == [0]
    want_cent = sorted(
        (r.cell, tuple(r.centroid))
        for r in spark.read.parquet(str(clean / "centroids")).collect()
    )
    want_mem = sorted(
        (r.id, r.cell)
        for r in spark.read.parquet(str(clean / "members")).collect()
    )
    assert not (clean / "centroids_pending").exists()

    def crash_state(tag, centroids_from, members_from):
        root = tmp_path / tag
        root.mkdir()
        if centroids_from is not None:
            shutil.copytree(centroids_from / "centroids", root / "centroids")
        shutil.copytree(members_from / "members", root / "members")
        spark.read.parquet(str(clean / "centroids")).write.parquet(
            str(root / "centroids_pending")
        )
        return root

    def check(root, want_split):
        assert rebalance_gate_index(spark, str(root), max_cell_size=3) == want_split
        got_cent = sorted(
            (r.cell, tuple(r.centroid))
            for r in spark.read.parquet(str(root / "centroids")).collect()
        )
        got_mem = sorted(
            (r.id, r.cell)
            for r in spark.read.parquet(str(root / "members")).collect()
        )
        assert got_cent == want_cent and got_mem == want_mem
        assert not (root / "centroids_pending").exists()

    check(crash_state("crash_a", base, base), [0])     # marker discarded, redo
    check(crash_state("crash_b", base, clean), [])     # marker promoted
    check(crash_state("crash_c", None, clean), [])     # live table destroyed


def test_rebalance_gate_index_converges_to_fixed_point(spark, tmp_path):
    """The full maintenance loop driven by its own trigger: rebalance
    repeatedly, using ivf_occupancy's over-cap list as the loop
    condition, until no cell exceeds the cap. Pins: (a) membership is
    conserved on every pass, (b) the largest over-cap cell SHRINKS
    strictly every pass (one split halves separable data — the
    documented geometric path; the over-cap COUNT may transiently grow
    as one big cell becomes two medium ones), (c) the loop reaches the
    empty-trigger fixed point in O(log n) passes, after which another
    call is a byte-level no-op."""
    import math

    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_index,
        ivf_occupancy,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import rebalance_gate_index

    def xz(deg):
        return [math.cos(math.radians(deg)), 0.0, math.sin(math.radians(deg)), 0.0]

    # 16 separable vectors, 6 degrees apart, in ONE hot cell. Ids are
    # BIT-REVERSED over the angle order so every sub-cell's two
    # lowest-id members sit at opposite angular ends and each split
    # lands ~even — the separable-data geometric-halving shape (ids
    # ascending with angle would peel one member per pass instead).
    def bitrev4(i):
        return int(f"{i:04b}"[::-1], 2)

    rows = [(100 + bitrev4(i), xz(6 * i)) for i in range(16)]
    rows.append((200, [0.0, -1.0, 0.0, 0.0]))  # cold 1-member cell
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    members = idx.assignments.withColumn("centroid_cos", F.lit(1.0))
    root = tmp_path / "converge_gate"
    idx.centroids.write.parquet(str(root / "centroids"))
    members.repartition("cell").write.partitionBy("cell").parquet(
        str(root / "members")
    )

    def occupancy():
        mem = spark.read.parquet(str(root / "members")).select("id", "v", "cell")
        return ivf_occupancy(mem, cap=3).collect()

    all_ids = {100 + i for i in range(16)} | {200}
    prev_max = None
    passes = 0
    while any(r.over_cap for r in occupancy()):
        split = rebalance_gate_index(spark, str(root), max_cell_size=3)
        assert split, "trigger fired but rebalance split nothing"
        passes += 1
        assert passes <= 8, "convergence loop runaway"
        mem = spark.read.parquet(str(root / "members"))
        assert {r.id for r in mem.collect()} == all_ids  # conserved
        cur_max = max(r.n_members for r in occupancy())
        if prev_max is not None:
            assert cur_max < prev_max  # strictly shrinking hot tail
        prev_max = cur_max
    assert 2 <= passes <= 4  # 16 -> ~8 -> ~4 -> <=3: the geometric path
    # fixed point: one more call is a no-op
    assert rebalance_gate_index(spark, str(root), max_cell_size=3) == []


def test_gate_decision_logs_carry_batch_id(spark, tmp_path):
    """Every gate's decisions log now records the micro-batch id — the
    order column the log-maintenance passes key on: compact_decisions
    (order_col="batch_id") retention and quantizer_drift_audit
    (the retrain trigger) both run straight off the real gate log,
    closing the loop the fixture-staged registry queries model."""
    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_index,
        quantizer_drift_audit,
    )
    from auraverse_etl_pipeline_spark.sources.sinks import compact_decisions
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_semdedup_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stage_ordered_batches

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    root = tmp_path / "bid_gate"
    ivf_index(corpus, nlist=2, quantizer="sample").centroids.write.parquet(
        str(root / "centroids")
    )
    schema = "vec_id bigint, embedding array<double>"
    b1 = [(20, [0.99, 0.1, 0.0]), (21, [0.1, 0.99, 0.0])]
    b2 = [(22, [0.98, 0.15, 0.0]), (20, [9.0, 9.0, 9.0])]  # 20 re-ingested
    chunks = tmp_path / "bid_chunks"
    stage_ordered_batches(
        [spark.createDataFrame(rows, schema) for rows in (b1, b2)], str(chunks)
    )
    svec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    run_stream_semdedup_gate(svec, index_path=str(root), threshold=0.999)

    dec = spark.read.parquet(str(root / "decisions"))
    got = {r.id: r.batch_id for r in dec.collect()}
    assert got == {20: 0, 21: 0, 22: 1}  # re-ingest writes no row
    # the log composes with the drift audit as-is
    drift = {r.cell: r for r in quantizer_drift_audit(dec).collect()}
    assert drift and all(not r.retrain for r in drift.values())
    # and with retention compaction as-is
    compacted = compact_decisions(
        spark, str(root / "decisions"), order_col="batch_id"
    )
    assert {r.id for r in compacted.collect()} == {20, 21, 22}


def test_retrain_gate_index_refits_drifted_geometry(spark, tmp_path):
    """The drift-audit -> retrain loop closes: members that drifted
    away from the day-1 quantizer (near-zero centroid_cos) get new
    Lloyd geometry that fits them, membership is conserved, the
    decisions log is untouched, and a second retrain is a converged
    no-op (deterministic quantizer: same members => same geometry)."""
    import os

    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_index,
        quantizer_drift_audit,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import retrain_gate_index

    anchors = [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])]
    drifted = [(20 + i, [0.01 * i, 0.1, 0.99]) for i in range(4)]
    corpus = spark.createDataFrame(
        anchors, "vec_id bigint, embedding array<double>"
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    members = ivf_assign(
        spark.createDataFrame(anchors + drifted, "vec_id bigint, embedding array<double>"),
        idx.centroids,
        clamp=True,
    )
    root = tmp_path / "retrain_gate"
    idx.centroids.write.parquet(str(root / "centroids"))
    members.repartition("cell").write.partitionBy("cell").parquet(
        str(root / "members")
    )
    # the gate's decision log shows the drift the audit would flag
    log = members.select(
        "id", "cell", "centroid_cos",
        F.when(F.col("id") < 20, 0).otherwise(1).cast("bigint").alias("batch_id"),
    )
    log.write.parquet(str(root / "decisions"))
    flagged = [
        r.cell
        for r in quantizer_drift_audit(spark.read.parquet(str(root / "decisions"))).collect()
        if r.retrain
    ]
    assert flagged  # the drifted arrivals' cell trips the trigger
    dec_files = {
        f: os.stat(f).st_mtime_ns
        for f in __import__("glob").glob(str(root / "decisions" / "*.parquet"))
    }

    def disk_fit():
        rows = spark.read.parquet(str(root / "members")).collect()
        return {r.id: r.centroid_cos for r in rows}

    before = disk_fit()
    assert sum(before[i] for i, _ in drifted) / len(drifted) < 0.2  # poor fit
    retrain_gate_index(spark, str(root))
    after = disk_fit()
    assert set(after) == set(before)  # membership conserved
    assert sum(after[i] for i, _ in drifted) / len(drifted) > 0.8  # re-fit
    # history untouched: same decision files, byte for byte
    assert {
        f: os.stat(f).st_mtime_ns
        for f in __import__("glob").glob(str(root / "decisions" / "*.parquet"))
    } == dec_files
    # converged: a second re-fit over identical members moves nothing
    assert retrain_gate_index(spark, str(root)) == 0


def test_retrain_gate_index_crash_window_heals(spark, tmp_path):
    """The retrain's documented crash posture, pinned: a failure
    between the members write and the centroids write leaves new cell
    labels under OLD centroids — the index still answers (same cell-id
    space), and re-running the idempotent deterministic retrain
    converges to exactly the uncrashed final state."""
    import shutil

    from auraverse_etl_pipeline_spark.operators.similarity import (
        IvfIndex,
        ivf_assign,
        ivf_index,
        ivf_search,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import retrain_gate_index

    anchors = [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])]
    drifted = [(20 + i, [0.01 * i, 0.1, 0.99]) for i in range(4)]
    schema = "vec_id bigint, embedding array<double>"
    idx = ivf_index(spark.createDataFrame(anchors, schema), nlist=2, quantizer="sample")
    members = ivf_assign(
        spark.createDataFrame(anchors + drifted, schema), idx.centroids, clamp=True
    )

    def stage(root):
        idx.centroids.write.parquet(str(root / "centroids"))
        members.repartition("cell").write.partitionBy("cell").parquet(
            str(root / "members")
        )

    ref, crash = tmp_path / "ref_gate", tmp_path / "crash_gate"
    stage(ref)
    stage(crash)
    retrain_gate_index(spark, str(ref))  # the uncrashed reference state
    want = {
        r.id: (r.cell, r.centroid_cos)
        for r in spark.read.parquet(str(ref / "members")).collect()
    }
    # crash replay: snapshot old centroids, retrain fully, then restore
    # the old centroids over the new ones = died before the final write
    old_cent = str(tmp_path / "old_centroids")
    shutil.copytree(str(crash / "centroids"), old_cent)
    retrain_gate_index(spark, str(crash))
    shutil.rmtree(str(crash / "centroids"))
    shutil.copytree(old_cent, str(crash / "centroids"))
    # degraded but alive: searches still answer out of the same id space
    loaded = IvfIndex(
        centroids=spark.read.parquet(str(crash / "centroids")),
        assignments=spark.read.parquet(str(crash / "members")).select("id", "v", "cell"),
    )
    q = spark.createDataFrame([(0, [0.0, 0.1, 0.99])], schema)
    assert ivf_search(q, loaded, k=2, nprobe=2, exact_fold=True, clamp=True).count() > 0
    # the healing re-run converges to the uncrashed state exactly
    retrain_gate_index(spark, str(crash))
    got = {
        r.id: (r.cell, r.centroid_cos)
        for r in spark.read.parquet(str(crash / "members")).collect()
    }
    assert got == want
    ref_cent = {
        r.cell: r.centroid
        for r in spark.read.parquet(str(ref / "centroids")).collect()
    }
    crash_cent = {
        r.cell: r.centroid
        for r in spark.read.parquet(str(crash / "centroids")).collect()
    }
    assert crash_cent == ref_cent


def test_gate_maintenance_tick_runs_the_triad(spark, tmp_path):
    """One tick composes all three maintenance passes, each firing
    only on its own evidence: the tombstoned id vanishes, the drifted
    geometry is re-fit, and the cap is enforced to the fixed point —
    while a second tick with nothing left to do is a clean no-op."""
    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_index,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import gate_maintenance_tick

    schema = "vec_id bigint, embedding array<double>"
    anchors = [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])]
    # a hot crowd near anchor A (trips the cap) + drifted arrivals far
    # from both anchors (trips the retrain flag) + one doomed id
    crowd = [(20 + i, [0.9 + 0.005 * i, 0.1, 0.0]) for i in range(6)]
    drifted = [(40 + i, [0.01 * i, 0.1, 0.99]) for i in range(4)]
    idx = ivf_index(spark.createDataFrame(anchors, schema), nlist=2, quantizer="sample")
    members = ivf_assign(
        spark.createDataFrame(anchors + crowd + drifted, schema),
        idx.centroids,
        clamp=True,
    )
    root = tmp_path / "tick_gate"
    idx.centroids.write.parquet(str(root / "centroids"))
    members.repartition("cell").write.partitionBy("cell").parquet(
        str(root / "members")
    )
    members.select(
        "id", "cell", "centroid_cos",
        F.when(F.col("id") < 40, 0).otherwise(1).cast("bigint").alias("batch_id"),
    ).write.parquet(str(root / "decisions"))
    tomb_path = str(tmp_path / "tick_tombs")
    spark.createDataFrame([(25,)], "id bigint").write.parquet(tomb_path)

    out = gate_maintenance_tick(
        spark, str(root), max_cell_size=4, tombstones_path=tomb_path
    )
    assert out["retired_cells"]          # the take-down fired first
    assert out["retrained"] and out["moved"] >= 0
    mem = spark.read.parquet(str(root / "members"))
    ids = {r.id for r in mem.collect()}
    assert 25 not in ids                 # retired id gone
    assert ids == {10, 11, 40, 41, 42, 43} | {20, 21, 22, 23, 24}
    sizes = [r.n for r in mem.groupBy("cell").agg(F.count("*").alias("n")).collect()]
    assert all(n <= 4 for n in sizes)    # cap enforced to the fixed point
    fit = {r.id: r.centroid_cos for r in mem.collect()}
    assert sum(fit[i] for i, _ in drifted) / len(drifted) > 0.8  # re-fit geometry
    # second tick: a clean no-op. The decisions log still HOLDS the
    # old drift evidence, but the retrain watermark marks it consumed
    # (evidence scored under the old geometry cannot indict the new
    # one) — without the watermark the expensive retrain would
    # re-fire every tick and oscillate with the rebalance
    out2 = gate_maintenance_tick(
        spark, str(root), max_cell_size=4, tombstones_path=tomb_path
    )
    assert out2["retired_cells"] == [] and not out2["retrained"]
    assert out2["rebalance_rounds"] == 0
    assert {r.id for r in spark.read.parquet(str(root / "members")).collect()} == ids


def test_gate_index_fsck_healthy_and_planted_corruption(spark, tmp_path):
    """fsck reads all-zero on a healthy index (an emptied cell is
    legal), and each planted corruption fires exactly its own check."""
    from auraverse_etl_pipeline_spark.operators.retire import ivf_retire
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import gate_index_fsck

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.9, 0.1]), (13, [0.1, 0.9])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "fsck_gate"
    idx.centroids.write.parquet(str(root / "centroids"))
    members = idx.assignments.withColumn("centroid_cos", F.lit(1.0))
    members.repartition("cell").write.partitionBy("cell").parquet(
        str(root / "members")
    )
    members.select(
        "id", "cell", "centroid_cos", F.lit(True).alias("kept"),
        F.lit(0).cast("bigint").alias("batch_id"),
    ).write.parquet(str(root / "decisions"))

    healthy = {r.check: r.violations for r in gate_index_fsck(spark, str(root)).collect()}
    assert healthy == {
        "member_cell_without_centroid": 0,
        "duplicate_member_id": 0,
        "duplicate_centroid_cell": 0,
        "null_member_vector": 0,
        "kept_decision_without_member": 0,
        "pending_marker_present": 0,
    }
    # a retire that FORGOT its log_retire: kept decisions now dangle
    ivf_retire(spark, str(root), spark.createDataFrame([(12,)], "id bigint"))
    after_retire = {
        r.check: r.violations for r in gate_index_fsck(spark, str(root)).collect()
    }
    assert after_retire["kept_decision_without_member"] == 1
    # an emptied-by-retire cell is LEGAL (no orphan fires)
    assert after_retire["member_cell_without_centroid"] == 0
    # planted: duplicate member row + a leftover staged-commit marker
    spark.read.parquet(str(root / "members")).limit(1).select(
        "id", "v", "centroid_cos", "cell"
    ).repartition("cell").write.mode("append").partitionBy("cell").parquet(
        str(root / "members")
    )
    idx.centroids.write.parquet(str(root / "centroids_pending"))
    planted = {
        r.check: r.violations for r in gate_index_fsck(spark, str(root)).collect()
    }
    assert planted["duplicate_member_id"] == 1
    assert planted["pending_marker_present"] == 1
    # planted: drop a centroid the members still reference
    cents = spark.read.parquet(str(root / "centroids"))
    keep_one = cents.orderBy("cell").limit(1).localCheckpoint()
    keep_one.write.mode("overwrite").parquet(str(root / "centroids"))
    orphaned = {
        r.check: r.violations for r in gate_index_fsck(spark, str(root)).collect()
    }
    assert orphaned["member_cell_without_centroid"] == 1


def test_stream_semdedup_gate_missing_tombstone_table(spark, tmp_path):
    """tombstones_path pointing at a not-yet-created durable table
    (empty take-down backlog) is an EMPTY tombstone set, not a
    stream-killing AnalysisException — the gate_maintenance_tick
    guard, applied to the gate's own per-batch read."""
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_semdedup_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stage_ordered_batches

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "tombless"
    idx.centroids.write.parquet(str(root / "centroids"))
    schema = "vec_id bigint, embedding array<double>"
    chunks = tmp_path / "tombless_chunks"
    stage_ordered_batches(
        [spark.createDataFrame([(20, [0.0, 0.3, 0.9, 0.0])], schema)],
        str(chunks),
    )
    svec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    run_stream_semdedup_gate(
        svec,
        index_path=str(root),
        threshold=0.9,
        tombstones_path=str(tmp_path / "never_written_tombstones"),
    )
    dec = {r.id: r.reason for r in spark.read.parquet(str(root / "decisions")).collect()}
    assert dec == {20: "kept"}


def test_gate_index_fsck_rescored_decisions_judge_latest(spark, tmp_path):
    """An id kept in an early batch and REJECTED in a later one (the
    lm/logreg gates re-score and retain history by batch_id) is not a
    dangling kept decision — fsck judges each id by its newest
    verdict; the reverse order (rejected early, kept latest, member
    missing) still fires."""
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import gate_index_fsck

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.9, 0.1])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "rescored"
    idx.centroids.write.parquet(str(root / "centroids"))
    idx.assignments.withColumn("centroid_cos", F.lit(1.0)).repartition(
        "cell"
    ).write.partitionBy("cell").parquet(str(root / "members"))
    # ids 10-12 are members; 13 was kept at batch 0 then re-scored
    # out at batch 1 (and correctly removed from members)
    spark.createDataFrame(
        [
            (10, True, 0), (11, True, 0), (12, True, 0),
            (13, True, 0), (13, False, 1),
        ],
        "id bigint, kept boolean, batch_id bigint",
    ).write.parquet(str(root / "decisions"))
    out = {r.check: r.violations for r in gate_index_fsck(spark, str(root)).collect()}
    assert out["kept_decision_without_member"] == 0
    # reversed history: latest verdict kept, member missing -> fires
    spark.createDataFrame(
        [(14, False, 0), (14, True, 1)],
        "id bigint, kept boolean, batch_id bigint",
    ).write.mode("append").parquet(str(root / "decisions"))
    out = {r.check: r.violations for r in gate_index_fsck(spark, str(root)).collect()}
    assert out["kept_decision_without_member"] == 1


def test_gate_maintenance_tick_degenerate_watermark(spark, tmp_path):
    """A readable but DEGENERATE retrain_watermark (zero rows, or a
    null batch_id left by an all-null max) degrades to the
    unwatermarked audit instead of aborting the whole tick."""
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import gate_maintenance_tick

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.9, 0.1])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "degen_wm"
    idx.centroids.write.parquet(str(root / "centroids"))
    idx.assignments.withColumn("centroid_cos", F.lit(1.0)).repartition(
        "cell"
    ).write.partitionBy("cell").parquet(str(root / "members"))
    spark.createDataFrame(
        [(10, 1.0, 0, 0), (11, 1.0, 1, 0), (12, 0.99, 0, 1)],
        "id bigint, centroid_cos double, cell int, batch_id bigint",
    ).write.parquet(str(root / "decisions"))
    # zero-row watermark
    spark.createDataFrame([], "batch_id bigint").write.parquet(
        str(root / "retrain_watermark")
    )
    out = gate_maintenance_tick(spark, str(root), max_cell_size=100)
    assert out["retrained"] is False and out["split_cells"] == []
    # null-batch_id watermark row
    spark.createDataFrame([(None,)], "batch_id bigint").write.mode(
        "overwrite"
    ).parquet(str(root / "retrain_watermark"))
    out = gate_maintenance_tick(spark, str(root), max_cell_size=100)
    assert out["retrained"] is False and out["split_cells"] == []


def test_stream_semdedup_gate_misshapen_tombstone_table_fails_loudly(
    spark, tmp_path
):
    """Only an ABSENT tombstone table is an empty set; a present table
    without an id column must fail the stream instead of silently
    disabling take-down stickiness."""
    import pytest

    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import run_stream_semdedup_gate
    from auraverse_etl_pipeline_spark.streaming.sources import stage_ordered_batches

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "badtomb"
    idx.centroids.write.parquet(str(root / "centroids"))
    tomb_path = tmp_path / "tomb_wrong_schema"
    spark.createDataFrame([(10,)], "doc_id bigint").write.parquet(str(tomb_path))
    schema = "vec_id bigint, embedding array<double>"
    chunks = tmp_path / "badtomb_chunks"
    stage_ordered_batches(
        [spark.createDataFrame([(20, [0.3, 0.9])], schema)], str(chunks)
    )
    svec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    with pytest.raises(Exception, match="(?i)id|UNRESOLVED|StreamingQuery"):
        run_stream_semdedup_gate(
            svec,
            index_path=str(root),
            threshold=0.9,
            tombstones_path=str(tomb_path),
        )


def test_gate_index_fsck_same_batch_conflict_deterministic(spark, tmp_path):
    """Conflicting verdicts WITHIN one batch (a replayed append) must
    resolve deterministically — to kept=true, surfacing the id —
    instead of max_by's arbitrary per-run pick."""
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_index
    from auraverse_etl_pipeline_spark.streaming.ops import gate_index_fsck

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    idx = ivf_index(corpus, nlist=2, quantizer="sample")
    root = tmp_path / "conflict"
    idx.centroids.write.parquet(str(root / "centroids"))
    idx.assignments.withColumn("centroid_cos", F.lit(1.0)).repartition(
        "cell"
    ).write.partitionBy("cell").parquet(str(root / "members"))
    # id 99 is not a member and carries BOTH verdicts in batch 0
    spark.createDataFrame(
        [(10, True, 0), (11, True, 0), (99, True, 0), (99, False, 0)],
        "id bigint, kept boolean, batch_id bigint",
    ).write.parquet(str(root / "decisions"))
    for _ in range(3):
        out = {
            r.check: r.violations
            for r in gate_index_fsck(spark, str(root)).collect()
        }
        assert out["kept_decision_without_member"] == 1


def test_gate_maintenance_tick_take_down_erases_decisions(spark, tmp_path):
    """The tick's take-down stage keeps the erasure posture end to
    end: the retired id's decision rows vanish along with its member
    row (r16 — previously only members were retired, leaving every
    tick-driven take-down a permanent kept_decision_without_member
    fsck violation), and the post-tick index is fsck-clean."""
    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_index,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import (
        gate_index_fsck,
        gate_maintenance_tick,
    )

    schema = "vec_id bigint, embedding array<double>"
    anchors = [(10, [1.0, 0.0]), (11, [0.0, 1.0])]
    extra = [(20, [0.9, 0.1]), (21, [0.1, 0.9])]
    idx = ivf_index(spark.createDataFrame(anchors, schema), nlist=2, quantizer="sample")
    members = ivf_assign(
        spark.createDataFrame(anchors + extra, schema), idx.centroids, clamp=True
    )
    root = tmp_path / "tick_erase"
    idx.centroids.write.parquet(str(root / "centroids"))
    members.repartition("cell").write.partitionBy("cell").parquet(
        str(root / "members")
    )
    members.select(
        "id", "cell", "centroid_cos",
        F.lit(True).alias("kept"), F.lit(0).cast("bigint").alias("batch_id"),
    ).write.parquet(str(root / "decisions"))
    tomb_path = str(tmp_path / "tomb")
    spark.createDataFrame([(20,)], "id bigint").write.parquet(tomb_path)

    out = gate_maintenance_tick(
        spark, str(root), max_cell_size=10, tombstones_path=tomb_path
    )
    assert out["retired_cells"]
    assert {r.id for r in spark.read.parquet(str(root / "decisions")).collect()} == {
        10, 11, 21,
    }
    fs = {r.check: r.violations for r in gate_index_fsck(spark, str(root)).collect()}
    assert fs["kept_decision_without_member"] == 0
    assert all(v == 0 for v in fs.values()), fs


def test_stream_substring_compaction_matches_batch(spark, sf_dir, tmp_path):
    """The ninth closed loop: ExactSubstr spans accumulated across
    id-ordered micro-batches equal the batch duplicate_token_spans
    audit over the same corpus, the persisted index holds one owner
    row per distinct shingle hash, and a batch-2 re-ingest of batch-1
    text is covered wall-to-wall while appending no index rows."""
    import time

    from auraverse_etl_pipeline_spark.operators.dedup import duplicate_token_spans
    from auraverse_etl_pipeline_spark.sources.tables import load_table
    from auraverse_etl_pipeline_spark.streaming.ops import (
        run_stream_substring_compaction,
    )

    k = 8
    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 60")
    chunk_dir = tmp_path / "ss_chunks"
    for lo, hi in [(0, 20), (20, 40), (40, 60)]:
        docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(str(chunk_dir))
        time.sleep(1.2)

    root = tmp_path / "substr"
    schema = spark.read.parquet(str(chunk_dir)).schema
    sdocs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    run_stream_substring_compaction(
        sdocs,
        index_path=str(root / "index"),
        spans_path=str(root / "spans"),
        k=k,
    )

    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in spark.read.parquet(str(root / "spans")).collect()
    )
    want = sorted(
        tuple(r) for r in duplicate_token_spans(docs, k=k).collect()
    )
    assert got == want and len(want) > 0

    index = spark.read.parquet(str(root / "index"))
    n_idx = index.count()
    assert index.select("h").distinct().count() == n_idx

    # re-ingest batch-1 docs: wall-to-wall coverage, zero index growth
    redo_dir = tmp_path / "ss_redo"
    docs.filter("doc_id < 20").coalesce(1).write.parquet(str(redo_dir))
    sredo = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(redo_dir))
    )
    run_stream_substring_compaction(
        sredo,
        index_path=str(root / "index"),
        spans_path=str(root / "spans2"),
        k=k,
    )
    assert spark.read.parquet(str(root / "index")).count() == n_idx
    re_spans = spark.read.parquet(str(root / "spans2"))
    full = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id < 20")
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+")).alias("n"),
        )
        .filter(F.col("n") >= k)
    )
    got_cover = {(r.doc_id, r.span_start, r.span_end) for r in re_spans.collect()}
    want_cover = {(r.doc_id, 0, r.n) for r in full.collect()}
    assert got_cover == want_cover


def test_index_suite_tick_all_families(spark, tmp_path):
    """The one-command estate tick: every present family runs its own
    maintenance tick against ONE shared tombstone table, absent
    anchors report "skipped" (AnalysisException probe only), a second
    tick is quiet estate-wide, and the gate cap must be caller-owned
    (no silent default)."""
    import pytest as _pytest

    from auraverse_etl_pipeline_spark.operators.retrieval import bm25_index
    from auraverse_etl_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_index,
        pq_codebooks,
        pq_encode,
        pq_quantization_error,
        sq_encode,
        sq_stats,
    )
    from auraverse_etl_pipeline_spark.streaming.ops import index_suite_tick

    schema = "vec_id bigint, embedding array<double>"
    # gate family: ids 10, 11, 20..25
    anchors = [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])]
    crowd = [(20 + i, [0.9 + 0.005 * i, 0.1, 0.0]) for i in range(6)]
    gidx = ivf_index(spark.createDataFrame(anchors, schema), nlist=2, quantizer="sample")
    gmembers = ivf_assign(
        spark.createDataFrame(anchors + crowd, schema), gidx.centroids, clamp=True
    )
    groot = tmp_path / "suite_gate"
    gidx.centroids.write.parquet(str(groot / "centroids"))
    gmembers.repartition("cell").write.partitionBy("cell").parquet(
        str(groot / "members")
    )
    # compressed family: ids 0..23, clean day-1 models
    import random

    rng = random.Random(1712)
    day1 = [(i, [rng.uniform(0.3, 1.0) for _ in range(8)]) for i in range(24)]
    cday1 = spark.createDataFrame(day1, schema)
    croot = str(tmp_path / "suite_comp")
    ivf_index(cday1, nlist=4, quantizer="sample").save(croot)
    cells = spark.read.parquet(f"{croot}/assignments").select("id", "cell")
    books = pq_codebooks(cday1, m=2, ksub=4, quantizer="lloyd", max_iter=2)
    books.write.parquet(f"{croot}/codebooks")
    pq_encode(cday1, books, m=2).join(cells, "id").repartition("cell").write.partitionBy(
        "cell"
    ).parquet(f"{croot}/pq_codes")
    st = sq_stats(cday1)
    st.write.parquet(f"{croot}/sq_stats")
    sq_encode(cday1, st).join(cells, "id").repartition("cell").write.partitionBy(
        "cell"
    ).parquet(f"{croot}/sq_codes")
    pq_quantization_error(cday1, books, m=2).withColumn(
        "batch_id", F.expr("id DIV 12").cast("bigint")
    ).write.parquet(f"{croot}/encode_log")
    # bm25 family: docs 1..3
    broot = str(tmp_path / "suite_bm25")
    bm25_index(
        spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma delta")],
            "doc_id bigint, text string",
        )
    ).save(broot)
    # one shared take-down list: 25 lives in gate, 2 and 5 live in
    # BOTH compressed (vec ids 0..23) and bm25 (doc ids 1..3 -> just 2)
    tomb = str(tmp_path / "suite_tomb")
    spark.createDataFrame([(25,), (2,), (5,)], "id bigint").write.parquet(tomb)

    with _pytest.raises(ValueError, match="max_cell_size"):
        index_suite_tick(spark, gate_path=str(groot), tombstones_path=tomb)
    # the contract fires BEFORE the existence probe: a misconfigured
    # cron fails at deploy time even while the gate root doesn't exist
    with _pytest.raises(ValueError, match="max_cell_size"):
        index_suite_tick(spark, gate_path=str(tmp_path / "not_yet"))

    out = index_suite_tick(
        spark,
        gate_path=str(groot),
        compressed_path=croot,
        bm25_path=broot,
        tombstones_path=tomb,
        gate_opts={"max_cell_size": 8},
        compressed_opts={"m": 2, "ksub": 4, "max_iter": 2},
    )
    assert set(out) == {"gate", "compressed", "bm25"}
    assert out["gate"]["retired_cells"]
    assert out["compressed"]["retired"] == [
        "assignments", "pq_codes", "sq_codes", "encode_log",
    ]
    assert out["bm25"]["rewrote"]
    assert {r.id for r in spark.read.parquet(str(groot / "members")).collect()} == {
        10, 11, 20, 21, 22, 23, 24,
    }
    assert {r.id for r in spark.read.parquet(f"{croot}/assignments").collect()} == (
        set(range(24)) - {2, 5}
    )
    assert {
        r.id for r in spark.read.parquet(f"{broot}/postings").collect()
    } == {1, 3}

    # second estate tick: quiet everywhere under the standing tombstones
    out2 = index_suite_tick(
        spark,
        gate_path=str(groot),
        compressed_path=croot,
        bm25_path=broot,
        tombstones_path=tomb,
        gate_opts={"max_cell_size": 8},
        compressed_opts={"m": 2, "ksub": 4, "max_iter": 2},
    )
    assert out2["gate"]["retired_cells"] == []
    assert out2["compressed"]["retired"] == []
    assert not out2["bm25"]["rewrote"]

    # absent roots: skipped, never an exception
    out3 = index_suite_tick(
        spark,
        gate_path=str(tmp_path / "nope_gate"),
        compressed_path=str(tmp_path / "nope_comp"),
        bm25_path=str(tmp_path / "nope_bm25"),
        gate_opts={"max_cell_size": 8},
    )
    assert out3 == {"gate": "skipped", "compressed": "skipped", "bm25": "skipped"}


def test_stream_substring_gate_decisions(spark, tmp_path):
    """The novelty gate: every document gets a decision row per
    arrival, a cross-batch verbatim re-ingest is re-judged and
    rejected at dup_pct 10000, a within-batch duplicate loses to the
    id-ordered first copy, fresh content is admitted, and the index
    holds ONLY admitted documents' hashes (rejected content never
    claims ownership)."""
    import time

    from auraverse_etl_pipeline_spark.streaming.ops import (
        run_stream_substring_gate,
    )

    k = 3
    fresh_a = "completely original first document about parquet rows"
    fresh_b = "another novel piece of text on shuffle partitions here"
    schema = "doc_id bigint, text string"
    batch1 = [(1, fresh_a), (2, fresh_a)]          # 2: within-batch dup of 1
    batch2 = [(3, fresh_b), (4, fresh_a)]          # 4: cross-batch re-ingest
    chunk_dir = tmp_path / "gate_chunks"
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(chunk_dir))
        time.sleep(1.2)

    root = tmp_path / "ssgate"
    sdocs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    run_stream_substring_gate(
        sdocs,
        index_path=str(root / "index"),
        decisions_path=str(root / "decisions"),
        k=k,
        max_dup_pct=5000,
    )

    dec = {r.doc_id: r for r in spark.read.parquet(str(root / "decisions")).collect()}
    assert set(dec) == {1, 2, 3, 4}
    assert dec[1].kept and dec[1].dup_pct == 0
    assert not dec[2].kept and dec[2].dup_pct == 10000  # within-batch loser
    assert dec[3].kept and dec[3].dup_pct == 0
    assert not dec[4].kept and dec[4].dup_pct == 10000  # re-judged re-ingest
    assert dec[4].batch_id > dec[1].batch_id

    # index ownership: admitted docs only (1 and 3)
    idx = spark.read.parquet(str(root / "index"))
    assert {r.doc_id for r in idx.collect()} == {1, 3}
