"""Structured Streaming surface over the ``events`` stream table.

The reference is batch-only (SURVEY §2.6 — no streaming anywhere in
`/root/reference/etl_parser.py` or `script.py`); this module is the
north-star upgrade: the same event analytics the batch layer answers
(q20 hourly windows, q24 sessionization) expressed as incremental
streaming plans with watermarks, plus the streaming-only operators
(dropDuplicatesWithinWatermark, custom stateful running totals).

Design: every operator takes/returns a streaming DataFrame, so plans
compose exactly like batch ones; ``run_stream_to_memory`` executes any
of them to completion with Trigger.AvailableNow for the oracle gate
(stream result == batch SQL result on the same files).
"""

from auraverse_etl_pipeline_spark.streaming.ops import (
    dedup_events_within_watermark,
    minhash_signature_expr,
    sessionize_events_stream,
    stream_match_minhash_index,
    user_running_totals,
    windowed_event_counts,
)
from auraverse_etl_pipeline_spark.streaming.runner import run_stream_to_memory
from auraverse_etl_pipeline_spark.streaming.sources import stream_events

__all__ = [
    "stream_events",
    "windowed_event_counts",
    "sessionize_events_stream",
    "dedup_events_within_watermark",
    "minhash_signature_expr",
    "stream_match_minhash_index",
    "user_running_totals",
    "run_stream_to_memory",
]
