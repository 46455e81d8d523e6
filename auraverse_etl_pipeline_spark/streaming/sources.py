"""Streaming sources for the events table.

A streaming read needs an explicit schema (no inference pass), and the
driver's events.parquet is written as parquet TIMESTAMP(NANOS) — same
workaround as the batch loader (`sources/tables.py`): read nanos as
long (legacy conf) and convert with integer math.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of events.parquet with ts still raw nanos (pre-conversion).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over the events parquet → incremental micro-batches.

    ``path`` is either an sf dir containing ``events.parquet`` (the
    driver's testdata layout) or a directory of event parquet files
    (the real-scale layout: files landing in a monitored prefix).
    ``max_files_per_trigger`` bounds each micro-batch (source-side rate
    limiting — at real scale this is what keeps one trigger from
    swallowing a day of backlog); None lets AvailableNow plan the
    batches itself.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    table = os.path.join(path, "events.parquet")
    stream_dir = _as_stream_dir(table) if os.path.exists(table) else path
    raw = reader.parquet(stream_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def _as_stream_dir(path: str) -> str:
    """FileStreamSource monitors a directory; the driver ships events as
    one parquet file. Stage a symlink inside a derived temp dir (read
    path only — the testdata stays untouched). A directory input passes
    through unchanged, which is the real-scale layout (a stream of
    parquet files landing in a prefix)."""
    if os.path.isdir(path):
        return path
    digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
    staged = os.path.join(tempfile.gettempdir(), f"stream_src_{digest}")
    os.makedirs(staged, exist_ok=True)
    link = os.path.join(staged, os.path.basename(path))
    if os.path.lexists(link) and not os.path.exists(link):
        os.unlink(link)  # stale/broken symlink from a previous run
    if not os.path.lexists(link):
        os.symlink(path, link)
    return staged


#: Schema of documents.parquet (no nanos column; verbatim read).
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_documents(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over the documents corpus — the input shape of a
    continuously-landing crawl: each new parquet file is a micro-batch
    of raw documents for the ingest pipeline."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    table = os.path.join(path, "documents.parquet")
    stream_dir = _as_stream_dir(table) if os.path.exists(table) else path
    return reader.parquet(stream_dir)
