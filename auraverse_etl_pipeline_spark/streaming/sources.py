"""Streaming sources for the events table.

A streaming read needs an explicit schema (no inference pass). The
driver's events.parquet has shipped in two layouts across testdata
generations — TIMESTAMP(NANOS), which must be read as raw longs
(legacy conf) and converted with integer math, and TIMESTAMP(MICROS),
which reads as TIMESTAMP_NTZ — so the raw schema is derived from one
cheap batch footer read before the stream starts (same normalization
as the batch loader in ``sources/tables.py``).
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
    TimestampNTZType,
)


def _events_raw_schema(ts_is_long: bool) -> StructType:
    """Schema of events.parquet with ts still raw (pre-conversion)."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType() if ts_is_long else TimestampNTZType()),
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
    table = os.path.join(path, "events.parquet")
    stream_dir = _as_stream_dir(table) if os.path.exists(table) else path
    # One footer read (batch, schema only) decides the raw layout; the
    # stream itself still runs with an explicit schema as required.
    ts_is_long = dict(spark.read.parquet(stream_dir).dtypes)["ts"] == "bigint"
    reader = spark.readStream.schema(_events_raw_schema(ts_is_long))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(stream_dir)
    if ts_is_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


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


def stage_ordered_batches(batches, path: str) -> None:
    """Stage DataFrames as one parquet part file each under ``path``
    with strictly increasing, explicitly PINNED mtimes — the file
    stream source orders pending files by MODIFICATION time, so
    back-to-back writes can collide on coarse-mtime filesystems and
    replay micro-batches out of order. Order-sensitive fixtures (a
    batch-1 survivor must gate its batch-2 near-duplicate) stage
    through this instead of sleeping between writes."""
    import glob
    import os

    seen: set[str] = set()
    groups = []
    for df in batches:
        df.coalesce(1).write.mode("append").parquet(path)
        now = set(glob.glob(f"{path}/part-*"))
        groups.append(now - seen)
        seen = now
    t0 = os.stat(next(iter(groups[0]))).st_mtime
    for i, grp in enumerate(groups):
        for f in grp:
            os.utime(f, (t0 + 10 * i, t0 + 10 * i))
