"""Streaming sinks beyond the built-ins.

``foreachBatch`` is the general-purpose exactly-once bridge: Spark
replays a failed micro-batch with the SAME batch_id, so any sink that
is idempotent per (batch_id) gives end-to-end exactly-once on top of
at-least-once delivery. :func:`partitioned_parquet_sink` implements the
standard spelling — one parquet partition directory per batch_id,
overwritten (not appended) on replay.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_writer(path: str) -> Callable[[DataFrame, int], None]:
    """Idempotent micro-batch writer: batch N lands in
    ``path/batch_id=N`` with dynamic partition overwrite, so a replay
    of batch N replaces exactly its own output and nothing else."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from auraverse_etl_pipeline_spark.streaming.runner import audit_batch_plan

        out = batch_df.withColumn("batch_id", F.lit(batch_id))
        audit_batch_plan("partitioned_parquet_sink", out)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return write


def partitioned_parquet_sink(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start an exactly-once parquet sink for a streaming DataFrame."""
    writer = (
        sdf.writeStream.foreachBatch(foreach_batch_writer(path))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
