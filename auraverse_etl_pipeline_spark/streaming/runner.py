"""Execute a streaming plan to completion and hand back a batch result.

``Trigger.AvailableNow`` processes everything the source currently has
(in rate-limited micro-batches when the source is configured so) and
terminates — the replay harness that lets the oracle gate compare a
streaming plan's output against batch SQL on the same files.
"""

from __future__ import annotations

import tempfile
from itertools import count

from pyspark.sql import DataFrame

_SEQ = count()

#: When set to a list (by ``tools/audit_plans.py``), every streaming
#: run appends ``(label, physical_plan_str)`` tuples here: the
#: micro-batch plan of each started streaming query, plus — via
#: :func:`audit_batch_plan` calls inside foreachBatch handlers — the
#: executed plan of every batch DataFrame a handler writes. This is
#: what lets the whole-registry anti-pattern sweep cover the streaming
#: tier with the SAME checks as the batch tier, instead of relying on
#: individually pinned plans. ``None`` (the default) disables capture
#: entirely — zero overhead on the production path.
PLAN_AUDIT: list[tuple[str, str]] | None = None


def audit_batch_plan(label: str, df: DataFrame) -> None:
    """Record ``df``'s executed physical plan when auditing is on.

    Called by foreachBatch handlers on each DataFrame they write —
    planning only, no extra execution. Capture failures are recorded
    as findings (never swallowed into a false 'clean' sweep)."""
    if PLAN_AUDIT is None:
        return
    try:
        PLAN_AUDIT.append(
            (label, df._jdf.queryExecution().executedPlan().toString())
        )
    except Exception as exc:  # noqa: BLE001 — surfaced by the audit tool
        PLAN_AUDIT.append((label, f"CAPTURE_ERROR: {exc!r}"))


def audit_stream_plan(label: str, query) -> None:
    """Record a StreamingQuery's last micro-batch physical plan."""
    if PLAN_AUDIT is None:
        return
    try:
        PLAN_AUDIT.append((label, query._jsq.explainInternal(False)))
    except Exception as exc:  # noqa: BLE001
        PLAN_AUDIT.append((label, f"CAPTURE_ERROR: {exc!r}"))


def run_stream_to_memory(
    sdf: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
    timeout_s: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run a streaming DataFrame with AvailableNow into a memory sink;
    return the sink table as a batch DataFrame.

    ``complete`` mode re-emits the full aggregate each batch, so the
    table holds the final answer regardless of watermark progress;
    ``append``/``update`` accumulate emitted rows (callers with
    cumulative update-mode output take the last row per key).
    Checkpoint goes to a throwaway dir — replay harness, not a
    production deployment.

    ``state_partitions`` pins the state-store shard count for this
    query (the shuffle-partition conf is captured at first checkpoint):
    state shards should match key cardinality and throughput, not the
    batch-analytics parallelism — at replay scale 64 near-empty shards
    cost 5× the wall clock of 8 (per-task state-store open/commit
    overhead). None keeps the session setting; a real deployment sizes
    this to its key space once, since it is fixed for the checkpoint's
    lifetime."""
    qname = name or f"stream_result_{next(_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
            audit_stream_plan(qname, q)
        finally:
            q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(qname)
