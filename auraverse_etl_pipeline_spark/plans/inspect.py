"""Physical-plan introspection for scale review.

``plan_summary`` condenses ``df.explain`` into the handful of numbers
that decide whether a plan survives a 100 TB deployment: how many data
shuffles, whether small sides broadcast, whether per-row Python
evaluation crept into the hot path, and what the scans actually read
(pushed filters / pruned schema). The plan-guard tests in
``tests/test_plans.py`` assert on these; pipelines can log them before
launching an expensive job.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame, run: bool = False) -> dict:
    """Summarize the EXECUTED physical plan of ``df``.

    Under AQE the plan text is ``isFinalPlan=false`` until the query
    actually runs, and codegen span markers (``*(n)``) only appear in
    the final plan. ``run=True`` executes the DataFrame's own query
    execution first (a collect — use at test/sample scale) so the
    summary reflects the runtime-adapted plan.

    Returns a dict with:
    - ``exchanges``: data-moving shuffles (hash + range partitioning)
    - ``single_partition_exchanges``: global funnels (the 100 TB smell)
    - ``broadcasts``: broadcast exchanges (small sides shipped, not shuffled)
    - ``sort_merge_joins`` / ``broadcast_hash_joins`` / ``shuffled_hash_joins``
    - ``nested_loop_joins``: BroadcastNestedLoopJoin + CartesianProduct
    - ``python_eval_nodes``: row-at-a-time or Arrow Python stages
    - ``codegen_stages``: whole-stage-codegen spans
    - ``pushed_filters``: filters that reached the parquet reader
    - ``read_schemas``: pruned column sets per scan
    """
    if run:
        df._jdf.collectToPython()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "python_eval_nodes": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("MapInPandas"),
        # codegen spans render as "*(n) Operator" in executedPlan text
        "codegen_stages": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: ([^\n]*)", plan),
    }
