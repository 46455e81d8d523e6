#!/usr/bin/env python
"""Whole-registry physical-plan anti-pattern audit — batch AND streaming.

Builds every registry query's executed plan at a small SF and reports
any plan containing the two unconditional anti-patterns this repo
claims to have zero of: ``CartesianProduct`` (unbounded pairing) and
bare ``BatchEvalPython`` (row-at-a-time scalar Python — every Python
stage must be Arrow-batched; ``BatchEvalPythonUDTF`` is the UDTF
protocol node and is exempt). BroadcastNestedLoopJoin is reported for
REVIEW rather than failed: 1-row stat-frame crossJoins legitimately
plan as BNLJ (each hand-audited in tests/test_plans.py).

Batch queries are audited from the returned DataFrame's executed plan.
Streaming queries (``stream_*``) run to completion with micro-batch
plan capture enabled (``streaming.runner.PLAN_AUDIT``): the streaming
query's own last micro-batch plan plus the executed plan of every
DataFrame a foreachBatch handler writes are swept with the SAME
checks, so the zero-anti-pattern claim covers all tiers uniformly.
A streaming run that captures nothing, or a capture error, is itself a
finding — the sweep cannot silently thin out.

Usage: python tools/audit_plans.py [sf_dir]   (default sf0.001)
Exit code 1 if any hard anti-pattern (or capture gap) is found.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def sweep(name: str, plan: str, hard: list, review: list) -> None:
    if plan.startswith("CAPTURE_ERROR"):
        hard.append((name, plan))
        return
    if "CartesianProduct" in plan:
        hard.append((name, "CartesianProduct"))
    # BatchEvalPythonUDTF is the (batched) UDTF protocol node, not a
    # row-at-a-time scalar UDF — only the bare node is a finding
    if re.search(r"BatchEvalPython(?!UDTF)", plan):
        hard.append((name, "BatchEvalPython"))
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj:
        review.append((name, f"BroadcastNestedLoopJoin x{n_bnlj}"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from auraverse_etl_pipeline_spark.plans.registry import all_queries
    from auraverse_etl_pipeline_spark.session import get_spark
    from auraverse_etl_pipeline_spark.streaming import runner

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    hard, review, errors = [], [], []
    n_batch = n_stream = n_stream_plans = 0
    for name, qd in all_queries().items():
        streaming = name.startswith("stream_")
        if streaming:
            runner.PLAN_AUDIT = []
        try:
            df = qd.fn(spark, sf_dir)
            if streaming:
                captured = list(runner.PLAN_AUDIT)
                # the returned frame is a batch view of the sink/memory
                # table — audit it too (it is what the caller consumes)
                captured.append(
                    ("result", df._jdf.queryExecution().executedPlan().toString())
                )
                if len(captured) < 2:
                    errors.append((name, "no micro-batch plan captured"))
                for label, plan in captured:
                    sweep(f"{name}[{label}]", plan, hard, review)
                n_stream += 1
                n_stream_plans += len(captured)
            else:
                plan = df._jdf.queryExecution().executedPlan().toString()
                sweep(name, plan, hard, review)
                n_batch += 1
        except Exception as exc:  # noqa: BLE001 — audit must see every query
            errors.append((name, str(exc)[:120]))
        finally:
            if streaming:
                runner.PLAN_AUDIT = None
            spark.catalog.clearCache()
    n_all = len(all_queries())
    print(
        f"audited {n_batch + n_stream} of {n_all} queries ({sf_dir}): "
        f"{n_batch} batch, {n_stream} streaming "
        f"({n_stream_plans} captured micro-batch/handler plans)"
    )
    print(f"hard anti-patterns: {hard or 'NONE'}")
    print(f"review (BNLJ — expected only on 1-row stat frames): {len(review)}")
    for name, what in review:
        print(f"  {name}: {what}")
    if errors:
        print(f"errors: {errors}")
    return 1 if hard or errors else 0


if __name__ == "__main__":
    sys.exit(main())
