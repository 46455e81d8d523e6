#!/usr/bin/env python
"""Whole-registry physical-plan anti-pattern audit.

Builds every (non-streaming) registry query's executed plan at a small
SF and reports any plan containing the two unconditional anti-patterns
this repo claims to have zero of: ``CartesianProduct`` (unbounded
pairing) and bare ``BatchEvalPython`` (row-at-a-time scalar Python —
every Python stage must be Arrow-batched; ``BatchEvalPythonUDTF`` is
the UDTF protocol node and is exempt). BroadcastNestedLoopJoin is reported for
REVIEW rather than failed: 1-row stat-frame crossJoins legitimately
plan as BNLJ (each hand-audited in tests/test_plans.py).

Streaming queries are skipped: their ``fn()`` runs the stream to
completion and returns a materialized batch result whose plan is not
the streaming plan (those are pinned in tests/test_streaming.py).

Usage: python tools/audit_plans.py [sf_dir]   (default sf0.001)
Exit code 1 if any hard anti-pattern is found.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from auraverse_etl_pipeline_spark.plans.registry import all_queries
    from auraverse_etl_pipeline_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    hard, review, errors = [], [], []
    for name, qd in all_queries().items():
        if name.startswith("stream_"):
            continue
        try:
            plan = qd.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must see every query
            errors.append((name, str(exc)[:120]))
            continue
        finally:
            spark.catalog.clearCache()
        if "CartesianProduct" in plan:
            hard.append((name, "CartesianProduct"))
        # BatchEvalPythonUDTF is the (batched) UDTF protocol node, not
        # a row-at-a-time scalar UDF — only the bare node is a finding
        import re as _re

        if _re.search(r"BatchEvalPython(?!UDTF)", plan):
            hard.append((name, "BatchEvalPython"))
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj:
            review.append((name, f"BroadcastNestedLoopJoin x{n_bnlj}"))
    n_all = len(all_queries())
    n_skipped = sum(1 for n in all_queries() if n.startswith("stream_"))
    n_audited = n_all - n_skipped - len(errors)
    print(
        f"audited {n_audited} of {n_all} queries ({sf_dir}); "
        f"{n_skipped} streaming queries skipped (plans pinned in "
        f"tests/test_streaming.py)"
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
