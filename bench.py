"""Benchmark harness: the FULL query registry at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

``queries`` carries per-query wall times for every registered query
(so per-query regressions are visible round-over-round), while
``value`` stays the HEADLINE subtotal — the same nine-query metric
every previous round recorded, so the headline number remains
comparable across BENCH_r*.json files.

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect overhead). A small warmup query amortizes JVM /
codegen startup out of the numbers. Set ``SPARK_GRAFT_BENCH=headline``
to run only the headline subset (fast iteration loop).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from auraverse_etl_pipeline_spark.plans.registry import all_queries
from auraverse_etl_pipeline_spark.session import get_spark

#: Representative, load-bearing queries: fact-table scan+agg, 6-table
#: star join, top-k join, calendar bucketing, HAVING join, event
#: windows, plus the LLM-pipeline headliners when registered.
HEADLINE = [
    "q01_pricing_summary",
    "q03_region_nation_revenue",
    "q05_returned_customers",
    "q12_orders_monthly_kpis",
    "q18_large_quantity_orders",
    "q20_hourly_event_windows",
    "fragment_summary",
    "dedup_minhash_pairs",
    "sim_topk_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="auraverse-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # Warmup: touch the fact table once so JVM startup / codegen noise
    # stays out of per-query timings.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    headline_only = os.environ.get("SPARK_GRAFT_BENCH", "full") == "headline"
    names = [n for n in HEADLINE if n in registry] if headline_only else list(registry)
    # Headline queries run first so their timings are never polluted by
    # cache/session state left behind by the long tail of the sweep.
    if not headline_only:
        names = [n for n in HEADLINE if n in registry] + [
            n for n in names if n not in HEADLINE
        ]

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one broken query must not sink the sweep
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for n, t in timings.items() if n in HEADLINE and t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
