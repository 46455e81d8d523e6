"""Isolated per-query measurement for the optimization rounds.

Usage: python tools/measure_query.py <query> [<query> ...] \
           [--sf /root/testdata/sf0.1] [--runs 3] [--plan out.txt]

Fresh process, engine session (get_spark), noop sink per guide §1.4,
job labelled per guide §1.5. Prints per-run wall seconds (run 1 is the
cold/codegen run; the warm floor is what cross-round comparisons use —
SCALE.md canary rule) and optionally writes .explain("formatted") to a
file for the plans/r17 attestations.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auraverse_etl_pipeline_spark.plans.registry import all_queries
from auraverse_etl_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="write explain('formatted') of run 1's frame here")
    ap.add_argument(
        "--plan-dir",
        default=None,
        help="write each query's explain('formatted') to <dir>/<name>_<suffix>.txt",
    )
    ap.add_argument("--plan-suffix", default="before")
    args = ap.parse_args()

    spark = get_spark(app_name="measure-query")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in args.queries:
        qd = registry[name]
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = qd.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"{name} run{i}: {dt:.3f} s", flush=True)
            if i == 0 and (args.plan or args.plan_dir):
                out = args.plan or os.path.join(
                    args.plan_dir, f"{name}_{args.plan_suffix}.txt"
                )
                with open(out, "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
