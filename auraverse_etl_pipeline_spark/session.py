"""SparkSession factory with scale-appropriate defaults.

The engine targets a large multi-executor cluster reading ~100 TB; tests
run on ``local[N]``. The defaults below are the cluster-shaped knobs that
matter in both worlds: AQE on (runtime shuffle sizing, skew-join
handling), Arrow on (vectorized pandas-UDF transfer), explicit session
timezone (UTC — so timestamp semantics match the DuckDB oracle and don't
depend on host TZ).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conservative, cluster-portable defaults. Anything sized "per node"
#: (memory, cores) is intentionally NOT set here — that belongs to
#: spark-submit / the cluster manager, not application code.
DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching. At 100 TB this is
    # what turns "static 200-partition shuffle" into right-sized stages.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs / toPandas (the ingest pipeline is
    # pandas-UDF based; row-at-a-time pickling would be 10-100x slower).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: pushdown + pruning are on by default; keep
    # vectorized reader explicit since the engine depends on it.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Broadcast threshold: dims (region/nation/supplier/part at test SF)
    # must broadcast instead of shuffling the fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def default_master() -> str:
    """local[$SPARK_GRAFT_CPUS] unless a master is provided by env."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def get_spark(
    app_name: str = "auraverse-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``shuffle_partitions`` defaults to the parallelism of the master —
    at local test scale a huge static shuffle count only creates tiny
    files and scheduler overhead; AQE coalesces down from this anyway.
    """
    master = master or default_master()
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        shuffle_partitions = int(cpus) * 2 if cpus.isdigit() else 64
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
