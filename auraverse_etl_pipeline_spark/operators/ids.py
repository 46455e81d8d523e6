"""Global row-id assignment at scale.

The naive ``row_number() OVER (ORDER BY ...)`` plans an Exchange
SinglePartition — every row funnels through ONE task, which is the
canonical does-not-survive-100TB shape. This operator produces the
identical ids with a two-pass scheme: range-repartition on the order
key, number rows within each partition, then shift by per-partition
offsets (a tiny numPartitions-row table, broadcast back). The result is
independent of the partitioning because the order key is required to be
unique — same answer as the naive window, none of the funnel.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str | Column],
    id_col: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add contiguous ids 0..n-1 following the total order of
    ``order_cols`` (which must be a unique key — with ties the
    assignment within a tie group would depend on partitioning).

    Pass 1: range-repartition by the order key and ``row_number``
    within each partition (local sort only). Pass 2: per-partition
    counts → exclusive prefix sums; that offsets table has one row per
    partition, so ITS global window is trivially cheap, and it joins
    back as a broadcast. No row ever moves through a single reducer.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *order_cols)
    with_pid = part.withColumn("_pid", F.spark_partition_id())
    local = with_pid.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    )
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_rn") - 1).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )
