"""Bucketed co-located join: the physical plan must contain NO shuffle
exchange when both sides are bucketed by the join key — the write-once
pre-shuffle contract that kills the dominant fact-fact shuffle at
scale."""

from __future__ import annotations

import pyspark.sql.functions as F

from auraverse_etl_pipeline_spark.sources.bucketed import colocated_join, write_bucketed
from auraverse_etl_pipeline_spark.sources.tables import load_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8, path=str(tmp_path / "o"))
    write_bucketed(li, "t_lineitem_b", "o_orderkey", 8, path=str(tmp_path / "l"))
    try:
        joined = colocated_join(spark, "t_lineitem_b", "t_orders_b", "o_orderkey")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        want = li.join(orders, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_unbucketed_same_join_does_shuffle(spark, sf_dir):
    """Control: the identical join over plain parquet scans needs
    exchanges (proves the bucketing, not the data size, removed them)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plan = _executed_plan(li.hint("merge").join(orders, "o_orderkey"))
    assert "Exchange" in plan
