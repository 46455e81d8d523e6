"""Bucketed-table surface: shuffle-free co-located joins.

At 100 TB the fact-fact join (lineitem ⋈ orders) is the dominant
shuffle. Writing both tables bucketed (and sorted) by the join key
pre-shuffles them ONCE at write time; every later join on that key
reads co-located buckets and skips both the exchange and (with sortBy)
the sort. This module spells that contract; the pytest asserts the
resulting physical plan really has no Exchange under the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed+sorted by ``bucket_col``. ``path`` makes
    it an external table (data at path, metadata in the session
    catalog). Bucket count is a layout contract: joins co-locate only
    between tables with the SAME count (or integer multiples with
    bucketed-scan ratio enabled)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The merge
    hint pins sort-merge join (a broadcast would also skip the shuffle,
    but only because one side is small — the bucketed layout is what
    removes the exchange for two LARGE sides)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, on, how)
