"""Count-min sketch: fixed-memory frequency estimation over unbounded
key spaces.

Where :mod:`plans.analytics`'s q28/q33 cover DISTINCT-COUNT sketches
(HLL), this is the FREQUENCY side: a 100 TB corpus's token/URL/n-gram
frequency table is itself huge (the dictionary dominates), but a
count-min sketch answers "how often does key k occur" within
``ε = e/width`` of the true count (always an OVER-estimate, never
under) using ``depth × width`` integers total — broadcast-sized at any
corpus scale. The sketch is an ordinary ``(row, bucket, cnt)``
DataFrame: persistable to parquet and MERGEABLE by summing cells
(count-min is a linear sketch), so daily increments compose like the
MinHash and Bloom indexes.

Engine-portable: bucket positions are md5 prefixes
(``('0x' || substr(md5(key || '#' || row), 1, 15))::BIGINT % width``),
so a SQL oracle replays every cell and every estimate digit-for-digit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _cms_bucket(key: Column, row: Column, width: int) -> Column:
    """Row ``row``'s hash of ``key`` as a bucket in [0, width)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("#", key, row)), 1, 15), 16, 10)
    return h.cast("bigint") % F.lit(width)


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)``, at most depth × width
    rows regardless of key cardinality. ``weight_col`` counts each
    input row by a weight instead of 1 (pre-aggregated inputs).

    Scale shape: ``depth`` fixed-width rows per input row (the key is
    hashed map-side and never shuffles), one partial-aggregated count
    shuffle onto at most depth × width groups. Merge two sketches of
    the SAME geometry by unioning and re-summing cells."""
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    pos = df.select(F.col(key_col).alias("k"), w.alias("w")).select(
        "k",
        "w",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        pos.select("row", _cms_bucket(F.col("k"), F.col("row"), width).alias("bucket"), "w")
        .groupBy("row", "bucket")
        .agg(F.sum("w").cast("bigint").alias("cnt"))
    )


def cms_lookup(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est_count",
) -> DataFrame:
    """``keys`` plus the sketch's estimate for each key: the MIN over
    the depth rows' cells (the count-min estimator — an upper bound on
    the true count, exact when no colliding key shares all ``depth``
    cells). Keys the sketch never saw estimate 0.

    Scale shape: sketch broadcast (≤ depth × width rows), ``depth``
    fixed-width probe rows per distinct key, one ``min`` aggregate
    back to the key."""
    distinct = keys.select(F.col(key_col).alias("k")).distinct()
    probes = distinct.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    ).select("k", "row", _cms_bucket(F.col("k"), F.col("row"), width).alias("bucket"))
    est = (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias(out_col))
    )
    return keys.join(est.withColumnRenamed("k", key_col), key_col, "left")
