"""Range (interval) join and hypertable-style rollup cascade.

Spark has no native range-join operator — a naive spelling of
``points JOIN intervals ON ts BETWEEN start AND end`` becomes a
BroadcastNestedLoopJoin (O(points × intervals)). These operators give
the scale-sane spellings:

- :func:`range_join` — bucket both sides to a time grain, replicate
  each interval only across the buckets it covers, equality-join on
  (keys..., bucket), then apply the exact containment filter. Each
  point lives in exactly one bucket, so a (point, interval) pair can
  match at most once — no post-join dedup. Cost: equality shuffle +
  interval replication by ceil(span/bucket), instead of a cross
  product.
- :func:`rollup_cascade` — TimescaleDB-style continuous-aggregate
  ladder: raw → finest bucket with algebraic partials, every coarser
  level re-aggregated FROM THE PREVIOUS LEVEL (sums of sums), never
  from raw. At 100 TB the raw scan happens once; the day-level rollup
  reads minute partials that are ~1e4× smaller.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: seconds per supported bucket unit
_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _parse_width(width: str) -> int:
    n, unit = width.split()
    return int(n) * _UNIT_SECONDS[unit.rstrip("s")]


def time_bucket(ts: Column | str, width: str) -> Column:
    """Truncate a timestamp to a fixed-width bucket (``'5 minutes'``,
    ``'1 hour'``...) — TimescaleDB's ``time_bucket``, spelled with
    integer epoch math so it is engine-portable and exact."""
    step = _parse_width(width)
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds((F.unix_timestamp(c) / step).cast("bigint") * step)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Equality-join spelling of
    ``points ⋈ intervals ON keys AND start <= ts <= end``.

    ``bucket`` trades replication for selectivity: choose it near the
    typical interval span (intervals replicate ceil(span/bucket)+1
    times; a smaller bucket prunes more non-matches before the filter).
    """
    step = _parse_width(bucket)
    p = points.withColumn("_b", time_bucket(point_ts, bucket))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                time_bucket(start_col, bucket),
                time_bucket(end_col, bucket),
                F.expr(f"interval {step} seconds"),
            )
        ),
    )
    joined = p.join(i, [*keys, "_b"], how).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_b")


def rollup_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    widths: Sequence[str] = ("1 minute", "1 hour", "1 day"),
) -> dict[str, DataFrame]:
    """Continuous-aggregate ladder: ``{width: DataFrame}`` with columns
    (bucket, *key_cols, n_events, sum_value), each level computed from
    the previous one.

    The partials are algebraic (count→sum, sum→sum), so re-aggregation
    is exact; ``sum_value`` is carried as DECIMAL(38,6) through every
    level so the ladder is bit-stable at any parallelism."""
    out: dict[str, DataFrame] = {}
    finest = widths[0]
    level = (
        events.groupBy(time_bucket(ts_col, finest).alias("bucket"), *key_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_value"),
        )
    )
    out[finest] = level
    for width in widths[1:]:
        level = (
            level.groupBy(time_bucket("bucket", width).alias("bucket"), *key_cols)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
        out[width] = level
    return out
