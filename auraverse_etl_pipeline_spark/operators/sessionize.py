"""Gap-based sessionization over event streams (batch spelling).

Assign a session id per (user, run of events with gaps < timeout):
lag → new-session flag → running sum. Two window passes over the same
(user_id, ts) partitioning — Spark reuses the sort, so this is one
shuffle. The streaming twin is ``session_window`` in
``streaming/events.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Append ``session_seq`` (1-based per user). Deterministic total
    order via the tie-break columns."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: bounds, event count, duration seconds."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias("duration_s"),
    )
