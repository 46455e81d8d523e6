"""As-of (most-recent-match) join — an operator Spark lacks natively.

Implemented per SURVEY.md §2.6 guidance as a composition of built-ins:
condition join + per-left-row argmax. For each left row, find the right
row with the greatest timestamp ≤ the left timestamp within the same
key. Two spellings:

- :func:`as_of_join` — cogrouped ``applyInPandas`` running
  ``pandas.merge_asof`` per key group: one shuffle on the key each side,
  then an O(n log n) in-memory merge per group. This is the scale path —
  state per group, not per cluster, and Arrow-batched.
- :func:`as_of_join_native` — pure DataFrame fallback (range join +
  groupBy argmax via ``max_by``) used when Python workers are
  undesirable; relies on AQE to handle the range-join fan-out.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType

from auraverse_etl_pipeline_spark.runtime import ship_package


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by_left: str,
    by_right: str,
    right_cols: list[str] | None = None,
    tolerance: pd.Timedelta | None = None,
    right_on: str | None = None,
) -> DataFrame:
    """For each left row, append the most recent right row with
    ``right[right_on] <= left[on]`` and matching key (backward as-of).
    Right columns keep their names; collisions get a ``_right`` suffix."""
    ship_package(left.sparkSession)
    right_on = right_on or on
    right_cols = right_cols or [c for c in right.columns if c not in (by_right, right_on)]
    out_right = [right_on] + [c for c in right_cols if c != right_on]

    fields = list(left.schema.fields)
    taken = {f.name for f in fields}
    rename: dict[str, str] = {}
    for c in out_right:
        name = c if c not in taken else f"{c}_right"
        rename[c] = name
        fields.append(StructField(name, right.schema[c].dataType, True))
    out_schema = StructType(fields)

    out_names = [f.name for f in out_schema.fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=out_names)
        l = l.sort_values(on, kind="mergesort")
        if r.empty:
            for c in out_right:
                l[rename[c]] = None
            return l[out_names]
        # rename right columns up front so a shared key name (on ==
        # right_on) keeps the matched right value as its own column
        rr = r[out_right].rename(columns=rename).sort_values(rename[right_on], kind="mergesort")
        merged = pd.merge_asof(
            l, rr, left_on=on, right_on=rename[right_on],
            direction="backward", tolerance=tolerance,
        )
        return merged[out_names]

    return (
        left.groupBy(F.col(by_left).alias("_k"))
        .cogroup(right.groupBy(F.col(by_right).alias("_k")))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )


def as_of_join_native(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by_left: str,
    by_right: str,
    value_col: str,
) -> DataFrame:
    """DataFrame-only backward as-of: non-equi join + ``max_by`` argmax.
    Output: left columns + ``asof_{on}`` + ``asof_{value_col}``."""
    r = right.select(
        F.col(by_right).alias("_k"),
        F.col(on).alias("_rts") if on in right.columns else F.col(on),
        F.col(value_col).alias("_rval"),
    )
    joined = left.join(
        r, (left[by_left] == r["_k"]) & (r["_rts"] <= left[on]), "left"
    )
    return (
        joined.groupBy(*[left[c] for c in left.columns])
        .agg(
            F.max("_rts").alias(f"asof_{on}"),
            F.max_by("_rval", "_rts").alias(f"asof_{value_col}"),
        )
    )
