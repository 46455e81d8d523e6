"""Change-data-capture application: upsert a changeset into a snapshot
(type-1) and build a versioned SCD2 history from a change log.

The reference's merge layer is per-document last-wins routing
(``/root/reference/script.py:516-556`` ``merge_section``); these
operators generalize that semantics to table scale: the latest change
per key wins, applied distributively.

Scale shape: one shuffle of the changeset on the key (window for
latest-wins), then one key-partitioned join against the snapshot —
broadcast when the changeset is small (the common CDC case: a day of
changes vs years of snapshot). No driver-side state, no collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def latest_changes(
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
) -> DataFrame:
    """Latest change row per key (highest ``seq_col`` wins; ties broken
    by operation to keep the result deterministic)."""
    w = Window.partitionBy(key_col).orderBy(F.desc(seq_col), F.desc("op"))
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changeset(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Type-1 upsert: apply an I/U/D change log to a snapshot.

    ``changes`` carries the snapshot's columns plus ``op_col`` in
    {'I','U','D'} and a monotonically increasing ``seq_col``. Per key,
    only the latest change applies: D drops the row, I/U replaces (or
    inserts) it. Untouched snapshot rows pass through unchanged.
    """
    value_cols = snapshot.columns
    latest = latest_changes(changes, key_col, seq_col)
    keys = latest.select(key_col)
    kept = snapshot.join(keys, key_col, "left_anti")
    replaced = latest.filter(F.col(op_col) != "D").select(*value_cols)
    return kept.unionByName(replaced)


def scd2_history(
    changes: DataFrame,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Type-2 history: every non-delete change becomes a version row with
    ``[valid_from, valid_to)`` sequence bounds; the current version has
    ``valid_to = NULL``. A delete closes the prior version without
    emitting a row. Pure window algebra — lead() over the per-key change
    order — one shuffle on the key."""
    w = Window.partitionBy(key_col).orderBy(seq_col)
    nxt = F.lead(seq_col).over(w)
    return (
        changes.withColumn("valid_to", nxt)
        .filter(F.col(op_col) != "D")
        .withColumnRenamed(seq_col, "valid_from")
        .drop(op_col)
    )
