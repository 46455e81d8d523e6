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


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Release diff between two corpus snapshots: one row per status —
    ``(status ∈ added|removed|changed|unchanged, n_docs, tokens_old,
    tokens_new)`` — the change summary a dataset release note ships
    (and the sanity gate a daily pipeline checks before promoting a
    snapshot: an unexpected ``removed`` spike is an upstream loss).

    Document identity is the id; change detection is ``md5(text)``
    (the exact-dedup discipline — fixed-width hashes move, never
    text). One projection per side, one full-outer id join, one
    4-group aggregate; at 100 TB both sides prune to (id, hash,
    token count) at the scan."""
    from auraverse_etl_pipeline_spark.functions.text import token_count

    def side(df: DataFrame, suffix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.md5(text_col).alias(f"h_{suffix}"),
            token_count(text_col).alias(f"t_{suffix}"),
        )

    joined = side(old, "old").join(side(new, "new"), "id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(
            status.alias("status"),
            F.coalesce(F.col("t_old"), F.lit(0)).alias("t_old"),
            F.coalesce(F.col("t_new"), F.lit(0)).alias("t_new"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("t_old").cast("bigint").alias("tokens_old"),
            F.sum("t_new").cast("bigint").alias("tokens_new"),
        )
    )
