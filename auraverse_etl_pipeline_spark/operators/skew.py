"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized partitions at runtime and is the first line of defense — it
is on in our session factory. These operators cover the two cases AQE
does not fix:

- **Skewed aggregation** (one key holds a large share of all rows): a
  single reducer still receives the whole key. :func:`salted_agg`
  two-phases it — partial aggregate on (key, salt), final aggregate on
  key — so the hot key fans across ``n_salts`` reducers. Works for any
  algebraic aggregate (the caller supplies partial and merge forms).
- **Skewed join against a hot probe side** when the build side is too
  big to broadcast: :func:`salted_join` replicates each build row
  ``n_salts`` times (explode) and salts the probe side randomly-but-
  deterministically, so one hot key spreads across ``n_salts`` tasks at
  the cost of an n_salts× bigger build shuffle. Use only when metrics
  show a straggler: salting an unskewed join just multiplies work.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, n_salts: int, cols: Sequence[str], salt_col: str = "_salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, n_salts): a hash of the
    full row content (xxhash64 of the given columns), not rand() — so
    retried/recomputed tasks assign identical salts and the operator
    stays idempotent under task failure."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the
    partials per key (e.g. partial ``count(*) AS c`` merges with
    ``sum(c) AS c``). Spark's map-side partial aggregation already does
    this *within* a task; salting extends it *across* reducers when one
    key exceeds a single reducer.
    """
    salted = with_salt(df, n_salts, list(salt_cols or df.columns))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (hot) probe side, replicate
    the build side across all salts, join on key+salt.

    Output equals ``probe.join(build, on, how)`` for 'inner' and
    'left' joins. The build side shuffles n_salts× its size — the
    explicit price for splitting a hot key across n_salts tasks.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # Salt by full row content, NOT the join key: hashing the key would
    # put every row of the hot key on one salt, defeating the split.
    salted_probe = with_salt(probe, n_salts, list(probe.columns))
    replicated = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_probe.join(replicated, [*on, "_salt"], how).drop("_salt")
