"""Linear text classification over hashed bag-of-words features.

The model-based quality gate every modern curation pipeline runs
(FineWeb-Edu, DCLM: a cheap linear scorer distilled from a seed set
decides which documents survive): features are md5-hashed token
buckets, the model is a tiny (bucket, log_odds) table, scoring is a
broadcast join + one order-independent sum per document — so the
100 TB side is one scan, and the model trains in one aggregation pass.

Multinomial Naive Bayes with Laplace smoothing is the trainer here
because it IS one aggregation pass (count token instances per class),
fully deterministic, and strong enough for language/domain routing;
the scoring path doesn't care how the (bucket, log_odds) table was
made, so weights exported from any externally-trained linear model
(fasttext, logistic regression) drop in unchanged.

Engine parity note: JVM ``Math.log`` and DuckDB's libm ``ln`` disagree
in the last ulp on ~2% of inputs (measured), so the per-bucket logs
are computed in an Arrow-batched pandas_udf with Python's libm
``math.log`` — bit-identical to DuckDB — over the model table only
(num_buckets rows, never the corpus).
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from auraverse_etl_pipeline_spark.runtime import ship_package

#: Prior row marker in the model table (real buckets are >= 0).
PRIOR_BUCKET = -1


# DataType instance, not a DDL string: the module imports before any
# SparkSession exists and DDL parsing needs an active context.
@pandas_udf(DoubleType())
def _ln(s: pd.Series) -> pd.Series:
    return s.map(math.log)


def token_bucket(tok: Column, num_buckets: int) -> Column:
    """md5-prefix feature hash of a token — DuckDB replays it as
    ``('0x' || substr(md5(tok), 1, 15))::BIGINT % num_buckets``."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint") % num_buckets
    )


def nb_train(
    df: DataFrame,
    label_col: str | Column,
    positive,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """Train binary multinomial NB: ``(bucket, log_odds)`` with one
    extra row ``bucket = -1`` holding the class-prior log odds.

    ``log_odds[b] = ln((pos_b + α) / (pos_tot + α·B))
                  - ln((neg_b + α) / (neg_tot + α·B))`` over token
    INSTANCES (multinomial — repeats count); the prior row is
    ``ln((n_pos_docs + α) / (n_neg_docs + α))``.

    Scale shape: one explode of token instances into fixed-width
    (bucket, is_pos) rows, one partial-aggregated count shuffle, the
    totals joined back from a single-row aggregate — the model table
    is at most ``num_buckets + 1`` rows no matter the corpus size.
    The logs run in the Arrow batch over that tiny table (see module
    docstring for why not ``F.log``)."""
    ship_package(df.sparkSession)  # _ln is pickled by reference
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    from auraverse_etl_pipeline_spark.functions.text import tokens

    inst = df.select(
        (lab == F.lit(positive)).alias("pos"), F.explode(tokens(text_col)).alias("tok")
    ).select("pos", token_bucket(F.col("tok"), num_buckets).alias("bucket"))
    counts = inst.groupBy("bucket").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("pos_n"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).cast("bigint").alias("neg_n"),
    )
    totals = counts.agg(
        F.sum("pos_n").cast("bigint").alias("pos_tot"),
        F.sum("neg_n").cast("bigint").alias("neg_tot"),
    )
    denom_b = float(alpha) * num_buckets
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            _ln((F.col("pos_n") + F.lit(alpha)) / (F.col("pos_tot") + F.lit(denom_b)))
            - _ln((F.col("neg_n") + F.lit(alpha)) / (F.col("neg_tot") + F.lit(denom_b)))
        ).alias("log_odds"),
    )
    prior = df.agg(
        F.sum(F.when(lab == F.lit(positive), 1).otherwise(0)).cast("bigint").alias("np"),
        F.sum(F.when(lab != F.lit(positive), 1).otherwise(0)).cast("bigint").alias("nn"),
    ).select(
        F.lit(PRIOR_BUCKET).cast("bigint").alias("bucket"),
        _ln((F.col("np") + F.lit(alpha)) / (F.col("nn") + F.lit(alpha))).alias("log_odds"),
    )
    return weights.unionByName(prior)


def nb_score(
    df: DataFrame,
    model: DataFrame,
    num_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a ``(bucket, log_odds)`` model:
    ``(id, score, predicted)`` where ``score`` = prior + Σ per-token
    log_odds and ``predicted = score > 0``. Tokens hashing to buckets
    absent from the model contribute 0 (symmetric smoothing cancels).

    Scale shape: model broadcast, corpus exploded once into
    fixed-width (id, bucket) rows, the per-document sum is a hash
    aggregate over DECIMAL(38,12) partials (order-independent — the
    joined doubles are identical across engines, a double SUM would
    depend on partial order). ``explode_outer`` keeps NULL-text
    documents as a null-bucket row, so every id reaches the aggregate
    and scores at least the bare prior — no second corpus-sized join
    to backfill missing ids."""
    from auraverse_etl_pipeline_spark.functions.text import tokens

    w = F.broadcast(model.filter(F.col("bucket") >= 0))
    prior = F.broadcast(
        model.filter(F.col("bucket") == PRIOR_BUCKET).select(
            F.col("log_odds").alias("prior")
        )
    )
    inst = df.select(
        F.col(id_col).alias("id"), F.explode_outer(tokens(text_col)).alias("tok")
    ).select("id", token_bucket(F.col("tok"), num_buckets).alias("bucket"))
    sums = (
        inst.join(w, "bucket", "left")
        .groupBy("id")
        .agg(
            F.sum(F.coalesce(F.col("log_odds"), F.lit(0.0)).cast("decimal(38,12)"))
            .cast("double")
            .alias("tok_sum")
        )
    )
    return sums.crossJoin(prior).select(
        "id",
        (F.col("prior") + F.coalesce(F.col("tok_sum"), F.lit(0.0))).alias("score"),
        ((F.col("prior") + F.coalesce(F.col("tok_sum"), F.lit(0.0))) > 0).alias(
            "predicted"
        ),
    )
