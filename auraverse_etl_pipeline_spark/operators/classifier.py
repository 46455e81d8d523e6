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

#: 2^40 — power-of-two fixed point for every oracle-gated sum of
#: COMPUTED doubles (model weights, sigmoid residuals) in the logistic
#: tier. ``floor(v * 2^40)`` is deterministic in both engines (the
#: multiply is an exact exponent shift, floor has no rounding mode),
#: the DECIMAL(38,0) sum is exact, and the single final division by
#: 2^40 is an exact scale — so no per-row double→DECIMAL(38,12) cast
#: (Spark HALF_UP on the shortest repr vs DuckDB HALF_EVEN on the
#: binary expansion — divergent on computed values, see CLAUDE.md) is
#: ever exercised. Same discipline as ``_LLOYD_FIXED_POINT``
#: (operators/similarity.py) and the char-entropy query.
LOGREG_FIXED_POINT = 1099511627776.0


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


@pandas_udf(DoubleType())
def _sigmoid(s: pd.Series) -> pd.Series:
    # math.exp (Python libm) matches DuckDB's exp bit-for-bit; numpy's
    # vectorized exp does NOT (SIMD polynomial, ~24% of inputs differ
    # in the last ulp — measured). Same discipline as _ln.
    return s.map(lambda v: 1.0 / (1.0 + math.exp(-v)))


def logreg_features(
    df: DataFrame,
    num_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed set-of-words features for the logistic tier: one
    ``(id, bucket, x = 1.0)`` PRESENCE row per document × distinct
    bucket, plus one BIAS row ``(id, -1, 1.0)`` per document so the
    intercept trains and scores through exactly the same joins as
    every other feature. Binary presence (not counts, not L1 shares)
    keeps every feature on the bias's scale, which is what lets
    full-batch gradient descent move all weights at one learning rate
    — L1-normalized counts put token features at 1/doc_length of the
    bias's gradient and need thousands of steps (measured: the
    separable marker fixture stayed at base-rate accuracy). Corpus-
    sized fixed-width rows; the bucket hash is the engine-portable
    md5 prefix."""
    from auraverse_etl_pipeline_spark.functions.text import tokens

    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    feats = (
        toks.select("id", F.explode_outer("toks").alias("tok"))
        .select("id", token_bucket(F.col("tok"), num_buckets).alias("bucket"))
        .distinct()
        .withColumn("x", F.lit(1.0))
    )
    bias = toks.select(
        "id", F.lit(PRIOR_BUCKET).cast("bigint").alias("bucket"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(bias)


def logreg_train(
    df: DataFrame,
    label_col: str | Column,
    positive,
    num_buckets: int = 1024,
    lr: float = 1.0,
    iters: int = 2,
    decay: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary logistic regression over hashed bag-of-words features,
    trained by ``iters`` full-batch gradient-descent steps from w = 0 —
    the fasttext-shaped quality classifier (DCLM / FineWeb-Edu's gate
    is exactly this: a cheap linear scorer over hashed n-gram
    features) trained INSIDE the engine, deterministically.

    Per step: ``s = X·w`` (a SHUFFLE-FREE map stage — each document's
    sorted bucket array folds against a map-literal model, each weight
    quantized at ``floor(w·2^40)`` and accumulated as an exact
    DECIMAL(38,0) sum with ONE division at the end, which equals the
    shuffled partial-sum spelling digit-for-digit because integer
    decimal addition is exact hence associative), ``p = σ(s)``
    (Arrow-batched Python-libm sigmoid — bit-identical to DuckDB's
    exp), ``∇_b = Σ (p − y)·x_b`` (one fixed-width per-bucket
    aggregate with the same fixed-point partials, the step's ONLY
    shuffle), ``w ← w − lr_t·∇/n``. The ``LOGREG_FIXED_POINT``
    quantization replaces per-row double→DECIMAL(38,12) casts of
    computed values, whose HALF_UP/HALF_EVEN rounding diverges
    between engines (ADVICE r9). Only the MODEL-sized
    gradient (≤ num_buckets+1 rows) is collected per step (the
    Lloyd/BPE driver-loop discipline — MLlib's own LBFGS does the
    same treeAggregate-to-driver). With w₀ = 0 the first step's p is
    exactly 0.5, so the whole training replays digit-for-digit in a
    SQL oracle via unrolled iteration CTEs.

    ``decay=True`` uses the Robbins–Monro 1/t schedule
    ``lr_t = lr / t`` — constant-lr full-batch GD on presence
    features oscillates near the optimum (measured: lr=8 needs 8
    steps to reach training accuracy 1.0 on the separable marker
    fixture; lr=8/t gets there in 4), and each saved step is a whole
    serial corpus pass. The per-step rate is a pure literal, so the
    schedule is oracle-portable.

    Returns ``(bucket, w)`` with the intercept at ``bucket = -1`` —
    the same broadcastable weights-table contract as the NB model, so
    external weights drop into :func:`logreg_score` unchanged."""
    ship_package(df.sparkSession)
    spark = df.sparkSession
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    from auraverse_etl_pipeline_spark.functions.text import tokens

    # Per-DOC feature arrays instead of exploded (id, bucket) rows: the
    # per-step score is then a pure MAP stage — an exact fixed-point
    # DECIMAL(38,0) fold over the doc's sorted bucket array against a
    # map-literal model (integer addition is exact hence associative,
    # so the fold equals the shuffled partial-sum spelling
    # digit-for-digit) — and the only shuffle per step is the
    # model-sized gradient aggregate.
    # The join-based spelling paid three shuffle stages per step
    # (measured: the 4-step sf0.1 query dropped 11.7s → 8.2s
    # like-for-like after this rewrite).
    xd = (
        df.select(
            F.col(id_col).alias("id"),
            (lab == F.lit(positive)).cast("double").alias("y"),
            tokens(text_col).alias("toks"),
        )
        .select(
            "id",
            "y",
            F.concat(
                F.array(F.lit(PRIOR_BUCKET).cast("bigint")),
                F.array_sort(
                    F.array_distinct(
                        F.transform(
                            "toks", lambda t: token_bucket(t, num_buckets)
                        )
                    )
                ),
            ).alias("bs"),
        )
        .cache()
    )
    n_docs = df.count()
    fx = F.lit(LOGREG_FIXED_POINT)
    dzero = F.lit(0).cast("decimal(38,0)")

    def weights_map(wmap: dict[int, float]):
        items = []
        for b, wv in sorted(wmap.items()) or [(PRIOR_BUCKET, 0.0)]:
            items += [F.lit(int(b)).cast("bigint"), F.lit(float(wv))]
        return F.create_map(*items)

    wmap: dict[int, float] = {}
    for t in range(1, iters + 1):
        step_lr = lr / t if decay else lr
        wm = weights_map(wmap)
        s = (
            F.aggregate(
                F.col("bs"),
                dzero,
                lambda acc, b: (
                    acc
                    + F.floor(
                        F.coalesce(F.element_at(wm, b), F.lit(0.0)) * fx
                    ).cast("decimal(38,0)")
                ).cast("decimal(38,0)"),
            ).cast("double")
            / fx
        )
        g = (
            xd.select("bs", "y", _sigmoid(s).alias("p"))
            .select(F.explode("bs").alias("bucket"), (F.col("p") - F.col("y")).alias("d"))
            .groupBy("bucket")
            .agg(
                (
                    F.sum(F.floor(F.col("d") * fx).cast("decimal(38,0)")).cast("double")
                    / fx
                ).alias("g")
            )
        )
        for r in g.collect():
            b, gd = int(r["bucket"]), float(r["g"])
            wmap[b] = wmap.get(b, 0.0) - step_lr * (gd / n_docs)
    xd.unpersist()
    return spark.createDataFrame(sorted(wmap.items()), "bucket bigint, w double")


def logreg_score(
    df: DataFrame,
    model: DataFrame,
    num_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a ``(bucket, w)`` logistic model:
    ``(id, score, prob, predicted)`` with ``score = X·w`` (bias row
    included via the bucket −1 feature), ``prob = σ(score)`` and
    ``predicted = score > 0``. Same scale shape as :func:`nb_score`:
    model broadcast, one corpus explode, fixed-point DECIMAL(38,0)
    per-doc sums (``LOGREG_FIXED_POINT`` — weights are computed
    doubles, so no per-row DECIMAL(38,12) cast), one Arrow-batched
    sigmoid over the per-doc scalar."""
    ship_package(df.sparkSession)
    fx = F.lit(LOGREG_FIXED_POINT)
    x = logreg_features(df, num_buckets, text_col, id_col)
    s = (
        x.join(F.broadcast(model), "bucket", "left")
        .groupBy("id")
        .agg(
            (
                F.sum(
                    F.floor(
                        (F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))) * fx
                    ).cast("decimal(38,0)")
                ).cast("double")
                / fx
            ).alias("score")
        )
    )
    return s.select(
        "id",
        "score",
        _sigmoid("score").alias("prob"),
        (F.col("score") > 0).alias("predicted"),
    )
