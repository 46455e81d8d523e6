"""Deterministic sampling operators for training-data mixing.

``mix_weighted_sample`` (plans/llm_queries.py) draws at a RATE per
stratum — the right tool when the mixture is specified as proportions
and the output size can float. :func:`stratified_exact_sample` here
draws an EXACT per-stratum quota — the tool when a data card promises
"30k documents per language" and the count must be exact, reproducible,
and stable under re-runs.

Determinism: rows are ranked inside each stratum by a Knuth
multiplicative hash of the id (then the id itself as tie-break), so the
sample is a pure function of the data — no RNG state, identical under
task retry at any parallelism, and adding new documents only perturbs
the selection near quota boundaries instead of reshuffling everything.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: Knuth's multiplicative hash constant (2^32 / phi) — same generator
#: as mix_weighted_sample so the two samplers agree on ordering.
_KNUTH = 2654435761
_HASH_MOD = 1_000_000_007


def sample_hash(id_col: str | F.Column = "doc_id", string_ids: bool = False) -> F.Column:
    """The deterministic per-row sort key both samplers rank by.

    Numeric ids multiply straight into the Knuth generator. String ids
    (``string_ids=True``) first collapse to a 60-bit integer via an
    md5 prefix — chosen over ``xxhash64`` because DuckDB replays it
    digit-for-digit (``('0x' || substr(md5(id),1,15))::BIGINT``), so
    string-keyed samples stay oracle-gated — then reduce mod the prime
    before the multiply so the product stays inside BIGINT."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if string_ids:
        bucket = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint") % F.lit(_HASH_MOD)
        return (bucket * F.lit(_KNUTH)) % F.lit(_HASH_MOD)
    return (c.cast("bigint") * F.lit(_KNUTH)) % F.lit(_HASH_MOD)


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``quotas[stratum]`` rows per stratum (``default_quota``
    for strata not in the map; a stratum smaller than its quota yields
    all of its rows). Output: the sampled rows plus ``sample_rank``
    (1-based rank within the stratum).

    Scale shape: one hash-partition shuffle on the stratum key, then a
    bounded per-stratum top-k — Spark's window TopK pushes the rank
    filter into the sort, so per-partition state is O(quota), not
    O(stratum). A skewed stratum (one language dominating a web crawl)
    concentrates its sort on one partition; when quota ≪ stratum, the
    scalable refinement is a pre-filter on the same hash (keep buckets
    below ~2× the expected quota rate) before the exact window — the
    hash is uniform, so the pre-filter keeps every final winner with
    overwhelming probability and the window then sees only a sliver.
    That refinement changes no results, so it is left to the caller's
    scale; the operator itself stays exact."""
    id_type = dict(df.dtypes).get(id_col)
    if id_type is None:
        raise ValueError(f"id column {id_col!r} not in {df.columns}")
    numeric = id_type in {"tinyint", "smallint", "int", "bigint"} or id_type.startswith("decimal")
    if not numeric and id_type != "string":
        raise TypeError(
            f"id column {id_col!r} has type {id_type}; sample_hash needs an "
            "integer/decimal or string id (a float id would round-trip lossily)"
        )
    rk = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            sample_hash(id_col, string_ids=not numeric), F.col(id_col)
        )
    )
    quota = F.lit(default_quota)
    for stratum, k in quotas.items():
        quota = F.when(F.col(strata_col) == stratum, F.lit(k)).otherwise(quota)
    return (
        df.withColumn("sample_rank", rk)
        .filter(F.col("sample_rank") <= quota)
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    centroids: DataFrame,
    per_cell: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic-coverage subsampling: assign every vector to its
    nearest centroid (:func:`operators.similarity.ivf_assign` — no
    quantizer refit, centroids broadcast) and keep an exact per-cell
    quota via the deterministic Knuth ranking — so the sample spans
    the embedding space's regions instead of letting the head cluster
    swamp it (the anti-mode-collapse draw a curated pretraining mix
    wants). Output: (id, cell, centroid_cos, sample_rank).

    Scale shape: ivf_assign's one fixed-width row per vector into the
    argmax aggregate, then one hash-partition shuffle on the cell with
    O(per_cell) window state per cell. Deterministic end to end: same
    centroids + same ids ⇒ same sample under any parallelism."""
    from auraverse_etl_pipeline_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col).select(
        "id", "cell", "centroid_cos"
    )
    return stratified_exact_sample(
        assigned, "cell", {}, default_quota=per_cell, id_col="id"
    )


def token_budget_plan(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The data-card math of a pretraining mixture: given per-stratum
    target WEIGHTS and a total token budget, report what each stratum
    must contribute against what it has. Output per stratum:
    (stratum, n_docs, available_tokens, weight, target_tokens, epochs,
    sample_fraction) where ``epochs`` > 1 means the stratum repeats to
    meet its target (the up-sampling a small high-quality source gets)
    and ``sample_fraction`` = min(1, epochs) is the rate a downstream
    :func:`mix`-style sampler should draw at. Strata absent from
    ``weights`` get weight 0 (excluded from the mix, still reported).

    One aggregation pass over the corpus; weights normalize to 1 so
    callers can pass unnormalized relative weights."""
    from auraverse_etl_pipeline_spark.functions.text import token_count

    wsum = float(sum(weights.values())) or 1.0
    w = F.lit(0.0)
    for stratum, wt in weights.items():
        w = F.when(F.col("stratum") == stratum, F.lit(wt / wsum)).otherwise(w)
    return (
        df.select(F.col(strata_col).alias("stratum"), token_count(text_col).alias("t"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("t").cast("bigint").alias("available_tokens"),
        )
        .select(
            "stratum",
            "n_docs",
            "available_tokens",
            w.alias("weight"),
            (w * F.lit(float(total_tokens))).alias("target_tokens"),
            (w * F.lit(float(total_tokens)) / F.col("available_tokens")).alias("epochs"),
            F.least(
                F.lit(1.0),
                w * F.lit(float(total_tokens)) / F.col("available_tokens"),
            ).alias("sample_fraction"),
        )
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_bins: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum ordering for training: bin documents by a difficulty
    score (ascending — bin 1 is easiest) and give each bin a
    deterministic Knuth-shuffled serving order. Output: the input rows
    plus (bin, bin_rank); consumers emit training order by
    ``ORDER BY bin, bin_rank``.

    Bins are VALUE-deterministic, not row-split: the b-th threshold is
    the exact ``percentile_disc(b/n_bins)`` of the score (computed from
    one cumulative histogram over DISTINCT score values — never a
    global sort of the data), and a document's bin is the first
    threshold at or above its score. Equal scores therefore always
    share a bin — reproducible under any parallelism, unlike
    ``ntile``'s arbitrary tie splitting. Intra-bin order is the same
    RNG-free Knuth hash as every sampler here, so the curriculum is a
    pure function of the data.

    Scale shape: one partial-aggregated histogram shuffle + a window
    over its distinct values, thresholds carried as ONE broadcast
    n_bins-element array row, one bin-partitioned ranking window —
    the corpus itself is never globally sorted."""
    hist = df.groupBy(F.col(score_col).alias("_s")).agg(F.count(F.lit(1)).alias("_c")).cache()
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    nrow = hist.agg(F.sum("_c").alias("_n"))
    rungs = cum.crossJoin(F.broadcast(nrow)).agg(
        *[
            F.min(
                F.when(
                    F.col("_cum") >= F.ceil(F.lit(b / n_bins) * F.col("_n")), F.col("_s")
                )
            ).alias(f"_t{b}")
            for b in range(1, n_bins + 1)
        ]
    ).select(F.array(*[f"_t{b}" for b in range(1, n_bins + 1)]).alias("_thresholds"))
    binned = df.crossJoin(F.broadcast(rungs)).withColumn(
        "bin",
        (
            1
            + F.size(F.filter("_thresholds", lambda t: t < F.col(score_col)))
        ).cast("int"),
    ).drop("_thresholds")
    rk = F.row_number().over(
        Window.partitionBy("bin").orderBy(sample_hash(id_col), F.col(id_col))
    )
    from auraverse_etl_pipeline_spark.operators.caching import release_after

    return release_after(binned.withColumn("bin_rank", rk.cast("bigint")), hist)


def length_bucket_plan(
    df: DataFrame,
    text_col: str = "text",
    max_bucket: int = 1 << 20,
) -> DataFrame:
    """Length-bucketed batching plan: assign every document to the
    smallest power-of-two bucket holding its token count and report,
    per bucket, the padding economics a training dataloader will pay —
    ``(bucket, n_docs, total_tokens, padded_tokens, waste_ratio)``
    where ``padded_tokens = n_docs · bucket`` (every sequence in a
    bucket pads to the bucket length) and ``waste_ratio`` is the
    fraction of padded positions that are padding.

    Bucketing by length is how real dataloaders cut padding waste
    without packing; this report is the measurement that chooses
    between bucketing and :func:`~auraverse_etl_pipeline_spark
    .operators.quality` sequence packing (which trades shuffle cost
    for zero waste).

    Engine-exactness: the bucket is 2^bit_length(n-1) computed via the
    BINARY-STRING length (``conv``/``bin``) — no ``log2``, whose
    last-ulp behavior on exact powers differs across libms; 2^k stays
    exact in a double through 2^62 (the shiftleft rule), cast back to
    BIGINT. One token-count scan, one vocabulary-of-buckets aggregate
    (≤ ~20 distinct buckets), everything map-side combined."""
    from auraverse_etl_pipeline_spark.functions.text import token_count

    n = token_count(text_col)
    bucket = (
        F.when(n <= 1, F.lit(1).cast("bigint"))
        .otherwise(
            F.pow(F.lit(2.0), F.length(F.conv((n - 1).cast("string"), 10, 2)))
            .cast("bigint")
        )
        .alias("bucket")
    )
    per_doc = df.select(bucket, n.alias("toks"))
    agg = per_doc.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
    )
    return (
        agg.filter(F.col("bucket") <= max_bucket)
        .select(
            "bucket",
            "n_docs",
            "total_tokens",
            (F.col("n_docs") * F.col("bucket")).cast("bigint").alias("padded_tokens"),
            (
                (F.col("n_docs") * F.col("bucket") - F.col("total_tokens")).cast("double")
                / (F.col("n_docs") * F.col("bucket")).cast("double")
            ).alias("waste_ratio"),
        )
    )


def dsir_importance(
    df: DataFrame,
    target: DataFrame,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): estimate hashed-unigram bag-of-buckets distributions for a
    small TARGET domain sample and the raw corpus, and score every raw
    document with its log importance weight

        ``log_weight(d) = Σ_tokens [ ln p̂_target(bucket) − ln p̂_raw(bucket) ]``

    (add-α smoothed over ``num_buckets`` md5-hash buckets — the same
    feature hash as ``operators/classifier.py``, so DuckDB replays
    it). High weight ⇒ the document looks like the target domain
    relative to the raw pool; selecting by weight shifts the corpus
    mixture toward the target without a trained classifier.

    Output: ``(id, n_tokens, log_weight)``. Selection policy is the
    caller's (top-k for the deterministic variant — the DSIR paper's
    Gumbel resampling adds per-doc noise, which an engine-reproducible
    pipeline replaces with the hash-rank discipline used across this
    module).

    Scale shape: the 100 TB raw side is scanned twice — once to count
    buckets (one fixed-width partial-aggregated shuffle into a
    ≤num_buckets-row table), once to score (broadcast λ-table join +
    one DECIMAL-partial hash aggregate per document); the target side
    is small by definition. Both count tables are cached (each feeds
    the totals aggregate AND the λ join) and paired-released. Logs run
    in the Arrow-batched libm ``_ln`` over the λ table only, never the
    corpus (the Math.log-vs-ln parity rule)."""
    from auraverse_etl_pipeline_spark.functions.text import tokens
    from auraverse_etl_pipeline_spark.operators.caching import release_after
    from auraverse_etl_pipeline_spark.operators.classifier import _ln, token_bucket
    from auraverse_etl_pipeline_spark.runtime import ship_package

    ship_package(df.sparkSession)  # _ln is pickled by reference

    def bucketize(frame: DataFrame) -> DataFrame:
        return frame.select(F.explode(tokens(text_col)).alias("tok")).select(
            token_bucket(F.col("tok"), num_buckets).alias("bucket")
        )

    rc = (
        bucketize(df)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("raw_n"))
        .cache()
    )
    tc = (
        bucketize(target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tgt_n"))
        .cache()
    )
    totals = rc.agg(F.sum("raw_n").cast("bigint").alias("raw_tot")).crossJoin(
        tc.agg(F.coalesce(F.sum("tgt_n"), F.lit(0)).cast("bigint").alias("tgt_tot"))
    )
    a = float(alpha)
    denom = a * num_buckets
    # every corpus bucket appears in rc, so a left join from rc covers
    # the whole scoring domain; target-only buckets never score
    lam = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                _ln(
                    (F.coalesce(F.col("tgt_n"), F.lit(0)) + F.lit(a))
                    / (F.col("tgt_tot") + F.lit(denom))
                )
                - _ln((F.col("raw_n") + F.lit(a)) / (F.col("raw_tot") + F.lit(denom)))
            ).alias("lam"),
        )
    )
    inst = df.select(
        F.col(id_col).alias("id"), F.explode_outer(tokens(text_col)).alias("tok")
    ).select("id", token_bucket(F.col("tok"), num_buckets).alias("bucket"))
    out = (
        inst.join(F.broadcast(lam), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count("lam").cast("bigint").alias("n_tokens"),
            F.when(
                F.count("lam") > 0,
                F.sum(F.col("lam").cast("decimal(38,12)")).cast("double"),
            ).alias("log_weight"),
        )
    )
    return release_after(out, rc, tc)


def temperature_mixture(
    docs: DataFrame,
    alpha: float = 0.7,
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual sampling
    standard (mBERT/XLM-R/mT5: raise each stratum's share to α < 1 and
    renormalize, boosting low-resource strata without drowning the
    head): ``(stratum, n_docs, available_tokens, raw_share,
    temp_share, boost)`` with ``temp_share ∝ raw_share^α`` and
    ``boost = temp_share / raw_share`` (the per-doc up/down-sampling
    factor a sampler applies).

    Engine parity: ``pow`` runs in an Arrow-batched pandas_udf with
    Python-libm ``math.pow`` — bit-identical to DuckDB's pow (probed
    0/60k mismatches across three exponents; the same discipline as
    ``_ln``/``_sigmoid``) — over the STRATUM-sized table only; the
    renormalization denominator is the ``floor(w·2^40)`` fixed-point
    sum (order-independent, no double-sum partial-order hazard), and
    raw shares are single IEEE divisions of exact BIGINT token counts.
    One corpus scan; everything after is stratum-bounded."""
    import math

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from auraverse_etl_pipeline_spark.functions.text import token_count
    from auraverse_etl_pipeline_spark.runtime import ship_package

    ship_package(docs.sparkSession)

    @pandas_udf(DoubleType())
    def _pow_a(s: pd.Series) -> pd.Series:
        return s.map(lambda v: math.pow(v, alpha))

    strata = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(text_col)).cast("bigint").alias("available_tokens"),
    )
    tot = strata.agg(F.sum("available_tokens").cast("bigint").alias("tot"))
    shares = strata.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_docs",
        "available_tokens",
        (
            F.col("available_tokens").cast("double") / F.col("tot").cast("double")
        ).alias("raw_share"),
    )
    w = shares.withColumn("w", _pow_a(F.col("raw_share")))
    fx = F.lit(1099511627776.0)  # 2^40 — the classifier fixed point
    denom = w.agg(
        (F.sum(F.floor(F.col("w") * fx).cast("decimal(38,0)")).cast("double") / fx).alias("d")
    )
    return w.crossJoin(F.broadcast(denom)).select(
        "stratum",
        "n_docs",
        "available_tokens",
        "raw_share",
        (F.col("w") / F.col("d")).alias("temp_share"),
        ((F.col("w") / F.col("d")) / F.col("raw_share")).alias("boost"),
    )
