"""Corpus-statistics quality operators for training-data curation.

Two operators that score each document against statistics of the WHOLE
corpus (unlike the per-document Gopher rules in plans/llm_queries.py,
which need no second pass):

- :func:`rare_bigram_stats` — a count-based stand-in for language-model
  perplexity filtering: a document whose word bigrams are mostly
  singletons in the corpus is likely garbled (OCR noise, wordlists,
  base64 spill), while boilerplate scores near zero. The corpus bigram
  count table IS the language model; scoring is one equality join
  against it. Counts stay integers end-to-end, so the whole pipeline is
  reproducible in any engine (a log-prob spelling would hash-diverge on
  the last ulp of ``ln`` between engines — the ratio carries the same
  signal for a keep/drop gate).
- :func:`repeated_ngram_stats` — the intra-corpus repeated-substring
  signal motivating suffix-array dedup of training data: per document,
  how many of its n-gram instances occur in at least ``min_df``
  distinct documents. Span-level removal is the expensive follow-up;
  this per-document ratio is the cheap triage that decides which
  documents need it.

Scale shape (both): tokenize per-row (embarrassingly parallel), explode
to (doc_id, gram) and aggregate counts on ``md5(gram)`` — a fixed-width
32-char key, partial-aggregated map-side, so the shuffle carries hashes
and counts, never gram text (same discipline as line-level dedup,
``operators/dedup.py drop_boilerplate_lines``). The score join is
gram-hash equality; hot grams (stopword pairs) skew it, which is AQE's
skew-join case — deliberately no broadcast hint, since a web-corpus
model table is far past broadcast limits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _gram_instances(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, gram) — every n-gram INSTANCE per document (duplicates
    preserved: counting models need instance frequency, not the
    distinct shingle sets the dedup tiers use). JVM-side NGram, spread
    across cores first (small scans arrive as one split)."""
    from pyspark.ml.feature import NGram

    from auraverse_etl_pipeline_spark.functions.text import tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    ).repartition(par, "doc_id")
    ng = NGram(n=n, inputCol="_toks", outputCol="_ng").transform(base)
    return ng.select("doc_id", F.explode("_ng").alias("gram"))


def rare_bigram_stats(
    df: DataFrame,
    rare_threshold: int = 2,
    max_rare_ratio: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document rare-bigram statistics against the corpus bigram
    model: (doc_id, n_bigrams, n_rare, rare_ratio, keep) where a bigram
    is "rare" when its total corpus instance count is at most
    ``rare_threshold`` (a document's own occurrences included), and
    ``keep`` is ``rare_ratio <= max_rare_ratio``.

    Documents with fewer than two tokens have no bigrams and are absent
    from the output (they belong to a length gate, not a fluency one).
    """
    grams = _gram_instances(df, n=2, text_col=text_col, id_col=id_col)
    ex = grams.select("doc_id", F.md5("gram").alias("gh"))
    model = ex.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    scored = ex.join(model, "gh")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("cnt") <= rare_threshold, 1).otherwise(0)
            ).cast("bigint").alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_rare",
            (F.col("n_rare") / F.col("n_bigrams")).alias("rare_ratio"),
            (F.col("n_rare") / F.col("n_bigrams") <= F.lit(max_rare_ratio)).alias(
                "keep"
            ),
        )
    )


def repeated_ngram_stats(
    df: DataFrame,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repeated-n-gram statistics: (doc_id, n_grams,
    n_repeated, repeated_ratio) where an n-gram instance counts as
    repeated when that n-gram occurs in at least ``min_df`` DISTINCT
    documents. High ratios flag boilerplate-heavy or templated
    documents — the candidates for span-level substring dedup.

    The document-frequency aggregate is ``count_distinct(doc_id)`` per
    gram hash; at corpus scale that is the one genuinely heavy state
    here (distinct doc sets per gram), bounded because an 8-gram's df
    distribution is extremely head-light — and the shuffle still
    carries only (hash, doc_id) pairs, never text."""
    grams = _gram_instances(df, n=n, text_col=text_col, id_col=id_col)
    ex = grams.select("doc_id", F.md5("gram").alias("gh"))
    docfreq = ex.groupBy("gh").agg(F.count_distinct("doc_id").alias("gdf"))
    scored = ex.join(docfreq, "gh")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("gdf") >= min_df, 1).otherwise(0))
            .cast("bigint")
            .alias("n_repeated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_repeated",
            (F.col("n_repeated") / F.col("n_grams")).alias("repeated_ratio"),
        )
    )
