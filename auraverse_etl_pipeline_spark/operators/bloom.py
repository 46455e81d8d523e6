"""Distributed Bloom filter for membership gating at corpus scale.

Why this exists next to :func:`operators.dedup.decontaminate`: the
broadcast variant ships the eval corpus's DISTINCT SHINGLE SET to every
executor — perfect while benchmarks are KBs, impossible once the
blocklist is itself large (n-gram decontamination against a 100M-key
held-out suite, URL blocklists, previously-trained-corpus fingerprints:
tens of GB as strings). A Bloom filter compresses the same membership
question to ~1.2 GB per 10⁹ keys at 1% FPR, with zero false negatives —
so the 100 TB side is still filtered with a broadcast-sized structure,
and the (tiny) false-positive candidate set is re-checked exactly.

Engine-portable by construction: bit positions come from md5 prefixes
(``('0x' || substr(md5(key || ':' || i), 1, 15))::BIGINT % num_bits``),
words hold 63 usable bits (bit 63 never set — DuckDB raises on
``1::BIGINT << 63``, and staying positive keeps both engines'
arithmetic identical), and the filter itself is an ordinary DataFrame
``(word BIGINT, bits BIGINT)`` — persistable to parquet and mergeable
with ``bit_or`` like any other incremental index.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bloom_parameters(expected_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: bits = -n·ln p / ln²2 (rounded up to a
    multiple of 63 so the last word is full), hashes = (bits/n)·ln 2."""
    n = max(expected_keys, 1)
    num_bits = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    num_bits = ((num_bits + 62) // 63) * 63
    num_hashes = max(1, round(num_bits / n * math.log(2)))
    return num_bits, num_hashes


def _bit_position(key: Column, i: Column, num_bits: int) -> Column:
    """The i-th hash of ``key`` as a bit index in [0, num_bits) — an
    md5-prefix integer, so DuckDB replays it digit-for-digit."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", key, i)), 1, 15), 16, 10)
    return h.cast("bigint") % F.lit(num_bits)


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """Build the filter: ``(word BIGINT, bits BIGINT)``, one row per
    63-bit word with at least one bit set.

    Scale shape: explode ``num_hashes`` rows per key (fixed-width — the
    key never leaves the map side after hashing), one partial-aggregated
    ``bit_or`` shuffle on the word id, output at most
    ``num_bits / 63`` rows regardless of key count. Persist to parquet
    for reuse; union two builds and re-``bit_or`` to merge filters."""
    pos = (
        keys.select(F.col(key_col).alias("k"))
        .select("k", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"))
        .select(_bit_position(F.col("k"), F.col("i"), num_bits).alias("p"))
    )
    return (
        pos.select(
            F.expr("p DIV 63").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: True when every hash bit of
    ``df[key_col]`` is set in ``bloom`` (possible member — subject to
    the FPR), False otherwise (DEFINITELY absent).

    Probes the distinct keys (``num_hashes`` fixed-width rows each,
    map-side joined against the broadcast filter, one ``bool_and``
    shuffle on the md5 of the key) and joins the verdict back, so
    duplicate keys in ``df`` cost one probe."""
    keys = df.select(F.col(key_col).alias("k")).distinct()
    probes = keys.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i")
    ).select("k", _bit_position(F.col("k"), F.col("i"), num_bits).alias("p")).select(
        "k",
        F.expr("p DIV 63").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("m"),
    )
    verdict = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select("k", ((F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m"))) != 0).alias("hit"))
        .groupBy("k")
        .agg(F.bool_and("hit").alias(out_col))
    )
    return df.join(verdict.withColumnRenamed("k", key_col), key_col, "left")


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    fpp: float = 0.01,
    expected_keys: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
) -> DataFrame:
    """Test-set decontamination through a Bloom filter: drop every
    training document sharing at least one word-``n``-gram with the
    evaluation corpus — same contract as
    :func:`operators.dedup.decontaminate`, different scale regime (see
    module docstring). With ``verify=True`` (default) flagged documents
    are re-checked against the exact eval shingle set, so the result is
    EXACTLY the broadcast variant's: the filter only decides who pays
    for verification. ``verify=False`` skips the re-check and
    over-drops at the document-level false-positive rate — acceptable
    when the blocklist is too large to join at all and recall is the
    only requirement.

    Scale shape: eval shingles hash into the filter (one ``bit_or``
    shuffle, output ≤ num_bits/63 rows); training shingles probe it
    map-side against the broadcast words; the per-(doc, shingle)
    ``bool_and`` and doc-level ``bool_or`` shuffle md5-hashed
    fixed-width rows (raw text never shuffles); the exact verify join
    touches only flagged documents' shingles — at a 1% shingle FPR
    that is ~1% of the corpus volume, not 100%."""
    from auraverse_etl_pipeline_spark.operators.caching import release_after
    from auraverse_etl_pipeline_spark.operators.dedup import _shingle_table

    # consumed up to three times (count, build, exact verify) — cache
    # the eval shingles (the SMALL side by contract), paired release
    ev_sh = (
        _shingle_table(eval_docs, n=n, text_col=text_col, id_col=id_col)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
        .cache()
    )
    nk = expected_keys if expected_keys is not None else ev_sh.count()
    num_bits, num_hashes = bloom_parameters(nk, fpp)
    bloom = bloom_build(ev_sh, "shingle", num_bits, num_hashes)

    tr_sh = _shingle_table(train, n=n, text_col=text_col, id_col=id_col).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    probes = tr_sh.select(
        "doc_id",
        F.md5("shingle").alias("sh_h"),
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
    ).select(
        "doc_id",
        "sh_h",
        _bit_position(F.col("shingle"), F.col("i"), num_bits).alias("p"),
    ).select(
        "doc_id",
        "sh_h",
        F.expr("p DIV 63").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("m"),
    )
    flagged = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            "doc_id",
            "sh_h",
            ((F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m"))) != 0).alias("hit"),
        )
        .groupBy("doc_id", "sh_h")
        .agg(F.bool_and("hit").alias("sh_hit"))
        .groupBy("doc_id")
        .agg(F.bool_or("sh_hit").alias("doc_hit"))
        .filter("doc_hit")
        .select("doc_id")
    )
    if not verify:
        return release_after(
            train.join(flagged.withColumnRenamed("doc_id", id_col), id_col, "left_anti"),
            ev_sh,
        )
    # exact re-check: only flagged documents' shingles meet the eval
    # set (no broadcast hint — the candidate side is small, AQE picks)
    cand_sh = tr_sh.join(flagged, "doc_id")
    confirmed = (
        cand_sh.join(ev_sh, "shingle").select("doc_id").distinct()
    )
    return release_after(
        train.join(confirmed.withColumnRenamed("doc_id", id_col), id_col, "left_anti"),
        ev_sh,
    )
