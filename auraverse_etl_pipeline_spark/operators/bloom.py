"""Distributed register-blocked Bloom filter for corpus-scale membership.

Why this exists next to :func:`operators.dedup.decontaminate`: the
broadcast variant ships the eval corpus's DISTINCT SHINGLE SET to every
executor — perfect while benchmarks are KBs, impossible once the
blocklist is itself large (n-gram decontamination against a 100M-key
held-out suite, URL blocklists, previously-trained-corpus fingerprints:
tens of GB as strings). A Bloom filter compresses the same membership
question to ~1.2 GB per 10⁹ keys at 1% FPR, with zero false negatives —
so the 100 TB side is still filtered with a broadcast-sized structure,
and the (tiny) false-positive candidate set is re-checked exactly.

BLOCKED layout (the round-5 rewrite of the classic k-probe layout):
each key selects ONE 63-bit word by its block hash, and all
``num_hashes`` bits land inside that word — the cache-blocked Bloom
filter of Putze/Sanders/Singler. On the 100 TB probe side this is the
difference between ``k`` exploded rows per shingle plus a per-shingle
``bool_and`` shuffle, and ONE fixed-width row per shingle with a single
``(bits & mask) = mask`` comparison — a whole shuffle stage gone
(measured: the probe stage collapses from k×|shingles| to |shingles|
rows). The price is a modestly worse FPR at equal size (bits
concentrate in one word; the standard result is ~1.3–2× the flat-array
FPR at these parameters), which ``verify=True`` makes irrelevant for
exactness — the filter only decides who pays for verification.

Engine-portable by construction: the block index and in-word bit
positions come from md5 prefixes (``('0x' || substr(md5(key || ':' ||
i), 1, 15))::BIGINT``), words hold 63 usable bits (bit 63 never set —
DuckDB raises on ``1::BIGINT << 63``, and staying positive keeps both
engines' arithmetic identical), the in-word mask is the sum of DISTINCT
powers of two (= their bitwise OR, spelled identically on both sides),
and the filter itself is an ordinary DataFrame ``(word BIGINT, bits
BIGINT)`` — persistable to parquet and mergeable with ``bit_or`` like
any other incremental index.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


#: Domain-blocklist filter sizing, shared by the blocklist query tier
#: (``corpus_domain_blocklist`` / ``stream_domain_gate``) and the crawl
#: funnel's gate stage — ONE definition so the false-positive-probe
#: workload can't silently drift between the documented tier and the
#: funnel (flagged domains are exact-verified either way).
BLOCKLIST_NUM_BITS = 63 * 16
BLOCKLIST_NUM_HASHES = 5


def bloom_parameters(expected_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Bloom sizing: bits = -n·ln p / ln²2 (rounded up to a multiple
    of 63 so every block is a full word), hashes = (bits/n)·ln 2,
    capped at 8 (past that, extra in-block probes stop helping a
    63-bit block). The blocked layout's true FPR at these parameters
    runs ~1.3–2× the flat-array formula — acceptable for a
    candidate-generation filter whose hits are exactly verified."""
    n = max(expected_keys, 1)
    num_bits = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    num_bits = ((num_bits + 62) // 63) * 63
    num_hashes = min(8, max(1, round(num_bits / n * math.log(2))))
    return num_bits, num_hashes


def _block_word(key: Column, num_words: int) -> Column:
    """The key's block: word index in [0, num_words) from the i=0
    hash. DuckDB twin: ``('0x' || substr(md5(key || ':0'), 1, 15))::
    BIGINT % num_words``."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", key, F.lit(0))), 1, 15), 16, 10)
    return h.cast("bigint") % F.lit(num_words)


def _block_mask(key: Column, num_hashes: int) -> Column:
    """The key's in-word mask: bits ``md5(key:i) % 63`` for i in
    1..num_hashes, OR-ed as a sum of DISTINCT powers of two — the
    exact spelling DuckDB replays with
    ``list_sum(list_distinct(list_transform(range(1, k+1), ...)))``."""
    # 2^b via pow (exact in double for b <= 62) — pyspark's shiftleft
    # only takes a literal shift amount, and the mask must be one
    # expression so the probe stays a single row per key
    powers = F.array(
        *[
            F.pow(
                F.lit(2.0),
                (
                    F.conv(
                        F.substring(F.md5(F.concat_ws(":", key, F.lit(i))), 1, 15),
                        16,
                        10,
                    ).cast("bigint")
                    % 63
                ).cast("double"),
            ).cast("bigint")
            for i in range(1, num_hashes + 1)
        ]
    )
    return F.aggregate(
        F.array_distinct(powers), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """Build the filter: ``(word BIGINT, bits BIGINT)``, one row per
    63-bit word with at least one bit set.

    Scale shape: ONE fixed-width (word, mask) row per key — no explode
    (the key never leaves the map side after hashing) — then one
    partial-aggregated ``bit_or`` shuffle on the word id; output at
    most ``num_bits / 63`` rows regardless of key count. Persist to
    parquet for reuse; union two builds and re-``bit_or`` to merge
    filters."""
    num_words = num_bits // 63
    k = keys.select(F.col(key_col).alias("k"))
    return (
        k.select(
            _block_word(F.col("k"), num_words).alias("word"),
            _block_mask(F.col("k"), num_hashes).alias("m"),
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
    ``df[key_col]`` is set in its block word (possible member —
    subject to the FPR), False otherwise (DEFINITELY absent).

    Probes the distinct keys — one fixed-width row each, map-side
    joined against the broadcast filter, a single ``(bits & mask) =
    mask`` comparison, no aggregation at all — and joins the verdict
    back, so duplicate keys in ``df`` cost one probe."""
    num_words = num_bits // 63
    keys = df.select(F.col(key_col).alias("k")).distinct()
    verdict = (
        keys.select(
            "k",
            _block_word(F.col("k"), num_words).alias("word"),
            _block_mask(F.col("k"), num_hashes).alias("m"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "k",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m"))
                == F.col("m")
            ).alias(out_col),
        )
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
    only requirement (note the doc-level FPR compounds over a
    document's shingle count).

    Scale shape: eval shingles hash into the filter (one ``bit_or``
    shuffle, output ≤ num_bits/63 rows); training shingles probe it
    map-side against the broadcast words — ONE fixed-width row per
    (doc, shingle), one ``(bits & mask) = mask`` comparison, then a
    single doc-level ``bool_or`` shuffle (raw text never shuffles);
    the exact verify join touches only flagged documents' shingles —
    at a ~1% shingle FPR that is ~1% of the corpus volume, not 100%."""
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
    num_words = num_bits // 63
    bloom = bloom_build(ev_sh, "shingle", num_bits, num_hashes)

    tr_sh = _shingle_table(train, n=n, text_col=text_col, id_col=id_col).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    flagged = (
        tr_sh.select(
            "doc_id",
            _block_word(F.col("shingle"), num_words).alias("word"),
            _block_mask(F.col("shingle"), num_hashes).alias("m"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m"))
                == F.col("m")
            ).alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.bool_or("hit").alias("doc_hit"))
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


def bloom_flag_report(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    fpp: float = 0.01,
    expected_keys: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row audit of a :func:`bloom_decontaminate` run: how many
    documents the filter flagged vs how many the exact re-check
    confirmed — the observability surface that quantifies exactly what
    ``verify=False`` would have over-dropped (the same role
    ``hot_buckets`` plays for the capped LSH tiers: a lossy knob gets
    an audit query, never silent behavior). Output: (n_train,
    n_flagged, n_confirmed, n_false_flagged, flag_precision).

    Cost: the same probe + verify joins the decontaminate run does —
    run it on a sample or alongside the real pass, not as a second
    full pass at 100 TB."""
    from auraverse_etl_pipeline_spark.operators.caching import release_after
    from auraverse_etl_pipeline_spark.operators.dedup import _shingle_table

    ev_sh = (
        _shingle_table(eval_docs, n=n, text_col=text_col, id_col=id_col)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
        .cache()
    )
    nk = expected_keys if expected_keys is not None else ev_sh.count()
    num_bits, num_hashes = bloom_parameters(nk, fpp)
    num_words = num_bits // 63
    bloom = bloom_build(ev_sh, "shingle", num_bits, num_hashes)
    tr_sh = _shingle_table(train, n=n, text_col=text_col, id_col=id_col).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    flagged = (
        tr_sh.select(
            "doc_id",
            _block_word(F.col("shingle"), num_words).alias("word"),
            _block_mask(F.col("shingle"), num_hashes).alias("m"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m"))
                == F.col("m")
            ).alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.bool_or("hit").alias("doc_hit"))
        .filter("doc_hit")
        .select("doc_id")
        .cache()
    )
    confirmed = tr_sh.join(flagged, "doc_id").join(ev_sh, "shingle").select("doc_id").distinct()
    n_train = train.select(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    n_fl = flagged.select(F.count(F.lit(1)).cast("bigint").alias("n_flagged"))
    n_cf = confirmed.select(F.count(F.lit(1)).cast("bigint").alias("n_confirmed"))
    result = (
        n_train.crossJoin(n_fl)
        .crossJoin(n_cf)
        .select(
            "n_train",
            "n_flagged",
            "n_confirmed",
            (F.col("n_flagged") - F.col("n_confirmed")).alias("n_false_flagged"),
            F.when(F.col("n_flagged") > 0, F.col("n_confirmed") / F.col("n_flagged"))
            .otherwise(F.lit(1.0))
            .alias("flag_precision"),
        )
    )
    return release_after(result, ev_sh, flagged)
