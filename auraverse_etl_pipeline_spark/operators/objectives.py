"""Training-objective data transforms — the last hop of an LLM data
pipeline, where curated text becomes MODEL INPUTS: T5-style span
corruption (masked-span denoising) and FIM (fill-in-middle, the code-
model objective). Both are usually done with an RNG at batch time;
here they are DETERMINISTIC functions of (doc_id, position) via md5 —
the same engine-reproducibility contract as the sampling/mixture tier
(mix_weighted_sample's Knuth hash), so the exact same corruption
replays in any engine, any partitioning, any run.

Span corruption uses BLOCKED span placement: instead of "sample k
random non-overlapping spans" (whose rejection/overlap resolution is a
SEQUENTIAL per-document scan — hostile at 100 TB), the token stream is
cut into ``span_every``-sized blocks and each block masks ONE span of
``span_len`` tokens at an md5-derived offset. Non-overlap holds BY
CONSTRUCTION, every position's mask flag is a pure function of
(doc_id, block), and the corruption rate is exactly
``span_len / span_every`` — the T5 defaults (15 % at mean span 3)
map to span_len=3, span_every=20.

Scale shape: one token explode into fixed-width (id, pos, tok) rows,
all flags codegen'd column algebra, one per-doc ordered re-assembly
aggregate. No Python, no shuffle beyond the per-doc aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _md5_mod(key: Column, mod: Column) -> Column:
    """Deterministic [0, mod) draw: leading-60-bit md5 as BIGINT, then
    %. Engine-portable (DuckDB: ('0x' || substr(md5(k),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint") % mod


def span_corruption(
    docs: DataFrame,
    span_len: int = 3,
    span_every: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T5-style masked-span denoising pairs, deterministically:
    ``(id, n_tokens, n_spans, n_masked, inputs_md5, targets_md5)``.

    Each complete ``span_every``-token block masks ``span_len``
    consecutive tokens at offset ``md5(id:block) % (span_every −
    span_len + 1)``; the INPUT stream replaces each masked span with
    its sentinel ``<extra_id_K>`` (K = block index), the TARGET stream
    is sentinel-prefixed masked spans in order — exactly the T5
    encoder/decoder pair. Documents shorter than one block pass
    through unmasked (n_spans = 0, targets empty). Digests are md5 of
    the space-joined streams so the driver value-hashes the whole
    construction."""
    from auraverse_etl_pipeline_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("id"), F.posexplode(tokens(text_col)).alias("pos0", "tok")
    ).filter(F.col("tok") != "")
    nt = toks.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    t = (
        toks.join(nt, "id")
        .select(
            "id",
            "n_tokens",
            (F.col("pos0") + 1).alias("pos"),
            "tok",
            F.expr(f"CAST(pos0 AS BIGINT) DIV {span_every}").alias("blk"),
        )
        # only COMPLETE blocks mask (the ragged tail stays clean) —
        # keeps the corruption rate exact and the oracle simple
        .withColumn(
            "blk_ok",
            (F.col("blk") + 1) * span_every <= F.col("n_tokens"),
        )
        .withColumn(
            "off",
            _md5_mod(
                F.concat(F.col("id").cast("string"), F.lit(":"), F.col("blk").cast("string")),
                F.lit(span_every - span_len + 1),
            ),
        )
        .withColumn(
            "in_span",
            F.col("blk_ok")
            & (F.col("pos") - 1 - F.col("blk") * span_every >= F.col("off"))
            & (F.col("pos") - 1 - F.col("blk") * span_every < F.col("off") + span_len),
        )
        .withColumn(
            "span_first",
            F.col("in_span")
            & (F.col("pos") - 1 - F.col("blk") * span_every == F.col("off")),
        )
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("blk").cast("string"), F.lit(">"))
    # input stream: unmasked tokens verbatim; the FIRST masked position
    # of each span contributes the sentinel; other masked drop.
    inp = t.filter(~F.col("in_span") | F.col("span_first")).select(
        "id",
        "pos",
        F.when(F.col("span_first"), sentinel).otherwise(F.col("tok")).alias("piece"),
    )
    # target stream: sentinel before each span's tokens.
    tgt = t.filter(F.col("in_span")).select(
        "id",
        (F.col("pos") * 2 + 1).alias("opos"),
        F.col("tok").alias("piece"),
    ).unionByName(
        t.filter(F.col("span_first")).select(
            "id", (F.col("pos") * 2).alias("opos"), sentinel.alias("piece")
        )
    )

    def digest(df: DataFrame, order_col: str) -> DataFrame:
        return df.groupBy("id").agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(order_col, "piece"))),
                        lambda s: s["piece"],
                    ),
                    " ",
                )
            ).alias("h")
        )

    spans = t.groupBy("id").agg(
        F.sum(F.when(F.col("span_first"), 1).otherwise(0)).cast("bigint").alias("n_spans"),
        F.sum(F.when(F.col("in_span"), 1).otherwise(0)).cast("bigint").alias("n_masked"),
    )
    return (
        nt.join(spans, "id")
        .join(digest(inp, "pos").withColumnRenamed("h", "inputs_md5"), "id")
        .join(digest(tgt, "opos").withColumnRenamed("h", "targets_md5"), "id", "left")
        .select(
            "id", "n_tokens", "n_spans", "n_masked",
            "inputs_md5",
            F.coalesce("targets_md5", F.lit("")).alias("targets_md5"),
        )
    )


def fim_transform(
    docs: DataFrame,
    min_tokens: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fill-in-middle (PSM) reordering, deterministically: ``(id,
    n_tokens, cut_a, cut_b, fim_md5)`` where two md5-derived cuts
    1 ≤ a < b ≤ n−1 split the token stream into prefix/middle/suffix
    and the emitted stream is ``<PRE> prefix <SUF> suffix <MID>
    middle`` — the code-model objective (Bavarian et al.), replayable
    in any engine. Documents under ``min_tokens`` pass through as
    ``<PRE> tokens`` with cut_a = cut_b = 0.

    Cuts: ``a = 1 + md5(id:a) % (n−2)``, ``b = 1 + md5(id:b) % (n−2)``
    with (min, max) ordering and b bumped by one when equal — so a <
    b always and every region is non-empty except possibly the middle
    (b = a+1 → single-token middle; equality bump guarantees ≥ 1)."""
    from auraverse_etl_pipeline_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("id"), F.posexplode(tokens(text_col)).alias("pos0", "tok")
    ).filter(F.col("tok") != "")
    nt = toks.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    cuts = nt.select(
        "id",
        "n_tokens",
        F.when(
            F.col("n_tokens") >= min_tokens,
            F.lit(1) + _md5_mod(F.concat(F.col("id").cast("string"), F.lit(":a")), F.col("n_tokens") - 2),
        ).otherwise(F.lit(0)).alias("ra"),
        F.when(
            F.col("n_tokens") >= min_tokens,
            F.lit(1) + _md5_mod(F.concat(F.col("id").cast("string"), F.lit(":b")), F.col("n_tokens") - 2),
        ).otherwise(F.lit(0)).alias("rb"),
    ).select(
        "id",
        "n_tokens",
        F.least("ra", "rb").alias("cut_a"),
        (
            F.greatest("ra", "rb")
            # equality bump only for REAL draws — ra = rb = 0 is the
            # short-doc passthrough and must keep cut_b = 0
            + F.when((F.col("ra") == F.col("rb")) & (F.col("ra") > 0), 1).otherwise(0)
        ).alias("cut_b"),
    )
    # region order key: prefix(0) < suffix(1) < middle(2); sentinels get
    # key (region, 0), tokens (region, pos) — one ordered re-assembly.
    j = toks.join(cuts, "id").select(
        "id",
        "n_tokens",
        "cut_a",
        "cut_b",
        (F.col("pos0") + 1).alias("pos"),
        "tok",
        F.when(F.col("cut_b") == 0, F.lit(0))
        .when(F.col("pos0") + 1 <= F.col("cut_a"), F.lit(0))
        .when(F.col("pos0") + 1 > F.col("cut_b"), F.lit(1))
        .otherwise(F.lit(2))
        .alias("region"),
    )
    pieces = j.select(
        "id",
        F.struct(
            F.col("region"),
            F.col("pos").cast("bigint").alias("k"),
            F.col("tok").alias("piece"),
        ).alias("s"),
    ).unionByName(
        cuts.select(
            "id",
            F.explode(
                F.when(
                    F.col("cut_b") > 0,
                    F.array(
                        F.struct(F.lit(0).alias("region"), F.lit(0).cast("bigint").alias("k"), F.lit("<PRE>").alias("piece")),
                        F.struct(F.lit(1).alias("region"), F.lit(0).cast("bigint").alias("k"), F.lit("<SUF>").alias("piece")),
                        F.struct(F.lit(2).alias("region"), F.lit(0).cast("bigint").alias("k"), F.lit("<MID>").alias("piece")),
                    ),
                ).otherwise(
                    F.array(
                        F.struct(F.lit(0).alias("region"), F.lit(0).cast("bigint").alias("k"), F.lit("<PRE>").alias("piece"))
                    )
                )
            ).alias("s"),
        )
    )
    dig = pieces.groupBy("id").agg(
        F.md5(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["piece"]),
                " ",
            )
        ).alias("fim_md5")
    )
    return cuts.join(dig, "id").select("id", "n_tokens", "cut_a", "cut_b", "fim_md5")
