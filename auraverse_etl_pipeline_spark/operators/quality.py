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

Every operator here consumes the exploded (doc_id[, pos], hash) gram
table twice (model/df aggregate + membership join), so that table is
cached with the repo's paired ``release_caches()`` discipline
(``operators/caching.py``) — without the cache the tokenize+NGram
pipeline, the expensive part, runs once per consumer. The cache is a
``cache_grams``/``cache_tokens`` OPT-OUT: the exploded table scales
with the corpus TOKEN count, so at full 100 TB scale
MEMORY_AND_DISK would spill corpus-sized state — there, pass False
and pay the second tokenize scan (CPU, no executor storage) instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from auraverse_etl_pipeline_spark.operators.bloom import (
    BLOCKLIST_NUM_BITS,
    BLOCKLIST_NUM_HASHES,
)
from auraverse_etl_pipeline_spark.operators.caching import release_after


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
    cache_grams: bool = True,
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
    if cache_grams:
        ex = ex.cache()
    model = ex.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    scored = ex.join(model, "gh")
    result = (
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
    return release_after(result, *( [ex] if cache_grams else [] ))


#: Gopher rule constants — the ONE place the thresholds live. Batch
#: gate, streaming gate and curation funnel all build their keep
#: condition from these via :func:`gopher_metrics` / :func:`gopher_rules`,
#: and the DuckDB oracles splice the same numbers via
#: :func:`gopher_keep_sql` / :func:`gopher_fail_reason_sql`.
GOPHER_WORD_COUNT = (50, 100000)
GOPHER_MEAN_WORD_LEN = (3.0, 10.0)
GOPHER_MIN_STOPWORDS = 2


def gopher_metrics(text_col: str | Column) -> tuple[Column, Column, Column]:
    """The three Gopher metric Columns ``(n_words, mean_word_len,
    stopword_hits)`` for a text column — pure codegen'd expressions."""
    from auraverse_etl_pipeline_spark.functions.text import (
        LANG_STOPWORDS,
        avg_token_len,
        tokens,
    )

    en_stops = LANG_STOPWORDS[0][1]
    toks = tokens(text_col)
    n = F.size(toks).cast("bigint")
    stops = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in en_stops]))
    ).cast("bigint")
    return n, avg_token_len(text_col), stops


def gopher_rules(
    n_words: Column, mean_word_len: Column, stopword_hits: Column
) -> tuple[Column, Column, Column]:
    """Per-rule boolean Columns ``(word_count_ok, word_len_ok,
    stops_ok)`` over already-computed metric Columns."""
    return (
        n_words.between(*GOPHER_WORD_COUNT),
        mean_word_len.between(*GOPHER_MEAN_WORD_LEN),
        stopword_hits >= GOPHER_MIN_STOPWORDS,
    )


def gopher_keep_sql(
    n_words: str = "n_words", mean_word_len: str = "mean_word_len",
    stopword_hits: str = "stopword_hits",
) -> str:
    """The keep condition as an ANSI-SQL fragment with the same
    constants, for splicing into DuckDB oracles."""
    lo, hi = GOPHER_WORD_COUNT
    a, b = GOPHER_MEAN_WORD_LEN
    return (
        f"({n_words} BETWEEN {lo} AND {hi}) AND ({mean_word_len} BETWEEN {a:g} AND {b:g}) "
        f"AND {stopword_hits} >= {GOPHER_MIN_STOPWORDS}"
    )


def gopher_fail_reason_sql(
    n_words: str = "n_words", mean_word_len: str = "mean_word_len",
    stopword_hits: str = "stopword_hits",
) -> str:
    """The first-failing-rule CASE expression for DuckDB oracles."""
    lo, hi = GOPHER_WORD_COUNT
    a, b = GOPHER_MEAN_WORD_LEN
    return (
        f"CASE WHEN {n_words} < {lo} OR {n_words} > {hi} THEN 'word_count' "
        f"WHEN {mean_word_len} < {a:g} OR {mean_word_len} > {b:g} THEN 'word_length' "
        f"WHEN {stopword_hits} < {GOPHER_MIN_STOPWORDS} THEN 'stopwords' "
        "ELSE 'ok' END"
    )


def gopher_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-rules quality gate as a per-document DECISION: (doc_id,
    n_words, mean_word_len, stopword_hits, fail_reason, keep) with the
    first failing rule named. One spelling shared by the batch query
    (``text_gopher_filter``) and the streaming gate
    (``stream_quality_gate``) — a pure stateless projection, so it is
    legal on streaming DataFrames and costs one scan either way."""
    n, mwl, stops = gopher_metrics(text_col)
    m = df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_words"),
        mwl.alias("mean_word_len"),
        stops.alias("stopword_hits"),
    )
    word_count_ok, word_len_ok, stops_ok = gopher_rules(
        F.col("n_words"), F.col("mean_word_len"), F.col("stopword_hits")
    )
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stopword_hits",
        F.when(~word_count_ok, F.lit("word_count"))
        .when(~word_len_ok, F.lit("word_length"))
        .when(~stops_ok, F.lit("stopwords"))
        .otherwise(F.lit("ok"))
        .alias("fail_reason"),
        (word_count_ok & word_len_ok & stops_ok).alias("keep"),
    )


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_threshold: int = 2,
    max_rare_ratio: float = 0.5,
) -> DataFrame:
    """Whole-pipeline attrition report: run the corpus through the
    standard curation gate sequence and count survivors at every stage —
    the one-page answer to "where did my tokens go?" that every
    training-data pipeline publishes next to its dataset card.

    Stages (cumulative — a document must survive all earlier gates):

    1. ``exact_dedup``  — keep-first per ``md5(text)`` group;
    2. ``gopher``       — the Gopher quality rules (word count 50..100k,
       mean word length 3..10, ≥ 2 distinct common stopwords);
    3. ``lang_id``      — stopword-vote language ID resolves (≠ 'und');
    4. ``fluency``      — corpus rare-bigram ratio ≤ ``max_rare_ratio``
       (documents too short to have bigrams fail — they were already
       gone at the gopher stage).

    Output: (stage_id, stage, docs_in, docs_out, dropped), one row per
    stage, ``docs_in`` of stage k = ``docs_out`` of stage k-1.

    Scale shape: every per-document flag is a codegen'd column
    expression; the exact-dedup canonical flag aggregates (md5, doc_id)
    pairs — 40 bytes/row, text never shuffles — and joins back on the
    hash; fluency reuses :func:`rare_bigram_stats` (md5(bigram)
    shuffle). The final funnel is ONE single-row aggregate fanned out
    to stage rows, so the report itself is free."""
    from auraverse_etl_pipeline_spark.functions.text import lang_guess

    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    wc_ok, wl_ok, st_ok = gopher_rules(*gopher_metrics("text"))
    gopher = wc_ok & wl_ok & st_ok
    # consumed twice (canonical aggregate + join back) — cache the
    # fixed-width flag rows, never the text (paired release below)
    flags = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        gopher.alias("gopher"),
        (lang_guess("text") != "und").alias("lang_ok"),
    ).cache()
    canon = flags.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    fluent_stats = rare_bigram_stats(
        docs, rare_threshold=rare_threshold, max_rare_ratio=max_rare_ratio
    )
    fluent = fluent_stats.select("doc_id", F.col("keep").alias("fluent"))
    joined = (
        flags.join(canon, "h")
        .withColumn("canonical", F.col("doc_id") == F.col("keep_id"))
        .join(fluent, "doc_id", "left")
        .withColumn("fluent", F.coalesce("fluent", F.lit(False)))
    )

    def _n(cond) -> Column:
        return F.sum(cond.cast("int")).cast("bigint")

    c = F.col
    agg = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("c0"),
        _n(c("canonical")).alias("c1"),
        _n(c("canonical") & c("gopher")).alias("c2"),
        _n(c("canonical") & c("gopher") & c("lang_ok")).alias("c3"),
        _n(c("canonical") & c("gopher") & c("lang_ok") & c("fluent")).alias("c4"),
    )
    stage_names = ("exact_dedup", "gopher", "lang_id", "fluency")
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("bigint").alias("stage_id"),
                F.lit(name).alias("stage"),
                c(f"c{i}").alias("docs_in"),
                c(f"c{i + 1}").alias("docs_out"),
            )
            for i, name in enumerate(stage_names)
        ]
    )
    result = (
        agg.select(F.explode(stages).alias("st"))
        .select("st.*")
        .withColumn("dropped", c("docs_in") - c("docs_out"))
    )
    # fluent_stats carries its own paired release (the gram cache);
    # release_after chains it automatically
    return release_after(result, flags, fluent_stats)


def repeated_span_report(
    df: DataFrame,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_grams: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document — the span-level
    output :func:`repeated_ngram_stats` triages for (the Spark spelling
    of suffix-array substring dedup at n-gram granularity, cf. Lee et
    al. "Deduplicating Training Data Makes Language Models Better").

    Every n-gram instance occurring in ≥ ``min_df`` distinct documents
    marks its token interval [pos, pos+n-1] (1-based) as duplicated;
    overlapping or adjacent marked intervals merge into maximal spans
    (gaps-and-islands over a per-document window). A caller cuts these
    spans out of the token stream to get the deduplicated document.

    Output: (doc_id, span_start, span_end, span_tokens), one row per
    maximal span.

    Scale shape: the df aggregate and the membership join both key on
    ``md5(gram)`` (fixed-width, partial-aggregated — text never
    shuffles); the islands pass shuffles (doc_id, pos) pairs only,
    partitioned by doc_id, and each document's interval list is tiny
    (≤ its token count), so the window state is bounded per key."""
    from pyspark.ml.feature import NGram

    from auraverse_etl_pipeline_spark.functions.text import tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    ).repartition(par, "doc_id")
    ng = NGram(n=n, inputCol="_toks", outputCol="_ng").transform(base)
    # 0-based gram index -> 1-based token interval [pos+1, pos+n]
    ex = ng.select(
        "doc_id", F.posexplode("_ng").alias("pos", "gram")
    ).select("doc_id", "pos", F.md5("gram").alias("gh"))
    if cache_grams:
        ex = ex.cache()
    repeated = (
        ex.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("gdf"))
        .filter(F.col("gdf") >= min_df)
        .select("gh")
    )
    spans = ex.join(repeated, "gh").select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("s"),
        (F.col("pos") + n).cast("bigint").alias("e"),
    )
    prev_w = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_w = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = spans.select(
        "doc_id",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(prev_w) + 1, 1)
        .otherwise(F.when(F.max("e").over(prev_w).isNull(), 1).otherwise(0))
        .alias("new_island"),
    )
    islands = flagged.withColumn("gid", F.sum("new_island").over(run_w))
    result = (
        islands.groupBy("doc_id", "gid")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )
    return release_after(result, *( [ex] if cache_grams else [] ))


def apply_span_dedup(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_tokens: bool = True,
) -> DataFrame:
    """Materialize span-level substring dedup with KEEP-FIRST semantics
    (Lee et al. "Deduplicating Training Data" at n-gram granularity):
    the globally first instance of every duplicated n-gram — ordered by
    (doc_id, position) — survives; every later instance marks its token
    interval for removal, except tokens that some kept (first-instance)
    gram still covers, so novel text overlapping a duplicated run is
    never destroyed.

    Output: (doc_id, n_tokens, n_removed, clean_md5) where clean_md5
    digests the surviving tokens joined by single spaces, NULL when a
    document (an exact copy of an earlier one) loses every token.

    Scale shape: the first-instance ranking windows on ``md5(gram)``
    (fixed-width shuffle, text never moves); coverage explodes each
    gram instance to its n token positions — the honest n× cost of
    substring dedup, which is why :func:`repeated_ngram_stats` exists
    as the cheap triage to run it only where it pays. Reassembly is a
    hash aggregate with an in-group ``array_sort`` — no sort exchange
    (same trick as line-level dedup). One skew caveat, documented not
    hidden: a mega-hot boilerplate gram serializes its ranking window
    into one partition; cap/salt before this operator if the corpus
    has one."""
    from pyspark.ml.feature import NGram

    from auraverse_etl_pipeline_spark.functions.text import tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    # tokens feed both the gram pipeline and the reassembly — cache the
    # tokenized form once (paired release below)
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    ).repartition(par, "doc_id")
    if cache_tokens:
        base = base.cache()
    ng = NGram(n=n, inputCol="_toks", outputCol="_ng").transform(base)
    pg = ng.select("doc_id", F.posexplode("_ng").alias("p0", "gram")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), F.md5("gram").alias("gh")
    )
    first_w = Window.partitionBy("gh").orderBy("doc_id", "pos")
    inst = pg.withColumn("rn", F.row_number().over(first_w))
    cov = inst.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("j"),
        (F.col("rn") == 1).alias("kept"),
        "pos",
    ).select("doc_id", (F.col("pos") + F.col("j")).cast("bigint").alias("tpos"), "kept")
    rm = (
        cov.groupBy("doc_id", "tpos")
        .agg(F.max("kept").alias("any_kept"), F.max(~F.col("kept")).alias("any_red"))
        .filter(F.col("any_red") & ~F.col("any_kept"))
        .select("doc_id", "tpos")
    )
    alltok = base.select(
        "doc_id", F.posexplode("_toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("bigint").alias("tpos"), "tok")
    flagged = alltok.join(rm.withColumn("removed", F.lit(True)), ["doc_id", "tpos"], "left").withColumn(
        "removed", F.coalesce("removed", F.lit(False))
    )
    kept_sorted = F.array_sort(
        F.collect_list(F.when(~F.col("removed"), F.struct("tpos", "tok")))
    )
    result = (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("removed").cast("int")).cast("bigint").alias("n_removed"),
            kept_sorted.alias("_kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_removed",
            F.when(
                F.size("_kept") > 0,
                F.md5(F.array_join(F.transform("_kept", lambda x: x["tok"]), " ")),
            ).alias("clean_md5"),
        )
    )
    return release_after(result, *( [base] if cache_tokens else [] ))


def repeated_ngram_stats(
    df: DataFrame,
    n: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_grams: bool = True,
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
    if cache_grams:
        ex = ex.cache()
    docfreq = ex.groupBy("gh").agg(F.count_distinct("doc_id").alias("gdf"))
    scored = ex.join(docfreq, "gh")
    result = (
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
    return release_after(result, *( [ex] if cache_grams else [] ))


def corpus_data_card(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    lang_col: str | None = None,
) -> DataFrame:
    """The one-call dataset report a corpus release ships: (section,
    metric, value DOUBLE) rows covering volume (docs/tokens/chars),
    exact-duplicate rate, Gopher pass rate, token-length quartiles
    (exact percentile_disc — engine-reproducible), and the language
    mix (share per ``lang_col`` value when given, else the stopword
    vote of :func:`functions.text.lang_guess`).

    Scale shape: the fixed-width per-doc metric rows are cached (four
    consumers — scalar aggregate, length histogram, language mix,
    total; paired release) so the text scans once; quartiles come from
    ONE cumulative histogram, not three percentile_disc states (the
    q37 lesson, SCALE.md); every value is a ratio of exact integers or
    an exact percentile, so the card is reproducible across engines
    digit-for-digit."""
    from auraverse_etl_pipeline_spark.functions.text import lang_guess, token_count

    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        (F.col(lang_col) if lang_col else lang_guess(F.col(text_col))).alias("lang"),
    )
    n, mwl, stops = gopher_metrics("text")
    wc_ok, wl_ok, st_ok = gopher_rules(n, mwl, stops)
    base = docs.select(
        "doc_id", "lang",
        F.md5("text").alias("h"),
        token_count("text").alias("toks"),
        F.length("text").cast("bigint").alias("chars"),
        (wc_ok & wl_ok & st_ok).cast("int").alias("gopher_ok"),
    ).cache()

    def row(section: str, metric: str, value) -> Column:
        return F.struct(
            F.lit(section).alias("section"), F.lit(metric).alias("metric"),
            value.cast("double").alias("value"),
        )

    scalars = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        F.countDistinct("h").cast("bigint").alias("n_distinct"),
        F.sum("gopher_ok").cast("bigint").alias("n_gopher"),
    ).select(
        F.explode(
            F.array(
                row("volume", "n_docs", F.col("n_docs")),
                row("volume", "n_tokens", F.col("n_tokens")),
                row("volume", "n_chars", F.col("n_chars")),
                row("dedup", "exact_dup_rate",
                    (F.col("n_docs") - F.col("n_distinct")) / F.col("n_docs")),
                row("quality", "gopher_pass_rate", F.col("n_gopher") / F.col("n_docs")),
            )
        ).alias("r")
    ).select("r.*")
    # quartiles from one cumulative histogram (value at first cum >=
    # ceil(p*n), percentile_disc's definition) — the global window runs
    # one task over DISTINCT token counts, a bounded set
    hist = base.groupBy("toks").agg(F.count(F.lit(1)).alias("c")).cache()
    w = Window.orderBy("toks").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    nrow = hist.agg(F.sum("c").alias("n"))
    rung = lambda p: F.min(  # noqa: E731
        F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("toks"))
    )
    quartiles = (
        cum.crossJoin(F.broadcast(nrow))
        .agg(rung(0.25).alias("p25"), rung(0.50).alias("p50"), rung(0.75).alias("p75"))
        .select(
            F.explode(
                F.array(
                    *[row("length_tokens", f"p{p}", F.col(f"p{p}")) for p in (25, 50, 75)]
                )
            ).alias("r")
        )
        .select("r.*")
    )
    total = base.count()
    langs = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.lit("lang_mix").alias("section"),
            F.col("lang").alias("metric"),
            (F.col("cnt") / F.lit(total)).cast("double").alias("value"),
        )
    )
    result = scalars.unionByName(quartiles).unionByName(langs)
    return release_after(result, base, hist)


def pmi_phrases(
    df: DataFrame,
    min_count: int = 5,
    delta: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_unigrams: bool = True,
) -> DataFrame:
    """word2phrase collocation mining (Mikolov et al. 2013): score each
    adjacent word pair by ``(pair_count - δ) · N / (count(w1) ·
    count(w2))`` — a discounted pointwise-mutual-information ratio —
    returning ``(w1, w2, pair_count, w1_count, w2_count, score)`` for
    pairs seen at least ``min_count`` times. High-scoring pairs are the
    multi-word units ("new york") a tokenizer or dedup shingler should
    treat as one token; the discount ``δ`` kills rare-pair noise.

    Counts stay exact BIGINTs; the score converts each factor to
    DOUBLE BEFORE multiplying (a BIGINT product of two web-scale
    unigram counts would overflow; the double product is
    engine-identical IEEE), so the ranking is reproducible anywhere.

    Scale shape: one pass builds bigram instances JVM-side (NGram — no
    corpus self-join on positions), one pass explodes unigrams; both
    aggregates partial-combine map-side, and the join back is
    vocabulary-sized × bigram-vocabulary-sized with AQE free to
    broadcast the unigram side (no hint — a web corpus's unigram table
    can be past broadcast limits). Unlike the hash-shuffle operators
    above, the shuffle key here is the word itself — the output needs
    the text, and both tables are vocabulary-bounded, not
    corpus-bounded. The unigram count table is consumed twice (w1 and
    w2 joins) plus the token total, so it is cached by default with
    the paired ``release_caches()`` discipline."""
    grams = _gram_instances(df, n=2, text_col=text_col, id_col=id_col)
    pair_counts = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
        .select(
            F.substring_index("gram", " ", 1).alias("w1"),
            F.substring_index("gram", " ", -1).alias("w2"),
            "pair_count",
        )
    )
    from auraverse_etl_pipeline_spark.functions.text import tokens

    uni = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    if cache_unigrams:
        uni = uni.cache()
    totals = uni.agg(F.sum("c").cast("bigint").alias("n_tok"))
    scored = (
        pair_counts.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("w1_count")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("w2_count")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "pair_count",
            "w1_count",
            "w2_count",
            (
                (F.col("pair_count") - F.lit(delta)).cast("double")
                * F.col("n_tok").cast("double")
                / (
                    F.col("w1_count").cast("double")
                    * F.col("w2_count").cast("double")
                )
            ).alias("score"),
        )
    )
    return release_after(scored, *([uni] if cache_unigrams else []))


def registrable_domain(uri: str | Column) -> Column:
    """Registrable domain of a URL under the public-suffix-list
    snapshot — see :mod:`auraverse_etl_pipeline_spark.functions.psl`
    (one shared rule definition emits this Spark Column and the DuckDB
    oracle expression): lowercased host, userinfo/port stripped,
    longest-matching-suffix over the committed multi-label rules with
    the last-two-labels fallback for single-label suffixes."""
    from auraverse_etl_pipeline_spark.functions.psl import (
        registrable_domain as _psl_domain,
    )

    return _psl_domain(uri)


def domain_card(
    docs: DataFrame,
    uri_col: str = "target_uri",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registrable-domain curation card — the RefinedWeb/C4-style
    stage that decides DOMAIN-level keep/drop before any document-level
    gate runs: ``(domain, n_docs, n_dup, dup_rate, n_gopher,
    gopher_rate, n_lang_ok, lang_ok_rate, tok_q25, tok_q50, tok_q75)``.

    ``n_dup`` counts documents that are NOT the md5 keep-first
    canonical of their exact-duplicate group — corpus-GLOBAL dedup
    attributed to the domain (a mirror domain shows dup_rate ≈ 1 even
    though its copies are "first" within itself). Token-count
    quartiles are exact ``percentile_disc`` values from ONE cumulative
    histogram per domain (the percentile-ladder discipline — never N
    percentile states).

    Scale shape: one corpus scan computes fixed-width flag rows
    (domain, n_tokens, canonical, gopher, lang_ok); the md5 canonical
    join shuffles hashes (never text); the card aggregates are
    domain-bounded. The flag table is cached (two consumers: the rate
    aggregate and the histogram) — release via ``release_caches()``."""
    from auraverse_etl_pipeline_spark.functions.text import lang_guess

    d = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("text"),
        registrable_domain(uri_col).alias("domain"),
    )
    canon = d.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    n, mwl, sw = gopher_metrics("text")
    ok_n, ok_len, ok_stop = gopher_rules(n, mwl, sw)
    flags = (
        d.withColumn("h", F.md5("text"))
        .join(canon, "h")
        .select(
            "domain",
            n.alias("n_tokens"),
            (F.col("doc_id") == F.col("keep_id")).alias("canonical"),
            (ok_n & ok_len & ok_stop).alias("gopher"),
            (lang_guess("text") != F.lit("und")).alias("lang_ok"),
        )
        .cache()
    )
    big = F.lit(0).cast("bigint")
    base = flags.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(~F.col("canonical"), 1).otherwise(0)).cast("bigint").alias("n_dup"),
        F.sum(F.when(F.col("gopher"), 1).otherwise(0)).cast("bigint").alias("n_gopher"),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0)).cast("bigint").alias("n_lang_ok"),
    )
    hist = flags.groupBy("domain", "n_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("domain").orderBy("n_tokens")
    wt = Window.partitionBy("domain")
    cum = hist.select(
        "domain",
        "n_tokens",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("tot"),
    )
    # percentile_disc(q) = smallest value with cum >= q·tot — exact
    # integer comparisons (cum·4 >= tot·4q), no float quantile state.
    quarts = cum.groupBy("domain").agg(
        F.min(F.when(F.col("cum") * 4 >= F.col("tot"), F.col("n_tokens"))).alias("tok_q25"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("n_tokens"))).alias("tok_q50"),
        F.min(F.when(F.col("cum") * 4 >= F.col("tot") * 3, F.col("n_tokens"))).alias("tok_q75"),
    )
    out = base.join(quarts, "domain").select(
        "domain",
        "n_docs",
        "n_dup",
        (F.col("n_dup").cast("double") / F.col("n_docs").cast("double")).alias("dup_rate"),
        "n_gopher",
        (F.col("n_gopher").cast("double") / F.col("n_docs").cast("double")).alias("gopher_rate"),
        "n_lang_ok",
        (F.col("n_lang_ok").cast("double") / F.col("n_docs").cast("double")).alias("lang_ok_rate"),
        "tok_q25",
        "tok_q50",
        "tok_q75",
    )
    return release_after(out, flags)


def domain_blocklist_funnel(
    docs: DataFrame,
    blocked_domains: list[str],
    uri_col: str = "target_uri",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = BLOCKLIST_NUM_BITS,
    num_hashes: int = BLOCKLIST_NUM_HASHES,
) -> DataFrame:
    """The domain-blocklist gate as a funnel stage — the curation step
    that consumes a (potentially huge) blocked-domain list through the
    Bloom tier: ``(domain, n_docs, bloom_flagged, blocked, kept,
    kept_gopher)``.

    Every document's registrable domain probes a Bloom filter BUILT
    from the blocklist (at web scale the list is millions of domains —
    the filter is ``num_bits/63`` BIGINT words, broadcastable where the
    list is not); only bloom-flagged domains hit the exact verify join
    (the bloom-decontaminate discipline: the filter prunes, the join
    confirms, so false positives cost a lookup but never a wrong
    drop). Survivors then pass the Gopher gate — the per-domain report
    shows exactly what the blocklist and the quality gate each cost.

    Scale shape: one corpus scan to fixed-width (domain, gopher) rows;
    the bloom probe is one distinct-domain-sized map-side join; the
    exact verify joins only flagged domains against the blocklist."""
    from auraverse_etl_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    spark = docs.sparkSession
    bl = spark.createDataFrame([(x,) for x in sorted(blocked_domains)], "domain string")
    bloom = bloom_build(bl, "domain", num_bits, num_hashes)
    n, mwl, sw = gopher_metrics(text_col)
    ok_n, ok_len, ok_stop = gopher_rules(n, mwl, sw)
    d = docs.select(
        registrable_domain(uri_col).alias("domain"),
        (ok_n & ok_len & ok_stop).alias("gopher"),
    )
    probed = bloom_might_contain(d, bloom, "domain", num_bits, num_hashes)
    verified = probed.join(
        F.broadcast(bl.withColumn("on_list", F.lit(True))), "domain", "left"
    ).select(
        "domain",
        "gopher",
        "bloom_hit",
        # flagged-but-unverified = Bloom false positive: kept.
        (F.col("bloom_hit") & F.coalesce("on_list", F.lit(False))).alias("blocked"),
    ).cache()
    out = verified.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("bigint").alias("bloom_flagged"),
        F.sum(F.when(F.col("blocked"), 1).otherwise(0)).cast("bigint").alias("blocked"),
        F.sum(F.when(~F.col("blocked"), 1).otherwise(0)).cast("bigint").alias("kept"),
        F.sum(F.when(~F.col("blocked") & F.col("gopher"), 1).otherwise(0))
        .cast("bigint")
        .alias("kept_gopher"),
    )
    return release_after(out, verified)
