"""Registry entries for end-to-end pipeline compositions.

Each per-stage oracle proves its own operator; these queries prove the
stages COMPOSE — the full crawl-to-corpus path runs as one flow whose
attrition counts and final-corpus content digest are replayed
closed-form by DuckDB from the source table. The oracle replays the
WARC and detector stages as identity (the corpus is plain prose, so
staging + re-ingestion + fragment re-assembly must return every byte),
which is exactly what makes the digest an attestation: any framing or
span drift in the Spark path flips ``text_xor60``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from auraverse_etl_pipeline_spark.operators.e2e import LM_XENT_MAX
from auraverse_etl_pipeline_spark.plans.registry import query
from auraverse_etl_pipeline_spark.sources.tables import load_table


def _crawl_to_corpus_oracle_sql(xent_max: float = LM_XENT_MAX, tau: float = 0.5) -> str:
    """DuckDB replica of :func:`crawl_to_corpus_funnel` on the fixture
    corpus: WARC + detect replay as identity, then exact dedup → Gopher
    → language ID → bigram-LM gate (the ``_LM_CTES`` model, scored over
    stage-5 survivors only) → md5-base MinHash-LSH near-dedup with
    exact-Jaccard verify (the ``_minhash_oracle_sql`` chain over
    stage-6 survivors) → final count/token/digest row. Multi-referenced
    CTEs are MATERIALIZED (DuckDB re-inlines plain CTEs per reference;
    down a chain this long that goes exponential)."""
    from auraverse_etl_pipeline_spark.operators.dedup import (
        _MINHASH_P,
        minhash_coeffs,
    )
    from auraverse_etl_pipeline_spark.operators.quality import gopher_keep_sql
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _BLOCKED_DOMAINS,
        _DOMAIN_URI_SQL,
        _EN_LIST,
        _LANG_CASE,
        _SH3,
        _TOKS,
        _domain_sql_expr,
    )

    domain = _domain_sql_expr(_DOMAIN_URI_SQL)
    blocked = ", ".join(f"'{d}'" for d in sorted(_BLOCKED_DOMAINS))
    coeffs = minhash_coeffs(8, 42)
    mins = ",\n               ".join(
        f"MIN(({a} * h + {b}) % {_MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_case = " ".join(f"WHEN {i} THEN m{i}" for i in range(8))
    return f"""
    WITH d AS MATERIALIZED (SELECT doc_id, text FROM documents),
    dom AS MATERIALIZED (
        SELECT doc_id, {domain} AS domain,
               {domain} NOT IN ({blocked}) AS domain_ok
        FROM documents
    ),
    canon AS (
        SELECT md5(text) AS h, MIN(d.doc_id) AS keep_id
        FROM d JOIN dom USING (doc_id) WHERE dom.domain_ok GROUP BY h
    ),
    g AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_words,
               length(regexp_replace(text, '\\s', '', 'g')) / len({_TOKS}) AS mwl,
               CAST(len(list_intersect(list_distinct({_TOKS}), {_EN_LIST})) AS BIGINT) AS sw,
               {_LANG_CASE} AS guessed
        FROM d
    ),
    flag AS MATERIALIZED (
        SELECT d.doc_id,
               g.n_words AS n_tokens,
               ('0x' || substr(sha256(d.text), 1, 15))::BIGINT AS sha60,
               dom.domain_ok,
               dom.domain_ok AND d.doc_id = COALESCE(c.keep_id, -1) AS canonical,
               {gopher_keep_sql("g.n_words", "g.mwl", "g.sw")} AS gopher,
               g.guessed <> 'und' AS lang_ok
        FROM d LEFT JOIN canon c ON md5(d.text) = c.h
        JOIN g USING (doc_id) JOIN dom USING (doc_id)
    ),
    s5 AS MATERIALIZED (
        SELECT d.doc_id, d.text
        FROM d JOIN flag USING (doc_id)
        WHERE flag.canonical AND flag.gopher AND flag.lang_ok
    ),
    rt AS MATERIALIZED (
        SELECT {_TOKS} AS toks
        FROM documents WHERE lang = 'en' AND doc_id % 2 = 0
    ),
    tr AS (
        SELECT unnest(toks[1:len(toks)-1]) AS prev,
               unnest(toks[2:len(toks)]) AS tok
        FROM rt
    ),
    voc AS (
        SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS tok FROM rt)
    ),
    big AS MATERIALIZED (
        SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tr GROUP BY prev, tok
    ),
    ctx AS MATERIALIZED (
        SELECT prev, CAST(SUM(c) AS BIGINT) AS c_prev FROM big GROUP BY prev
    ),
    bw AS (
        SELECT prev, tok,
               ln((c + CAST(1.0 AS DOUBLE)) / (c_prev + CAST(1.0 AS DOUBLE) * v)) AS logp
        FROM big JOIN ctx USING (prev), voc
    ),
    cw AS (
        SELECT prev,
               ln(CAST(1.0 AS DOUBLE) / (c_prev + CAST(1.0 AS DOUBLE) * v)) AS logp_miss
        FROM ctx, voc
    ),
    st AS (
        SELECT ln(CAST(1.0 AS DOUBLE) / (0 + CAST(1.0 AS DOUBLE) * v)) AS logp_unseen
        FROM voc
    ),
    ct AS (SELECT doc_id, {_TOKS} AS toks FROM s5),
    ctr AS (
        SELECT doc_id,
               unnest(toks[1:len(toks)-1]) AS prev,
               unnest(toks[2:len(toks)]) AS tok
        FROM ct
    ),
    scoredtr AS (
        SELECT ctr.doc_id,
               COALESCE(bw.logp, cw.logp_miss, (SELECT logp_unseen FROM st)) AS logp
        FROM ctr LEFT JOIN bw USING (prev, tok) LEFT JOIN cw USING (prev)
    ),
    xents AS (
        SELECT s5.doc_id,
               CASE WHEN COUNT(s.logp) > 0 THEN
                   -CAST(SUM(CAST(s.logp AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(s.logp)
               END AS xent
        FROM s5 LEFT JOIN scoredtr s USING (doc_id)
        GROUP BY s5.doc_id
    ),
    s6 AS MATERIALIZED (
        SELECT s5.doc_id, s5.text
        FROM s5 JOIN xents USING (doc_id)
        WHERE xents.xent IS NOT NULL AND xents.xent <= {xent_max!r}
    ),
    shg AS (SELECT doc_id, {_SH3} AS sh FROM s6),
    sh2 AS MATERIALIZED (SELECT doc_id, sh FROM shg WHERE len(sh) > 0),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh2),
    hh AS (
        SELECT doc_id,
               list_reduce(
                   list_transform(string_split(substr(md5(s), 1, 15), ''),
                                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (a, b) -> a * 16 + b) % {_MINHASH_P} AS h
        FROM ex
    ),
    mins AS MATERIALIZED (
        SELECT doc_id,
               {mins}
        FROM hh GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
        SELECT doc_id, i, CASE i {band_case} END AS mh
        FROM mins, range(8) r(i)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bands a JOIN bands b ON a.i = b.i AND a.mh = b.mh AND a.doc_id < b.doc_id
    ),
    dup AS MATERIALIZED (
        SELECT DISTINCT c.id2 AS doc_id
        FROM cand c
        JOIN sh2 x ON x.doc_id = c.id1
        JOIN sh2 y ON y.doc_id = c.id2
        WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= {tau!r}
    ),
    fin AS MATERIALIZED (
        SELECT doc_id, text FROM s6
        WHERE doc_id NOT IN (SELECT doc_id FROM dup)
    ),
    counts AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS c0,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS c1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS c2,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM flag WHERE domain_ok) AS c3,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM flag WHERE canonical) AS c4,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM flag
                WHERE canonical AND gopher) AS c5,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s5) AS c6,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s6) AS c7,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM fin) AS c8,
               (SELECT CAST(SUM(len({_TOKS})) AS BIGINT) FROM fin) AS tok,
               (SELECT bit_xor(('0x' || substr(sha256(text), 1, 15))::BIGINT)
                FROM fin) AS xr
    )
    SELECT CAST(1 AS BIGINT) AS stage_id, 'warc_roundtrip' AS stage,
           c0 AS docs_in, c1 AS docs_out, c0 - c1 AS dropped,
           CAST(NULL AS BIGINT) AS corpus_tokens,
           CAST(NULL AS BIGINT) AS text_xor60 FROM counts
    UNION ALL SELECT 2, 'detect_extract', c1, c2, c1 - c2, NULL, NULL FROM counts
    UNION ALL SELECT 3, 'domain_blocklist', c2, c3, c2 - c3, NULL, NULL FROM counts
    UNION ALL SELECT 4, 'exact_dedup', c3, c4, c3 - c4, NULL, NULL FROM counts
    UNION ALL SELECT 5, 'gopher', c4, c5, c4 - c5, NULL, NULL FROM counts
    UNION ALL SELECT 6, 'lang_id', c5, c6, c5 - c6, NULL, NULL FROM counts
    UNION ALL SELECT 7, 'lm_fluency', c6, c7, c6 - c7, NULL, NULL FROM counts
    UNION ALL SELECT 8, 'minhash_dedup', c7, c8, c7 - c8, NULL, NULL FROM counts
    UNION ALL SELECT 9, 'final_corpus', c8, c8, 0, tok, xr FROM counts
    """


@query(
    "pipeline_crawl_to_corpus",
    oracle=_crawl_to_corpus_oracle_sql(),
    description="the whole crawl-to-corpus pipeline as ONE attested "
    "flow: documents staged into gzipped WARC files and re-ingested "
    "(the CommonCrawl entry point), the full fragment detector suite "
    "with span-ordered re-assembly, the Bloom-gated PSL domain "
    "blocklist (RefinedWeb order - BEFORE dedup, so a blocked mirror "
    "never decides a duplicate group's canonical), exact keep-first "
    "dedup among domain survivors, the Gopher "
    "rules, stopword-vote language ID, the bigram-LM fluency gate "
    "(scored over stage-5 survivors only - the expensive gate runs "
    "last), and md5-base MinHash-LSH near-dedup with exact-Jaccard "
    "verify - reported as the per-stage attrition funnel plus a final "
    "row carrying surviving-token totals and a bit_xor sha256 content "
    "digest, so ANY cross-stage drift (framing, spans, text bytes) "
    "hash-mismatches. Text makes one round trip through the Arrow "
    "ingest tier and is cached at the re-assembly boundary (a real "
    "run checkpoints it); every later stage consumes fixed-width "
    "flags, broadcast model tables, or the band join",
)
def pipeline_crawl_to_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.e2e import crawl_to_corpus_funnel
    from auraverse_etl_pipeline_spark.plans.llm_queries import (
        _BLOCKED_DOMAINS,
        _domain_uri,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn("uri", _domain_uri())
    ref = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
    return crawl_to_corpus_funnel(
        docs, ref, blocked_domains=_BLOCKED_DOMAINS, uri_col="uri"
    )


def _hashed_vec_sql(src: str, out: str) -> str:
    """CTE fragment: feature-hashed unit vectors from an instance CTE
    ``src`` (columns id, tok) into ``{out}`` (id, v DOUBLE[64]) —
    replays operators/similarity.py hashed_embeddings, zero-norm
    vectors dropped (the pipeline's no-signal filter). ±1 bucket sums
    are exact small integers, so the unordered SUM equals Spark's
    ordered fold without DECIMAL machinery."""
    return f"""
    {out}_sums AS (
        SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket,
               CAST(SUM(CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT % 2 = 0
                             THEN CAST(1.0 AS DOUBLE)
                             ELSE CAST(-1.0 AS DOUBLE) END) AS DOUBLE) AS w
        FROM {src} GROUP BY id, bucket
    ),
    {out}_raw AS (
        SELECT g.id, g.bucket, COALESCE(s.w, CAST(0.0 AS DOUBLE)) AS w
        FROM (SELECT d.id, r.i AS bucket
              FROM (SELECT DISTINCT id FROM {src}) d, range(0, 64) r(i)) g
        LEFT JOIN {out}_sums s ON s.id = g.id AND s.bucket = g.bucket
    ),
    {out}_norm AS (
        SELECT id, sqrt(SUM(w * w)) AS norm FROM {out}_raw GROUP BY id
    ),
    {out} AS MATERIALIZED (
        SELECT r.id, list(r.w / n.norm ORDER BY r.bucket) AS v
        FROM {out}_raw r JOIN {out}_norm n USING (id)
        WHERE n.norm > 0 GROUP BY r.id
    )"""


def _corpus_to_index_oracle_sql() -> str:
    """DuckDB replica of corpus_to_chunk_index on the fixture slices:
    chunker → hashed chunk/query vectors → the unrolled Lloyd chain →
    probe/assign/score top-k, every hand-off replayed."""
    from auraverse_etl_pipeline_spark.plans.llm_queries import _TOKS, _lloyd_chain

    chain, prev = _lloyd_chain("cvec", 8, 2)
    return (
        f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n
        FROM documents WHERE doc_id < 100
    ),
    kc AS (
        SELECT doc_id, toks,
               CASE WHEN n <= 64 THEN 1
                    ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1 END AS n_chunks
        FROM t
    ),
    ce AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS i FROM kc),
    csrc AS (
        SELECT doc_id * 1048576 + i AS id,
               unnest(toks[i * 48 + 1 : i * 48 + 64]) AS tok
        FROM ce
    ),
    qsrc AS (
        SELECT doc_id AS id, unnest({_TOKS}) AS tok
        FROM documents WHERE doc_id >= 200 AND doc_id < 205
    ),"""
        + _hashed_vec_sql("csrc", "cvec")
        + ","
        + _hashed_vec_sql("qsrc", "qv0")
        + chain
        + f""",
    q AS (SELECT id AS query_id, v AS qv FROM qv0),
    assigned AS (
        SELECT id, v, cell FROM (
            SELECT c.id, c.v, ct.cell,
                   ROW_NUMBER() OVER (PARTITION BY c.id
                       ORDER BY least(CAST(1.0 AS DOUBLE),
                                      list_cosine_similarity(c.v, ct.centroid))
                                    DESC,
                                ct.cell) AS rn
            FROM cvec c CROSS JOIN {prev} ct
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, qv, cell FROM (
            SELECT q.query_id, q.qv, ct.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, ct.centroid) DESC,
                                ct.cell) AS pr
            FROM q CROSS JOIN {prev} ct
        ) WHERE pr <= 4
    ),
    scored AS (
        SELECT p.query_id, a.id AS neighbor_id,
               least(CAST(1.0 AS DOUBLE),
                     list_cosine_similarity(p.qv, a.v)) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                   ORDER BY least(CAST(1.0 AS DOUBLE),
                                  list_cosine_similarity(p.qv, a.v)) DESC,
                            a.id) AS rank
        FROM probes p JOIN assigned a USING (cell)
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
    FROM scored WHERE rank <= 5
    """
    )


@query(
    "pipeline_corpus_to_index",
    oracle=_corpus_to_index_oracle_sql(),
    description="the RETRIEVAL-side pipeline composition - the RAG "
    "twin of pipeline_crawl_to_corpus: corpus documents chunk into "
    "sliding 64-token windows, every chunk embeds through the "
    "model-free feature-hashing encoder (zero-norm chunks dropped - "
    "cosine vs a zero vector is NaN and NaN ordering is cross-engine "
    "ambiguity), the deterministic Lloyd quantizer trains over the "
    "chunk vectors, and query documents embed through the SAME "
    "encoder and probe the index. Four tiers hand off in one flow - "
    "chunk ids, embedding components, trained centroids, cell labels "
    "and search ranks all replay digit-for-digit in the oracle, which "
    "is what proves the stages COMPOSE",
)
def pipeline_corpus_to_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.e2e import corpus_to_chunk_index

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    queries = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 205)
    )
    return corpus_to_chunk_index(docs, queries)
