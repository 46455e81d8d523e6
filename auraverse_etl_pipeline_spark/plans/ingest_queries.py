"""Registry entries for the document-ETL surface (SURVEY.md §2.1-2.4).

Two kinds of correctness anchors:

1. Corpus-scale plumbing over the driver's ``documents`` table — the
   synthetic texts are plain prose, so the full detector provably yields
   exactly one RAW_TEXT fragment per document spanning the whole text;
   that lets plain SQL state the expected fragments/merged output
   exactly, proving the Spark fan-out (mapInPandas → explode-shaped
   rows) end-to-end at any SF.

2. Adversarial fixture documents (the reference's own ``input.txt`` /
   ``input2.txt``, checked into ``tests/fixtures/``) embedded via
   ``createDataFrame`` — format counts are golden-pinned as VALUES
   oracles, so the driver hash-checks real multi-format detection,
   normalization and schema inference too. (Byte-level span/record
   parity with the reference lives in pytest: tests/test_ingest.py.)
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from auraverse_etl_pipeline_spark.ingest.convert import convert_corpus
from auraverse_etl_pipeline_spark.ingest.pipeline import (
    detect_fragments,
    extract_records,
    infer_schema_fields,
    summarize_fragments,
)
from auraverse_etl_pipeline_spark.plans.registry import query
from auraverse_etl_pipeline_spark.sources.tables import load_table

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURE_PATHS = (
    os.path.join(_REPO_ROOT, "tests", "fixtures", "messy_doc_1.txt"),
    os.path.join(_REPO_ROOT, "tests", "fixtures", "messy_doc_2.txt"),
)


def fixture_documents(spark: SparkSession) -> DataFrame:
    rows = []
    for i, path in enumerate(FIXTURE_PATHS, 1):
        with open(path, encoding="utf-8") as fh:
            rows.append((i, fh.read()))
    return spark.createDataFrame(rows, "doc_id long, text string")


@query(
    "fragment_summary",
    oracle="""
    SELECT 'RAW_TEXT' AS format_type, COUNT(*) AS n_fragments
    FROM documents
    """,
    description="full detector suite over the corpus + A1 summary agg (one shuffle)",
)
def fragment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return summarize_fragments(detect_fragments(docs))


@query(
    "fragment_spans",
    oracle="""
    SELECT doc_id, 'RAW_TEXT' AS format_type,
           CAST(0 AS BIGINT) AS start_index,
           CAST(length(text) AS BIGINT) AS end_index,
           CAST(0.35 AS DOUBLE) AS confidence
    FROM documents
    """,
    description="per-document fragment spans are exact at corpus scale",
)
def fragment_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return detect_fragments(docs).select(
        "doc_id", "format_type", "start_index", "end_index", "confidence"
    )


@query(
    "converted_documents",
    oracle="""
    SELECT doc_id, concat('{"text": "', text, '"}') AS merged
    FROM documents
    """,
    description="merged-document converter (EP2) over the corpus, shuffle-free",
)
def converted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return convert_corpus(docs)


@query(
    "fixture_fragment_summary",
    oracle="""
    SELECT * FROM (VALUES
        ('CSV', CAST(4 AS BIGINT)), ('HTML', 1), ('HTML_TABLE', 2),
        ('JSON', 4), ('JSON_LD', 1), ('KEY_VALUE', 8),
        ('MALFORMED_JSON', 2), ('RAW_TEXT', 22), ('SQL', 2),
        ('YAML_FRONTMATTER', 1)
    ) AS t(format_type, n_fragments)
    """,
    description="multi-format detection on the reference's adversarial fixtures (golden-pinned)",
)
def fixture_fragment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return summarize_fragments(detect_fragments(fixture_documents(spark)))


@query(
    "fixture_record_summary",
    oracle="""
    SELECT * FROM (VALUES
        ('CSV', CAST(4 AS BIGINT)), ('HTML_TABLE', 2), ('JSON', 4),
        ('JSON_LD', 1), ('KEY_VALUE', 8), ('MALFORMED_JSON', 2),
        ('SQL', 2), ('YAML_FRONTMATTER', 1)
    ) AS t(format, n_records)
    """,
    description="per-format normalization fan-out on the fixtures (golden-pinned)",
)
def fixture_record_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    records = extract_records(fixture_documents(spark))
    return records.groupBy("format").agg(F.count("*").alias("n_records"))


@query(
    "fixture_schema_field_types",
    oracle="""
    SELECT * FROM (VALUES
        ('boolean', CAST(2 AS BIGINT)), ('date', 9), ('integer', 14),
        ('number', 2), ('string', 144)
    ) AS t(type, n_fields)
    """,
    description="schema inference (v1 Flattener contract) type distribution (golden-pinned)",
)
def fixture_schema_field_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    records = extract_records(fixture_documents(spark))
    fields = infer_schema_fields(records)
    return fields.groupBy("type").agg(F.count("*").alias("n_fields"))

@query(
    "sql_lateral_fragment_summary",
    oracle="""
    SELECT 'RAW_TEXT' AS format_type, COUNT(*) AS n_fragments
    FROM documents
    """,
    description="SQL-callable surface (SURVEY §2.5): detector UDTF via "
    "LATERAL join in spark.sql, same answer as the DataFrame pipeline",
)
def sql_lateral_fragment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.functions.sql_surface import register_sql_surface

    register_sql_surface(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_sql_surface")
    return spark.sql(
        """
        SELECT f.format_type, COUNT(*) AS n_fragments
        FROM _docs_sql_surface d, LATERAL detect_fragments(d.text) f
        GROUP BY f.format_type
        """
    )


@query(
    "sql_udaf_source_stats",
    oracle="""
    SELECT source, median(n_chars) AS med_chars, mad(n_chars) AS mad_chars
    FROM documents GROUP BY source
    """,
    description="pandas GROUPED_AGG UDAF surface (SURVEY §2.5's "
    "aggregate extension point): exact median + median-absolute-"
    "deviation per source, registered as SQL-callable aggregates and "
    "invoked from spark.sql. Integer inputs keep the even-count "
    "midpoints exact in binary, so DuckDB's native median()/mad() "
    "reproduce the Arrow-batched kernels digit-for-digit",
)
def sql_udaf_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.functions.sql_surface import register_sql_surface

    register_sql_surface(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udaf")
    return spark.sql(
        """
        SELECT source, median_agg(n_chars) AS med_chars, mad_agg(n_chars) AS mad_chars
        FROM _docs_udaf GROUP BY source
        """
    )


@query(
    "ingest_warc_roundtrip",
    oracle="""
    SELECT doc_id,
           'response' AS warc_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
           CAST(6 AS BIGINT) AS n_headers,
           sha256(text) AS payload_sha256
    FROM documents
    """,
    description="the WARC ingestion tier (ISO 28500 - the format "
    "CommonCrawl ships ~100 TB/crawl of): documents staged as REAL "
    "multi-record gzipped WARC/1.0 files (50 records each, "
    "deterministic bytes), then parsed back by the strict stdlib "
    "parser (CRLF framing, header block, byte-exact Content-Length "
    "slicing - multi-byte UTF-8 payloads in the zh/es/de/fr slices "
    "make byte-vs-char bugs observable - record trailers, transparent "
    "gunzip). One row per parsed record; the oracle replays the "
    "metadata + payload digest closed-form from the source table, so "
    "any framing drift hash-mismatches. Parse is per-file-stateful, "
    "across-files parallel - the million-WARC-files crawl posture",
)
def ingest_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.ingest.warc import (
        documents_to_warc,
        warc_records,
    )

    docs = load_table(spark, sf_dir, "documents")
    files = documents_to_warc(docs, records_per_file=50, gzip=True)
    recs = warc_records(files)
    return recs.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("bigint").alias("doc_id"),
        "warc_type",
        "content_length",
        "n_headers",
        "payload_sha256",
    )


@query(
    "ingest_jsonl_roundtrip",
    oracle="""
    SELECT doc_id, lang, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           sha256(text) AS text_sha256
    FROM documents
    """,
    description="the JSONL interchange path (the format LLM corpora "
    "ship in): documents written with the native json sink, read back "
    "with an EXPLICIT schema (no inference pre-pass - at 100 TB "
    "inference is a full extra read, and explicit types pin the table "
    "against shard-local drift). The oracle replays every column plus "
    "a payload digest from the source table, so any serialization "
    "loss (unicode escaping, number coercion, null handling) "
    "hash-mismatches",
)
def ingest_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.runtime import scratch_dir

    from auraverse_etl_pipeline_spark.sources.tables import (
        read_jsonl_corpus,
        write_jsonl_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir(prefix="jsonl_corpus_") + "/docs"
    write_jsonl_corpus(docs, path)
    back = read_jsonl_corpus(
        spark,
        path,
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return back.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.sha2("text", 256).alias("text_sha256"),
    )
