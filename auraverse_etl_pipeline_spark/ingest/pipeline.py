"""Spark pipeline over the document ETL core.

The dataflow mirrors the reference lifecycle (SURVEY.md §3) re-shaped
for a cluster:

    documents(doc_id, text)
      → detect_fragments     (Arrow-batched mapInPandas, 1 pass/doc)
      → fragments(doc_id, format_type, start_index, end_index,
                  confidence, text, meta)
      → extract_records      (normalize per fragment)
      → records(doc_id, format, start, end, data:jsonstr)
      → infer_schema_fields  (flatten leaf paths)
      → schema_fields(doc_id, name, path, type, nullable, example,
                      confidence)
      → summarize_fragments  (the reference's only aggregation, A1)

Detection/normalization is stateful *within* a document but
embarrassingly parallel *across* documents, so the whole suite runs
executor-side inside ``mapInPandas`` — the only shuffle in the pipeline
is the final summary groupBy. Arrow batch transfer keeps the
Python-boundary cost at columns-per-batch, not per-row pickling.

``extract_records`` runs detect+normalize in ONE pass instead of
re-detecting — at 100 TB you never want to pay the detector twice.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from auraverse_etl_pipeline_spark.ingest.detect import Fragment, detect_document
from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment
from auraverse_etl_pipeline_spark.ingest.schema_infer import fields_for_data
from auraverse_etl_pipeline_spark.runtime import ship_package

#: DetectedBlock contract (FIXTURES.md §3; reference etl_parser.py:451-458)
FRAGMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format_type", StringType()),
        StructField("start_index", LongType()),
        StructField("end_index", LongType()),
        StructField("confidence", DoubleType()),
        StructField("text", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

#: NormalizedRecord contract (reference etl_parser.py:1067-1075); ``data``
#: is a JSON string — records are heterogeneous, so typing happens late
#: via from_json/schema_of_json at the consumer.
RECORD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("data", StringType()),
    ]
)

#: SchemaField contract (reference etl_parser.py:45-53, v1 layer).
SCHEMA_FIELD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("name", StringType()),
        StructField("path", StringType()),
        StructField("type", StringType()),
        StructField("nullable", BooleanType()),
        StructField("example", StringType()),
        StructField("confidence", DoubleType()),
    ]
)


def _meta_strings(meta: dict) -> dict[str, str]:
    return {str(k): str(v) for k, v in meta.items()}


def _fragment_row(doc_id: int, frag: Fragment) -> dict[str, Any]:
    return {
        "doc_id": doc_id,
        "format_type": frag.format_type,
        "start_index": frag.start,
        "end_index": frag.end,
        "confidence": frag.confidence,
        "text": frag.text,
        "meta": _meta_strings(frag.meta),
    }


def _parallelize(cols: DataFrame) -> DataFrame:
    """Spread docs across all cores before the Python-heavy stages.

    The detector is CPU-bound per document; a small parquet input
    arrives as ONE split, which would serialize the whole corpus
    through a single Python worker. Only repartitions when the scan
    has fewer splits than cores — at real scale (thousands of input
    files) this is a no-op, so no extra shuffle of the text."""
    if cols.isStreaming:
        # micro-batch sizing is the stream source's job
        # (maxFilesPerTrigger); .rdd is illegal on a streaming plan
        return cols
    par = cols.sparkSession.sparkContext.defaultParallelism
    if cols.rdd.getNumPartitions() >= par:
        return cols
    return cols.repartition(par, "doc_id")


def detect_fragments(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """documents → fragments (SURVEY.md §2.2, all detectors, one pass)."""
    ship_package(docs.sparkSession)
    cols = _parallelize(
        docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [
                _fragment_row(doc_id, frag)
                for doc_id, text in zip(batch["doc_id"], batch["text"])
                for frag in detect_document(text or "")
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in FRAGMENT_SCHEMA.fields])

    return cols.mapInPandas(run, schema=FRAGMENT_SCHEMA)


def extract_records(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """documents → normalized records in ONE detector pass per doc."""
    ship_package(docs.sparkSession)
    cols = _parallelize(
        docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                for frag in detect_document(text or ""):
                    data = normalize_fragment(frag.format_type, frag.text, frag.meta)
                    if data is None:
                        continue
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "format": frag.format_type,
                            "start": frag.start,
                            "end": frag.end,
                            "data": json.dumps(data, ensure_ascii=False),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in RECORD_SCHEMA.fields])

    return cols.mapInPandas(run, schema=RECORD_SCHEMA)


def normalize_fragments(fragments: DataFrame) -> DataFrame:
    """fragments → records, when the fragments DataFrame already exists
    (e.g. persisted); otherwise prefer :func:`extract_records`."""
    ship_package(fragments.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                data = normalize_fragment(rec.format_type, rec.text, dict(rec.meta or {}))
                if data is None:
                    continue
                rows.append(
                    {
                        "doc_id": rec.doc_id,
                        "format": rec.format_type,
                        "start": rec.start_index,
                        "end": rec.end_index,
                        "data": json.dumps(data, ensure_ascii=False),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RECORD_SCHEMA.fields])

    return fragments.mapInPandas(run, schema=RECORD_SCHEMA)


def infer_schema_fields(records: DataFrame) -> DataFrame:
    """records → advisory schema_fields (v1 contract, SURVEY.md §3 EP3)."""
    ship_package(records.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                try:
                    data = json.loads(rec.data)
                except (TypeError, ValueError):
                    continue
                for fld in fields_for_data(data):
                    rows.append(
                        {
                            "doc_id": rec.doc_id,
                            "name": fld.name,
                            "path": fld.path,
                            "type": fld.type,
                            "nullable": fld.nullable,
                            "example": None if fld.example is None else str(fld.example),
                            "confidence": fld.confidence,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in SCHEMA_FIELD_SCHEMA.fields])

    return records.mapInPandas(run, schema=SCHEMA_FIELD_SCHEMA)


def summarize_fragments(fragments: DataFrame, per_doc: bool = False) -> DataFrame:
    """A1, the reference's only aggregation: fragment counts by format
    (``etl_parser.py:1077-1080``) — here one shuffle, map-side combined."""
    keys = ["doc_id", "format_type"] if per_doc else ["format_type"]
    return fragments.groupBy(*keys).agg(F.count("*").alias("n_fragments"))


def consolidated_schema(schema_fields: DataFrame) -> DataFrame:
    """Corpus-level schema report: one row per path with modal type,
    occurrence count, and nullability — the aggregate the v1 layer never
    had but its consumers wanted."""
    return (
        schema_fields.groupBy("path")
        .agg(
            F.mode("type").alias("type"),
            F.count("*").alias("n_occurrences"),
            F.max("nullable").alias("nullable"),
            F.first("example", ignorenulls=True).alias("example"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def typed_records(records: DataFrame, format_type: str, sample_size: int = 1000) -> DataFrame:
    """Materialize one format's records as a TYPED DataFrame (SURVEY §7
    M4: the engine's own inference for actual typing, with the
    SchemaField layer staying advisory).

    Schema comes from ``schema_of_json`` over a sampled record —
    then every record parses with one ``from_json`` against that
    schema (executor-side, no driver collect of the data). Records
    whose shape disagrees with the inferred schema get nulls in the
    mismatched fields, mirroring ``spark.read.json`` semantics.

    At 100 TB you infer once per (corpus, format) and persist the
    schema next to the dataset; ``sample_size`` bounds the inference
    scan either way.

    Inference is one aggregate: the sampled records fold executor-side
    into a single JSON array string, and ``schema_of_json`` (the JVM's
    own JsonInferSchema, the engine ``from_json`` is defined against)
    merges the element schemas. The driver never sees per-record rows —
    only the one bounded aggregate and the resulting DDL string; no
    ``.collect()``/``.rdd``/``createDataFrame`` round-trip."""
    from pyspark.sql.types import ArrayType, DataType

    data = records.filter(F.col("format") == format_type).select("doc_id", "start", "data")
    spark = records.sparkSession
    agg = (
        data.select("data")
        # empty/whitespace-only strings pass isNotNull but poison
        # schema_of_json over the concatenated array — filter both,
        # like the PERMISSIVE reader's 'if r.data' guard this path
        # replaced
        .filter(F.col("data").isNotNull() & (F.length(F.trim("data")) > 0))
        .limit(sample_size)
        .agg(
            F.concat(
                F.lit("["), F.concat_ws(",", F.collect_list("data")), F.lit("]")
            ).alias("arr")
        )
        .first()
    )
    if agg is None or agg.arr == "[]":
        return data.select("doc_id", "start").withColumn("record", F.lit(None).cast("string"))
    try:
        ddl = spark.range(1).select(F.schema_of_json(F.lit(agg.arr)).alias("d")).first().d
        parsed = DataType.fromDDL(ddl)
    except Exception:
        # one malformed/scalar sampled record must not fail the whole
        # format — degrade to the raw JSON string (PERMISSIVE spirit)
        return data.select("doc_id", "start", F.col("data").alias("record"))
    schema = parsed.elementType if isinstance(parsed, ArrayType) else parsed
    return data.select("doc_id", "start", F.from_json("data", schema).alias("record"))
