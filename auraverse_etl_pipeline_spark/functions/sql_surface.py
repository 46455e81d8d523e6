"""SQL-callable surface (SURVEY.md §2.5).

The reference's only "registry" is the hardcoded detector list in
``run_all`` (etl_parser.py:866-877) and ``FORMAT_PRIORITY``
(etl_parser.py:461-474). The rebuild exposes the same capabilities as
named functions a SQL user can call directly:

- **Python UDTFs** (``LATERAL`` fan-out, Spark 3.5+):
  ``detect_fragments(text)`` and ``extract_records(text)`` — one call
  per document, one output row per fragment/record.
- **Python scalar UDFs**: ``normalize_fragment(format, text)`` →
  JSON string; ``repair_json(text)`` (reference
  ``_attempt_repair_json``, etl_parser.py:972-982).
- **SQL UDFs** (pure-expression, no Python boundary): token counting,
  quality ratios, fingerprints — the text-analysis column functions
  from ``functions/text.py`` spelled as ``CREATE FUNCTION … RETURN``
  so they stay whole-stage-codegen inside ``spark.sql`` queries.

After ``register_sql_surface(spark)``::

    SELECT d.doc_id, f.format_type, f.confidence
    FROM documents d, LATERAL detect_fragments(d.text) f

runs the whole detector suite per document with executor-side fan-out.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.functions import udf, udtf

from auraverse_etl_pipeline_spark.runtime import ship_package

_FRAGMENT_COLS = (
    "format_type string, start_index bigint, end_index bigint, "
    "confidence double, text string, meta map<string,string>"
)
_RECORD_COLS = "format string, start bigint, end bigint, data string"


@udtf(returnType=_FRAGMENT_COLS)
class DetectFragmentsUDTF:
    """Fan out one row per detected fragment of a document."""

    def eval(self, text: str):  # noqa: D102
        from auraverse_etl_pipeline_spark.ingest.detect import detect_document

        for frag in detect_document(text or ""):
            yield (
                frag.format_type,
                frag.start,
                frag.end,
                frag.confidence,
                frag.text,
                {str(k): str(v) for k, v in frag.meta.items()},
            )


@udtf(returnType=_RECORD_COLS)
class ExtractRecordsUDTF:
    """Fan out one row per normalized record (detect + normalize in one pass)."""

    def eval(self, text: str):  # noqa: D102
        from auraverse_etl_pipeline_spark.ingest.detect import detect_document
        from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment

        for frag in detect_document(text or ""):
            data = normalize_fragment(frag.format_type, frag.text, frag.meta)
            if data is None:  # match extract_records: unnormalizable → no record
                continue
            yield (
                frag.format_type,
                frag.start,
                frag.end,
                json.dumps(data, ensure_ascii=False),
            )


def _normalize_fragment_json(format_type: str, text: str) -> str | None:
    from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment

    data = normalize_fragment(format_type or "", text or "", {})
    return None if data is None else json.dumps(data, ensure_ascii=False)


def _repair_json(text: str) -> str:
    from auraverse_etl_pipeline_spark.ingest.normalize import repair_json_text

    return repair_json_text(text or "")


#: name → (CREATE FUNCTION arg list, RETURN expression). Pure SQL — these
#: compile to the same native expressions as the Column functions in
#: functions/text.py (kept textually in sync; parity pinned in pytest).
_SQL_UDFS: dict[str, tuple[str, str]] = {
    "token_count": (
        "(t STRING) RETURNS BIGINT",
        "size(split(trim(t), '\\\\s+'))",
    ),
    "punct_ratio": (
        "(t STRING) RETURNS DOUBLE",
        "length(regexp_replace(t, '[^.,;:!?]', '')) / length(t)",
    ),
    "avg_token_len": (
        "(t STRING) RETURNS DOUBLE",
        "length(regexp_replace(t, '\\\\s', '')) / size(split(trim(t), '\\\\s+'))",
    ),
    "content_fingerprint": (
        "(t STRING) RETURNS STRING",
        "md5(array_join(array_sort(array_distinct(split(trim(t), '\\\\s+'))), ' '))",
    ),
}


def register_sql_surface(spark: SparkSession) -> list[str]:
    """Register every SQL-callable function on this session (idempotent);
    returns the registered names."""
    ship_package(spark)
    spark.udtf.register("detect_fragments", DetectFragmentsUDTF)
    spark.udtf.register("extract_records", ExtractRecordsUDTF)
    spark.udf.register("normalize_fragment", udf(_normalize_fragment_json, "string"))
    spark.udf.register("repair_json", udf(_repair_json, "string"))
    for name, (signature, body) in _SQL_UDFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{signature} RETURN {body}")
    return ["detect_fragments", "extract_records", "normalize_fragment", "repair_json", *_SQL_UDFS]
