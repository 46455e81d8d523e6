"""SQL-callable surface (SURVEY.md §2.5).

The reference's only "registry" is the hardcoded detector list in
``run_all`` (etl_parser.py:866-877) and ``FORMAT_PRIORITY``
(etl_parser.py:461-474). The rebuild exposes the same capabilities as
named functions a SQL user can call directly:

- **Python UDTFs** (``LATERAL`` fan-out, Spark 3.5+):
  ``detect_fragments(text)`` and ``extract_records(text)`` — one call
  per document, one output row per fragment/record.
- **Arrow-batched pandas UDF**: ``normalize_fragment(format, text)``
  → JSON string (per-format Python normalizers are genuinely
  imperative, but the transfer is Arrow-batched, never per-row).
- **SQL UDFs** (pure-expression, no Python boundary): token counting,
  quality ratios, fingerprints, AND ``repair_json`` — the reference's
  ``_attempt_repair_json`` (etl_parser.py:972-982) is a pure
  regex-substitution chain, so it compiles to three nested
  ``regexp_replace`` calls (same regexes as
  ``ingest/normalize.py:repair_json_text``, parity pinned in pytest)
  and stays whole-stage-codegen inside ``spark.sql`` queries.

After ``register_sql_surface(spark)``::

    SELECT d.doc_id, f.format_type, f.confidence
    FROM documents d, LATERAL detect_fragments(d.text) f

runs the whole detector suite per document with executor-side fan-out.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf

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


def _normalize_fragment_batch(fmts, texts):
    """Arrow-batch kernel for ``normalize_fragment`` (module-level so
    executors unpickle it by reference — needs ``ship_package``)."""
    import pandas as pd

    from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment

    out = []
    for fmt, text in zip(fmts, texts):
        data = normalize_fragment(fmt or "", text or "", {})
        out.append(None if data is None else json.dumps(data, ensure_ascii=False))
    return pd.Series(out, dtype=object)


def _median_agg(v: pd.Series) -> float:
    """GROUPED_AGG kernel: exact median. On integer inputs the
    even-count midpoint is a half, exact in binary — so DuckDB's
    ``median()`` reproduces it digit-for-digit (the same reason the
    repo's other oracles avoid ``ln``-family floats)."""
    import numpy as np

    return float(np.median(v.to_numpy().astype("float64")))


def _mad_agg(v: pd.Series) -> float:
    """GROUPED_AGG kernel: median absolute deviation — DuckDB's
    ``mad()``. Exact on integer inputs for the same half-is-exact
    reason as :func:`_median_agg`."""
    import numpy as np

    a = v.to_numpy().astype("float64")
    return float(np.median(np.abs(a - np.median(a))))


#: name → (CREATE FUNCTION arg list, RETURN expression). Pure SQL — these
#: compile to the same native expressions as the Column functions in
#: functions/text.py and the repair chain in ingest/normalize.py (kept
#: textually in sync; parity pinned in pytest).
_SQL_UDFS: dict[str, tuple[str, str]] = {
    # the three conservative repairs of normalize.repair_json_text, in
    # the same order: trailing commas → single-quoted values → bare
    # keys. coalesce keeps the old Python UDF's NULL → '' behavior.
    "repair_json": (
        "(t STRING) RETURNS STRING",
        "regexp_replace(regexp_replace(regexp_replace(coalesce(t, ''), "
        r"',\\s*(?=[}\\]])', ''), "
        r"'(?<=[:\\s])\'([^\']*)\'', '\"$1\"'), "
        r"'([{,\\s])([A-Za-z0-9_\\-]+)\\s*:', '$1\"$2\":')",
    ),
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
    # round-5 additions: the deterministic sampling key and the hashed
    # feature bucket, so ad-hoc SQL can reproduce the engine's sampling
    # and classifier decisions exactly
    "sample_key": (
        "(id BIGINT) RETURNS BIGINT",
        "(id * 2654435761) % 1000000007",
    ),
    "feature_bucket": (
        "(t STRING, width INT) RETURNS BIGINT",
        "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % width",
    ),
}


def register_sql_surface(spark: SparkSession) -> list[str]:
    """Register every SQL-callable function on this session (idempotent);
    returns the registered names."""
    ship_package(spark)
    spark.udtf.register("detect_fragments", DetectFragmentsUDTF)
    spark.udtf.register("extract_records", ExtractRecordsUDTF)
    # built lazily — a module-level pandas_udf would need a live
    # SparkContext at import time (cf. similarity.batch_cosine)
    spark.udf.register(
        "normalize_fragment", pandas_udf(_normalize_fragment_batch, "string")
    )
    # pandas GROUPED_AGG UDAFs (Arrow-batched aggregate extension point
    # — the §2.5 category the detector/normalizer UDFs don't cover);
    # the Series -> scalar type hints select the GROUPED_AGG eval type
    spark.udf.register("median_agg", pandas_udf(_median_agg, "double"))
    spark.udf.register("mad_agg", pandas_udf(_mad_agg, "double"))
    # Unicode canonicalization (Arrow-batched unicodedata kernels —
    # functions/unicode.py documents the DuckDB parity contract)
    from auraverse_etl_pipeline_spark.functions.unicode import fold_text, nfc_text

    spark.udf.register("nfc_text", nfc_text)
    spark.udf.register("fold_text", fold_text)
    for name, (signature, body) in _SQL_UDFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{signature} RETURN {body}")
    return [
        "detect_fragments",
        "extract_records",
        "normalize_fragment",
        "median_agg",
        "mad_agg",
        "nfc_text",
        "fold_text",
        *_SQL_UDFS,
    ]
