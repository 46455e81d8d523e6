"""Drop-in library API matching the reference's entry points.

The reference is consumed as ``from etl_parser import parse_file``
(trial2.py:1-6) returning ``{"fragments", "summary", "records"}``
(v2, etl_parser.py:1053-1082) — and its documented contract also
promises ``"fields"`` (module docstring etl_parser.py:5-11), which
only the commented-out v1 produced (etl_parser.py:399-429), so the
shipped trial scripts crash. This API restores the FULL contract.

Pure Python on purpose: one document needs no cluster. The Spark
pipeline (`ingest/pipeline.py`) is the same functions mapped over a
corpus — these wrappers make single-document use and testing trivial,
and they are exactly what executors run per document.
"""

from __future__ import annotations

import json
from typing import Any

from auraverse_etl_pipeline_spark.ingest.convert import convert_document
from auraverse_etl_pipeline_spark.ingest.detect import detect_document
from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment
from auraverse_etl_pipeline_spark.ingest.schema_infer import fields_for_data


def parse_file(text: str) -> dict[str, Any]:
    """Reference ``parse_file`` (etl_parser.py:1053-1082) plus the v1
    ``fields`` layer the docstring promises:

    - ``fragments``: list of dicts with the DetectedBlock contract
      (format_type, start_index, end_index, confidence, text, meta)
    - ``records``: ``{"format", "start", "end", "data"}`` per
      normalizable fragment
    - ``summary``: fragment count per format_type
    - ``fields``: inferred SchemaField dicts over every record
      (name, path, type, nullable, example, confidence)
    """
    fragments = detect_document(text or "")
    records: list[dict[str, Any]] = []
    fields: list[dict[str, Any]] = []
    summary: dict[str, int] = {}
    for frag in fragments:
        summary[frag.format_type] = summary.get(frag.format_type, 0) + 1
        data = normalize_fragment(frag.format_type, frag.text, frag.meta)
        if data is None:
            continue
        records.append(
            {"format": frag.format_type, "start": frag.start, "end": frag.end, "data": data}
        )
        fields.extend(
            {
                "name": f.name,
                "path": f.path,
                "type": f.type,
                "nullable": f.nullable,
                "example": f.example,
                "confidence": f.confidence,
            }
            for f in fields_for_data(data)
        )
    return {
        "fragments": [
            {
                "format_type": f.format_type,
                "start_index": f.start,
                "end_index": f.end,
                "confidence": f.confidence,
                "text": f.text,
                "meta": dict(f.meta),
            }
            for f in fragments
        ],
        "summary": summary,
        "records": records,
        "fields": fields,
    }


def convert_file(input_path: str, output_path: str | None = None) -> dict[str, Any]:
    """Reference ``script.py`` main flow (script.py:540-576): read one
    file, convert to the merged clean JSON, write it pretty-printed to
    ``output_path`` (default ``<stem>_parsed2.json``, script.py:558);
    returns the merged dict."""
    import os

    with open(input_path, encoding="utf-8") as fh:
        text = fh.read()
    merged = convert_document(text)
    out = output_path or f"{os.path.splitext(input_path)[0]}_parsed2.json"
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(merged, fh, indent=2, ensure_ascii=False)
    return merged
