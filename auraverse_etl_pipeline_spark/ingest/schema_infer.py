"""Advisory schema inference over normalized records.

Restores the reference's v1 output contract (SURVEY.md §3 EP3): the
``fields`` key produced by ``Flattener.flatten`` + ``_infer_type``
(``etl_parser.py:354-392``, dataclass ``etl_parser.py:45-53``) which the
trial scripts consume (``trial2.py:21-23``) but the active v2 dropped.

Inference stays advisory (a report DataFrame), per SURVEY.md §1.2 — the
engine's actual typing uses Spark's own inference / explicit schemas.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

_ISO_DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}")

#: Reference type vocabulary (etl_parser.py:379-392); SURVEY.md §1.2 maps
#: these onto Spark types.
TYPE_NAMES = ("boolean", "integer", "number", "string", "date", "null")


@dataclass(frozen=True)
class SchemaField:
    name: str
    path: str
    type: str
    nullable: bool
    example: Any
    confidence: float


def infer_value_type(value: Any) -> str:
    """JSON-flavored dynamic typing; ISO-looking strings are dates."""
    if isinstance(value, bool):  # bool before int: bool is an int subclass
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    if isinstance(value, str):
        return "date" if _ISO_DATE_RE.match(value) else "string"
    if value is None:
        return "null"
    return "string"


def flatten_record(obj: Any, prefix: str = "") -> list[SchemaField]:
    """Leaf walk: dicts → dotted paths, lists → ``path[i]``, leaves →
    one SchemaField each."""
    fields: list[SchemaField] = []
    if isinstance(obj, dict):
        for key, val in obj.items():
            fields.extend(flatten_record(val, f"{prefix}.{key}" if prefix else str(key)))
    elif isinstance(obj, list):
        for i, val in enumerate(obj):
            fields.extend(flatten_record(val, f"{prefix}[{i}]"))
    else:
        fields.append(
            SchemaField(
                name=prefix.split(".")[-1],
                path=prefix,
                type=infer_value_type(obj),
                nullable=obj is None,
                example=obj,
                confidence=0.95,
            )
        )
    return fields


def fields_for_data(data: Any) -> list[SchemaField]:
    """Fields for one normalized record; list records fan out one
    element at a time (v1 ``parse_file``, ``etl_parser.py:409-418``)."""
    if data is None:
        return []
    items = data if isinstance(data, list) else [data]
    out: list[SchemaField] = []
    for item in items:
        out.extend(flatten_record(item))
    return out
