"""Per-format normalizers: fragment text → Python records.

Behavioral parity with the reference normalizer surface
(``etl_parser.py:927-1050``, SURVEY.md §2.3 N1-N8), written fresh as a
dispatch registry. Contract: return a dict / list-of-dicts / None; never
raise. The Spark layer serializes the result to a JSON string column
(heterogeneous records stay semi-structured until a late ``from_json``;
SURVEY.md §7 risk register).
"""

from __future__ import annotations

import csv
import json
import re
from io import StringIO
from typing import Any

from auraverse_etl_pipeline_spark.ingest.htmlmini import parse_html

# --- repair / harvest helpers ---------------------------------------------

_TRAILING_COMMA_RE = re.compile(r",\s*(?=[}\]])")
_SINGLE_QUOTED_RE = re.compile(r"(?<=[:\s])'([^']*)'")
_BARE_KEY_RE = re.compile(r"(?P<lead>[\{,\s])(?P<key>[A-Za-z0-9_\-]+)\s*:")
_KV_HARVEST_RE = re.compile(r"([A-Za-z0-9_\- ]{1,60})\s*[:=]\s*(\"[^\"]*\"|'[^']*'|[^,\n]+)")


def repair_json_text(s: str) -> str:
    """Conservative JSON repairs (``etl_parser.py:972-982``): drop
    trailing commas, double-quote single-quoted values, quote bare keys.
    Returns the repaired text; caller decides whether it parses."""
    s = _TRAILING_COMMA_RE.sub("", s)
    s = _SINGLE_QUOTED_RE.sub(r'"\1"', s)
    s = _BARE_KEY_RE.sub(r'\g<lead>"\g<key>":', s)
    return s


def harvest_kv_pairs(s: str) -> dict[str, str]:
    """Regex-harvest ``key: value`` pairs from arbitrary broken text
    (``etl_parser.py:984-989``) — the last-resort normalizer."""
    out: dict[str, str] = {}
    for key, val in _KV_HARVEST_RE.findall(s):
        out[key.strip()] = val.strip().strip('"').strip("'").strip()
    return out


# --- per-format normalizers ------------------------------------------------


def _norm_json(s: str, meta: dict) -> Any:
    return json.loads(s)


def _norm_malformed_json(s: str, meta: dict) -> Any:
    try:
        return json.loads(repair_json_text(s))
    except (ValueError, RecursionError):
        return harvest_kv_pairs(s)


def _norm_kv(s: str, meta: dict) -> dict[str, str]:
    """Line-oriented ``key: value`` split on the first colon
    (``etl_parser.py:991-997``)."""
    out: dict[str, str] = {}
    for line in s.splitlines():
        if ":" in line:
            key, _, val = line.partition(":")
            out[key.strip()] = val.strip().strip('"')
    return out


def _norm_html_table(s: str, meta: dict) -> list[dict[str, str]] | None:
    """HTML table → row dicts; headers from ``<thead><th>``, synthetic
    ``col_i`` otherwise (``etl_parser.py:999-1021``)."""
    dom = parse_html(s)
    table = dom.first("table")
    if table is None:
        return None
    headers: list[str] = []
    thead = table.first("thead")
    if thead is not None:
        headers = [th.text_content(strip=True) for th in thead.all("th")]
    rows: list[dict[str, str]] = []
    for tr in table.all("tr"):
        cells = [td.text_content(strip=True) for td in tr.all(("td", "th"))]
        if headers and len(cells) == len(headers):
            rows.append(dict(zip(headers, cells)))
        elif not headers and cells:
            rows.append({f"col_{i}": cell for i, cell in enumerate(cells)})
    return rows or None


def _norm_csv(s: str, meta: dict, *, headerless: bool = False) -> list[dict[str, str]] | None:
    """CSV → row dicts with sniffed dialect; headerless/single-row blocks
    get synthetic ``col_i`` headers (``etl_parser.py:1023-1050``)."""
    body = s.strip()
    if not body:
        return None
    try:
        dialect = csv.Sniffer().sniff(s.splitlines()[0])
        rows = list(csv.reader(StringIO(body), dialect=dialect))
    except csv.Error:
        rows = [line.split(",") for line in body.splitlines() if line.strip()]
    if not rows:
        return None
    if headerless or len(rows) < 2:
        header = [f"col_{i}" for i in range(len(rows[0]))]
        return [dict(zip(header, r)) for r in rows]
    return [dict(zip(rows[0], r)) for r in rows[1:]]


_JS_OBJ_BODY_RE = re.compile(r"=\s*(\{[\s\S]*\})\s*;?$")


def _norm_js_object(s: str, meta: dict) -> Any:
    """``var x = {...}`` → dict via quote swap, falling back to pair
    harvest (``etl_parser.py:953-964``)."""
    m = _JS_OBJ_BODY_RE.search(s)
    if not m:
        return None
    body = m.group(1)
    try:
        return json.loads(body.replace("'", '"'))
    except (ValueError, RecursionError):
        return harvest_kv_pairs(body)


def _norm_sql(s: str, meta: dict) -> dict[str, str]:
    """SQL is stored, never executed (``etl_parser.py:965-966``; the
    fixtures even include a quoted ``DROP TABLE`` as a trap)."""
    return {"sql": s}


NORMALIZERS = {
    "JSON": _norm_json,
    "JSON_LD": _norm_json,
    "MALFORMED_JSON": _norm_malformed_json,
    "CSV": _norm_csv,
    "CSV_NO_HEADER": lambda s, meta: _norm_csv(s, meta, headerless=True),
    "HTML_TABLE": _norm_html_table,
    "KEY_VALUE": _norm_kv,
    "YAML_FRONTMATTER": _norm_kv,
    "JS_OBJECT": _norm_js_object,
    "SQL": _norm_sql,
}


def normalize_fragment(format_type: str, text: str, meta: dict | None = None) -> Any:
    """Normalize one fragment; None for un-normalizable formats
    (RAW_TEXT, HTML) and on any parse failure — never raises."""
    fn = NORMALIZERS.get(format_type)
    if fn is None:
        return None
    try:
        return fn(text.strip(), meta or {})
    except Exception:
        return None
