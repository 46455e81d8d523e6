"""Merged-document converter: one messy document → one clean JSON dict.

Behavioral parity with the reference's second pipeline, the "Universal
Data to JSON Converter" (``script.py:83-533``, SURVEY.md §2 D17/D18,
N9-N15, T1-T4), golden-tested byte-equal against the reference's own
committed output (``input_parsed2.json``).

Known reference quirks replicated deliberately (golden parity beats
local prettiness; documented per SURVEY.md §7 risk register):

- greedy JSON extraction ``\\{.*\\}`` can merge everything between the
  first and last brace of a section (``script.py:220``);
- ``fix_json`` quotes every ``word:`` occurrence, which can corrupt
  values containing colons (``script.py:248``);
- section merge is last-wins for root-merged keys (``script.py:135``).

Pure Python; the Spark wrapper is :func:`convert_corpus` below — one
Arrow batch pass, no shuffle at all (per-document work only).
"""

from __future__ import annotations

import csv
import json
import re
from collections.abc import Iterator
from html.parser import HTMLParser
from io import StringIO
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

# ---------------------------------------------------------------------------
# Scalar helpers (reference T1/T2: script.py:482-515)
# ---------------------------------------------------------------------------

_TRUE_WORDS = frozenset({"true", "yes", "on"})
_FALSE_WORDS = frozenset({"false", "no", "off"})
_NULL_WORDS = frozenset({"null", "none", "n/a", "na"})


def coerce_scalar(value: Any) -> Any:
    """String → bool / None / int / float (comma-decimal aware) / str."""
    if not isinstance(value, str):
        return value
    value = value.strip().strip("\"'")
    low = value.lower()
    if low in _TRUE_WORDS:
        return True
    if low in _FALSE_WORDS:
        return False
    if low in _NULL_WORDS:
        return None
    try:
        return float(value.replace(",", ".")) if "." in value else int(value)
    except ValueError:
        return value


def clean_key(key: str) -> str:
    """Lowercase, strip non-word chars, spaces → underscores."""
    key = re.sub(r"[^\w\s-]", "", key)
    return re.sub(r"\s+", "_", key.strip()).lower()


# ---------------------------------------------------------------------------
# OCR repair + free-text entity extraction (script.py:425-480)
# ---------------------------------------------------------------------------

OCR_FIXES: tuple[tuple[str, str], ...] = (
    (r"l0cation", "location"),
    (r"\bO\b(?=\d)", "0"),
    (r"one hundred and twenty", "120"),
)

_PHONE_RE = re.compile(r"\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}")
_EMAIL_RE = re.compile(r"[\w\.-]+@[\w\.-]+\.\w+")
_URL_RE = re.compile(r'https?://[^\s<>"]+')
_PRICE_RE = re.compile(r"\$?\d+[.,]\d{2}")
_INLINE_KV_RE = re.compile(r"(\w+):\s*([^\n]+)")


def fix_ocr_errors(text: str) -> str:
    for pattern, repl in OCR_FIXES:
        text = re.sub(pattern, repl, text, flags=re.IGNORECASE)
    return text


def extract_text_entities(text: str) -> dict[str, Any]:
    """Entity extraction from prose: phone/email/urls/prices + inline
    key:value pairs; falls back to ``{'text': ...}`` when sparse."""
    out: dict[str, Any] = {}
    text = fix_ocr_errors(text)
    if m := _PHONE_RE.search(text):
        out["phone"] = m.group()
    if m := _EMAIL_RE.search(text):
        out["email"] = m.group()
    if urls := _URL_RE.findall(text):
        out["urls"] = urls
    if prices := _PRICE_RE.findall(text):
        out["prices"] = [p.replace(",", ".") for p in prices]
    for m in _INLINE_KV_RE.finditer(text):
        key = clean_key(m.group(1))
        if len(key) > 2:
            out[key] = coerce_scalar(m.group(2).strip())
    if len(out) < 2:
        out["text"] = text
    return out


# ---------------------------------------------------------------------------
# JSON section parsing (script.py:211-282)
# ---------------------------------------------------------------------------

_GREEDY_OBJ_RE = re.compile(r"\{.*\}", re.DOTALL)
_TRAIL_COMMA_RE = re.compile(r",(\s*[}\]])")
_MISSING_COMMA_RE = re.compile(r'"\s*\n\s*"')
_SINGLE_Q_RE = re.compile(r"'([^']*)'")
_UNQUOTED_KEY_RE = re.compile(r"(\w+):")
_PAIR_PATTERNS = (
    re.compile(r'"(\w+)":\s*"([^"]*)"'),
    re.compile(r'"(\w+)":\s*(\d+\.?\d*)'),
    re.compile(r'"(\w+)":\s*(true|false)'),
)
_JSON_LD_SCRIPT_RE = re.compile(
    r'<script[^>]*type="application/ld\+json"[^>]*>(.*?)</script>',
    re.DOTALL | re.IGNORECASE,
)


def patch_json_syntax(s: str) -> str:
    s = _TRAIL_COMMA_RE.sub(r"\1", s)
    s = _MISSING_COMMA_RE.sub('",\n"', s)
    s = _SINGLE_Q_RE.sub(r'"\1"', s)
    return _UNQUOTED_KEY_RE.sub(r'"\1":', s)


def scrape_json_pairs(s: str) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for pattern in _PAIR_PATTERNS:
        for key, val in pattern.findall(s):
            out[key] = coerce_scalar(val)
    return out


def parse_lenient_json(text: str) -> dict[str, Any] | None:
    try:
        return json.loads(text)
    except (ValueError, RecursionError):
        pass
    m = _GREEDY_OBJ_RE.search(text)
    if not m:
        return None
    patched = patch_json_syntax(m.group())
    try:
        return json.loads(patched)
    except (ValueError, RecursionError):
        return scrape_json_pairs(patched)


def parse_json_ld_section(text: str) -> dict[str, Any]:
    """JSON-LD payload minus top-level ``@`` keys (script.py:269-282;
    golden drops ``@context``/``@type``)."""
    m = _JSON_LD_SCRIPT_RE.search(text)
    if not m:
        return {}
    try:
        data = json.loads(m.group(1))
        return {k: v for k, v in data.items() if not k.startswith("@")}
    except (ValueError, RecursionError):
        return {}


# ---------------------------------------------------------------------------
# HTML table parsing (script.py:21-76, 288-302) — stdlib state machine
# ---------------------------------------------------------------------------


class _TableScraper(HTMLParser):
    def __init__(self):
        super().__init__()
        self.headers: list[str] = []
        self.rows: list[list[str]] = []
        self._row: list[str] = []
        self._cell: list[str] = []
        self._in_cell = False
        self._row_is_header = False

    def handle_starttag(self, tag, attrs):
        if tag == "tr":
            self._row = []
        elif tag in ("th", "td"):
            self._in_cell = True
            self._row_is_header = tag == "th"

    def handle_endtag(self, tag):
        if tag == "tr":
            if self._row_is_header:
                self.headers = self._row
            else:
                self.rows.append(self._row)
        elif tag in ("th", "td"):
            self._in_cell = False
            self._row.append("".join(self._cell).strip())
            self._cell = []

    def handle_data(self, data):
        if self._in_cell:
            self._cell.append(data)


def parse_table_section(text: str) -> dict[str, Any]:
    scraper = _TableScraper()
    scraper.feed(text)
    if not scraper.headers or not scraper.rows:
        return {}
    rows = [
        {k: coerce_scalar(v) for k, v in zip(scraper.headers, row)}
        for row in scraper.rows
        if len(row) == len(scraper.headers)
    ]
    return {"table_data": rows} if rows else {}


# ---------------------------------------------------------------------------
# CSV / KV sections (script.py:308-397)
# ---------------------------------------------------------------------------


def looks_like_csv(text: str) -> bool:
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if len(lines) < 2:
        return False
    sep_count = lines[0].count(",") or lines[0].count("\t")
    if sep_count == 0:
        return False
    return all(ln.count(",") == sep_count or ln.count("\t") == sep_count for ln in lines[:3])


def parse_csv_section(text: str) -> dict[str, Any]:
    delimiter = "," if "," in text.split("\n")[0] else "\t"
    try:
        rows = list(csv.DictReader(StringIO(text), delimiter=delimiter))
    except csv.Error:
        return {}
    typed = [{k: coerce_scalar(v) for k, v in row.items()} for row in rows]
    if len(typed) == 1:
        return typed[0]  # single row promotes to a flat dict
    return {"table_data": typed} if typed else {}


_KV_LINE_RE = re.compile(r"^\w+\s*[:=]\s*.+")


def looks_like_key_value(text: str) -> bool:
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    if not lines:
        return False
    hits = sum(1 for ln in lines if _KV_LINE_RE.match(ln))
    return hits > len(lines) * 0.5


def parse_kv_section(text: str) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#") or line.startswith("//"):
            continue
        # separator precedence: ': ' then '=' then bare ':'
        for sep in (": ", "=", ":"):
            if sep in line:
                key, _, val = line.partition(sep)
                break
        else:
            continue
        val = val.strip()
        out[clean_key(key)] = (
            [coerce_scalar(v.strip()) for v in val.split(";")] if ";" in val else coerce_scalar(val)
        )
    return out


_JS_VAR_RE = re.compile(r"var\s+\w+\s*=\s*(\{[^}]+\})")


def parse_js_section(text: str) -> dict[str, Any]:
    m = _JS_VAR_RE.search(text)
    if not m:
        return {}
    body = _UNQUOTED_KEY_RE.sub(r'"\1":', m.group(1)).replace("'", '"')
    try:
        return json.loads(body)
    except (ValueError, RecursionError):
        return scrape_json_pairs(body)


# ---------------------------------------------------------------------------
# Dispatch + merge (script.py:93-205)
# ---------------------------------------------------------------------------


def parse_section(text: str) -> dict[str, Any]:
    """Cheap-predicate sniff cascade over one section (D17)."""
    text = text.strip()
    if "<script" in text and "application/ld+json" in text:
        return parse_json_ld_section(text)
    if "{" in text and '"' in text:
        if (data := parse_lenient_json(text)) is not None:
            return data
    if "<table" in text.lower():
        return parse_table_section(text)
    if looks_like_csv(text):
        return parse_csv_section(text)
    if looks_like_key_value(text):
        return parse_kv_section(text)
    if "var " in text and "{" in text:
        return parse_js_section(text)
    return extract_text_entities(text)


def merge_section(result: dict[str, Any], title: str, parsed: dict[str, Any]) -> dict[str, Any]:
    """Route a parsed section by title keyword (T3, script.py:129-168):
    metadata/JSON/OCR merge to root (last-wins), tables/CSV append to
    arrays, SQL/code becomes ``code_snippet``, else nest under the
    cleaned title."""
    tu = title.upper()
    if "METADATA" in tu or "KEY-VALUE" in tu or "JSON" in tu or "OCR" in tu:
        result.update(parsed)
    elif "HTML" in tu or "TABLE" in tu:
        if "table_data" in parsed:
            result.setdefault("tables", []).extend(parsed["table_data"])
    elif "CSV" in tu:
        if "table_data" in parsed:
            result.setdefault("csv_data", []).extend(parsed["table_data"])
    elif "SQL" in tu or "CODE" in tu:
        result["code_snippet"] = parsed.get("text", "")
    else:
        result[clean_key(title)] = parsed
    return result


def collapse_single_keys(data: Any) -> Any:
    """``{user: {name: X}} → {user_name: X}`` for single-key dict values
    (T4, script.py:517-533)."""
    if not isinstance(data, dict):
        return data
    out: dict[str, Any] = {}
    for key, value in data.items():
        if isinstance(value, dict) and len(value) == 1:
            nested_key, nested_value = next(iter(value.items()))
            out[f"{key}_{nested_key}"] = nested_value
        elif isinstance(value, dict):
            out[key] = collapse_single_keys(value)
        else:
            out[key] = value
    return out


def convert_document(text: str) -> dict[str, Any]:
    """One document → one merged clean dict (EP2, SURVEY.md §3)."""
    text = text.strip()
    if not text:
        return {}
    if "---" not in text:
        return parse_section(text)
    result: dict[str, Any] = {}
    for i, section in enumerate(re.split(r"\n---\s*", text)):
        section = section.strip()
        if not section:
            continue
        title, _, rest = section.partition("\n")
        content = rest.strip() if rest else section
        result = merge_section(result, title.strip(), parse_section(content))
    return collapse_single_keys(result)


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------

MERGED_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("merged", StringType())]
)


def convert_corpus(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """documents → (doc_id, merged JSON string); shuffle-free."""
    from auraverse_etl_pipeline_spark.runtime import ship_package

    ship_package(docs.sparkSession)
    cols = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "merged": [
                        json.dumps(convert_document(t or ""), ensure_ascii=False)
                        for t in batch["text"]
                    ],
                }
            )

    return cols.mapInPandas(run, schema=MERGED_SCHEMA)
