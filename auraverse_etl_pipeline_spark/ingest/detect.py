"""Fragment detection: one messy document → typed spans with offsets.

Behavioral parity with the reference detector suite
(``/root/reference/etl_parser.py:532-924``, SURVEY.md §2.2 D1-D15),
re-implemented from scratch as a registry of detector functions over a
shared scan state. Parity points that matter (verified against golden
inventories from the reference on its own fixtures):

- Only JSON_LD / JSON / MALFORMED_JSON / HTML_TABLE / HTML /
  YAML_FRONTMATTER *reserve* their spans (``etl_parser.py:549-553``);
  CSV / KEY_VALUE / JS_OBJECT / SQL only consult reservations, and
  RAW_TEXT covers the complement of reservations — so e.g. a SQL
  statement nested in prose yields BOTH a RAW_TEXT parent and a SQL
  child fragment.
- Containment dedupe (``etl_parser.py:884-924``): a fragment fully
  inside an earlier-kept fragment of higher-or-equal priority is
  dropped; a strictly-higher-priority child survives alongside its
  parent.
- Scan caps are semantics, not just guards: 200 kB brace window,
  2 kB malformed tail / YAML body, 200-line CSV, 400-char SQL.

Pure Python, no Spark imports — the Spark layer wraps
:func:`detect_document` in an Arrow-batched UDF (see ``pipeline.py``);
each document is independent, which is exactly the parallelism axis a
1000-executor cluster wants.
"""

from __future__ import annotations

import bisect
import json
import re
from collections import Counter
from dataclasses import dataclass, field

from auraverse_etl_pipeline_spark.ingest.htmlmini import parse_html

# Priority order, highest first (reference FORMAT_PRIORITY,
# etl_parser.py:461-474). Index = rank.
PRIORITY: tuple[str, ...] = (
    "JSON_LD",
    "JSON",
    "MALFORMED_JSON",
    "HTML_TABLE",
    "HTML",
    "YAML_FRONTMATTER",
    "CSV",
    "CSV_NO_HEADER",
    "KEY_VALUE",
    "JS_OBJECT",
    "SQL",
    "RAW_TEXT",
)
_RANK = {name: i for i, name in enumerate(PRIORITY)}

#: Formats whose spans block lower-priority detectors and RAW_TEXT.
RESERVING = frozenset(
    {"JSON_LD", "JSON", "MALFORMED_JSON", "HTML_TABLE", "HTML", "YAML_FRONTMATTER"}
)

MAX_BRACE_WINDOW = 200_000
MAX_MALFORMED_TAIL = 2_000
MAX_CSV_LINES = 200
MAX_SQL_CHARS = 400
MIN_RAW_SEGMENT = 20


@dataclass
class Fragment:
    format_type: str
    start: int
    end: int
    confidence: float
    text: str
    meta: dict = field(default_factory=dict)


def balanced_brace_span(text: str, pos: int, window: int = MAX_BRACE_WINDOW):
    """Span of the first balanced ``{...}`` at/after ``pos``, honoring
    quoted strings and backslash escapes; None if unbalanced within the
    window. (Same contract as reference ``find_json_span``,
    ``etl_parser.py:484-525`` — Spark has no native equivalent since
    ``get_json_object`` requires already-valid JSON.)"""
    open_at = text.find("{", pos)
    if open_at < 0:
        return None
    depth = 0
    quote = ""  # current string delimiter, '' when outside strings
    i = open_at
    stop = min(len(text), open_at + window)
    while i < stop:
        ch = text[i]
        if quote:
            if ch == "\\":
                i += 1  # skip escaped char
            elif ch == quote:
                quote = ""
        elif ch in "\"'":
            quote = ch
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return (open_at, i + 1)
        i += 1
    return None


class DocumentScan:
    """Mutable scan state shared by the detector functions.

    Reserved spans are kept as a SORTED, DISJOINT (merged-on-insert)
    interval list so the hot operations are sub-linear: overlap test is
    one bisect, complement is one linear walk. The naive append-a-tuple
    + scan-them-all spelling is O(fragments²) — a divider-storm
    document emitting 33k reserving fragments spent ~75 s there."""

    def __init__(self, text: str):
        self.text = text
        self.fragments: list[Fragment] = []
        self._starts: list[int] = []
        self._ends: list[int] = []

    def reserved_overlaps(self, start: int, end: int) -> bool:
        # disjoint + sorted ⇒ only the last interval starting before
        # ``end`` can overlap [start, end)
        j = bisect.bisect_left(self._starts, end)
        return j > 0 and self._ends[j - 1] > start

    def emit(self, frag: Fragment) -> None:
        self.fragments.append(frag)
        if frag.format_type in RESERVING:
            s, e = frag.start, frag.end
            lo = bisect.bisect_left(self._ends, s)  # first interval ending at/after s
            hi = bisect.bisect_right(self._starts, e)  # first interval starting after e
            if lo < hi:  # merge everything [lo, hi) into one interval
                s = min(s, self._starts[lo])
                e = max(e, self._ends[hi - 1])
            self._starts[lo:hi] = [s]
            self._ends[lo:hi] = [e]

    def free_segments(self) -> list[tuple[int, int]]:
        """Complement of the reserved intervals over [0, len(text))."""
        segments: list[tuple[int, int]] = []
        prev = 0
        for a, b in zip(self._starts, self._ends):
            if a > prev:
                segments.append((prev, a))
            prev = max(prev, b)
        if prev < len(self.text):
            segments.append((prev, len(self.text)))
        return segments


def _clamp(conf: float) -> float:
    return max(0.0, min(1.0, float(conf)))


def _line_offsets(text: str) -> tuple[list[str], list[int]]:
    lines = text.splitlines()
    offsets = [0]
    for ln in lines:
        offsets.append(offsets[-1] + len(ln) + 1)
    return lines, offsets


# --------------------------------------------------------------------------
# Detectors, in execution order. Each takes the scan and mutates it.
# --------------------------------------------------------------------------

_JSON_LD_RE = re.compile(
    r'<script\b[^>]*type=["\']application/ld\+json["\'][^>]*>([\s\S]*?)</script>',
    re.IGNORECASE,
)


def find_json_ld(scan: DocumentScan) -> None:
    """D1: ``<script type="application/ld+json">`` payloads
    (``etl_parser.py:556-572``). Span covers the payload only."""
    for m in _JSON_LD_RE.finditer(scan.text):
        payload = m.group(1)
        try:
            json.loads(payload.strip())
            conf = 0.99
        except (ValueError, RecursionError):
            conf = 0.6
        scan.emit(
            Fragment("JSON_LD", m.start(1), m.end(1), _clamp(conf), payload, {"parsed": conf > 0.9})
        )


_YAML_RE = re.compile(r"(?:^|\n)---\s*\n([\s\S]{0,%d}?)\n---" % MAX_MALFORMED_TAIL)


def find_yaml_frontmatter(scan: DocumentScan) -> None:
    """D2: ``--- ... ---`` blocks, confidence from colon-line ratio
    (``etl_parser.py:575-588``)."""
    for m in _YAML_RE.finditer(scan.text):
        body = m.group(1)
        if m.start(1) >= m.end(1) or not body.strip():
            continue  # empty --- --- block: no fragment (zero-length spans are invalid)
        lines = [ln for ln in body.splitlines() if ln.strip()]
        colon_ratio = sum(1 for ln in lines if ":" in ln) / max(1, len(lines))
        if scan.reserved_overlaps(m.start(1), m.end(1)):
            continue
        scan.emit(
            Fragment(
                "YAML_FRONTMATTER",
                m.start(1),
                m.end(1),
                _clamp(0.95 if colon_ratio > 0.5 else 0.6),
                body,
                {"colon_ratio": colon_ratio},
            )
        )


_SECTION_HEADER_RE = re.compile(r"(?:^|\n)---\s*([A-Z0-9 _\-()]+)\s*\n", re.IGNORECASE)
_NEXT_DIVIDER_RE = re.compile(r"\n---\s*[\w \-()/:]*\n", re.IGNORECASE)


def find_sectioned_json(scan: DocumentScan) -> None:
    """D3: ``--- SOME JSON HEADER`` sections: brace-scan the body; valid
    parse → JSON(0.99), else MALFORMED_JSON(0.45); bodies with no
    balanced brace → MALFORMED_JSON(0.4) (``etl_parser.py:591-626``)."""
    for m in _SECTION_HEADER_RE.finditer(scan.text):
        header = m.group(1).strip().upper()
        body_start = m.end()
        nxt = _NEXT_DIVIDER_RE.search(scan.text, body_start)
        body_end = nxt.start() if nxt else len(scan.text)
        if not scan.text[body_start:body_end].strip():
            continue
        if "JSON" not in header or scan.reserved_overlaps(body_start, body_end):
            continue
        span = balanced_brace_span(scan.text, body_start)
        if span is None:
            if not scan.reserved_overlaps(body_start, body_end):
                scan.emit(
                    Fragment(
                        "MALFORMED_JSON",
                        body_start,
                        body_end,
                        0.4,
                        scan.text[body_start:body_end],
                        {"section_header": header},
                    )
                )
            continue
        s, e = span
        snippet = scan.text[s:e]
        try:
            json.loads(snippet)
            ftype, conf = "JSON", 0.99
        except (ValueError, RecursionError):
            ftype, conf = "MALFORMED_JSON", 0.45
        scan.emit(Fragment(ftype, s, e, _clamp(conf), snippet, {"section_header": header}))


_QUOTED_KEY_RE = re.compile(r'"\w+"\s*:')
_BARE_KEY_RE = re.compile(r"\w+\s*:")
_KV_HINT_RE = re.compile(r'["\']\w+["\']\s*:|\w+\s*:\s*')
_BLANK_LINE_RE = re.compile(r"\n\s*\n")


def find_json_objects(scan: DocumentScan) -> None:
    """D5: scan every unreserved ``{``; balanced + valid → JSON(0.98),
    balanced + broken → MALFORMED_JSON(0.5/0.25 by key density),
    unbalanced → malformed tail to the next blank line, ≤2 kB
    (``etl_parser.py:629-678``)."""
    text = scan.text
    i = 0
    while True:
        pos = text.find("{", i)
        if pos < 0:
            break
        if scan.reserved_overlaps(pos, pos + 1):
            i = pos + 1
            continue
        span = balanced_brace_span(text, pos)
        if span is not None:
            s, e = span
            if scan.reserved_overlaps(s, e):
                i = e
                continue
            snippet = text[s:e]
            try:
                json.loads(snippet)
                scan.emit(Fragment("JSON", s, e, 0.98, snippet, {}))
            except (ValueError, RecursionError):
                kv_like = len(_QUOTED_KEY_RE.findall(snippet)) + len(_BARE_KEY_RE.findall(snippet))
                conf = 0.5 if kv_like >= 2 else 0.25
                scan.emit(Fragment("MALFORMED_JSON", s, e, _clamp(conf), snippet, {"kv_like": kv_like}))
            i = e
        else:
            tail_stop = min(len(text), pos + MAX_MALFORMED_TAIL)
            blank = _BLANK_LINE_RE.search(text, pos, tail_stop)
            end = blank.start() if blank else tail_stop
            if not scan.reserved_overlaps(pos, end):
                snippet = text[pos:end]
                if _KV_HINT_RE.search(snippet):
                    scan.emit(Fragment("MALFORMED_JSON", pos, end, 0.35, snippet, {"note": "unclosed"}))
            i = end


_TABLE_OPEN_RE = re.compile(r"<table\b", re.IGNORECASE)
_TABLE_CLOSE_RE = re.compile(r"</table\s*>", re.IGNORECASE)
_BLOCK_TAG_RE = re.compile(r"<(div|section|article|header|footer|main|nav|body)\b", re.IGNORECASE)
_ANY_OPEN_TAG_RE = re.compile(r"<[A-Za-z]+")


def find_html(scan: DocumentScan) -> None:
    """D6: ``<table>...</table>`` spans (row/col-count confidence), then
    generic block-level elements with tag-density confidence
    (``etl_parser.py:681-726``), via the stdlib mini-DOM."""
    for m in _TABLE_OPEN_RE.finditer(scan.text):
        start = m.start()
        if scan.reserved_overlaps(start, start + 1):
            continue
        close = _TABLE_CLOSE_RE.search(scan.text, start)
        if not close:
            continue
        end = close.end()
        snippet = scan.text[start:end]
        n_rows = n_cols = 0
        try:
            dom = parse_html(snippet)
            rows = dom.all("tr")
            n_rows = len(rows)
            n_cols = max((len(r.all(("td", "th"))) for r in rows), default=0)
            conf = 0.95 if n_rows and n_cols >= 1 else 0.6
        except Exception:
            conf = 0.6
        if not scan.reserved_overlaps(start, end):
            scan.emit(
                Fragment("HTML_TABLE", start, end, _clamp(conf), snippet, {"rows": n_rows, "cols": n_cols})
            )

    for m in _BLOCK_TAG_RE.finditer(scan.text):
        start = m.start()
        if scan.reserved_overlaps(start, start + 1):
            continue
        tag = m.group(1)
        close = re.search(rf"</{re.escape(tag)}\s*>", scan.text[start:], re.IGNORECASE)
        if not close:
            continue
        end = start + close.end()
        if end - start > 20 and not scan.reserved_overlaps(start, end):
            snippet = scan.text[start:end]
            n_open = len(_ANY_OPEN_TAG_RE.findall(snippet))
            n_close = snippet.count("</")
            conf = 0.5 + min(0.4, min(n_open, n_close) * 0.03)
            scan.emit(Fragment("HTML", start, end, _clamp(conf), snippet, {"tag_count": n_open}))


_JS_ASSIGN_RE = re.compile(r"\b(var|let|const)\s+([A-Za-z0-9_$]+)\s*=\s*\{")


def find_js_objects(scan: DocumentScan) -> None:
    """D9: ``var/let/const NAME = {...}`` (``etl_parser.py:803-816``)."""
    for m in _JS_ASSIGN_RE.finditer(scan.text):
        start = m.start()
        if scan.reserved_overlaps(start, start + 1):
            continue
        span = balanced_brace_span(scan.text, start + m.group(0).rfind("{"))
        if span is None:
            continue
        _, e = span
        if not scan.reserved_overlaps(span[0], e):
            scan.emit(
                Fragment("JS_OBJECT", start, e, 0.88, scan.text[start:e], {"var_name": m.group(2)})
            )


_ALPHA_RE = re.compile(r"[A-Za-z]")


def find_csv_blocks(scan: DocumentScan) -> None:
    """D7: delimiter-consistent line runs; header sniffed from the first
    cell; ≤200 lines per block (``etl_parser.py:729-776``)."""
    lines, offsets = _line_offsets(scan.text)
    n = len(lines)
    i = 0
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        delim = next(
            (d for d in (",", "\t", ";") if d in line and "{" not in line and "}" not in line),
            None,
        )
        if delim is None:
            i += 1
            continue
        counts = [line.count(delim)]
        j = i + 1
        while j < n and j - i < MAX_CSV_LINES and lines[j].strip() and lines[j].count(delim) > 0:
            counts.append(lines[j].count(delim))
            j += 1
        if len(counts) >= 2:
            _, freq = Counter(counts).most_common(1)[0]
            if freq >= max(1, len(counts) // 2):
                start = offsets[i]
                end = offsets[j - 1] + len(lines[j - 1])
                if not scan.reserved_overlaps(start, end):
                    has_header = bool(_ALPHA_RE.search(line.split(delim)[0]))
                    scan.emit(
                        Fragment(
                            "CSV" if has_header else "CSV_NO_HEADER",
                            start,
                            end,
                            0.9 if has_header else 0.7,
                            scan.text[start:end],
                            {"delimiter": delim, "rows": len(counts)},
                        )
                    )
                    i = j
                    continue
        i += 1


_KV_FIRST_RE = re.compile(r"^\s*[#\-]*\s*[\w\-\s]{1,80}\s*[:=]\s*.+")
_KV_CONT_RE = re.compile(r"^\s*[\w\-\s]{1,80}\s*[:=]\s*.+")


def find_key_values(scan: DocumentScan) -> None:
    """D8: runs of ≥2 consecutive ``key: value`` / ``key = value`` lines
    (``etl_parser.py:779-800``)."""
    lines, offsets = _line_offsets(scan.text)
    n = len(lines)
    i = 0
    while i < n:
        if _KV_FIRST_RE.match(lines[i]):
            j = i
            while j < n and _KV_CONT_RE.match(lines[j]):
                j += 1
            if j - i >= 2:
                start = offsets[i]
                end = offsets[j - 1] + len(lines[j - 1])
                if not scan.reserved_overlaps(start, end):
                    scan.emit(
                        Fragment("KEY_VALUE", start, end, 0.9, scan.text[start:end], {"pairs": j - i})
                    )
                    i = j
                    continue
        i += 1


_SQL_RE = re.compile(
    r"(--[^\n]*\n\s*)?(SELECT|INSERT|UPDATE|DELETE|CREATE|DROP)\b[\s\S]{0,%d}?;" % MAX_SQL_CHARS,
    re.IGNORECASE,
)


def find_sql(scan: DocumentScan) -> None:
    """D10: SQL statements ending in ``;`` ≤400 chars, optional leading
    comment (``etl_parser.py:819-827``). Detected + stored, never run."""
    for m in _SQL_RE.finditer(scan.text):
        if not scan.reserved_overlaps(m.start(), m.end()):
            scan.emit(Fragment("SQL", m.start(), m.end(), 0.9, m.group(0), {}))


def find_raw_text(scan: DocumentScan) -> None:
    """D11: blank-line paragraphs in the complement of reserved spans
    (``etl_parser.py:830-863``). Nested higher-priority fragments (SQL,
    KEY_VALUE) survive dedupe inside these."""
    for s, e in scan.free_segments():
        segment = scan.text[s:e].strip()
        if len(segment) < MIN_RAW_SEGMENT:
            continue
        pos = s
        for para in _BLANK_LINE_RE.split(segment):
            para = para.strip()
            if not para:
                pos += 2
                continue
            start = scan.text.find(para, pos, e)
            if start < 0:
                continue
            end = start + len(para)
            if not scan.reserved_overlaps(start, end):
                scan.emit(Fragment("RAW_TEXT", start, end, 0.35, scan.text[start:end], {}))
            pos = end


#: Execution order mirrors reference ``run_all`` (etl_parser.py:866-877).
DETECTOR_SEQUENCE = (
    find_json_ld,
    find_yaml_frontmatter,
    find_sectioned_json,
    find_json_objects,
    find_html,
    find_js_objects,
    find_csv_blocks,
    find_key_values,
    find_sql,
    find_raw_text,
)


def resolve_overlaps(fragments: list[Fragment]) -> list[Fragment]:
    """Containment dedupe (``etl_parser.py:884-924``): scanning in
    (start, longest-first) order, drop a fragment fully contained in an
    already-kept fragment of higher-or-equal priority; strictly-higher-
    priority children survive alongside their parent."""
    # Scanning start-ascending (longest-first at ties) means every kept
    # fragment already has start <= the current start, so containment
    # reduces to "some kept fragment of rank <= mine ends at or after my
    # end". Tracking the max kept end per rank makes the pass
    # O(n · n_ranks) instead of the naive O(n²) — a divider-storm
    # document yielding 33k fragments resolved in ~100 s quadratically,
    # ~0.1 s with this.
    n_ranks = len(PRIORITY) + 1
    max_end_by_rank = [-1] * n_ranks
    kept: list[Fragment] = []
    for frag in sorted(fragments, key=lambda f: (f.start, -(f.end - f.start))):
        rank = _RANK.get(frag.format_type, len(PRIORITY))
        swallowed = any(max_end_by_rank[r] >= frag.end for r in range(rank + 1))
        if not swallowed:
            kept.append(frag)
            if frag.end > max_end_by_rank[rank]:
                max_end_by_rank[rank] = frag.end
    kept.sort(key=lambda f: f.start)
    for frag in kept:
        frag.confidence = _clamp(frag.confidence)
    return kept


def detect_document(text: str) -> list[Fragment]:
    """Run the full detector suite over one document. Never raises: a
    failing detector is skipped (the reference wraps each in
    try/except — one bad fragment must not kill the document)."""
    scan = DocumentScan(text)
    for detector in DETECTOR_SEQUENCE:
        try:
            detector(scan)
        except Exception:
            continue
    return resolve_overlaps(scan.fragments)
