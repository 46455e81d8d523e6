"""Messy-date parsing (SURVEY.md §2.6 date-function gap).

The reference only regex-*types* dates (``\\d{4}-\\d{2}-\\d{2}`` →
"date", etl_parser.py:387-388) and its fixtures carry deliberately
mixed formats (``2025-10-20``, ``20/10/2025``, ``Oct 19, 2025``,
``18-10-2025``, ``2025/10/17`` — input.txt:35-46). This ladder actually
parses them: a ``coalesce`` of ``try_to_date`` attempts, first match
wins, NULL when nothing fits — never an exception (ANSI-safe), fully
native, pushdown-friendly.

Ambiguity policy: day-first before month-first (``03/04/2025`` →
April 3rd) — the reference's own fixtures are day-first; flip the
ladder order for US-centric corpora.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: Attempt order IS the ambiguity policy (first match wins).
DATE_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "yyyy.MM.dd",
    "dd/MM/yyyy",
    "dd-MM-yyyy",
    "dd.MM.yyyy",
    "MM/dd/yyyy",
    "dd-MMM-yyyy",
    "MMM d, yyyy",
    "MMMM d, yyyy",
    "d MMM yyyy",
)


def parse_messy_date(c: Column | str, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """First-match-wins date parse across ``formats``; NULL if none fit."""
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(*[F.try_to_date(F.trim(col), f) for f in formats])
