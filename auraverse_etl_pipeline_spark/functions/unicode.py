"""Unicode normalization column functions (Arrow-batched by necessity).

The pre-tokenization cleanup a multilingual corpus needs before any
hash-based operator can work: visually-identical strings with different
codepoint sequences ("café" composed vs decomposed) hash differently,
so exact dedup, MinHash shingles, line dedup and token bucketing all
silently miss matches until the corpus is NFC-normalized. Accent
folding and lowercasing additionally canonicalize for matching /
language-ID use cases.

Spark has no Unicode-normalization builtin, so these are pandas_udfs
over Python's ``unicodedata`` — Arrow-batched, and chosen over any JVM
route because Python's tables agree with DuckDB's utf8proc
(``nfc_normalize``, ``strip_accents``, ``lower``) codepoint-for-
codepoint on everything we tested except one known divergence:
DuckDB lowers final-position Greek Σ to σ while Python applies the
contextual final-sigma rule (ς). Keep Greek capitals out of oracle
fixtures; at corpus scale the divergence is cosmetic.

Kernels are module-level (pickled by reference): any plan using them
from a foreign-cwd session needs ``runtime.ship_package`` — the
operator/query layer calls it.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def nfc_text(s: pd.Series) -> pd.Series:
    """Canonical composition (NFC). DuckDB twin: ``nfc_normalize(x)``."""
    return s.map(lambda v: None if v is None else unicodedata.normalize("NFC", v))


@pandas_udf(StringType())
def fold_text(s: pd.Series) -> pd.Series:
    """Matching canonicalization: NFC → strip combining marks → lower.
    DuckDB twin: ``lower(strip_accents(nfc_normalize(x)))`` (see module
    docstring for the final-sigma caveat)."""

    def fold(v: str | None) -> str | None:
        if v is None:
            return None
        decomposed = unicodedata.normalize("NFD", unicodedata.normalize("NFC", v))
        return "".join(c for c in decomposed if not unicodedata.combining(c)).lower()

    return s.map(fold)


def normalized_columns(text: Column | str) -> tuple[Column, Column]:
    """(nfc, folded) column pair for a text column — one Arrow batch
    each, no per-row Python."""
    from pyspark.sql import functions as F

    c = F.col(text) if isinstance(text, str) else text
    return nfc_text(c), fold_text(c)
