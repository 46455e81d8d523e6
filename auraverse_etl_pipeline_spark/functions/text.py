"""Text-analysis column functions — all JVM-side built-ins.

The LLM-data-pipeline scalar layer: tokenization, n-gram shingling,
quality metrics, stopword language ID, document fingerprints. Everything
here compiles to Catalyst expressions inside whole-stage codegen — no
Python executes per row, which is the difference between scanning 100 TB
and not. (The reference's analogues are the regex entity extractors and
type coercers, ``script.py:425-515``; these generalize them to corpus
scale.)

Parity note: every function has a directly-equivalent DuckDB SQL
spelling used by the oracle strings in ``plans/llm_queries.py``; keep
the two in sync when editing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization. DuckDB twin: ``string_split_regex(trim(x), '\\s+')``."""
    return F.split(F.trim(_col(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


#: BPE-style pre-tokenizer pattern (GPT-2 family, simplified to the
#: POSIX-class subset both Spark (Java regex) and DuckDB (RE2) accept):
#: contractions, letter runs with optional leading space, digit runs,
#: punctuation runs, whitespace runs. A real tokenizer's merge step
#: only splits these further, so this count is the standard cheap
#: proxy (upper bound ≈ small multiple) for LLM token budgeting.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """Array of BPE-style pre-tokens. DuckDB twin:
    ``regexp_extract_all(x, <BPE_ISH_PATTERN>)`` (same pattern string)."""
    return F.regexp_extract_all(_col(text), F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column | str) -> Column:
    """Pre-token count excluding pure-whitespace matches — the
    LLM-budget estimate."""
    toks = bpe_ish_tokens(text)
    return F.size(F.filter(toks, lambda t: ~t.rlike(r"^\s+$"))).cast("bigint")


def shingles(text: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Word n-gram shingles (the MinHash/Jaccard unit). DuckDB twin:
    ``list_transform(range(1, len(t)-n+2), i -> array_to_string(t[i:i+n-1], ' '))``.

    Documents with fewer than ``n`` tokens yield an empty array — the
    guard matters because ``F.sequence(0, size-n)`` would otherwise emit
    a *descending* sequence through negative indices and crash with
    INVALID_PARAMETER_VALUE.START, while the DuckDB twin's ``range``
    returns empty. CASE WHEN short-circuits per row, so the sequence is
    never built for short docs."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(sep, F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars. DuckDB twin:
    ``length(regexp_replace(x, '[^.,;:!?]', '', 'g')) / length(x)``."""
    c = _col(text)
    return F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / F.length(c)


def avg_token_len(text: Column | str) -> Column:
    """Mean token length: non-space chars / token count."""
    c = _col(text)
    return F.length(F.regexp_replace(c, r"\s", "")) / token_count(c)


def stopword_hits(text: Column | str, words: tuple[str, ...]) -> Column:
    """Occurrences (with duplicates) of any listed word. DuckDB twin:
    ``len(list_filter(toks, t -> list_contains([...], t)))``."""
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lit_arr, t))).cast("bigint")


def stopword_ratio(text: Column | str, words: tuple[str, ...]) -> Column:
    return stopword_hits(text, words) / token_count(text)


#: Tiny per-language function-word sets for the n-gram/stopword language
#: heuristic. Order matters: ties resolve to the earlier language.
LANG_STOPWORDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "of", "and", "to", "is", "in")),
    ("de", ("der", "die", "das", "und", "ist", "ein", "nicht")),
    ("es", ("el", "la", "de", "y", "que", "los", "una")),
    ("fr", ("le", "la", "et", "les", "des", "un", "est")),
)


def lang_guess(text: Column | str, min_hits: int = 1) -> Column:
    """Stopword-vote language ID: the first language whose hit count is
    maximal and ≥ ``min_hits``; 'und' (undetermined) otherwise."""
    hit_cols = [stopword_hits(text, words) for _, words in LANG_STOPWORDS]
    best = F.greatest(*hit_cols)
    guess = F.lit("und")
    # build the CASE from the last language backwards so earlier
    # languages win ties, matching the documented order.
    for (lang, _), hits in reversed(list(zip(LANG_STOPWORDS, hit_cols))):
        guess = F.when((hits == best) & (best >= min_hits), F.lit(lang)).otherwise(guess)
    return guess


#: PII patterns, restricted to the regex subset Java regex (Spark) and
#: RE2 (DuckDB) evaluate identically — no backreferences, no lookaround.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def pii_email_count(text: Column | str) -> Column:
    """DuckDB twin: ``len(regexp_extract_all(x, <pattern>))``."""
    return F.regexp_count(_col(text), F.lit(PII_EMAIL_PATTERN)).cast("bigint")


def pii_phone_count(text: Column | str) -> Column:
    return F.regexp_count(_col(text), F.lit(PII_PHONE_PATTERN)).cast("bigint")


def redact_pii(text: Column | str) -> Column:
    """Scrub emails then phone numbers to fixed placeholder tags — the
    pre-training privacy pass. Pure ``regexp_replace`` chain: stays in
    whole-stage codegen, no Python per row. DuckDB twin:
    ``regexp_replace(regexp_replace(x, email, '[EMAIL]', 'g'), phone,
    '[PHONE]', 'g')`` (Spark's regexp_replace is global by default)."""
    c = F.regexp_replace(_col(text), PII_EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(c, PII_PHONE_PATTERN, "[PHONE]")


def content_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set. Identical in DuckDB:
    ``md5(array_to_string(list_sort(list_distinct(toks)), ' '))``."""
    return F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(tokens(text)))))


def rolling_hash(text: Column | str, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over characters, kept
    below 2^63 by the modulus so Spark and DuckDB BIGINT agree exactly.
    DuckDB twin: ``list_reduce(list_prepend(0, list_transform(
    string_split(x, ''), c -> ascii(c))), (a, b) -> (a*31 + b) % m)``."""
    chars = F.split(_col(text), "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes, F.lit(0).cast("bigint"), lambda acc, x: (acc * base + x) % F.lit(mod)
    )
