from auraverse_etl_pipeline_spark.functions.text import (
    LANG_STOPWORDS,
    avg_token_len,
    content_fingerprint,
    lang_guess,
    punct_ratio,
    rolling_hash,
    shingles,
    stopword_hits,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "LANG_STOPWORDS",
    "avg_token_len",
    "content_fingerprint",
    "lang_guess",
    "punct_ratio",
    "rolling_hash",
    "shingles",
    "stopword_hits",
    "stopword_ratio",
    "token_count",
    "tokens",
]
