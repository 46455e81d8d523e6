"""URL canonicalization — the crawl-frontier normalization every web
pipeline runs before URL-level dedup and domain curation: lowercase
scheme/host, strip default ports and fragments, normalize the empty
path, drop ``utm_*`` tracking parameters, sort the query string. Two
raw URLs that canonicalize equal are the same fetch target, so the
canonical form IS the dedup key of the URL tier (CommonCrawl, Heritrix
and every serious crawler ship a variant of exactly these rules).

One definition, two spellings: :func:`canonical_url` builds the Spark
Column, :func:`canonical_url_sql` emits the byte-equivalent DuckDB
expression — pure string/array algebra on both sides (regex extract,
split, filter, lexicographic sort, join), no UDF anywhere."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def canonical_url(url: str | Column) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # fragment never reaches the server
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    canon_q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (~p.startswith("utm_")) & (p != ""),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB spelling of :func:`canonical_url` over SQL expression
    ``expr`` — the same regexes, the same rule order."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z]+)://', 1))"
    hostport = f"lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = f"regexp_extract({u}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    canon_q = (
        f"list_aggregate(list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p NOT LIKE 'utm\\_%' ESCAPE '\\' AND p <> '')), 'string_agg', '&')"
    )
    return (
        f"{scheme} || '://' || ({host}) || ({path}) || "
        f"CASE WHEN COALESCE({canon_q}, '') <> '' THEN '?' || {canon_q} ELSE '' END"
    )
