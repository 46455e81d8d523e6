"""Public-suffix-list registrable-domain extraction — the domain
grouping rule every crawl-curation stage (domain cards, blocklists,
per-domain mixing) keys on. A naive last-two-labels rule groups
``foo.co.uk`` and ``bar.co.uk`` together as ``co.uk`` — every ccTLD
site under a multi-label public suffix aggregates at the wrong level.
The fix is data, not code: the published public-suffix list (PSL,
publicsuffix.org — public domain data) names the suffixes under which
registrations happen; the registrable domain is the LONGEST matching
public suffix plus one more label.

One definition, two spellings (the ``functions/urls.py`` pattern):
:func:`registrable_domain` builds the Spark Column,
:func:`registrable_domain_sql` emits the equivalent DuckDB expression
— both generated from the same committed rule snapshot, pure regex +
IN-set algebra (Catalyst folds a large literal IN into an ``InSet``
hash probe, DuckDB into a hash IN — O(1) per row, map-side, no join,
no shuffle, whole-stage-codegen-safe at any corpus scale).

Snapshot scope (documented subset): plain ICANN-section multi-label
rules of 2 and 3 labels, plus the PSL's WILDCARD rules (``*.ck`` —
every 2-label suffix under the TLD is public, so registrable keeps 3
labels) and their EXCEPTION rules (``!www.ck`` — carved back out, so
``www.ck`` itself is registrable). Rule precedence follows the PSL
algorithm: exceptions first, then longest match (3-label plain >
wildcard/2-label), then the implicit single-label default.
Single-label suffixes need no table. When the host IS exactly a
public suffix, the host itself is returned (conservative grouping).
The matcher caps at 3-label rules by construction of the snapshot;
longer rules raise a ValueError at import, never silently.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: Snapshot date of the curated rule subset below (publicsuffix.org
#: ICANN section; plain rules only).
PSL_SNAPSHOT_DATE = "2026-08-15"

#: Multi-label public suffixes under which registrations happen.
PSL_MULTILABEL_RULES: tuple[str, ...] = (
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # Australia (incl. state education registries — 3-label rules)
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.edu.au", "nsw.edu.au", "vic.edu.au", "qld.edu.au",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "gen.nz", "geek.nz",
    "maori.nz", "school.nz",
    # Japan
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # Mexico
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "nic.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    # Singapore
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    # Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    # Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    # South Korea
    "co.kr", "ne.kr", "or.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    # Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    # Hong Kong
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    # Malaysia
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    # Indonesia
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    # Ukraine
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    # Israel
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    # Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "waw.pl",
    # Thailand
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    # Philippines
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    # Vietnam
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    # Egypt
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    # Saudi Arabia
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    # Nigeria
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    # Kenya
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    # United States locality namespaces (state + k12/cc/lib — 2- and
    # 3-label rules)
    "ma.us", "ca.us", "ny.us", "tx.us", "wa.us",
    "k12.ma.us", "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.wa.us",
    "cc.ca.us", "lib.ca.us",
)

#: TLDs carrying a PSL WILDCARD rule (``*.ck`` etc.): EVERY 2-label
#: suffix under them is a public suffix, so the registrable domain
#: keeps three labels.
PSL_WILDCARD_TLDS: tuple[str, ...] = ("bd", "ck", "er", "fj", "kh", "mm", "np", "pg")

#: PSL EXCEPTION rules (``!www.ck`` etc.): carved back OUT of a
#: wildcard — the name itself is registrable.
PSL_EXCEPTIONS: tuple[str, ...] = ("www.ck",)


def _split_rules(rules: tuple[str, ...]) -> tuple[tuple[str, ...], tuple[str, ...]]:
    two = tuple(r for r in rules if r.count(".") == 1)
    three = tuple(r for r in rules if r.count(".") == 2)
    bad = [r for r in rules if r.count(".") not in (1, 2)]
    if bad:
        raise ValueError(f"PSL snapshot rules must have 2 or 3 labels: {bad}")
    return two, three


def _check_wild_and_exceptions(
    wildcard_tlds: tuple[str, ...], exceptions: tuple[str, ...]
) -> None:
    """The never-silently promise covers EVERY rule table: the matcher
    probes wildcards at the single TLD label and exceptions at the
    last two labels, so entries of any other arity (the real PSL has
    3-label exceptions like ``!city.kobe.jp``) would silently never
    match — reject them at build time instead."""
    bad_w = [t for t in wildcard_tlds if "." in t or not t]
    if bad_w:
        raise ValueError(
            f"PSL wildcard entries must be single TLD labels (*.<tld>): {bad_w}"
        )
    bad_x = [x for x in exceptions if x.count(".") != 1]
    if bad_x:
        raise ValueError(
            "PSL exception entries beyond 2 labels are not supported by this "
            f"matcher (it probes the last two labels only): {bad_x}"
        )


def _in_set(col: Column, values: tuple[str, ...]) -> Column:
    """Membership probe that stays valid for an EMPTY rule table
    (``col.isin()`` with zero args raises; the FALSE literal keeps the
    CASE arm shape identical on both engines)."""
    return col.isin(*values) if values else F.lit(False)


def _in_sql(expr: str, values: tuple[str, ...]) -> str:
    """DuckDB twin of :func:`_in_set` — an empty tuple must NOT emit
    ``IN ()`` (Binder error at query time, violating the module's
    fail-at-build / degrade-identically posture)."""
    if not values:
        return "FALSE"
    return f"{expr} IN (" + ", ".join(f"'{v}'" for v in values) + ")"


_HOST_RE = r"://([^/?#]+)"
_TLD_RE = r"([^.]+)$"
_LAST2_RE = r"([^.]+\.[^.]+)$"
_LAST3_RE = r"([^.]+\.[^.]+\.[^.]+)$"
_LAST4_RE = r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$"


def registrable_domain(
    uri: str | Column,
    rules: tuple[str, ...] = PSL_MULTILABEL_RULES,
    wildcard_tlds: tuple[str, ...] = PSL_WILDCARD_TLDS,
    exceptions: tuple[str, ...] = PSL_EXCEPTIONS,
) -> Column:
    """Registrable domain of a URL under the PSL snapshot: lowercase
    the authority, strip userinfo and any explicit port (the
    ``canonical_url`` port rule, generalized — a ported URI must group
    with its unported twin), then the PSL match order: exception rules
    first (the name itself is registrable), then longest matching
    suffix (a 3-label rule keeps 4 trailing labels; a wildcard TLD or
    2-label rule keeps 3), else the last two labels (the implicit
    single-label default). A host that IS exactly a public suffix
    returns itself."""
    two, three = _split_rules(rules)
    _check_wild_and_exceptions(wildcard_tlds, exceptions)
    u = F.col(uri) if isinstance(uri, str) else uri
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.regexp_replace(host, r":[0-9]+$", "")
    tld = F.regexp_extract(host, _TLD_RE, 1)
    last2 = F.regexp_extract(host, _LAST2_RE, 1)
    last3 = F.regexp_extract(host, _LAST3_RE, 1)
    last4 = F.regexp_extract(host, _LAST4_RE, 1)
    return (
        F.when((last2 != "") & _in_set(last2, exceptions), last2)
        .when(_in_set(last3, three) & (last4 != ""), last4)
        .when(_in_set(last3, three), host)
        .when(_in_set(tld, wildcard_tlds) & (last3 != ""), last3)
        .when(_in_set(tld, wildcard_tlds), host)
        .when(_in_set(last2, two) & (last3 != ""), last3)
        .when(_in_set(last2, two), host)
        .otherwise(last2)
    )


def registrable_domain_sql(
    expr: str,
    rules: tuple[str, ...] = PSL_MULTILABEL_RULES,
    wildcard_tlds: tuple[str, ...] = PSL_WILDCARD_TLDS,
    exceptions: tuple[str, ...] = PSL_EXCEPTIONS,
) -> str:
    """DuckDB spelling of :func:`registrable_domain` over SQL
    expression ``expr`` — the same regexes, rule sets and rule order,
    generated from the same snapshot."""
    two, three = _split_rules(rules)
    _check_wild_and_exceptions(wildcard_tlds, exceptions)
    host = f"lower(regexp_extract({expr}, '{_HOST_RE}', 1))"
    host = f"regexp_replace({host}, '^[^@]*@', '')"
    host = f"regexp_replace({host}, ':[0-9]+$', '')"
    tld = f"regexp_extract({host}, '{_TLD_RE}', 1)"
    last2 = f"regexp_extract({host}, '{_LAST2_RE}', 1)"
    last3 = f"regexp_extract({host}, '{_LAST3_RE}', 1)"
    last4 = f"regexp_extract({host}, '{_LAST4_RE}', 1)"
    in2 = _in_sql(last2, two)
    in3 = _in_sql(last3, three)
    inw = _in_sql(tld, wildcard_tlds)
    inx = _in_sql(last2, exceptions)
    return (
        f"CASE WHEN {last2} <> '' AND {inx} THEN {last2} "
        f"WHEN {in3} AND {last4} <> '' THEN {last4} "
        f"WHEN {in3} THEN {host} "
        f"WHEN {inw} AND {last3} <> '' THEN {last3} "
        f"WHEN {inw} THEN {host} "
        f"WHEN {in2} AND {last3} <> '' THEN {last3} "
        f"WHEN {in2} THEN {host} "
        f"ELSE {last2} END"
    )
