"""URL/domain curation operators — the CCNet/RefinedWeb URL-level
stage: registered-domain extraction with public-suffix-style rules,
host parsing, per-domain aggregates, blocklist filtering.

The reference platform has no URL surface (its string functions are
the generic scalar set, SURVEY §2.8); this is north-star LLM-pipeline
capability. Everything is pure JVM column expressions (parse_url,
split, array ops — whole-stage codegen, no UDF), with duckdb SQL twins
generated from the SAME suffix table so the oracle can never drift
from the operator (generated-oracle doctrine, CLAUDE.md).

Public-suffix handling: the full PSL is ~9k rules; carrying it
verbatim is a data-file concern, not an algorithmic one. The operator
implements the PSL *algorithm* (longest matching suffix wins; the
registered domain is one label beyond the matched suffix) over a
built-in subset of the most common multi-level rules, and accepts a
custom rule list for deployments that ship the full PSL. At 100 TB the
rule set rides into the expression as a literal array (a few KB,
serialized once per task with the plan, never shuffled).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multi-level public suffixes (PSL subset): a host ending in one of
# these keeps TWO labels beyond the dot-split tail pair. Single-level
# TLDs need no table — they are the default branch.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "com.au",
    "net.au",
    "org.au",
    "co.jp",
    "ne.jp",
    "com.br",
    "com.cn",
    "co.in",
    "co.nz",
    "co.za",
    "com.mx",
    "github.io",
    "blogspot.com",
    "s3.amazonaws.com",
)


def host_of(url: Column) -> Column:
    """Hostname of a URL, lowercased (parse_url is JVM-side)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def host_of_sql(url_expr: str) -> str:
    """duckdb twin of :func:`host_of`."""
    return f"lower(regexp_extract({url_expr}, '^[a-zA-Z]+://([^/]+)', 1))"


def registered_domain(
    host: Column, two_level: tuple[str, ...] = TWO_LEVEL_SUFFIXES
) -> Column:
    """Registered (pay-level) domain of a hostname: one label beyond
    the public suffix. ``blog.alpha.co.uk`` -> ``alpha.co.uk``;
    ``www.beta.com`` -> ``beta.com``; a bare suffix passes through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # try_element_at, not element_at: ANSI mode makes a negative index
    # past the array bounds a runtime error, and last2 is evaluated
    # unconditionally (it feeds the WHEN condition) — a single-label
    # host (localhost, intranet names) must not throw. concat_ws skips
    # NULLs, and the n >= 2 guards keep the semantics exact.
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    rules = F.array(*[F.lit(s) for s in two_level])
    return (
        F.when(
            F.array_contains(rules, last2) & (n >= 3),
            F.concat_ws(".", F.try_element_at(parts, F.lit(-3)), last2),
        )
        .when(n >= 2, last2)
        .otherwise(host)
    )


def registered_domain_sql(
    host_expr: str, two_level: tuple[str, ...] = TWO_LEVEL_SUFFIXES
) -> str:
    """duckdb twin of :func:`registered_domain`, generated from the
    SAME suffix table. duckdb lists are 1-indexed and support negative
    indexing like Spark's element_at."""
    rules = "[" + ", ".join(f"'{s}'" for s in two_level) + "]"
    p = f"string_split({host_expr}, '.')"
    last2 = f"({p}[-2] || '.' || {p}[-1])"
    return (
        f"CASE WHEN list_contains({rules}, {last2}) AND len({p}) >= 3 "
        f"THEN ({p}[-3] || '.' || {last2}) "
        f"WHEN len({p}) >= 2 THEN {last2} ELSE {host_expr} END"
    )


# ------------------------------------------------- URL canonicalization
#
# The CCNet/RefinedWeb dedup-key step: distinct raw URLs that denote the
# same resource must collapse before URL-level dedup/stats, or per-URL
# counts fragment across case/port/tracking-param/fragment variants.
# Pure JVM expressions (regexp + array ops — whole-stage codegen); the
# duckdb twin is generated from the SAME tracking-parameter table.

# Query parameters that never change the denoted resource (click/campaign
# trackers). Shared by the Column and SQL builders.
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_[^=]*",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "ref",
)

_TRACK_RE = "^(" + "|".join(TRACKING_PARAMS) + ")="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL: lowercased scheme and host, userinfo and
    default port stripped, fragment dropped, tracking query parameters
    removed and the rest sorted, trailing path slashes collapsed
    (empty path -> '/'). Variants of the same resource become equal
    strings; everything stays inside whole-stage codegen."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r"^[^@]*@", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACK_RE),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qtail)


def canonical_url_sql(url_expr: str) -> str:
    """duckdb twin of :func:`canonical_url`, generated from the same
    tracking-parameter table. Kept as a single expression so callers can
    splice it into generated oracles."""
    scheme = f"lower(regexp_extract({url_expr}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    hostport = (
        f"lower(regexp_extract({url_expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))"
    )
    host = f"regexp_replace({hostport}, '^[^@]*@', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = (
        f"regexp_replace(regexp_extract({url_expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '')"
    )
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({url_expr}, '\\?([^#]*)', 1)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACK_RE}')))"
    )
    qtail = (
        f"CASE WHEN len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    return f"({scheme} || '://' || {host} || {path} || {qtail})"


def surt_key(url: Column) -> Column:
    """SURT-form URL key (the sort key of Common Crawl's CDX index:
    ``com,example)/path?query``): host labels reversed and comma-
    joined (www. stripped), then ')' and the lowercased path+query.
    Feed it the output of :func:`canonical_url` so the host is already
    lowercase and the query params deduplicated/sorted — the composed
    key is what URL-index builders actually emit."""
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    tail = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(.*)$", 1))
    return F.concat(rev, F.lit(")"), tail)


def surt_key_sql(url_expr: str) -> str:
    """duckdb twin of :func:`surt_key`."""
    host = f"regexp_extract({url_expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)"
    host = f"regexp_replace({host}, '^www\\.', '')"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    tail = (
        f"lower(regexp_extract({url_expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(.*)$', 1))"
    )
    return f"({rev} || ')' || {tail})"
