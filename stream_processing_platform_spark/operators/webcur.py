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
