"""URL/domain curation operators — the CCNet/RefinedWeb URL-level
stage: registered-domain extraction with public-suffix-style rules,
host parsing, per-domain aggregates, blocklist filtering.

The reference platform has no URL surface (its string functions are
the generic scalar set, SURVEY §2.8); this is north-star LLM-pipeline
capability. Everything is pure JVM column expressions (parse_url,
split, array ops — whole-stage codegen, no UDF), with duckdb SQL twins
generated from the SAME suffix table so the oracle can never drift
from the operator (generated-oracle doctrine, CLAUDE.md).

Public-suffix handling (r12): the PSL *file* ships as data
(``data/public_suffix_list.dat`` — a snapshot subset in the official
publicsuffix.org format; drop the full ~9k-rule file in its place for
production) and :func:`load_psl` parses the complete format: exact
rules, ``*.`` wildcard rules (one label), and ``!`` exception rules.
The operator implements the full PSL algorithm — exception rules
prevail, else the longest matching rule; the registered domain is one
label beyond the matched public suffix; unlisted TLDs fall to the
implicit ``*`` rule. Rules ride into the expression grouped by label
count: small sets as ``isin`` IN-lists, the large exact set as ONE
ArrayType literal through ``array_contains`` (a single plan node — see
the plan-time/row-time note inside :func:`registered_domain`); the
whole chain is bound through ``let()`` so host/split evaluate once.
Everything is serialized once per task with the plan, never shuffled.
Single-label TLDs need no table entry — they are the default branch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pyspark.sql import Column
from pyspark.sql import functions as F

_PSL_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "data", "public_suffix_list.dat")


@dataclass(frozen=True)
class PslRules:
    """Parsed public-suffix rules. ``exact`` holds multi-label exact
    rules; ``wildcard`` holds the BASE of each ``*.base`` rule (the
    wildcard consumes exactly one extra label, per the PSL spec);
    ``exception`` holds each ``!rule`` with the '!' stripped."""

    exact: tuple[str, ...]
    wildcard: tuple[str, ...]
    exception: tuple[str, ...]


def _read_default_psl() -> str:
    """The shipped snapshot — read zip-safely: on non-local masters the
    package arrives on executors as an addPyFiles zip, where the module
    __file__ path is NOT an openable file (NotADirectoryError — found
    by tests/test_local_cluster.py). importlib.resources resolves
    through the zipimporter; the plain open stays as the fast path."""
    try:
        with open(_PSL_PATH, encoding="utf-8") as fh:
            return fh.read()
    except OSError:
        from importlib import resources

        return (
            resources.files("stream_processing_platform_spark")
            / "data"
            / "public_suffix_list.dat"
        ).read_text("utf-8")


def load_psl(path: str | None = None) -> PslRules:
    """Parse a publicsuffix.org-format rule file: one rule per line,
    ``//`` comments, blank lines ignored, ``*.`` wildcards, ``!``
    exceptions. Single-label exact rules are dropped (they equal the
    implicit ``*`` default branch and would only bloat the plan)."""
    exact, wildcard, exception = [], [], []
    if path is not None:
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
    else:
        text = _read_default_psl()
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        # the official file whitespace-separates trailing comments
        line = line.split()[0].lower()
        if line.startswith("!"):
            exception.append(line[1:])
        elif line.startswith("*."):
            wildcard.append(line[2:])
        elif "." in line:
            exact.append(line)
    return PslRules(tuple(exact), tuple(wildcard), tuple(exception))


PSL_RULES: PslRules = load_psl()

# Rule sets at or below this size inline as isin() literal lists (InSet
# hash lookups, one plan node per rule); larger sets ride as a single
# ArrayType literal through array_contains (one plan node total, linear
# per-row scan). See the trade-off note inside registered_domain.
PSL_MEMBERSHIP_INLINE_MAX = 64

# Back-compat alias (pre-r12 API): a bare tuple of two-level suffixes is
# still accepted by registered_domain/registered_domain_sql and treated
# as exact rules.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = tuple(
    s for s in PSL_RULES.exact if s.count(".") == 1
)


def _psl_branches(rules: PslRules) -> list[tuple[str, int, tuple[str, ...], int]]:
    """Shared branch table driving BOTH the Column and the SQL builder
    (generated-oracle doctrine): ordered ``(kind, k, rule_set, result_k)``
    rows, where ``k`` is the label count of the joined tail compared
    against ``rule_set`` and ``result_k`` the label count of the
    registered domain (0 = pass the host through). Kinds:

    - ``exc``  — exception rule: the rule ITSELF is the registered
      domain (public suffix = rule minus its leftmost label);
    - ``exact`` — exact rule of k labels: suffix = rule, registered =
      k+1 labels when n >= k+1; when the host IS the bare suffix
      (n == k) it passes through unchanged. The bare case lives INSIDE
      the exact branch (result selected by a nested n-conditional)
      rather than as a sibling branch so the rule-set membership
      literal — ~500 entries for the k=2 exact set — appears ONCE in
      the plan (r12 ADVICE: the default branch returns the LAST TWO
      labels, so without the bare case 'blob.core.windows.net'
      truncated to 'windows.net'; a sibling branch would have doubled
      the array literal, caught by the plan-form gate);
    - ``wild`` — ``*.base`` with base of k labels: suffix = base plus
      one label, registered = k+2 labels when n >= k+2;
    - ``wild_bare`` — host IS a wildcard-matched suffix (n == k+1):
      pass through unchanged.

    Order = PSL precedence: exceptions first (they prevail regardless
    of length), then exact/wildcard by descending effective rule
    length. Membership sets can never alias across k: a joined tail of
    k labels has k-1 dots, so it cannot equal a rule with a different
    label count.
    """
    branches: list[tuple[str, int, tuple[str, ...], int]] = []
    by_k: dict[int, list[str]] = {}
    for r in rules.exception:
        by_k.setdefault(r.count(".") + 1, []).append(r)
    for k in sorted(by_k, reverse=True):
        branches.append(("exc", k, tuple(by_k[k]), k))
    merged: list[tuple[int, str, int, tuple[str, ...], int]] = []
    by_k = {}
    for r in rules.exact:
        by_k.setdefault(r.count(".") + 1, []).append(r)
    for k, rs in by_k.items():
        merged.append((k, "exact", k, tuple(rs), k + 1))
    by_k = {}
    for b in rules.wildcard:
        by_k.setdefault(b.count(".") + 1, []).append(b)
    for k, rs in by_k.items():
        # effective rule length = base labels + the wildcard label
        merged.append((k + 1, "wild", k, tuple(rs), k + 2))
        merged.append((k + 1, "wild_bare", k, tuple(rs), 0))
    for _, kind, k, rs, res in sorted(merged, key=lambda t: (-t[0], t[1])):
        branches.append((kind, k, rs, res))
    return branches


def host_of(url: Column) -> Column:
    """Hostname of a URL, lowercased (parse_url is JVM-side)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def host_of_sql(url_expr: str) -> str:
    """duckdb twin of :func:`host_of`."""
    return f"lower(regexp_extract({url_expr}, '^[a-zA-Z]+://([^/]+)', 1))"


def _coerce_rules(rules: PslRules | tuple[str, ...]) -> PslRules:
    if isinstance(rules, PslRules):
        return rules
    return PslRules(exact=tuple(rules), wildcard=(), exception=())


def registered_domain(
    host: Column, rules: PslRules | tuple[str, ...] = PSL_RULES
) -> Column:
    """Registered (pay-level) domain of a hostname: one label beyond
    the public suffix, full PSL semantics. ``blog.alpha.co.uk`` ->
    ``alpha.co.uk``; ``www.beta.com`` -> ``beta.com``;
    ``wiki.example.ck`` -> ``wiki.example.ck`` (wildcard ``*.ck``);
    ``foo.www.ck`` -> ``www.ck`` (exception ``!www.ck``); a bare
    suffix passes through. A bare tuple is accepted as exact rules
    (pre-r12 API)."""
    r = _coerce_rules(rules)

    # Column expressions are TREES: every reference splices a copy, so a
    # chain with ~12 branches each referencing split(host) k times — and
    # host itself often a deep expression (canonical_url of a generated
    # fixture) — multiplies into tens of thousands of nodes. That's not
    # a row-time problem (codegen CSE would dedupe) but a PLAN-time one:
    # Catalyst's rule iterations over the exploded tree cost ~10 s of
    # driver compile per fresh lineage (measured on
    # q_robots_rules_filter, r12). let() binds host and its split ONCE
    # as HOF lambda variables — references become reads, the tree stays
    # a few hundred nodes, and per-row cost is a dozen hash-set
    # membership checks (interpreted, but trivially cheap).
    from stream_processing_platform_spark.functions.text import let

    def chain(h: Column, p: Column) -> Column:
        n = F.size(p)

        # try_element_at, not element_at: ANSI mode makes a negative
        # index past the array bounds a runtime error, and the tails
        # are evaluated unconditionally (they feed the WHEN
        # conditions) — a single-label host (localhost, intranet
        # names) must not throw. concat_ws skips NULLs; the n-guards
        # keep the semantics exact, and a collapsed short tail can
        # never alias a longer rule (fewer dots).
        def last(k: int) -> Column:
            return F.concat_ws(
                ".", *[F.try_element_at(p, F.lit(-i)) for i in range(k, 0, -1)]
            )

        expr = F.when(n >= 2, last(2)).otherwise(h)
        # build the chain back-to-front so the highest-precedence
        # branch ends up outermost.
        #
        # Membership structure is a plan-time/row-time trade: an
        # isin(...) list is one Literal NODE PER RULE, and HOF lambda
        # bodies never get the In->InSet rewrite, so a ~400-rule
        # IN-list is BOTH a fat plan (every optimizer/AQE walk of a
        # fresh lineage paid ~5 s, measured r12) AND a sequential
        # interpreted compare. A big set therefore rides as ONE
        # ArrayType literal (a single plan node) via array_contains —
        # the same linear short-string scan (~2 µs at 400 rules)
        # without the plan weight. Small sets stay IN-lists (cheap in
        # both dimensions; the cutoff is PSL_MEMBERSHIP_INLINE_MAX).
        for kind, k, rs, res in reversed(_psl_branches(r)):
            if len(rs) <= PSL_MEMBERSHIP_INLINE_MAX:
                member = last(k).isin(*rs)
            else:
                member = F.array_contains(F.lit(list(rs)), last(k))
            if kind == "exc":
                expr = F.when(member & (n >= k), last(k)).otherwise(expr)
            elif kind == "exact":
                # n >= k+1: one label beyond the suffix; n == k: the
                # host IS the bare suffix — pass through. One membership
                # test (one array literal) serves both outcomes.
                expr = F.when(
                    member & (n >= k),
                    F.when(n >= k + 1, last(k + 1)).otherwise(h),
                ).otherwise(expr)
            elif kind == "wild":
                expr = F.when(member & (n >= k + 2), last(k + 2)).otherwise(expr)
            else:  # wild_bare: the host IS a wildcard-matched suffix
                expr = F.when(member & (n == k + 1), h).otherwise(expr)
        return expr

    return let(host, lambda h: let(F.split(h, r"\."), lambda p: chain(h, p)))


def registered_domain_sql(
    host_expr: str, rules: PslRules | tuple[str, ...] = PSL_RULES
) -> str:
    """duckdb twin of :func:`registered_domain`, generated from the
    SAME parsed rule table via the SAME branch list (generated-oracle
    doctrine). duckdb lists are 1-indexed and support negative indexing
    like Spark's element_at; an out-of-bounds index yields NULL, which
    NULL-propagates through || so an undersized host can never match a
    longer rule."""
    r = _coerce_rules(rules)
    p = f"string_split({host_expr}, '.')"

    def last(k: int) -> str:
        return "(" + " || '.' || ".join(f"{p}[-{i}]" for i in range(k, 0, -1)) + ")"

    def inset(k: int, rs: tuple[str, ...]) -> str:
        return f"{last(k)} IN (" + ", ".join(f"'{s}'" for s in rs) + ")"

    whens = []
    for kind, k, rs, res in _psl_branches(r):
        if kind == "exc":
            whens.append(f"WHEN {inset(k, rs)} AND len({p}) >= {k} THEN {last(k)}")
        elif kind == "exact":
            whens.append(
                f"WHEN {inset(k, rs)} AND len({p}) >= {k} THEN "
                f"(CASE WHEN len({p}) >= {k + 1} THEN {last(k + 1)} "
                f"ELSE {host_expr} END)"
            )
        elif kind == "wild":
            whens.append(
                f"WHEN {inset(k, rs)} AND len({p}) >= {k + 2} THEN {last(k + 2)}"
            )
        else:
            whens.append(
                f"WHEN {inset(k, rs)} AND len({p}) = {k + 1} THEN {host_expr}"
            )
    whens.append(f"WHEN len({p}) >= 2 THEN {last(2)}")
    return "CASE " + " ".join(whens) + f" ELSE {host_expr} END"


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


# --------------------------------------------- relative URL resolution
#
# The crawl-discovery half of the frontier loop (r14 — the r13 verdict's
# top ask): a fetched page's <a href> values are RELATIVE references
# that must resolve against the page URL before canonicalization and
# the seen-frontier anti-join. WHATWG-basic deterministic subset,
# documented like the robots deviations:
#
# - fragment is stripped from the reference FIRST (a crawl frontier
#   never distinguishes fragments); a fragment-only or empty reference
#   resolves to the base with ITS fragment stripped;
# - a reference with a scheme (``^[a-zA-Z][a-zA-Z0-9+.-]*:``) is taken
#   VERBATIM (no dot-normalization of absolute URLs — canonical_url
#   handles case/port/params downstream); this is also why a relative
#   path containing ':' in its first segment needs './' (RFC 3986
#   §4.2 note, same as every browser);
# - scheme-relative ``//host/...`` gets the base scheme;
# - path references drop the base query (RFC 3986 merge semantics);
#   a query-only reference keeps the base path and replaces the query;
# - dot segments ('.', '..') are removed by a BOUNDED unrolled rewrite
#   (_DOT_PASSES passes — resolves any path with up to that many
#   nested dot segments; deeper chains keep their residue rather than
#   erroring, the never-throw policy). '..' at the root pops to '/'
#   (WHATWG behavior);
# - no percent-encoding normalization and no IDNA (the same documented
#   deviations as canonical_url).
#
# Pure JVM regexp expressions — whole-stage codegen, zero Python at
# 100 TB scan speed — with the duckdb twin generated from the SAME
# step table (_DOT_STEPS) so the oracle cannot drift.

_URL_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*:"
_DOT_PASSES = 6
# one pass = collapse '/./', trailing '/.', one '..' pop, one root-pop;
# _DOT_PASSES passes unrolled — each pass resolves at least one level
# of nesting, so depth <= _DOT_PASSES chains fully normalize.
# A path segment that is NOT exactly '.' or '..' — the only segments a
# '..' may pop. RE2 has no lookahead, so exclusion is an alternation:
# first char not a dot | '.x…' | '..x…'. Both counterexamples below
# came out of the hypothesis fuzz vs urljoin (r14).
_SEG_NOT_DOTS = r"(?:[^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)"
_DOT_STEPS: tuple[tuple[str, str], ...] = tuple(
    step
    for _ in range(_DOT_PASSES)
    for step in (
        # RUNS of './' in one match: a single '/\./' pass only removes
        # alternate segments of '/././..' (non-overlapping matches
        # share the '/'), and the leftover '.' would then be consumed
        # by the '..' pop as if it were a real segment ('././..')
        (r"/(?:\./)+", "/"),
        (r"/\.$", "/"),
        # the popped segment must be a REAL one: a bare [^/]+ matches
        # '..' itself, so '../..' annihilated to nothing instead of
        # popping two levels ('/0/0/0/' + '../../../..')
        (rf"/{_SEG_NOT_DOTS}/\.\.(/|$)", "/"),
        (r"^/\.\.(/|$)", "/"),
    )
)


def _remove_dot_segments(path: Column) -> Column:
    for pat, rep in _DOT_STEPS:
        path = F.regexp_replace(path, pat, rep)
    return path


def _remove_dot_segments_sql(path_expr: str) -> str:
    for pat, rep in _DOT_STEPS:
        path_expr = f"regexp_replace({path_expr}, '{pat}', '{rep}', 'g')"
    return path_expr


def resolve_url(base: Column, ref: Column) -> Column:
    """Resolve reference ``ref`` against page URL ``base`` (WHATWG-basic
    subset — module comment above). Callers should pass plain columns:
    the sub-expressions are referenced a handful of times each and stay
    inside whole-stage codegen (a let() binding here would push the
    whole resolve into interpreted-HOF territory)."""
    ref0 = F.regexp_replace(ref, "#.*$", "")
    scheme = F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    basepath = F.regexp_extract(
        base, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    basedir = F.regexp_replace(basepath, "[^/]*$", "")
    basedir = F.when(basedir == "", F.lit("/")).otherwise(basedir)
    rpath = F.regexp_extract(ref0, "^([^?]*)", 1)
    rq = F.regexp_extract(ref0, r"(\?.*)$", 1)
    return (
        F.when(ref0 == "", F.regexp_replace(base, "#.*$", ""))
        .when(ref0.rlike(_URL_SCHEME_RE), ref0)
        .when(
            ref0.startswith("//"), F.concat(scheme, F.lit(":"), ref0)
        )
        .when(
            ref0.startswith("/"),
            F.concat(origin, _remove_dot_segments(rpath), rq),
        )
        .when(rpath == "", F.concat(origin, basepath, rq))  # query-only
        .otherwise(
            F.concat(
                origin,
                _remove_dot_segments(F.concat(basedir, rpath)),
                rq,
            )
        )
    )


def document_base(page: Column, base_href: Column) -> Column:
    """The document base URL for outlink resolution: the page URL,
    overridden by a ``<base href>`` value when present. Deterministic
    subset (r14): HTTP(S)-family base tags only — absolute http(s)
    URLs, scheme-relative ``//host``, and absolute paths; everything
    else (path-relative, non-http schemes like ftp:/javascript:, and
    '') is ignored, i.e. the page URL stays the base. Rationale:
    nesting the full resolver here splices its ~30-node tree into
    every base reference of the outer resolve and blew janino's 64 KB
    method limit; path-relative base tags are pathological in real
    crawl data; and honoring an arbitrary-scheme base would let a
    page-controlled tag smuggle non-http URLs PAST the pre-resolution
    http(s) gate (r14 review finding — restricting to the http family
    is what makes gating the raw reference equivalent to gating the
    resolved URL). No dot-segment removal on the base itself."""
    scheme = F.regexp_extract(page, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = F.regexp_extract(page, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    return (
        F.when(base_href.rlike("(?i)^https?://"), base_href)
        .when(
            base_href.startswith("//"),
            F.concat(scheme, F.lit(":"), base_href),
        )
        .when(base_href.startswith("/"), F.concat(origin, base_href))
        .otherwise(page)
    )


def document_base_sql(page_expr: str, base_href_expr: str) -> str:
    """duckdb twin of :func:`document_base`."""
    scheme = f"regexp_extract({page_expr}, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1)"
    origin = (
        f"regexp_extract({page_expr}, "
        f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1)"
    )
    return f"""CASE
      WHEN regexp_matches({base_href_expr}, '(?i)^https?://')
        THEN {base_href_expr}
      WHEN {base_href_expr} LIKE '//%'
        THEN {scheme} || ':' || {base_href_expr}
      WHEN {base_href_expr} LIKE '/%' THEN {origin} || {base_href_expr}
      ELSE {page_expr}
    END"""


def resolve_url_sql(base_expr: str, ref_expr: str) -> str:
    """duckdb twin of :func:`resolve_url`, generated from the same
    _DOT_STEPS table. Pre-bind ``base_expr``/``ref_expr`` to CTE
    columns — each is spliced several times."""
    ref0 = f"regexp_replace({ref_expr}, '#.*$', '')"
    scheme = f"regexp_extract({base_expr}, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1)"
    origin = (
        f"regexp_extract({base_expr}, "
        f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1)"
    )
    basepath = (
        f"regexp_extract({base_expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    )
    basedir = f"regexp_replace({basepath}, '[^/]*$', '')"
    basedir = f"CASE WHEN {basedir} = '' THEN '/' ELSE {basedir} END"
    rpath = f"regexp_extract({ref0}, '^([^?]*)', 1)"
    rq = f"regexp_extract({ref0}, '(\\?.*)$', 1)"
    return f"""CASE
      WHEN {ref0} = '' THEN regexp_replace({base_expr}, '#.*$', '')
      WHEN regexp_matches({ref0}, '{_URL_SCHEME_RE}') THEN {ref0}
      WHEN {ref0} LIKE '//%' THEN {scheme} || ':' || {ref0}
      WHEN {ref0} LIKE '/%'
        THEN {origin} || {_remove_dot_segments_sql(rpath)} || {rq}
      WHEN {rpath} = '' THEN {origin} || {basepath} || {rq}
      ELSE {origin}
           || {_remove_dot_segments_sql(f"({basedir} || {rpath})")}
           || {rq}
    END"""


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
