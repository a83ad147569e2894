"""HTML boilerplate removal — web-corpus text extraction as pure column
expressions (the trafilatura/jusText-lite step every web-scale training
pipeline runs before quality filtering).

All JVM-side `regexp_replace` chains (global by default in Spark;
the DuckDB oracle passes the 'g' option) over patterns valid in BOTH
Java regex and RE2: inline ``(?s)`` dot-all, lazy ``.*?``, no
backreferences/lookaround. Entity decoding is a fixed literal-replace
chain applied in the same order on both engines, so ``&amp;lt;``
correctly yields the literal ``&lt;`` (ampersand decoded last).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order; keep in sync with SQL_STEPS.
_TAG_STEPS: list[tuple[str, str]] = [
    (r"(?s)<script[^>]*>.*?</script>", " "),  # executable payload
    (r"(?s)<style[^>]*>.*?</style>", " "),  # styling payload
    (r"(?s)<!--.*?-->", " "),  # comments
    (r"<[^>]+>", " "),  # every remaining tag
]
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: &amp;lt; must decode to the literal &lt;
]


def strip_html(raw: Column) -> Column:
    """Visible text of an HTML payload: drop script/style/comments, strip
    tags, decode the common entities, collapse whitespace."""
    out = raw
    for pat, rep in _TAG_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        out = F.replace(out, F.lit(lit), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_html_sql(raw_expr: str) -> str:
    """DuckDB twin of :func:`strip_html`, built from the same steps."""
    out = raw_expr
    for pat, rep in _TAG_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    for lit, rep in _ENTITY_STEPS:
        rep_sql = rep.replace("'", "''")
        lit_sql = lit.replace("'", "''")
        out = f"replace({out}, '{lit_sql}', '{rep_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def text_density(raw: Column, stripped: Column) -> Column:
    """share of the raw payload that is visible text — the classic
    boilerplate signal (low density ⇒ chrome-heavy page). Exact-integer
    lengths, floor(x+0.5) rounding: engine-portable."""
    return F.floor(F.length(stripped) * 10000.0 / F.length(raw) + 0.5) / 10000.0


# ------------------------------------------------ block-level extraction
#
# jusText/trafilatura-lite: real pipelines don't strip a page to one
# string — they segment it into BLOCKS at block-level tag boundaries,
# score each block (visible-text length, link density), and keep only
# content-like blocks, which is what actually removes nav bars,
# sidebars, ad units and footers (a whole-page strip keeps their text).
# Shared-constant design: the Spark Columns and the duckdb SQL are both
# generated from the tables below, so the heuristic can never drift
# between engines.

# block-level boundaries -> split sentinel (absent from fixtures/corpus)
_BLOCK_TAG_RE = (
    r"</?(p|div|h[1-6]|li|ul|ol|nav|header|footer|aside|section|article"
    r"|table|tr|td|blockquote|br)[^>]*>"
)
_BLOCK_SENTINEL = "¶"  # pilcrow
_LINK_RE = r"(?s)<a [^>]*>(.*?)</a>"
MIN_BLOCK_TEXT = 25   # chars of visible text a content block must have
LINK_RATIO_DENOM = 3  # keep iff link_chars * DENOM < text_chars (<1/3 links)


def _block_is_content(b: Column) -> Column:
    text_len = F.length(strip_html(b))
    link_len = F.length(
        F.regexp_replace(
            F.array_join(F.regexp_extract_all(b, F.lit(_LINK_RE), 1), ""),
            r"<[^>]+>",
            "",
        )
    )
    return (text_len >= MIN_BLOCK_TEXT) & (link_len * LINK_RATIO_DENOM < text_len)


def boilerplate_blocks(raw: Column) -> dict[str, Column]:
    """Block-level content extraction of an HTML payload. Returns the
    columns ``content`` (kept blocks' visible text joined by single
    spaces), ``n_blocks`` (blocks with any visible text) and ``n_kept``.

    Pure column expressions; the per-block strip chain runs inside
    higher-order-function lambdas (interpreted per element — fine for
    the tens of blocks a page has; the page itself never shuffles)."""
    blocks = F.split(F.regexp_replace(raw, _BLOCK_TAG_RE, _BLOCK_SENTINEL),
                     _BLOCK_SENTINEL)
    nonempty = F.filter(blocks, lambda b: F.length(strip_html(b)) > 0)
    kept = F.filter(blocks, _block_is_content)
    return {
        "content": F.array_join(F.transform(kept, strip_html), " "),
        "n_blocks": F.size(nonempty).cast("long"),
        "n_kept": F.size(kept).cast("long"),
    }


def boilerplate_blocks_sql(raw_expr: str) -> dict[str, str]:
    """duckdb twin of :func:`boilerplate_blocks`, generated from the
    same tag/link/threshold tables."""
    blocks = (
        f"string_split(regexp_replace({raw_expr}, '{_BLOCK_TAG_RE}', "
        f"'{_BLOCK_SENTINEL}', 'g'), '{_BLOCK_SENTINEL}')"
    )
    strip_b = strip_html_sql("b")
    # duckdb regexp_extract_all yields NULL (not []) when nothing
    # matches — coalesce so linkless blocks score 0, as on the Spark side
    link_b = (
        f"coalesce(length(regexp_replace(array_to_string("
        f"regexp_extract_all(b, '{_LINK_RE}', 1), ''), '<[^>]+>', '', 'g')), 0)"
    )
    keep = (
        f"length({strip_b}) >= {MIN_BLOCK_TEXT} "
        f"AND {link_b} * {LINK_RATIO_DENOM} < length({strip_b})"
    )
    kept = f"list_filter({blocks}, b -> {keep})"
    nonempty = f"list_filter({blocks}, b -> length({strip_b}) > 0)"
    return {
        # coalesce: duckdb's array_to_string over an empty list is NULL,
        # Spark's array_join is '' — a page with zero content blocks
        # must emit '' on both engines (no-nullable-columns invariant)
        "content": (
            f"coalesce(array_to_string("
            f"list_transform({kept}, b -> {strip_b}), ' '), '')"
        ),
        "n_blocks": f"CAST(len({nonempty}) AS BIGINT)",
        "n_kept": f"CAST(len({kept}) AS BIGINT)",
    }


# --------------------------------------------- Arrow twin (r12, perf)
#
# The HOF form above runs the per-block strip chain in INTERPRETED
# lambdas (no codegen), and the strip chain is evaluated up to 3x per
# block (filter condition twice via tree-splicing + transform) — the
# exact shape CLAUDE.md's winnow lesson flags. The twin below runs the
# SAME tables/patterns through Python's compiled `re` in one Arrow
# mapInPandas pass, one strip per block. Pinned row-identical to the
# expression form by tests/test_text_pipeline.py (integer/string
# outputs — exact equality, no float allowance); the duckdb oracle
# stays generated from the expression tables, so a pin breach has a
# one-switch fallback (impl="expr").
#
# Regex-portability notes (Java regexp vs Python re):
# - every pattern avoids backreferences/lookaround; inline (?s) works
#   identically;
# - `\s` differs (Python default is Unicode-aware) — compiled with
#   re.ASCII, whose [ \t\n\r\f\v] equals Java's [ \t\n\x0B\f\r];
# - Spark F.trim strips 0x20 only -> .strip(' ');
# - F.length / len() both count code points.

_PY_BLOCK_RE = None  # compiled lazily so `re` stays an import-local


def _py_tables():
    global _PY_BLOCK_RE
    import re

    if _PY_BLOCK_RE is None:
        _PY_BLOCK_RE = (
            re.compile(_BLOCK_TAG_RE),
            [(re.compile(p), r) for p, r in _TAG_STEPS],
            re.compile(r"\s+", re.ASCII),
            re.compile(_LINK_RE),
            re.compile(r"<[^>]+>"),
        )
    return _PY_BLOCK_RE


def strip_html_py(raw: str) -> str:
    """Python twin of :func:`strip_html` (same step tables)."""
    _, tag_steps, ws, _, _ = _py_tables()
    out = raw
    for pat, rep in tag_steps:
        out = pat.sub(rep, out)
    for lit, rep in _ENTITY_STEPS:
        out = out.replace(lit, rep)
    return ws.sub(" ", out).strip(" ")


def boilerplate_blocks_py(raw: str) -> tuple[str, int, int]:
    """Python twin of :func:`boilerplate_blocks`: returns
    ``(content, n_blocks, n_kept)`` for one page, one strip per block."""
    block_re, _, _, link_re, tag_re = _py_tables()
    kept_texts: list[str] = []
    n_blocks = 0
    n_kept = 0
    for b in block_re.sub(_BLOCK_SENTINEL, raw).split(_BLOCK_SENTINEL):
        text = strip_html_py(b)
        tl = len(text)
        if tl > 0:
            n_blocks += 1
        if tl >= MIN_BLOCK_TEXT:
            link_len = len(tag_re.sub("", "".join(link_re.findall(b))))
            if link_len * LINK_RATIO_DENOM < tl:
                kept_texts.append(text)
                n_kept += 1
    return " ".join(kept_texts), n_blocks, n_kept


def boilerplate_blocks_pandas(df, raw: Column, id_cols: list[str] | None = None):
    """Arrow mapInPandas form of :func:`boilerplate_blocks` over a
    DataFrame: emits ``id_cols + (content, n_blocks, n_kept)``. One
    Python pass per page, zero shuffle — same scale shape as the
    expression form, minus the interpreted-HOF re-evaluation."""
    from pyspark.sql import functions as _F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ids = id_cols or ["doc_id"]
    src = df.select(*ids, raw.alias("_raw"))
    out_schema = StructType(
        [src.schema[c] for c in ids]
        + [
            StructField("content", StringType(), False),
            StructField("n_blocks", LongType(), False),
            StructField("n_kept", LongType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            # NULL raw -> '' (r12 ADVICE): the expression twin
            # NULL-propagates to NULL outputs, but the declared output
            # schema here is non-nullable ('' / 0 / 0 sentinels), and
            # the engine-wide UDF policy is never-throw — strip_html_py
            # would TypeError on None.
            res = [boilerplate_blocks_py(r or "") for r in pdf["_raw"]]
            out = pdf[ids].copy()
            out["content"] = [r[0] for r in res]
            out["n_blocks"] = [r[1] for r in res]
            out["n_kept"] = [r[2] for r in res]
            yield out

    return src.mapInPandas(run, out_schema)


# ------------------------------------------------- outlink extraction
#
# The discovery half of the crawl loop (r14): <a href> values parsed
# out of fetched HTML, feeding resolve_url (operators/webcur.py) and
# the frontier anti-join. Regexp subset, documented:
# - only <a> tags (a <link>/<img>/<script> href/src is not an outlink);
# - double-quoted, single-quoted, and unquoted attribute forms, case-
#   insensitive tag/attribute names ((?i) — Java regex and RE2 agree);
# - no HTML-entity unescape inside the value (the fixture and real
#   CDX pipelines treat &amp; rewriting as canonicalization's job);
# - values are returned in pattern order (all double-quoted matches,
#   then single-quoted, then unquoted) — consumers explode + group, so
#   order never reaches a result.
# Three JVM regexp_extract_all calls concatenated — whole-stage
# codegen, zero Python; the duckdb twin is generated from the SAME
# pattern table so the oracle cannot drift.

# The attribute name must start at a boundary (whitespace or a closing
# quote of the previous attribute): a bare [^>]*?href also matched
# attributes merely ENDING in 'href' (data-href, ng-href), extracting
# a fake outlink and skipping the tag's real one (r14 review finding).
_A_HREF = "(?i)<a\\s(?:[^>]*?[\\s\"'])?href\\s*=\\s*"
HREF_PATTERNS: tuple[str, ...] = (
    _A_HREF + "\"([^\"]*)\"",
    _A_HREF + "'([^']*)'",
    _A_HREF + "([^\"'\\s>][^\\s>]*)",
)


def extract_hrefs(raw: Column) -> Column:
    """array<string> of <a href> attribute values in ``raw`` (subset
    documented above). Never NULL: a page with no anchors yields an
    empty array."""
    return F.concat(
        *[F.regexp_extract_all(raw, F.lit(p), F.lit(1)) for p in HREF_PATTERNS]
    )


def extract_hrefs_sql(raw_expr: str) -> str:
    """duckdb twin of :func:`extract_hrefs`, from the same patterns."""
    parts = [
        "regexp_extract_all({e}, '{p}', 1)".format(
            e=raw_expr, p=p.replace("'", "''")
        )
        for p in HREF_PATTERNS
    ]
    return "(" + " || ".join(parts) + ")"


# <base href> — WHATWG: the FIRST <base> element with an href sets the
# document's base URL for relative reference resolution; later ones are
# ignored. Same quoting subset + boundary rule as HREF_PATTERNS. ONE
# alternation pattern so "first" means first TAG in document order,
# not first quoting form (a per-form extract let a later double-quoted
# base beat an earlier single-quoted one — r14 review finding). The
# three value forms land in capture groups 1..3; exactly one is
# non-empty at the first match (an empty quoted value means '' on all
# three, which callers treat as no override — an empty base href is
# meaningless and ignored, documented deviation).
BASE_HREF_PATTERN: str = (
    "(?i)<base\\s(?:[^>]*?[\\s\"'])?href\\s*=\\s*"
    "(?:\"([^\"]*)\"|'([^']*)'|([^\"'\\s>][^\\s>]*))"
)


def extract_base_href(raw: Column) -> Column:
    """The first <base href> value in ``raw``, '' when absent. Three
    regexp_extract calls over the SAME pattern (one per value-form
    group) — all anchored at the same first match, so document order
    decides; still whole-stage codegen."""
    out = F.lit("")
    for g in (3, 2, 1):
        hit = F.regexp_extract(raw, BASE_HREF_PATTERN, g)
        out = F.when(hit != "", hit).otherwise(out)
    return out


def extract_base_href_sql(raw_expr: str) -> str:
    """duckdb twin of :func:`extract_base_href`."""
    pat = BASE_HREF_PATTERN.replace("'", "''")
    out = "''"
    for g in (3, 2, 1):
        hit = f"regexp_extract({raw_expr}, '{pat}', {g})"
        out = f"CASE WHEN {hit} <> '' THEN {hit} ELSE {out} END"
    return out
