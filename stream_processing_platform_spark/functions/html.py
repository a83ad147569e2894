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
