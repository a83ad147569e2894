"""Relative URL resolution (operators/webcur.resolve_url) + outlink
extraction (functions/html.extract_hrefs) — the r14 crawl-discovery
pair. The resolver is pinned THREE ways on one case grid: Spark
expression == duckdb generated twin == urllib.parse.urljoin (the
stdlib reference for the supported WHATWG-basic subset, fragments
pre-stripped since the frontier drops them)."""

from __future__ import annotations

import duckdb
from urllib.parse import urldefrag, urljoin

from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.html import (
    HREF_PATTERNS,
    extract_hrefs,
    extract_hrefs_sql,
)
from stream_processing_platform_spark.operators.webcur import (
    resolve_url,
    resolve_url_sql,
)

# (base, ref) grid — every branch of the resolver: plain/./../deep-..
# relative paths, beyond-root pops, absolute path, scheme-relative
# (http and https bases), absolute, mailto/javascript, fragment-only,
# empty, query-only (with and without a base query), query+fragment,
# pathless bases, trailing-slash bases, mixed dot segments.
CASES = [
    ("https://www.ex.com/a/b/c.html", "d.html"),
    ("https://www.ex.com/a/b/c.html", "./d.html"),
    ("https://www.ex.com/a/b/c.html", "../d.html"),
    ("https://www.ex.com/a/b/c.html", "../../d.html"),
    ("https://www.ex.com/a/b/c.html", "../../../../d.html"),
    ("https://www.ex.com/a/b/c.html", "/top/x.html"),
    ("https://www.ex.com/a/b/c.html", "//cdn.ex.org/l.js"),
    ("http://ex.com/a/b/c.html", "//cdn.ex.org/l.js"),
    ("https://www.ex.com/a/b/c.html", "https://other.org/p"),
    ("https://www.ex.com/a/b/c.html", "mailto:x@y.z"),
    ("https://www.ex.com/a/b/c.html", "javascript:void(0)"),
    ("https://www.ex.com/a/b/c.html", "#frag"),
    ("https://www.ex.com/a/b/c.html", ""),
    ("https://www.ex.com/a/b/c.html#old", "#new"),
    ("https://www.ex.com/a/b/c.html", "?q=1"),
    ("https://www.ex.com/a/b/c.html?z=2", "?q=1"),
    ("https://www.ex.com/a/b/c.html?z=2", "d.html?q=1"),
    ("https://www.ex.com/a/b/c.html", "d.html?q=1#frag"),
    ("https://www.ex.com", "p.html"),
    ("https://www.ex.com", "/p.html"),
    ("https://www.ex.com/", "p.html"),
    ("https://www.ex.com/a/", "b/./c/../d.html"),
    ("https://www.ex.com/a/b/", "../"),
    ("https://www.ex.com/a/b/", ".."),
    ("https://www.ex.com/a/b/", "."),
    ("https://www.ex.com/a/b/", "sub/"),
    ("https://www.ex.com/a/b/", "x/y/../../z.html"),
    ("https://www.ex.com/p;v=1/q", "r.html"),
]


def _spark_resolved(spark):
    df = spark.createDataFrame(CASES, ["base", "ref"])
    return [
        r["out"]
        for r in df.select(
            resolve_url(F.col("base"), F.col("ref")).alias("out")
        ).collect()
    ]


def test_resolver_matches_urljoin_and_duckdb(spark):
    got_spark = _spark_resolved(spark)
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT " + resolve_url_sql("base", "ref")
            + " FROM (VALUES "
            + ",".join(f"('{b}','{r}')" for b, r in CASES)
            + ") t(base, ref)"
        ).fetchall()
    ]
    for (b, r), s, d in zip(CASES, got_spark, got_duck):
        exp = urldefrag(urljoin(b, r))[0]
        assert s == exp, f"spark {(b, r)} -> {s!r} != urljoin {exp!r}"
        assert d == exp, f"duckdb {(b, r)} -> {d!r} != urljoin {exp!r}"


def test_extract_hrefs_subset(spark):
    html = (
        '<html><head><link rel="stylesheet" href="/css/site.css">'
        "</head><body>"
        '<a href="/dq/page.html">x</a>'
        "<A HREF='../sq/page.html'>y</A>"
        "<a class='k' href=unquoted.html>z</a>"
        '<a href="">empty</a>'
        '<a name="anchor-no-href">w</a>'
        # attributes merely ENDING in href are not hrefs — and the real
        # href later in the same tag must still be found (r14 review)
        '<a data-href="/fake.js" href="/real.html">r</a>'
        '<a ng-href="/alsofake.js">n</a>'
        '<img src="/img/p.png">'
        "</body></html>"
    )
    rows = (
        spark.createDataFrame([(html,)], ["raw"])
        .select(extract_hrefs(F.col("raw")).alias("hrefs"))
        .collect()
    )
    got = sorted(rows[0]["hrefs"])
    assert got == sorted(
        ["/dq/page.html", "../sq/page.html", "unquoted.html", "",
         "/real.html"]
    )
    # duckdb twin extracts the identical multiset from the same HTML
    con = duckdb.connect()
    d = con.execute(
        "SELECT " + extract_hrefs_sql("raw")
        + " FROM (VALUES (?)) t(raw)",
        [html],
    ).fetchone()[0]
    assert sorted(d) == got
    assert len(HREF_PATTERNS) == 3


def test_extract_hrefs_no_anchors_is_empty_array(spark):
    rows = (
        spark.createDataFrame([("<p>no links</p>",), ("",)], ["raw"])
        .select(extract_hrefs(F.col("raw")).alias("hrefs"))
        .collect()
    )
    assert [list(r["hrefs"]) for r in rows] == [[], []]


# ---- property-based: the generated resolver tracks urljoin over the
# documented subset (no empty path segments, no ':' in a relative
# first segment, dot-chains within the bounded unroll depth).

from hypothesis import given, settings, strategies as st

_SEG = st.text(alphabet="abcxyz019", min_size=1, max_size=5)


@st.composite
def _bases(draw):
    host = draw(st.sampled_from(["ex.com", "www.ex.org", "a.b.co.uk"]))
    segs = draw(st.lists(_SEG, min_size=0, max_size=4))
    leaf = draw(st.sampled_from(["", "page.html", "q?x=1"]))
    path = "".join("/" + s for s in segs)
    scheme = draw(st.sampled_from(["http", "https"]))
    return f"{scheme}://{host}{path}/{leaf}" if (segs or leaf) else f"{scheme}://{host}"


@st.composite
def _refs(draw):
    kind = draw(st.integers(0, 6))
    segs = draw(st.lists(st.one_of(_SEG, st.just(".."), st.just(".")),
                         min_size=1, max_size=4))
    rel = "/".join(segs)
    if kind == 0:
        return rel                      # relative path
    if kind == 1:
        return "./" + rel
    if kind == 2:
        return "/" + rel                # absolute path
    if kind == 3:
        return rel + "?a=1&b=2"         # with query
    if kind == 4:
        return "//cdn.ex.net/" + rel    # scheme-relative
    if kind == 5:
        return rel + "#frag"            # fragment dropped
    return "https://other.org/" + rel   # absolute


@settings(max_examples=150, deadline=None)
@given(base=_bases(), ref=_refs())
def test_resolver_property_tracks_urljoin(base, ref):
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + resolve_url_sql("base", "ref")
        + " FROM (VALUES (?, ?)) t(base, ref)",
        [base, ref],
    ).fetchone()[0]
    exp = urldefrag(urljoin(base, ref))[0]
    assert got == exp, (base, ref)


# ---- property-based: extract_hrefs tracks a real HTML parser
# (stdlib html.parser) over the documented subset — well-formed tags,
# no entities in values, one href per tag. The duckdb twin is used as
# the executable form (pinned equal to the Spark expression above).

from html.parser import HTMLParser


class _HrefCollector(HTMLParser):
    def __init__(self):
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)


# no '#' or '&'+digits pairs that form character references —
# entity unescape is documented out of the subset
_VAL = st.text(alphabet="abz./?=-_", min_size=0, max_size=12)
_NOISE_ATTR = st.sampled_from(["class", "id", "data-href", "ng-href", "rel"])


@st.composite
def _tags(draw):
    kind = draw(st.integers(0, 4))
    val = draw(_VAL)
    quote = draw(st.sampled_from(['"', "'", ""]))
    if quote == "":
        # unquoted values must be nonempty and not start with '='
        # (an HTML5 parse error outside the documented subset)
        val = "u" + val.lstrip("=")
    noise = ""
    if draw(st.booleans()):
        nk = draw(_NOISE_ATTR)
        nv = draw(_VAL)
        noise = f' {nk}="{nv}"'
    a_open = draw(st.sampled_from(["<a", "<A"]))
    href = draw(st.sampled_from(["href", "HREF", "Href"]))
    if kind == 0:  # <a href> — noise attr before href
        return f"{a_open}{noise} {href}={quote}{val}{quote}>t</a>"
    if kind == 1:  # <a href> — noise attr after href
        return f"{a_open} {href}={quote}{val}{quote}{noise}>t</a>"
    if kind == 2:  # anchor without href
        filler = noise or ' id="x"'
        return f"{a_open}{filler}>t</a>"
    if kind == 3:  # non-anchor href carriers must be skipped
        return f'<link href="{val}"><area href="{val}">'
    return draw(st.sampled_from(["plain text ", "<p>para</p>", "<img src='/i.png'>"]))


@settings(max_examples=120, deadline=None)
@given(parts=st.lists(_tags(), min_size=0, max_size=8))
def test_extract_hrefs_property_tracks_html_parser(parts):
    html = "<html><body>" + "".join(parts) + "</body></html>"
    ref = _HrefCollector()
    ref.feed(html)
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + extract_hrefs_sql("raw") + " FROM (VALUES (?)) t(raw)",
        [html],
    ).fetchone()[0]
    assert sorted(got) == sorted(ref.hrefs), html


def test_document_base_and_base_href_extraction(spark):
    from stream_processing_platform_spark.functions.html import (
        extract_base_href,
        extract_base_href_sql,
    )
    from stream_processing_platform_spark.operators.webcur import (
        document_base,
        document_base_sql,
    )

    # first <base href> wins IN DOCUMENT ORDER — including when a
    # later tag uses a different quoting form (r14 review: a per-form
    # extract let a later double-quoted base beat an earlier
    # single-quoted one); <a href> never matches the base patterns
    htmls = [
        ('<head><base target="_b" href="/zone/"><base href="/late/">'
         '</head><a href="/x">t</a>', "/zone/"),
        ("<base href='/first/'><base href=\"/second/\">", "/first/"),
        ('<base href=unq1><base href="/second/">', "unq1"),
        ("<p>none</p>", ""),
    ]
    got = (
        spark.createDataFrame([(h,) for h, _ in htmls], ["raw"])
        .select(extract_base_href(F.col("raw")).alias("b"))
        .collect()
    )
    assert [r["b"] for r in got] == [e for _, e in htmls]
    con = duckdb.connect()
    for h, e in htmls:
        assert con.execute(
            "SELECT " + extract_base_href_sql("raw")
            + " FROM (VALUES (?)) t(raw)",
            [h],
        ).fetchone()[0] == e, h

    # document_base subset: absolute http(s) / scheme-relative /
    # absolute-path honored; path-relative, NON-HTTP schemes (a
    # page-controlled base must not smuggle ftp:/javascript: past the
    # http gate) and absent -> the page URL
    page = "https://www.ex.com/a/b/c.html"
    cases = [
        ("https://other.org/z/", "https://other.org/z/"),
        ("HTTP://other.org/z/", "HTTP://other.org/z/"),
        ("//cdn.ex.net/z/", "https://cdn.ex.net/z/"),
        ("/zone/", "https://www.ex.com/zone/"),
        ("rel/", page),
        ("ftp://files.ex.net/pub/", page),
        ("javascript:", page),
        ("", page),
    ]
    rows = (
        spark.createDataFrame([(page, b) for b, _ in cases], ["p", "b"])
        .select(document_base(F.col("p"), F.col("b")).alias("e"))
        .collect()
    )
    assert [r["e"] for r in rows] == [e for _, e in cases]
    for b, e in cases:
        got = con.execute(
            "SELECT " + document_base_sql("p", "b")
            + " FROM (VALUES (?, ?)) t(p, b)",
            [page, b],
        ).fetchone()[0]
        assert got == e, (b, got)


@settings(max_examples=120, deadline=None)
@given(base=_bases(), ref=_refs())
def test_canonicalize_resolve_composition_stable(base, ref):
    """Frontier-key invariants: canonical_url is IDEMPOTENT on resolver
    output (a canonical key re-canonicalizes to itself — otherwise the
    seen anti-join and q_stream_url_dedup's state would key on
    different strings for the same resource), and resolving a
    canonical base yields the same canonical key as resolving the raw
    base (fragments/dot-chains can't leak into the frontier key)."""
    from stream_processing_platform_spark.operators.webcur import (
        canonical_url_sql,
    )

    con = duckdb.connect()
    q = (
        "SELECT c1, " + canonical_url_sql("c1") + " AS c2 FROM ("
        "SELECT " + canonical_url_sql(resolve_url_sql("base", "ref"))
        + " AS c1 FROM (VALUES (?, ?)) t(base, ref))"
    )
    c1, c2 = con.execute(q, [base, ref]).fetchone()
    assert c1 == c2, (base, ref, c1, c2)
