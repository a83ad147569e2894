"""Sitemap XML parsing (sitemaps.org protocol v0.9) — the frontier
half of the crawl-discovery pipeline: robots.txt surfaces ``Sitemap:``
URLs (functions/robotstxt.py), the crawler fetches each and parses the
payload into frontier entries. Two document shapes, both published
structure:

- ``<urlset>``: ``<url>`` entries with ``loc`` (required), optional
  ``lastmod`` (W3C datetime), ``changefreq`` (enumerated), ``priority``
  (0.0-1.0, default 0.5 per the spec);
- ``<sitemapindex>``: ``<sitemap>`` entries with ``loc`` + optional
  ``lastmod`` pointing at child sitemaps (recursion happens at the
  FETCH layer, not here — one payload in, its direct entries out).

Deterministic subset (documented choices):

- regex-extracted elements, case-sensitive lowercase tag names (the
  protocol defines lowercase; real-world sitemaps comply because
  crawlers do exactly this), no XML namespace validation;
- ``loc`` values are whitespace-trimmed and XML-unescaped for the five
  predefined entities (&amp; &lt; &gt; &quot; &apos;) — the spec
  REQUIRES entity-escaped URLs;
- ``priority`` parses as float and is floor-rounded to the 1e-3 grid
  as an integer (``priority_milli``) so downstream frontier math stays
  exact cross-engine; malformed priorities fall back to the spec
  default 0.5 (500);
- ``lastmod`` is surfaced verbatim (sorting W3C datetimes is
  lexicographic for same-precision values; parsing to epoch is the
  consumer's time-zone policy);
- entries beyond ``MAX_URLS_PER_SITEMAP`` (50,000 per the spec) are
  truncated, never an error (the never-throw policy).

The reference platform has no crawl surface; this is north-star
LLM-pipeline capability beside robots/WARC/CDX (SURVEY §2.1 family).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MAX_URLS_PER_SITEMAP = 50_000

_URL_BLOCK_RE = re.compile(r"<url>(.*?)</url>", re.S)
_SM_BLOCK_RE = re.compile(r"<sitemap>(.*?)</sitemap>", re.S)
_LOC_RE = re.compile(r"<loc>(.*?)</loc>", re.S)
_LASTMOD_RE = re.compile(r"<lastmod>(.*?)</lastmod>", re.S)
_CHANGEFREQ_RE = re.compile(r"<changefreq>(.*?)</changefreq>", re.S)
_PRIORITY_RE = re.compile(r"<priority>(.*?)</priority>", re.S)

_CHANGEFREQS = (
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never"
)

# the five predefined XML entities, &amp; LAST on unescape (else
# '&amp;lt;' would double-unescape)
_UNESCAPE = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&amp;", "&"),
)


def xml_unescape(s: str) -> str:
    for lit, rep in _UNESCAPE:
        s = s.replace(lit, rep)
    return s


@dataclass(frozen=True)
class SitemapEntry:
    loc: str
    lastmod: str  # '' when absent
    changefreq: str  # '' when absent or not in the enumeration
    priority_milli: int  # floor(priority * 1000 + 0.5); 500 = default
    is_child_sitemap: bool


def _field(block: str, pat: re.Pattern) -> str:
    m = pat.search(block)
    return m.group(1).strip() if m else ""


def _priority_milli(raw: str) -> int:
    if not raw:
        return 500
    try:
        v = float(raw)
    except ValueError:
        return 500
    if not 0.0 <= v <= 1.0:
        return 500
    import math

    return math.floor(v * 1000 + 0.5)


def parse_sitemap(text: str) -> tuple[str, tuple[SitemapEntry, ...]]:
    """Parse one sitemap payload. Returns ``(kind, entries)`` where
    ``kind`` is 'urlset' | 'sitemapindex' | 'none' (no recognizable
    root). Entries without a ``loc`` are dropped (the one required
    element)."""
    if "<sitemapindex" in text:
        kind, blocks, child = "sitemapindex", _SM_BLOCK_RE.findall(text), True
    elif "<urlset" in text:
        kind, blocks, child = "urlset", _URL_BLOCK_RE.findall(text), False
    else:
        return "none", ()
    out: list[SitemapEntry] = []
    for b in blocks[:MAX_URLS_PER_SITEMAP]:
        loc = xml_unescape(_field(b, _LOC_RE))
        if not loc:
            continue
        cf = _field(b, _CHANGEFREQ_RE).lower()
        out.append(
            SitemapEntry(
                loc=loc,
                lastmod=_field(b, _LASTMOD_RE),
                changefreq=cf if cf in _CHANGEFREQS else "",
                priority_milli=_priority_milli(_field(b, _PRIORITY_RE)),
                is_child_sitemap=child,
            )
        )
    return kind, tuple(out)
