"""Sitemap parser tests (functions/sitemap.py, sitemaps.org v0.9)."""

from __future__ import annotations

from stream_processing_platform_spark.functions.sitemap import (
    MAX_URLS_PER_SITEMAP,
    parse_sitemap,
    xml_unescape,
)


def test_urlset_fields_and_defaults():
    kind, es = parse_sitemap(
        "<urlset><url><loc>https://a/x</loc><lastmod>2026-01-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a/y</loc></url></urlset>"
    )
    assert kind == "urlset" and len(es) == 2
    assert es[0].priority_milli == 800 and es[0].changefreq == "daily"
    assert es[1].priority_milli == 500  # spec default
    assert es[1].lastmod == "" and es[1].changefreq == ""
    assert not es[0].is_child_sitemap


def test_sitemapindex_and_none():
    kind, es = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a/s.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert kind == "sitemapindex" and es[0].is_child_sitemap
    assert parse_sitemap("<html>nope</html>") == ("none", ())
    assert parse_sitemap("") == ("none", ())


def test_entity_unescape_and_required_loc():
    assert xml_unescape("a&amp;lt;b") == "a&lt;b"  # amp LAST: no double pass
    kind, es = parse_sitemap(
        "<urlset><url><loc>https://a/?x=1&amp;y=2</loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url></urlset>"
    )
    assert [e.loc for e in es] == ["https://a/?x=1&y=2"]  # loc-less dropped


def test_malformed_priority_falls_back_to_default():
    _, es = parse_sitemap(
        "<urlset><url><loc>u1</loc><priority>high</priority></url>"
        "<url><loc>u2</loc><priority>1.5</priority></url>"
        "<url><loc>u3</loc><priority>0.05</priority></url></urlset>"
    )
    assert [e.priority_milli for e in es] == [500, 500, 50]


def test_entry_cap_never_throws():
    body = "".join(f"<url><loc>u{i}</loc></url>" for i in range(60))
    _, es = parse_sitemap(f"<urlset>{body}</urlset>")
    assert len(es) == 60  # under the 50k cap everything survives
    assert MAX_URLS_PER_SITEMAP == 50_000
