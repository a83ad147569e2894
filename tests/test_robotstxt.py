"""robots.txt file parser tests (functions/robotstxt.py, RFC 9309)."""

from __future__ import annotations

from stream_processing_platform_spark.functions.robotstxt import (
    parse_robots_txt,
    path_allowed,
)

BASIC = """\
# corp robots
User-agent: *
Disallow: /private/
Allow: /private/public/
Crawl-delay: 10

Sitemap: https://ex.test/sitemap.xml
"""


def test_basic_group_and_globals():
    p = parse_robots_txt(BASIC, "trainingbot")
    assert p.matched_agent == "*"
    assert p.rules == ((0, "/private/"), (1, "/private/public/"))
    assert p.crawl_delay == 10
    assert p.sitemaps == ("https://ex.test/sitemap.xml",)


def test_specific_group_beats_star_and_merges():
    txt = (
        "User-agent: *\nDisallow: /a/\n\n"
        "User-agent: trainingbot\nDisallow: /b/\n\n"
        "User-agent: TrainingBot\nDisallow: /c/\n"  # same token, merges
    )
    p = parse_robots_txt(txt, "TrainingBot/1.0")
    assert p.matched_agent == "trainingbot"
    assert p.rules == ((0, "/b/"), (0, "/c/"))
    # most SPECIFIC (longest) token wins over a shorter prefix token
    txt2 = "User-agent: train\nDisallow: /x/\n\nUser-agent: trainingbot\nDisallow: /y/\n"
    assert parse_robots_txt(txt2, "trainingbot").rules == ((0, "/y/"),)


def test_agent_stacking_and_blank_lines_dont_split():
    txt = (
        "User-agent: a\nUser-agent: b\n\nDisallow: /shared/\n"
    )
    # blank line between the UA run and its rules does NOT end the group
    assert parse_robots_txt(txt, "a").rules == ((0, "/shared/"),)
    assert parse_robots_txt(txt, "b").rules == ((0, "/shared/"),)


def test_rules_before_any_group_ignored_and_empty_disallow():
    txt = "Disallow: /orphan/\nUser-agent: *\nDisallow:\n"
    p = parse_robots_txt(txt, "x")
    assert p.rules == ()  # orphan dropped; empty Disallow = allow all
    assert path_allowed(p, "/anything")


def test_path_precedence_longest_match_allow_wins_ties():
    p = parse_robots_txt(BASIC, "bot")
    assert not path_allowed(p, "/private/data.html")
    assert path_allowed(p, "/private/public/x")  # longer Allow overrides
    assert path_allowed(p, "/open/page")
    tie = parse_robots_txt(
        "User-agent: *\nDisallow: /p/\nAllow: /p/\n", "bot"
    )
    assert path_allowed(tie, "/p/x")  # equal length: Allow wins


def test_no_groups_and_garbage():
    p = parse_robots_txt("", "bot")
    assert p.matched_agent == "" and path_allowed(p, "/x")
    p = parse_robots_txt("not a directive\n<<<>>>\n", "bot")
    assert p.rules == () and p.crawl_delay == -1


# ---------------------------------------------------------------- r13:
# RFC 9309 §2.2.3 wildcards ('*' any-run, trailing '$' end anchor) and
# literal-octet specificity, plus the r12-ADVICE group-formation fixes.

def test_match_pattern_wildcards():
    from stream_processing_platform_spark.functions.robotstxt import (
        match_pattern,
    )

    assert match_pattern("/fish*", "/fishheads/yummy.html")
    assert match_pattern("/*.css$", "/static/app.css")
    assert not match_pattern("/*.css$", "/static/app.css?v=1")  # $ anchors
    assert match_pattern("/*.css", "/static/app.css?v=1")  # un-anchored
    assert match_pattern("/a*b*c$", "/a-x-b-y-c")
    assert not match_pattern("/a*b*c$", "/a-x-c-y-b")  # order matters
    assert match_pattern("/a**b", "/ab")  # '**' matches the empty run
    assert match_pattern("/p$", "/p") and not match_pattern("/p$", "/pq")
    # a '$' that is NOT trailing is a literal octet
    assert match_pattern("/pri$ate/", "/pri$ate/x")
    assert not match_pattern("/pri$ate/", "/private/x")
    # greedy-first-fit must not block a later segment
    assert match_pattern("/*ab*ab$", "/xabyabzab")


def test_wildcard_specificity_and_precedence():
    from stream_processing_platform_spark.functions.robotstxt import (
        pattern_specificity,
    )

    # literal octets only: '*' and the trailing '$' anchor count zero
    assert pattern_specificity("/page/*3$") == 7 == pattern_specificity("/page/1")
    assert pattern_specificity("/*.css$") == 5
    assert pattern_specificity("/p") == 2
    # the verdict's canonical case: Allow /*.css$ (5) beats Disallow /p (2)
    p = parse_robots_txt(
        "User-agent: *\nAllow: /*.css$\nDisallow: /p\n", "bot"
    )
    assert path_allowed(p, "/p/site.css")
    assert not path_allowed(p, "/p/site.css?v=1")  # anchor fails -> /p wins
    assert not path_allowed(p, "/p/index.html")
    # equal specificity across a wildcard and a prefix rule: Allow wins
    tie = parse_robots_txt(
        "User-agent: *\nDisallow: /private/*.html$\nAllow: /private/data.*\n",
        "bot",
    )
    assert path_allowed(tie, "/private/data.html")


def test_sitemap_and_garbage_lines_end_a_ua_run():
    # 'UA: a / Sitemap / UA: b' must be TWO groups (r12 ADVICE): a's
    # group has no rules, b's group gets the disallow.
    txt = (
        "User-agent: a\nSitemap: https://ex.test/s.xml\n"
        "User-agent: b\nDisallow: /private/\n"
    )
    assert parse_robots_txt(txt, "a").rules == ()
    assert parse_robots_txt(txt, "b").rules == ((0, "/private/"),)
    assert parse_robots_txt(txt, "a").sitemaps == ("https://ex.test/s.xml",)
    # colon-less garbage also ends the run; blank lines still do NOT
    txt2 = "User-agent: a\nnot a directive\nUser-agent: b\nDisallow: /x/\n"
    assert parse_robots_txt(txt2, "a").rules == ()
    assert parse_robots_txt(txt2, "b").rules == ((0, "/x/"),)


def test_like_translation_matches_pattern_core():
    """The q_robots_rules_filter LIKE translation is pinned equivalent
    to match_pattern on a pattern×path grid, on BOTH engines' LIKE
    (duckdb here; Spark's LIKE is exercised by the oracle sweep)."""
    import duckdb

    from stream_processing_platform_spark.functions.robotstxt import (
        match_pattern,
    )
    from stream_processing_platform_spark.queries.web import _robots_like

    patterns = [
        "/page/1", "/page/*3$", "/page/1*3$", "/page/3*$", "/*.css$",
        "/", "/a*b*c$", "/a**b", "/p$", "/pri$ate/", "/100!%$", "/u_x*",
    ]
    paths = [
        "/page/1", "/page/13", "/page/3", "/page/33", "/page/130",
        "/static/app.css", "/static/app.css?v=1", "/a-b-c", "/ab", "/p",
        "/pq", "/pri$ate/x", "/100%", "/100!%", "/u_x/1", "/uax/1", "",
    ]
    con = duckdb.connect()
    for pat in patterns:
        like = _robots_like(pat)
        for path in paths:
            got = con.execute(
                "SELECT ? LIKE ? ESCAPE '!'", [path, like]
            ).fetchone()[0]
            assert got == match_pattern(pat, path), (pat, like, path)
