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
