"""URL/domain curation operator tests (operators/webcur.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from stream_processing_platform_spark.operators.webcur import (
    host_of,
    host_of_sql,
    registered_domain,
    registered_domain_sql,
)

CASES = [
    ("https://www.beta.com/p/1", "www.beta.com", "beta.com"),
    ("https://blog.alpha.co.uk/x?y=1", "blog.alpha.co.uk", "alpha.co.uk"),
    ("http://a.b.c.gamma.github.io/", "a.b.c.gamma.github.io", "gamma.github.io"),
    ("https://delta.org/p", "delta.org", "delta.org"),  # no subdomain
    ("https://co.uk/", "co.uk", "co.uk"),  # bare multi-level suffix passes through
    ("https://localhost/x", "localhost", "localhost"),  # single label
    ("https://CDN.Epsilon.COM.AU/y", "cdn.epsilon.com.au", "epsilon.com.au"),  # case
]


@pytest.fixture(scope="module")
def spark():
    from stream_processing_platform_spark.session import get_spark

    return get_spark(app_name="test-webcur")


def test_registered_domain_spark(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    out = df.select(
        host_of(F.col("url")).alias("host"),
        registered_domain(host_of(F.col("url"))).alias("rd"),
    ).collect()
    for (u, host, rd), row in zip(CASES, out):
        assert row["host"] == host, u
        assert row["rd"] == rd, u


def test_registered_domain_sql_twin_matches():
    """The generated duckdb twin must agree case-for-case with the
    Spark expression (same suffix table drives both)."""
    con = duckdb.connect()
    for u, host, rd in CASES:
        h, r = con.execute(
            f"SELECT {host_of_sql('url')} AS h, "
            f"{registered_domain_sql(host_of_sql('url'))} AS r "
            f"FROM (SELECT '{u}' AS url)"
        ).fetchone()
        assert h == host, u
        assert r == rd, u


def test_blocklist_plan_broadcasts(spark):
    """The blocklist anti-join must broadcast the tiny dim — a shuffle
    of the corpus side on registered_domain would be the 100 TB
    bottleneck."""
    from stream_processing_platform_spark.registry import queries

    df = queries()["q_blocklist_filter"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


CANON_CASES = [
    # (raw, canonical)
    ("HTTPS://User:pw@WWW.Alpha.COM:443/p/7/?utm_source=x&b=2&a=1#frag",
     "https://www.alpha.com/p/7?a=1&b=2"),
    ("https://www.alpha.com/p/7?a=1&b=2", "https://www.alpha.com/p/7?a=1&b=2"),
    ("http://beta.org:80//", "http://beta.org/"),
    ("http://beta.org", "http://beta.org/"),
    ("https://shop.gamma.co.uk/a/b/?ref=tw", "https://shop.gamma.co.uk/a/b"),
    ("ftp://x.y:80/z/", "ftp://x.y:80/z"),  # :80 is NOT ftp's default
    ("https://a.io/?gclid=1&fbclid=2&msclkid=3&mc_cid=4&mc_eid=5&utm_x=6",
     "https://a.io/"),
    ("https://a.io/p?refresh=1", "https://a.io/p?refresh=1"),  # 'ref' is
    # anchored with '=' so legitimate params sharing the prefix survive
]


def test_canonical_url_spark_cases(spark):
    from stream_processing_platform_spark.operators.webcur import canonical_url

    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    for (u, want), g in zip(CANON_CASES, got):
        assert g == want, u


def test_canonical_url_sql_twin_and_idempotence(spark):
    from stream_processing_platform_spark.operators.webcur import (
        canonical_url,
        canonical_url_sql,
    )

    con = duckdb.connect()
    for u, want in CANON_CASES:
        got = con.execute(
            f"SELECT {canonical_url_sql('url')} FROM (SELECT '{u}' AS url)"
        ).fetchone()[0]
        assert got == want, u
    # canonicalization is idempotent: canonical(canonical(u)) == canonical(u)
    df = spark.createDataFrame([(w,) for _, w in CANON_CASES], "url string")
    again = [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert again == [w for _, w in CANON_CASES]


def test_robots_rules_precedence(spark):
    """RFC 9309 precedence on hand-built URLs: most literal octets wins
    (wildcard-aware since r13), Allow wins ties, no match allows. Every
    row is replayed through the Python pattern core (match_pattern +
    pattern_specificity — an independent implementation of the same
    semantics the query expresses as plan-time LIKE), and the wildcard
    signature pages are additionally pinned explicitly."""
    from stream_processing_platform_spark.functions.robotstxt import (
        match_pattern,
        pattern_specificity,
    )
    from stream_processing_platform_spark.queries.web import (
        _ROBOTS_RULES,
        q_robots_rules_filter,
    )

    # sanity of the generated table itself
    names = {n for n, _, _ in _ROBOTS_RULES}
    assert len(names) == 5
    for n in names:
        assert (n, 0, "/page/1") in _ROBOTS_RULES
        assert (n, 0, "/page/*3$") in _ROBOTS_RULES

    out = q_robots_rules_filter(spark, "/root/testdata/sf0.001").toPandas()
    out = out.set_index("doc_id")
    for doc_id, row in out.iterrows():
        cands = [
            (pattern_specificity(p), a, p)
            for n, a, p in _ROBOTS_RULES
            if n == row["domain_name"] and match_pattern(p, row["path"])
        ]
        if not cands:
            assert row["allowed"] and row["matched_rule"] == "", doc_id
        else:
            spec, allow, pat = max(cands)
            assert row["allowed"] == (allow == 1), doc_id
            assert row["matched_rule"] == pat, doc_id

    # wildcard signature pages (page == doc_id % 40, name index page % 7):
    by_page = {doc_id % 40: row for doc_id, row in out.iterrows()}
    # page 0 (alpha): decisive '$'-anchored wildcard disallow
    assert not by_page[0]["allowed"] and by_page[0]["matched_rule"] == "/page/*0$"
    # page 30 (gamma): same wildcard fires on a two-digit page
    assert not by_page[30]["allowed"]
    # page 23 (gamma): 8-literal Allow '/page/2*3$' wins the 7-literal
    # wildcard disallow back
    assert by_page[23]["allowed"] and by_page[23]["matched_rule"] == "/page/2*3$"
    # page 3 (delta): equal specificity (7) wildcard tie -> Allow wins
    assert by_page[3]["allowed"] and by_page[3]["matched_rule"] == "/page/3*$"
    # page 10 (delta): two DISALLOWS tie at 7 -> matched_rule resolves
    # by the struct max's pattern field ('/page/1' > '/page/*0$')
    assert not by_page[10]["allowed"] and by_page[10]["matched_rule"] == "/page/1"
    # page 14 (alpha): the longer literal Allow carve-out still wins
    assert by_page[14]["allowed"] and by_page[14]["matched_rule"] == "/page/14"
    # page 5 (zeta): ruleless domain -> default allowed
    assert by_page[5]["allowed"] and by_page[5]["matched_rule"] == ""


def test_messy_url_fixture_has_real_variants(spark):
    """r11 ADVICE: doc_id%4 / doc_id%8 variant indices were constant within
    each canonical page (4 and 8 divide _CANON_PAGES=40), so every doc of a
    page got the identical raw URL and the canonicalizer never collapsed
    anything. The indices now cycle on doc_id div 40; this pins that each
    multi-doc canonical page really receives multiple raw spellings."""
    import os

    from stream_processing_platform_spark.queries.web import q_url_canonicalize

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = q_url_canonicalize(spark, sf).collect()
    assert rows, "fixture produced no canonical pages"
    multi = [r for r in rows if r["n_docs"] > 1]
    assert multi, "expected canonical pages shared by several docs"
    # every page with enough docs must have collapsed >1 raw spelling
    assert all(r["n_raw_variants"] > 1 for r in multi), [
        (r["canonical_url"], r["n_docs"], r["n_raw_variants"]) for r in multi[:5]
    ]


# Full-PSL rule classes (r12): wildcard '*.' rules consume exactly one
# label, '!' exception rules prevail over everything, a host that IS a
# wildcard-matched suffix passes through bare. Each case is checked on
# BOTH engines (the same branch table generates both expressions).
PSL_CASES = [
    # *.ck wildcard: example.ck is a public suffix
    ("https://wiki.example.ck/a", "wiki.example.ck", "wiki.example.ck"),
    ("https://deep.wiki.example.ck/a", "deep.wiki.example.ck", "wiki.example.ck"),
    ("https://example.ck/a", "example.ck", "example.ck"),  # bare wildcard suffix
    # !www.ck exception: www.ck is NOT a suffix, it IS a registrable domain
    ("https://www.ck/a", "www.ck", "www.ck"),
    ("https://foo.www.ck/a", "foo.www.ck", "www.ck"),
    # *.kawasaki.jp geographic wildcard + !city.kawasaki.jp exception
    ("https://a.b.kawasaki.jp/", "a.b.kawasaki.jp", "a.b.kawasaki.jp"),
    ("https://b.kawasaki.jp/", "b.kawasaki.jp", "b.kawasaki.jp"),  # bare
    ("https://city.kawasaki.jp/", "city.kawasaki.jp", "city.kawasaki.jp"),
    ("https://foo.city.kawasaki.jp/", "foo.city.kawasaki.jp", "city.kawasaki.jp"),
    # plain jp exact rule still wins at its own length
    ("https://www.rakuten.co.jp/", "www.rakuten.co.jp", "rakuten.co.jp"),
    # 3-label wildcard base (AWS EC2 hostnames)
    (
        "https://ec2-1-2-3-4.us-east-1.compute.amazonaws.com/x",
        "ec2-1-2-3-4.us-east-1.compute.amazonaws.com",
        "ec2-1-2-3-4.us-east-1.compute.amazonaws.com",
    ),
    # 4-label exact private rule
    ("https://acct.blob.core.windows.net/c", "acct.blob.core.windows.net",
     "acct.blob.core.windows.net"),
    ("https://x.acct.blob.core.windows.net/c", "x.acct.blob.core.windows.net",
     "acct.blob.core.windows.net"),
    # r12 ADVICE: a host that IS a multi-label EXACT suffix passes
    # through bare (previously fell to the default last-two-labels
    # branch: 'blob.core.windows.net' -> 'windows.net')
    ("https://blob.core.windows.net/c", "blob.core.windows.net",
     "blob.core.windows.net"),
    ("https://co.uk/", "co.uk", "co.uk"),
    ("https://github.io/", "github.io", "github.io"),
]


def test_psl_wildcard_and_exception_spark(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in PSL_CASES], "url string")
    out = df.select(
        host_of(F.col("url")).alias("host"),
        registered_domain(host_of(F.col("url"))).alias("rd"),
    ).collect()
    for (u, host, rd), row in zip(PSL_CASES, out):
        assert row["host"] == host, u
        assert row["rd"] == rd, u


def test_psl_wildcard_and_exception_sql_twin():
    con = duckdb.connect()
    for u, host, rd in PSL_CASES:
        h, r = con.execute(
            f"SELECT {host_of_sql('url')} AS h, "
            f"{registered_domain_sql(host_of_sql('url'))} AS r "
            f"FROM (SELECT '{u}' AS url)"
        ).fetchone()
        assert h == host, u
        assert r == rd, u


def test_load_psl_parses_all_rule_classes(tmp_path):
    from stream_processing_platform_spark.operators.webcur import PSL_RULES, load_psl

    f = tmp_path / "psl.dat"
    f.write_text(
        "// comment\n\nfoo.example\n*.bar.example\n!keep.bar.example\n"
        "single\ncom // trailing\n"
    )
    r = load_psl(str(f))
    assert r.exact == ("foo.example",)
    assert r.wildcard == ("bar.example",)
    assert r.exception == ("keep.bar.example",)
    # the shipped snapshot carries every rule class
    assert len(PSL_RULES.exact) > 300
    assert "ck" in PSL_RULES.wildcard and "kawasaki.jp" in PSL_RULES.wildcard
    assert "www.ck" in PSL_RULES.exception


def test_registered_domain_membership_plan(spark):
    """Membership structure is the r12 plan-time/row-time trade
    (operators/webcur.py PSL_MEMBERSHIP_INLINE_MAX): SMALL rule sets
    inline as isin lists that Catalyst converts to InSet hash sets;
    the LARGE exact set rides as ONE ArrayType literal through
    array_contains so fresh-lineage plan walks stay cheap (a ~400-rule
    IN-list measured ~5 s of optimizer/AQE time per lineage). Gate
    both halves: an INSET appears (small sets), an array_contains
    appears (big set), and no giant literal IN-list leaks through."""
    from stream_processing_platform_spark.operators.webcur import (
        PSL_MEMBERSHIP_INLINE_MAX,
        PSL_RULES,
    )

    assert len(PSL_RULES.exact) > PSL_MEMBERSHIP_INLINE_MAX  # trade is live
    df = spark.createDataFrame([("a.co.uk",)], "host string")
    plan = df.select(
        registered_domain(F.col("host")).alias("rd")
    )._jdf.queryExecution().optimizedPlan().toString()
    up = plan.upper()
    # small sets are IN-lists (HOF lambda bodies never get the
    # In->InSet rewrite, so a bounded interpreted IN is the form);
    # the big exact set rides as ONE array literal via array_contains
    assert " IN (" in up, plan[:2000]
    assert "ARRAY_CONTAINS" in up, plan[:2000]
    # the big set must not appear as an expanded IN-list: co.uk may
    # surface only inside the single array literal, never as hundreds
    # of IN operands (count stays far below the exact-set size)
    assert up.count("CO.UK") <= 2, "exact-rule IN-list leaked into the plan"
