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
    """RFC 9309 precedence on hand-built URLs: longest prefix wins,
    Allow wins length ties, no match allows."""
    from stream_processing_platform_spark.registry import REGISTRY

    # drive the registered query's own logic through crafted doc_ids:
    # residues pin pages 14 (override allowed), 10 (disallowed), 5
    # (ruleless domain), 21 (name-specific disallow for alpha: /page/2*)
    import pandas as pd

    from stream_processing_platform_spark.queries.web import (
        _ROBOTS_RULES,
        q_robots_rules_filter,
    )

    # sanity of the generated table itself
    names = {n for n, _, _ in _ROBOTS_RULES}
    assert len(names) == 5
    for n in names:
        assert (n, 0, "/page/1") in _ROBOTS_RULES

    out = q_robots_rules_filter(spark, "/root/testdata/sf0.001").toPandas()
    out = out.set_index("doc_id")
    # page == doc_id % 40; name index == page % 7 (ruled iff < 5)
    for doc_id, row in out.iterrows():
        page = doc_id % 40
        ni = page % 7
        if ni >= 5:
            assert row["allowed"] and row["matched_rule"] == "", doc_id
        elif page == 14 + ni:
            assert row["allowed"] and row["matched_rule"] == f"/page/{page}", doc_id
        elif str(page).startswith("1"):
            assert not row["allowed"] and row["matched_rule"] == "/page/1", doc_id
        elif str(page).startswith(str(2 + ni)):
            assert not row["allowed"], doc_id
        else:
            assert row["allowed"], doc_id
