"""q_web_funnel (r13): stage invariants of the composed curation funnel."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_funnel_stage_invariants(spark):
    from stream_processing_platform_spark.queries.web import q_web_funnel

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = {r["stage"]: r for r in q_web_funnel(spark, sf).collect()}
    assert list(rows) and len(rows) == 6
    # pages monotone non-increasing through the drop stages
    assert rows["raw"]["n_pages"] >= rows["blocklist"]["n_pages"]
    assert rows["blocklist"]["n_pages"] >= rows["boilerplate"]["n_pages"]
    assert rows["boilerplate"]["n_pages"] == rows["nfc"]["n_pages"]  # transform
    assert rows["nfc"]["n_pages"] >= rows["script_filter"]["n_pages"]
    assert rows["script_filter"]["n_pages"] >= rows["url_dedup"]["n_pages"]
    # every stage actually does something on the fixture
    assert rows["blocklist"]["n_pages"] < rows["raw"]["n_pages"]  # blocked domains exist
    assert rows["boilerplate"]["n_chars"] < rows["blocklist"]["n_chars"]  # chrome dropped
    assert rows["nfc"]["n_chars"] < rows["boilerplate"]["n_chars"]  # composition shrinks
    assert rows["script_filter"]["n_pages"] < rows["nfc"]["n_pages"]  # mixed-script dropped
    assert rows["url_dedup"]["n_pages"] <= rows["script_filter"]["n_pages"]
    assert rows["url_dedup"]["n_pages"] > 0
    # domains never exceed pages
    for r in rows.values():
        assert r["n_domains"] <= max(r["n_pages"], 1)
