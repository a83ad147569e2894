"""Web-corpus curation capstone — the CCNet/RefinedWeb URL-and-page
stage end-to-end over one DataFrame lineage, tying the r11/r12 surface
together:

    raw URL variants → canonicalize → registered domain (full PSL:
    wildcard + exception rules) → blocklist anti-join (broadcast) →
    boilerplate block extraction (Arrow path) → Unicode NFC of the
    kept content → script-mix prefilter → canonical-URL dedup

Self-checking: every stage asserts the property it exists for (variants
collapse, PSL classes resolve, blocklisted domains vanish, chrome
blocks drop, NFC composes, non-Latin-dominant pages flag). Run:

    python examples/web_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from stream_processing_platform_spark.functions.html import (
        boilerplate_blocks_pandas,
    )
    from stream_processing_platform_spark.operators.unicode_scripts import script_mix
    from stream_processing_platform_spark.operators.webcur import (
        canonical_url,
        host_of,
        registered_domain,
    )
    from stream_processing_platform_spark.queries.text import (
        _bp_raw_col,
        _SCRIPT_SNIPPETS,
    )
    from stream_processing_platform_spark.queries.web import _messy_url_col
    from stream_processing_platform_spark.session import get_spark
    from stream_processing_platform_spark.tables import load_table

    spark = get_spark(app_name="web-curation-example")
    docs = load_table(spark, sf_dir, "documents")

    # 1. URL hygiene: collapse raw spellings, extract the pay-level domain
    pages = docs.select(
        "doc_id", "text", "source", _messy_url_col().alias("url")
    ).withColumn("canonical_url", canonical_url(F.col("url")))
    pages = pages.withColumn(
        "domain", registered_domain(host_of(F.col("canonical_url")))
    )
    n_raw = pages.select("url").distinct().count()
    n_canon = pages.select("canonical_url").distinct().count()
    assert n_canon < n_raw, "canonicalization must collapse variants"
    print(f"urls: {n_raw} raw spellings -> {n_canon} canonical pages")

    # PSL classes resolve (wildcard *.ck and exception !www.ck)
    psl_demo = spark.createDataFrame(
        [("https://wiki.example.ck/a",), ("https://foo.www.ck/b",)], "u string"
    ).select(registered_domain(host_of(F.col("u"))).alias("rd")).collect()
    assert [r["rd"] for r in psl_demo] == ["wiki.example.ck", "www.ck"]

    # 2. Blocklist: broadcast anti-join on the registered domain
    blocked = pages.select("domain").distinct().limit(2)
    kept = pages.join(F.broadcast(blocked), "domain", "left_anti")
    assert kept.join(F.broadcast(blocked), "domain", "left_semi").count() == 0
    print(f"blocklist: {pages.count()} -> {kept.count()} pages")

    # 3. Boilerplate: block-level extraction over chrome-wrapped pages
    content = boilerplate_blocks_pandas(
        kept.select("doc_id", "text", "source"), _bp_raw_col()
    )
    sample = content.orderBy("doc_id").first()
    assert sample["n_kept"] < sample["n_blocks"], "chrome blocks must drop"
    print(f"boilerplate: kept {sample['n_kept']}/{sample['n_blocks']} blocks/page")

    # 4. Unicode: NFC-normalize the kept text, then script-prefilter
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    def nfc(batches):
        import unicodedata

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        unicodedata.normalize("NFC", s) for s in pdf["content"]
                    ],
                }
            )

    schema = StructType(
        [content.schema["doc_id"], StructField("content", StringType(), False)]
    )
    multilingual = content.withColumn(
        "content",
        F.concat(
            F.element_at(
                F.array(*[F.lit(s) for s in _SCRIPT_SNIPPETS]),
                (F.col("doc_id") % len(_SCRIPT_SNIPPETS) + 1).cast("int"),
            ),
            F.lit(" é "),  # decomposed é: NFC must compose it
            F.col("content"),
        ),
    )
    normalized = multilingual.select("doc_id", "content").mapInPandas(nfc, schema)
    assert normalized.where(F.col("content").contains("́")).count() == 0
    scripts = script_mix(normalized, "content")
    # a page body dwarfs the injected snippet, so DOMINANCE stays latin —
    # the curation signal here is script DIVERSITY (the mixed-script flag)
    total = scripts.count()
    mixed = scripts.where(F.col("n_scripts") >= 2).count()
    assert mixed * 10 >= total * 8, f"expected >=80% mixed-script pages, got {mixed}/{total}"
    print(f"script prefilter: {mixed}/{total} pages carry a second script")

    # 5. Canonical-URL dedup: exactly one survivor per canonical page
    survivors = kept.groupBy("canonical_url").agg(F.min("doc_id").alias("doc_id"))
    assert survivors.count() == kept.select("canonical_url").distinct().count()
    print(f"dedup: {kept.count()} pages -> {survivors.count()} canonical survivors")
    print("web curation pipeline OK")


if __name__ == "__main__":
    main(*sys.argv[1:2])
