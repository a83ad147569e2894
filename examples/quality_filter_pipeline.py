"""End-to-end training-data curation pipeline over the documents table:

    quality filter (length / repetition / composite score)
      → exact dedup of the survivors (fingerprint keep-first)
      → per-source yield report + partitioned parquet write.

The filter is one narrow projection (a single let-bound tokenizer pass,
functions/text.py::quality_metrics); dedup shuffles only the survivors;
the write is hive-partitioned by language so downstream jobs prune on
it. Run:

    python examples/quality_filter_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.text import fingerprint, quality_metrics
from stream_processing_platform_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="quality-filter-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()

    # 1. score + filter in one pass (no shuffle)
    scored = docs.select(
        "doc_id", "text", "lang", "source", quality_metrics(F.col("text")).alias("m")
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.col("m")["n_tokens"].alias("n_tokens"),
        F.col("m")["quality"].alias("quality"),
        F.col("m")["rep_bigram"].alias("rep_bigram"),
    )
    kept = scored.where(
        (F.col("n_tokens") >= 25) & (F.col("rep_bigram") <= 0.10) & (F.col("quality") >= 0.42)
    )

    # 2. exact dedup of survivors: keep the smallest doc_id per fingerprint
    fp = kept.withColumn("fp", fingerprint(F.col("text")))
    keeper = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = fp.join(keeper, ["fp", "doc_id"], "left_semi").drop("fp")
    n_out = deduped.count()

    # 3. yield report per source
    report = (
        scored.join(deduped.select("doc_id", F.lit(1).alias("_kept")), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("_kept", F.lit(0))).alias("n_kept"),
        )
        .withColumn("yield_pct", F.round(100.0 * F.col("n_kept") / F.col("n_docs"), 1))
        .orderBy("source")
    )
    report.show(25, truncate=False)

    # 4. partitioned write (downstream jobs prune on lang)
    out = tempfile.mkdtemp(prefix="spp_curated_")
    deduped.write.mode("overwrite").partitionBy("lang").parquet(out)
    n_written = spark.read.parquet(out).count()

    print(f"in={n_in} kept+deduped={n_out} written={n_written} -> {out}")
    assert n_written == n_out, "partitioned write must preserve the curated corpus"
    assert 0 < n_out <= n_in
    print("OK")


if __name__ == "__main__":
    main(*sys.argv[1:2])
