"""Training-data preparation stages DOWNSTREAM of curation (see
quality_filter_pipeline.py for filter+dedup): the steps that turn a
curated corpus into model-ready sequences:

    eval-set decontamination (3-gram containment vs a benchmark set)
      → context-window chunking (64-token chunks, 16-token overlap)
      → sequence packing (2048-token packs, per-source running sum)
      → pack-utilization report.

Every stage is the registered-query shape (q_contamination,
q_doc_chunking, q_sequence_packing) chained as one plan. Run:

    python examples/training_data_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.text import tokens
from stream_processing_platform_spark.operators.dedup import contamination_pairs
from stream_processing_platform_spark.queries.text import (
    _CHUNK as CHUNK,
    _PACK_BUDGET as PACK_BUDGET,
    _STRIDE as STRIDE,
)
from stream_processing_platform_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="training-data-prep")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()

    # 1. decontamination: drop corpus docs containing benchmark passages
    #    (benchmark stand-in: every 20th doc). Broadcast inverted-index
    #    join — never corpus × benchmark.
    bench = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    contaminated = contamination_pairs(
        corpus, bench, "doc_id", "text", threshold=0.5
    ).select("doc_id").distinct()
    clean = corpus.join(contaminated, "doc_id", "left_anti")
    n_clean = clean.count()

    # 2. chunking: tokenize once, explode chunk indices, slice per index
    toked = clean.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    n_chunks = F.when(F.size("toks") <= CHUNK, F.lit(1)).otherwise(
        F.ceil((F.size("toks") - CHUNK) / float(STRIDE)).cast("int") + 1
    )
    chunks = toked.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        "toks",
    ).select(
        "doc_id",
        "source",
        "chunk_id",
        F.slice(F.col("toks"), F.col("chunk_id") * STRIDE + 1, CHUNK).alias("chunk"),
    )
    chunk_rows = chunks.select(
        "doc_id", "source", "chunk_id", F.size("chunk").alias("n_tokens")
    )

    # 3. packing: greedy contiguous fill per source (parallel across
    #    sources — no global sort)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = chunk_rows.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / float(PACK_BUDGET)),
    )

    # 4. utilization report: how full are the packs we'd emit?
    report = (
        packed.groupBy("source", "pack_id")
        .agg(F.count("*").alias("n_chunks"), F.sum("n_tokens").alias("pack_tokens"))
        .agg(
            F.count("*").alias("n_packs"),
            F.round(F.avg("pack_tokens") / PACK_BUDGET * 100, 1).alias("avg_fill_pct"),
            F.min("pack_tokens").alias("min_tokens"),
            F.max("pack_tokens").alias("max_tokens"),
        )
    )
    row = report.collect()[0]
    n_chunks_total = chunk_rows.count()
    print(
        f"in={n_in} decontaminated={n_clean} chunks={n_chunks_total} "
        f"packs={row.n_packs} avg_fill={row.avg_fill_pct}% "
        f"tokens/pack=[{row.min_tokens},{row.max_tokens}]"
    )
    assert n_clean <= n_in - 1  # the benchmark docs themselves are excluded
    assert n_chunks_total >= n_clean  # every doc yields >= 1 chunk
    assert row.n_packs > 0
    # all but each source's final (partial) pack should be at/over budget
    full = packed.groupBy("source", "pack_id").agg(F.sum("n_tokens").alias("t"))
    last = full.groupBy("source").agg(F.max("pack_id").alias("pack_id"))
    non_final = full.join(last, ["source", "pack_id"], "left_anti")
    n_underfull = non_final.where(F.col("t") < PACK_BUDGET * 0.9).count()
    assert n_underfull == 0, f"{n_underfull} non-final packs under 90% budget"
    print("OK")


if __name__ == "__main__":
    main(*sys.argv[1:2])
