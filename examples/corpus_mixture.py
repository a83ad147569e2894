"""Corpus mixture weighting — realize a training-data recipe:

    per-source integer weights + total token budget
      → exact integer token target per source
      → admit documents per source in content-fingerprint order
      → report achieved vs target mixture.

The operator shape is operators/mixture.py (broadcast recipe join, one
per-source window — see q_corpus_mixture for the oracle-checked form).
Run:

    python examples/corpus_mixture.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.functions import text as T
from stream_processing_platform_spark.operators.mixture import (
    corpus_mixture,
    mixture_targets,
)
from stream_processing_platform_spark.session import get_spark

# a recipe: heavy on the first five sources, light on the rest
WEIGHTS = {f"src{i}": (5 if i < 5 else 1) for i in range(20)}
BUDGET = 20_000


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="corpus-mixture")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(
        "doc_id",
        "source",
        T.token_count(F.col("text")).cast("long").alias("n"),
        T.fingerprint(F.col("text")).alias("h"),
    )
    kept = corpus_mixture(t, WEIGHTS, BUDGET, "n", hash_col="h")
    report = (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n").alias("tokens"),
            F.max("mix_target").alias("target"),
        )
        .orderBy("source")
    )
    targets = mixture_targets(WEIGHTS, BUDGET)
    print(f"budget={BUDGET} tokens, targets: src0-4 -> {targets['src0']}, rest -> {targets['src5']}")
    report.show(25, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
