"""Corpus curation scoring — the r9 additions composed as one pass:
Gopher-style rule filtering (Rae et al. 2021) gates documents, DSIR
importance weights (Xie et al. 2023) rank the survivors toward a
target source mix, and the report cross-tabulates the two — the
standard "filter, then importance-sample" curation recipe.

Self-checking: rule flags are re-derived from raw per-doc stats for a
sample and compared; DSIR weights must rank target-source documents
above average (the whole point of the ratio).

Run:  python examples/curation_scoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.queries.text import (
    _DSIR_TARGET,
    q_dsir_weights,
    q_gopher_rules,
)
from stream_processing_platform_spark.session import get_spark
from stream_processing_platform_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="curation-scoring")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    rules = q_gopher_rules(spark, sf_dir)
    weights = q_dsir_weights(spark, sf_dir)
    scored = rules.join(weights, "doc_id").join(docs, "doc_id")

    report = (
        scored.groupBy("passed")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.avg("avg_ratio").alias("mean_importance"),
        )
        .orderBy("passed")
        .collect()
    )
    print("Gopher gate x DSIR importance:")
    for r in report:
        print(
            f"  passed={str(r['passed']):5s}  docs={r['n_docs']:5d}  "
            f"tokens={r['tokens']:7d}  mean_importance={r['mean_importance']:.1f}"
        )

    # -- check 1: re-derive one rule from raw stats for a sample -------
    sample = scored.orderBy("doc_id").limit(50).collect()
    for r in sample:
        assert r["rule_word_count"] == (30 <= r["n_words"] <= 400), r
    print(f"rule_word_count re-derived for {len(sample)} docs: OK")

    # -- check 2: target-source docs must out-rank the rest ------------
    by_side = {
        row["is_target"]: row["imp"]
        for row in scored.withColumn(
            "is_target", F.col("source").isin(*_DSIR_TARGET)
        )
        .groupBy("is_target")
        .agg(F.avg("avg_ratio").alias("imp"))
        .collect()
    }
    print(
        f"mean importance — target sources: {by_side[True]:.1f}, "
        f"others: {by_side[False]:.1f}"
    )
    assert by_side[True] >= by_side[False], "DSIR must favor the target distribution"
    print("OK")


if __name__ == "__main__":
    main(*sys.argv[1:])
