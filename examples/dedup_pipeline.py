"""End-to-end LLM training-data dedup pipeline over the documents table:

    fingerprint (exact)  ─┐
    MinHash-LSH (near)   ─┴→ pair edges → connected components →
    one keeper per cluster → deduplicated corpus + stats.

This is the full production shape: exact dup clusters collapse for free
via the fingerprint groupBy; near-dup pairs from LSH (exact-Jaccard
verified) link the rest; components give each document its duplicate
group; and the keeper rule (smallest doc_id) selects the surviving copy.
Run:

    python examples/dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.text import fingerprint
from stream_processing_platform_spark.operators.dedup import minhash_lsh_pairs
from stream_processing_platform_spark.operators.graph import dedup_clusters
from stream_processing_platform_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="dedup-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. exact duplicates: same whitespace-normalized md5 → same edge
    fp = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    exact_pairs = (
        fp.alias("a")
        .join(fp.alias("b"), "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )

    # 2. near duplicates: MinHash-LSH candidates, exact-Jaccard >= 0.8
    near_pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).select(
        "id_a", "id_b"
    )

    # 3. duplicate groups = connected components over both edge sets
    clusters = dedup_clusters(docs.select("doc_id"), exact_pairs.union(near_pairs))

    # 4. keep one representative per group (cluster_id IS the keeper id)
    keepers = clusters.where(F.col("doc_id") == F.col("cluster_id"))
    survivors = docs.join(keepers.select("doc_id"), "doc_id", "left_semi")

    n_docs = docs.count()
    n_keep = survivors.count()
    dup_groups = clusters.where(F.col("cluster_size") > 1)
    n_groups = dup_groups.select("cluster_id").distinct().count()
    n_dups = dup_groups.where(F.col("doc_id") != F.col("cluster_id")).count()
    print(f"documents: {n_docs}, kept: {n_keep}, removed: {n_dups}")
    print(f"duplicate groups: {n_groups}")
    for r in dup_groups.orderBy(F.col("cluster_size").desc(), "doc_id").limit(10).collect():
        print(f"  doc {r.doc_id} -> cluster {r.cluster_id} (size {r.cluster_size})")
    assert n_keep + n_dups == n_docs, "every removed doc must belong to a kept cluster"
    assert n_dups > 0, "fixture contains planted duplicates"


if __name__ == "__main__":
    main(*sys.argv[1:])
