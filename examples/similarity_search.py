"""Similarity-search tiers over an embedding corpus — pick by scale:

    brute-force cosine top-k   exact; corpus streams once per query set
      → IVF cell probe         ~nprobe/num_cells of the corpus touched
      → PQ + exact re-rank     corpus lives as 16-byte codes (16x),
                               queries never shuffle it

All three return the same (query_id, neighbor_id, cos, rank) schema,
so swapping tiers is a one-line change; the recall/latency trade is
printed side by side. Run:

    python examples/similarity_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.operators import ann
from stream_processing_platform_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="similarity-search")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)

    tiers = {
        "brute_force": lambda: ann.brute_force_topk(emb, queries, k=5),
        "ivf": lambda: ann.ivf_topk(emb, queries, k=5, num_cells=16, nprobe=4),
        "pq": lambda: ann.pq_topk(emb, queries, k=5),
        "ivfpq": lambda: ann.ivfpq_topk(emb, queries, k=5, nprobe=6),
    }
    exact: set | None = None
    for name, build in tiers.items():
        t0 = time.time()
        rows = build().collect()
        took = time.time() - t0
        pairs = {(r.query_id, r.neighbor_id) for r in rows}
        if exact is None:
            exact = pairs
            recall = 1.0
        else:
            recall = len(pairs & exact) / len(exact)
        print(f"{name:>12}: {len(rows)} results, recall={recall:.2f}, {took:.2f}s")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
