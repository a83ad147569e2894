"""Retrieval + curation pipeline — the round-7 LLM-data surface end to
end: BM25 lexical retrieval fused with embedding-cosine retrieval via
reciprocal-rank fusion, MMR-diversified, then the candidate corpus
semantically deduplicated (SemDeDup).

No reference twin (the reference has no retrieval/dedup surface at
all); this composes `operators/ranking.py` and `operators/dedup.py`
the way a query-targeted corpus-selection job would. Self-checking:
asserts the fused list is non-empty and ordered, the MMR pick is a
subset of the candidates, and semantic dedup keeps at least one vector
per cluster. Run:

    python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.similarity import (
    as_double_array,
    cosine,
    dot,
)
from stream_processing_platform_spark.operators.clustering import _normed
from stream_processing_platform_spark.operators.dedup import semantic_dedup
from stream_processing_platform_spark.operators.ranking import (
    bm25_scores,
    mmr_rerank,
    rrf_fuse,
)
from stream_processing_platform_spark.operators.topk import top_k_global
from stream_processing_platform_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="retrieval-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_array(F.col("embedding")).alias("embedding")
    )

    # 1. Lexical retriever: BM25 top-50 for a seed query
    lex = bm25_scores(docs, ["join", "hash", "batch"]).select(
        F.col("doc_id").alias("id"), "bm25"
    )
    lex_top = top_k_global(lex, [F.col("bm25").desc(), F.col("id").asc()], 50)
    lr = lex_top.select(
        "id", F.row_number().over(Window.orderBy(F.col("bm25").desc(), F.col("id").asc())).alias("r")
    )

    # 2. Semantic retriever: cosine top-50 against a fixed query vector
    qv = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("_q"))
    sem = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("id"), cosine(F.col("embedding"), F.col("_q")).alias("cos")
    )
    sem_top = top_k_global(sem, [F.col("cos").desc(), F.col("id").asc()], 50)
    sr = sem_top.select(
        "id", F.row_number().over(Window.orderBy(F.col("cos").desc(), F.col("id").asc())).alias("r")
    )

    # 3. Fuse with RRF
    fused = rrf_fuse(lr, sr, id_col="id", rank_col="r", k=60)
    n_fused = fused.count()
    assert n_fused > 0
    top = fused.orderBy(F.col("rrf").desc(), F.col("id").asc()).limit(10).collect()
    assert all(top[i].rrf >= top[i + 1].rrf for i in range(len(top) - 1))
    print(f"fused candidates: {n_fused}; best rrf={top[0].rrf:.5f} (id {top[0].id})")

    # 4. MMR-diversify the semantic candidates
    cands = sem_top.select("id", F.col("cos").alias("rel"))
    cv = F.broadcast(cands).join(emb, cands.id == emb.vec_id).select(
        "id", "rel", "embedding", F.sqrt(dot("embedding", "embedding")).alias("nrm")
    )
    a = cv.select(F.col("id").alias("ia"), F.col("embedding").alias("va"), F.col("nrm").alias("na"))
    b = cv.select(F.col("id").alias("ib"), F.col("embedding").alias("vb"), F.col("nrm").alias("nb"))
    sims = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ia") != F.col("ib"))
        .select("ia", "ib", (dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("s"))
    )
    picked = mmr_rerank(cands, sims, k=5, lam=0.7).collect()
    cand_ids = {r.id for r in cands.collect()}
    assert {r.id for r in picked} <= cand_ids and len(picked) == 5
    print("MMR pick:", [r.id for r in sorted(picked, key=lambda x: x.mmr_rank)])

    # 5. Semantic dedup of the corpus feeding the retrievers
    cents = emb.where(F.col("vec_id") % 61 == 3).select(
        F.col("vec_id").alias("cid"), _normed(F.col("embedding")).alias("cvec")
    )
    res = semantic_dedup(emb, cents, threshold=0.95).cache()
    kept_per_cluster = res.groupBy("cluster").agg(
        F.count("*").alias("n"), F.sum(F.col("kept").cast("int")).alias("kept")
    )
    assert kept_per_cluster.where(F.col("kept") == 0).count() == 0  # every cluster keeps >= 1
    n_total, n_kept = res.count(), res.where("kept").count()
    print(f"semantic dedup: kept {n_kept}/{n_total} vectors")
    print("OK")


if __name__ == "__main__":
    main(*sys.argv[1:2])
