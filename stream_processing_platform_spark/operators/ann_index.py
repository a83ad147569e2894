"""IVF-PQ index persistence — build once, search many.

``ivfpq_topk`` rebuilds its index artifacts on every call (fine for the
correctness gate; wasteful for a serving path). This module gives the
index a LIFECYCLE: ``build_ivfpq_index`` scans the corpus once and
writes the three artifacts as parquet (centroids: k rows; codebook:
M×K rows; index: one (cell, codes) row per corpus vector — the
~16-bytes-per-vector structure that lets 100 TB of float vectors serve
from ~1.5 TB of codes) plus a params manifest; ``search_ivfpq_index``
answers query batches against the loaded artifacts through the exact
same query path the inline tier uses (``ann.ivfpq_query``), touching
only the probed cells' codes and the bounded re-rank join back to the
base table.

Determinism: the build reuses the inline tier's hash-sample /
k-means-trained construction, so a freshly built index answers
identically to ``ivfpq_topk`` with the same parameters (pinned in
tests/test_ann_quality.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_platform_spark.operators import ann


def _join(base: str, name: str) -> str:
    """Path join that works for URIs too (s3://…, hdfs://…): plain
    '/'-separator concatenation, no os.path normalization."""
    return base.rstrip("/") + "/" + name


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_cells: int = 16,
    num_subspaces: int = 16,
    num_codes: int = 64,
    train_iters: int = 0,
) -> None:
    """Build and persist the IVF-PQ artifacts for ``corpus``."""
    c = ann._prep(corpus, id_col, vec_col, "cid", "_cv")
    centroids = ann._ivf_centroids(c, num_cells, train_iters)
    assigned = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", ann.cosine(F.col("_cv"), F.col("_centroid")))
        .groupBy("cid")
        .agg(
            F.min(F.struct((-F.col("_sim")).alias("_neg"), F.col("cell")))["cell"].alias("cell"),
        )
        .select(F.col("cid").alias("neighbor_id"), "cell")
    )
    cn = c.select(F.col("cid").alias("neighbor_id"), "_cv")
    codebook = ann._pq_codebook(cn, dim, num_subspaces, num_codes, train_iters)
    c_subs = cn.select(
        "neighbor_id",
        F.posexplode(
            ann._subvectors(ann._l2_normalized(F.col("_cv")), dim, num_subspaces)
        ).alias("m", "sub"),
    )
    encoded = (
        c_subs.join(F.broadcast(codebook), "m")
        .withColumn("_d", ann._l2sq(F.col("sub"), F.col("csub")))
        .groupBy("neighbor_id", "m")
        .agg(F.min(F.struct("_d", "code"))["code"].alias("code"))
        .groupBy("neighbor_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code"))), lambda s: s["code"]
            ).alias("codes")
        )
    )
    index = assigned.join(encoded, "neighbor_id")
    spark = corpus.sparkSession
    centroids.write.mode("overwrite").parquet(_join(path, "centroids.parquet"))
    codebook.write.mode("overwrite").parquet(_join(path, "codebook.parquet"))
    index.write.mode("overwrite").parquet(_join(path, "index.parquet"))
    meta = {
        "dim": dim, "num_cells": num_cells, "num_subspaces": num_subspaces,
        "num_codes": num_codes, "train_iters": train_iters,
        "id_col": id_col, "vec_col": vec_col,
    }
    # the manifest goes through the SAME filesystem abstraction as the
    # parquet artifacts (a 1-row text write), so the index builds to and
    # serves from any Spark-supported store (HDFS/S3/local) — a driver-
    # local open() here would silently strand the manifest when `path`
    # is not a local directory. Like every artifact here, the write is
    # overwrite-in-place and NOT transactional: REBUILD TO A NEW PATH
    # and flip readers — swapping a live index atomically is a catalog/
    # metastore commit, not a filesystem write (the compact_parquet
    # doctrine, maintenance.py)
    (
        spark.createDataFrame([(json.dumps(meta),)], "value string")
        .coalesce(1)
        .write.mode("overwrite")
        .text(_join(path, "meta.json"))
    )


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    refine: int = 16,
) -> DataFrame:
    """Answer ``queries`` from a persisted index. ``corpus`` supplies
    the original float vectors for the exact re-rank only (at scale:
    the base table the index was built from). Output schema matches
    every other tier: query_id, neighbor_id, cos, rank."""
    meta = json.loads(spark.read.text(_join(path, "meta.json")).head()["value"])
    centroids = spark.read.parquet(_join(path, "centroids.parquet"))
    codebook = spark.read.parquet(_join(path, "codebook.parquet"))
    index = spark.read.parquet(_join(path, "index.parquet"))
    cn = ann._prep(corpus, meta["id_col"], meta["vec_col"], "neighbor_id", "_cv")
    q = ann._prep(queries, meta["id_col"], meta["vec_col"], "query_id", "_qv")
    return ann.ivfpq_query(
        centroids, codebook, index, cn, q,
        k=k, dim=meta["dim"], num_subspaces=meta["num_subspaces"],
        nprobe=nprobe, refine=refine,
    )
