"""Similarity search over embedding columns — brute-force and IVF.

Brute-force cosine top-k is the exactness baseline (and the oracle-checked
query); IVF (inverted-file) is the 100 TB path: partition the corpus into
cells around centroids, probe only the nearest cells per query. Cell
assignment is a broadcast join against the (small) centroid set, so the
corpus is never shuffled all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.similarity import as_double_array, cosine


def _prep(df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str) -> DataFrame:
    from stream_processing_platform_spark.partitioning import ensure_min_parallelism

    # Vector math is CPU-bound; widen single-file scans before it.
    return ensure_min_parallelism(df).select(
        F.col(id_col).alias(id_alias), as_double_array(F.col(vec_col)).alias(vec_alias)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k nearest corpus
    vectors (excluding itself). Deterministic: ties broken by corpus id.

    Output: query_id, neighbor_id, cos, rank.
    Plan shape: broadcast(queries) × corpus → per-query top-k. The corpus
    side streams; only q×k rows survive the window filter.
    """
    q = _prep(queries, id_col, vec_col, "query_id", "_qv")
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "_cv")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via IVF cells.

    Centroids are a deterministic hash sample of the corpus: the
    ``num_cells`` rows with the smallest ``xxhash64(id)`` — id-agnostic
    (works on sparse, non-contiguous, or non-integer ids), no driver-side
    action (the sample is a distributed top-k, not a ``count()``), and
    stable across runs. At production scale you'd k-means the centroids,
    but the partition/probe plumbing (the part that matters for Spark
    scale) is identical. Each corpus vector lands in one cell (broadcast
    join vs centroids); each query probes its ``nprobe`` nearest cells
    and ranks only those cells' members. Shuffle is bounded by cell id,
    never all-pairs.

    Output: query_id, neighbor_id, cos, rank (approximate; recall
    measured against brute_force_topk in tests).
    """
    c = _prep(corpus, id_col, vec_col, "cid", "_cv")
    # num_cells rows is tiny — the single-partition window after limit()
    # touches only those rows, not the corpus.
    cell_w = Window.orderBy("_h", "cid")
    centroids = (
        c.withColumn("_h", F.xxhash64(F.col("cid"), F.lit(0xC3)))
        .orderBy("_h", "cid")
        .limit(num_cells)
        .withColumn("cell", (F.row_number().over(cell_w) - 1).cast("int"))
        .select("cell", F.col("_cv").alias("_centroid"))
    )

    # Assign every corpus vector to its nearest centroid (broadcast join).
    assign_w = Window.partitionBy("cid").orderBy(F.col("_sim").desc(), F.col("cell").asc())
    assigned = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine(F.col("_cv"), F.col("_centroid")))
        .withColumn("_rn", F.row_number().over(assign_w))
        .where(F.col("_rn") == 1)
        .select("cell", F.col("cid").alias("neighbor_id"), F.col("_cv"))
    )

    # Each query probes its nprobe nearest cells.
    q = _prep(queries, id_col, vec_col, "query_id", "_qv")
    probe_w = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cell").asc())
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine(F.col("_qv"), F.col("_centroid")))
        .withColumn("_rn", F.row_number().over(probe_w))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "cell")
    )

    # Broadcast the PROBE side, stream the corpus: probes are q*nprobe rows
    # (small by construction — the query set, not the corpus), while
    # `assigned` is the full corpus and must never be broadcast. Streaming
    # the corpus also means the final rank-limit sees a non-query_id
    # partitioning, so Spark plants a map-side Partial WindowGroupLimit
    # before the query_id exchange — only ~k rows per query per partition
    # shuffle, instead of the whole probe-join candidate set.
    rank_w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        F.broadcast(probes).join(assigned, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
        .withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
