"""Distributed k-means clustering over embedding columns.

Closes the honest local-vs-cluster delta documented in ``operators/
ann.py``: the IVF/PQ tiers ship with deterministic hash-sample
centroids; this module adds real Lloyd's iterations so the centroids
can be *trained*, with every per-iteration pass shaped for 100 TB:

- **Assignment** is one corpus scan through an Arrow-vectorized
  ``pandas_udf`` — the centroid matrix rides in the UDF closure (k×dim
  doubles, broadcast with the task binary), and each Arrow batch is a
  single ``X @ C.T`` matmul + argmin. No join, no shuffle, no per-row
  Python (CLAUDE.md: numpy-vectorized Arrow UDFs beat interpreted HOF
  lambdas 3-10× on per-element array math).
- **Update** is one ``groupBy(cluster)`` over k groups with per-dimension
  sums (``sum(element_at(vec, j))`` — JVM-side, map-side combine), so
  the only shuffle per iteration moves ``k × (dim + 2)`` doubles per
  task, independent of corpus size.
- **Model state** lives on the driver between iterations: k×dim floats,
  the same bounded-driver-state design as Spark MLlib's KMeans (and the
  only way to avoid per-iteration lineage growth). Nothing
  corpus-sized ever reaches the driver.

The expression-form assignment (``assign_expr``) mirrors the numpy path
with pure JVM/duckdb-shared primitives (sequential-fold dot products,
argmin via ``min(struct(dist, id))``) so the assignment semantics get a
full DuckDB hash-MATCH (`q_kmeans_assign`); a pytest pins the fast
numpy path to the expression path row-for-row.

Reference has no clustering at all — this is part of the LLM-pipeline
extension surface (SURVEY.md §7.6), and the training hook feeds
``operators/ann.py`` IVF/IVF-PQ centroids.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from stream_processing_platform_spark.functions.similarity import as_double_array, dot


def _assign_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment. Returns
    struct<cluster:int, sqdist:double> per input vector.

    ||x - c||² = ||x||² - 2·x·c + ||c||² computed as one batch matmul;
    argmin ties break to the lowest cluster index (np.argmin takes the
    first minimum — deterministic).
    """
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("struct<cluster: int, sqdist: double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"cluster": pd.Series([], dtype="int32"),
                                 "sqdist": pd.Series([], dtype="float64")})
        X = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        d = (X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ C.T) + c_sq[None, :]
        np.maximum(d, 0.0, out=d)  # clamp FP negatives at exact duplicates
        idx = d.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": idx.astype("int32"), "sqdist": d[np.arange(len(idx)), idx]}
        )

    return assign


@dataclass(frozen=True)
class KMeansModel:
    centroids: list[list[float]]  # k × dim, driver-side (bounded: k·dim doubles)
    inertia: list[float]  # sum of squared distances per iteration (non-increasing)
    iterations: int  # Lloyd's iterations actually run


def _init_centroids(df: DataFrame, vec_col: str, id_col: str, k: int, salt: int) -> np.ndarray:
    """Deterministic hash-sample init (same scheme as the IVF tiers): the
    k rows with the smallest ``xxhash64(id, salt)`` — id-agnostic, a
    distributed top-k (never a full collect), stable across runs."""
    rows = (
        df.select(F.col(id_col).alias("_id"), as_double_array(F.col(vec_col)).alias("_v"))
        .withColumn("_h", F.xxhash64(F.col("_id"), F.lit(salt)))
        .orderBy("_h", "_id")
        .limit(k)
        .select("_v")
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the number of input vectors ({len(rows)})")
    return np.array([r["_v"] for r in rows], dtype=np.float64)


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    salt: int = 0x4B4D,
) -> KMeansModel:
    """Lloyd's k-means. Per iteration: one corpus scan (Arrow-batched
    assignment) + one k-group aggregate; the k×dim centroid matrix is
    the only driver-side state. Empty clusters keep their previous
    centroid (no re-seeding — deterministic). Stops when every centroid
    moves < ``tol`` (L2) or after ``max_iter`` iterations."""
    vecs = df.select(as_double_array(F.col(vec_col)).alias("_v"))
    C = _init_centroids(df, vec_col, id_col, k, salt)
    dim = C.shape[1]
    history: list[float] = []
    iters = 0
    for _ in range(max_iter):
        assigned = vecs.withColumn("_a", _assign_udf(C)(F.col("_v")))
        stats = (
            assigned.groupBy(F.col("_a.cluster").alias("cluster"))
            .agg(
                F.count("*").alias("n"),
                F.sum("_a.sqdist").alias("sse"),
                *[F.sum(F.element_at("_v", j + 1)).alias(f"s{j}") for j in range(dim)],
            )
            .collect()  # k rows × (dim+2) doubles — bounded, corpus-independent
        )
        iters += 1
        history.append(float(sum(r["sse"] for r in stats)))
        new_C = C.copy()  # empty clusters keep their previous centroid
        for r in stats:
            new_C[r["cluster"]] = [r[f"s{j}"] / r["n"] for j in range(dim)]
        shift = float(np.sqrt(((new_C - C) ** 2).sum(axis=1)).max())
        C = new_C
        if shift < tol:
            break
    return KMeansModel(centroids=C.tolist(), inertia=history, iterations=iters)


def kmeans_assign(
    df: DataFrame,
    model: KMeansModel | list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest model centroid — one scan, no
    shuffle. Output: id_col, cluster (int), sqdist (double)."""
    C = np.asarray(model.centroids if isinstance(model, KMeansModel) else model)
    a = _assign_udf(C)(as_double_array(F.col(vec_col)))
    return df.select(F.col(id_col), a["cluster"].alias("cluster"), a["sqdist"].alias("sqdist"))


def _assign_udf_rounded(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment over distances ROUNDED
    to 1e-6 via ``floor(d*1e6+0.5)/1e6`` — the cross-engine form
    ``assign_expr`` and the duckdb oracles use. Rounding BEFORE the
    argmin makes the winning cluster a function of the rounded value,
    so the numpy matmul's pairwise-summation noise (~1e-15 vs the
    sequential fold) can only matter exactly on a 0.5e-6 boundary — the
    repo's accepted Arrow-twin exception, pinned to the expression form
    in tests/test_clustering.py. ``np.argmin`` takes the first minimum:
    lowest cluster index, the same tie-break as ``min(struct(d, cid))``."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("struct<cluster: int, sqdist: double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"cluster": pd.Series([], dtype="int32"),
                                 "sqdist": pd.Series([], dtype="float64")})
        X = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        d = (X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ C.T) + c_sq[None, :]
        d = np.floor(d * 1e6 + 0.5) / 1e6  # no clamp: mirror assign_expr exactly
        idx = d.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": idx.astype("int32"), "sqdist": d[np.arange(len(idx)), idx]}
        )

    return assign


# Reproducible-training constants, shared verbatim by the generated
# duckdb oracle (queries/similarity.py:_kmeans_embeddings_oracle):
# Knuth multiplicative-hash init ordering and the 2^24 integer scale
# the mean update quantizes to.
REPRO_INIT_MULT = 2654435761
REPRO_INIT_MOD = 2147483647
REPRO_SCALE = float(1 << 24)
# MULT > MOD, so the naive ``(id * MULT) % MOD`` product overflows int64
# once id >= ~3.46e9 — under ANSI mode that is a JOB FAILURE at exactly
# the 10^12-row scale this engine targets (r9 advice; same failure class
# q_dsir_weights' staged division avoids). Reduce the constant factor
# first: ``((id % MOD) * (MULT % MOD)) % MOD`` is mathematically
# identical for id >= 0 (mod distributes over the product) and its
# largest intermediate is (MOD-1) * (MULT % MOD) < 2^60. Every Spark
# site goes through :func:`repro_hash_col` and every generated oracle
# through :func:`repro_hash_sql`, so both engines compute the same
# overflow-free text and every hash value — hence every oracle — is
# unchanged.
REPRO_INIT_MULT_RED = REPRO_INIT_MULT % REPRO_INIT_MOD  # 506952114


def repro_hash_col(id_col: Column, salt: int = 0) -> Column:
    """Overflow-safe Knuth multiplicative hash of a BIGINT id column."""
    base = (id_col + F.lit(salt)) if salt else id_col
    return (
        (base % F.lit(REPRO_INIT_MOD)) * F.lit(REPRO_INIT_MULT_RED)
    ) % F.lit(REPRO_INIT_MOD)


def repro_hash_sql(id_expr: str, salt: int = 0) -> str:
    """The duckdb-oracle twin of :func:`repro_hash_col` — same text,
    same values, same overflow headroom."""
    base = f"({id_expr} + {salt})" if salt else id_expr
    return f"(({base} % {REPRO_INIT_MOD}) * {REPRO_INIT_MULT_RED}) % {REPRO_INIT_MOD}"


def kmeans_fit_reproducible(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
) -> KMeansModel:
    """Lloyd's k-means whose ENTIRE training trajectory is bit-identical
    cross-engine, so a duckdb oracle can replay it (q_kmeans_embeddings):

    - init: the k vectors with the smallest ``(id*MULT) % MOD`` (Knuth
      multiplicative hash — SQL-expressible, unlike xxhash64), cluster
      index = rank in that order;
    - assignment: rounded-distance argmin (``_assign_udf_rounded``,
      lowest-index tie-break — the q_kmeans_assign doctrine);
    - update: means quantized to the 2^-24 grid through EXACT integer
      arithmetic — per-dimension ``sum(floor(x * 2^24))`` as BIGINT
      (float32 inputs make ``x * 2^24`` exact in double, so the floor
      is deterministic), then ``floor(s/n + 0.5) / 2^24`` on the
      driver. No order-dependent float summation anywhere: shuffle
      order, partition count, and engine all cancel out.
    - fixed ``iters`` rounds (no float-tolerance early stop — the stop
      test itself would be order-sensitive).

    Same scale shape as :func:`kmeans_fit`: one Arrow corpus scan + one
    k-group integer aggregate per round, k×dim driver state."""
    import math

    vecs = df.select(
        F.col(id_col).alias("_id"), as_double_array(F.col(vec_col)).alias("_v")
    )
    rows = (
        vecs.withColumn("_h", repro_hash_col(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(k)
        .select("_v")
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the number of input vectors ({len(rows)})")
    C = np.array([r["_v"] for r in rows], dtype=np.float64)
    dim = C.shape[1]
    for _ in range(iters):
        assigned = vecs.withColumn("_a", _assign_udf_rounded(C)(F.col("_v")))
        stats = (
            assigned.groupBy(F.col("_a.cluster").alias("cluster"))
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.floor(F.element_at("_v", j + 1) * REPRO_SCALE).cast("long")).alias(
                        f"s{j}"
                    )
                    for j in range(dim)
                ],
            )
            .collect()  # k rows × (dim+1) ints — bounded, corpus-independent
        )
        new_C = C.copy()  # empty clusters keep their previous centroid
        for r in stats:
            # Python int/int is the correctly-rounded IEEE quotient of the
            # exact integers — identical to duckdb's CAST(sum AS DOUBLE) /
            # CAST(n AS DOUBLE) PROVIDED |sum| < 2^53 (beyond that duckdb
            # rounds the sum to double before dividing while Python
            # divides the exact integers, and a half-boundary floor can
            # flip). |sum| <= n * 2^24 since inputs are in [-1, 1]-ish
            # float32 range, so the precondition holds to ~5e8 rows per
            # cluster — far above every oracle SF; a cluster bigger than
            # that needs the exact div+rem form on both sides.
            new_C[r["cluster"]] = [
                math.floor(r[f"s{j}"] / r["n"] + 0.5) / REPRO_SCALE for j in range(dim)
            ]
        C = new_C
    return KMeansModel(centroids=C.tolist(), inertia=[], iterations=iters)


def _sqdist_expr(a: Column, b: Column) -> Column:
    """||a-b||² via the three sequential-fold dot products (dot(a,a) -
    2·dot(a,b) + dot(b,b)) — bit-identical to duckdb's
    ``list_inner_product`` composition, unlike a fused zip_with fold
    whose summation order differs."""
    return dot(a, a) - 2.0 * dot(a, b) + dot(b, b)


def assign_expr(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cvec",
) -> DataFrame:
    """Oracle-checkable assignment: nearest centroid by squared L2
    rounded to 6 decimals via ``floor(x*1e6+0.5)/1e6`` (pure IEEE ops,
    bit-identical cross-engine — see CLAUDE.md), argmin as
    ``min(struct(dist, cid))`` — map-side combining, deterministic
    low-id tie-break. Centroids broadcast; the corpus never shuffles
    wider than one row per input vector. Output: id_col, cluster
    (centroid id), sqdist (rounded)."""
    pts = df.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")).withColumn(
        "_n2", dot(F.col("_v"), F.col("_v"))  # hoisted: per row, not per (row × centroid)
    )
    cents = centroids.select(
        F.col(centroid_id).alias("_cid"), as_double_array(F.col(centroid_vec)).alias("_cv")
    ).withColumn("_cn2", dot(F.col("_cv"), F.col("_cv")))
    # same value and same fp composition order as dot(a,a) - 2·dot(a,b)
    # + dot(b,b) computed inline (the duckdb oracle's form) — only the
    # place of evaluation moves. Rounded via floor(x*1e6+0.5)/1e6, pure
    # IEEE ops: round(x, 6) itself diverges cross-engine on decimal
    # half boundaries (Spark rounds the shortest decimal repr, duckdb
    # the binary double), and the rounded value drives the argmin
    # tie-break below, so a boundary row could flip cluster per engine.
    raw = F.col("_n2") - 2.0 * dot(F.col("_v"), F.col("_cv")) + F.col("_cn2")
    d = F.floor(raw * 1e6 + F.lit(0.5)) / 1e6
    best = F.min(F.struct(d.alias("d"), F.col("_cid").alias("cid")))
    return (
        pts.crossJoin(F.broadcast(cents))
        .groupBy(id_col)
        .agg(best.alias("_b"))
        .select(F.col(id_col), F.col("_b.cid").alias("cluster"), F.col("_b.d").alias("sqdist"))
    )


def trained_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    train_iters: int = 5,
) -> DataFrame:
    """k-means-refined centroid set in the shape ``operators/ann.py``
    consumes (``cell``, ``_centroid``) — same Knuth-hash INIT as the
    untrained tiers, so iteration 0 starts from exactly the untrained
    tiers' centroid set and each Lloyd's pass strictly refines it.
    Training runs the REPRODUCIBLE fit (r9): exact-integer mean
    updates, rounded-argmin assignment — which is what lets the
    trained-IVF tier carry a full duckdb oracle replaying the whole
    trajectory."""
    spark = corpus.sparkSession
    if train_iters <= 0:
        raise ValueError("train_iters must be >= 1; use the in-line hash sample otherwise")
    model = kmeans_fit_reproducible(
        corpus, id_col=id_col, vec_col=vec_col, k=num_cells, iters=train_iters
    )
    rows = [(i, c) for i, c in enumerate(model.centroids)]
    return F.broadcast(
        spark.createDataFrame(rows, "cell int, _centroid array<double>")
    )


def _pq_assign_udf(codebooks: np.ndarray, normalize: bool = True):
    """Arrow-batched PQ encoding: all subspaces in one matmul pass.
    ``codebooks`` is (M, K, d); input vectors are l2-normalized
    (``normalize=True``, the raw-vector PQ form) or taken as-is
    (``normalize=False`` — residual vectors, already centered) then
    reshaped to (N, M, d); output is the (N, M) argmin code per
    subspace as an array<int> column."""
    CB = np.ascontiguousarray(codebooks, dtype=np.float64)
    M, K, d = CB.shape
    cb_sq = (CB * CB).sum(axis=2)  # (M, K)

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        if normalize:
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = X.reshape(len(X), M, d)  # (N, M, d)
        # ||s||^2 - 2 s.c + ||c||^2 per subspace: einsum over d
        cross = np.einsum("nmd,mkd->nmk", S, CB)
        dist = (S * S).sum(axis=2)[:, :, None] - 2.0 * cross + cb_sq[None, :, :]
        # rounded BEFORE the argmin (r9): the winning code is a function
        # of the 1e-6-rounded distance — einsum-vs-fold noise can only
        # matter on a boundary (the accepted Arrow-twin exception), and
        # the trained-PQ duckdb oracle's argmin reproduces this one
        dist = np.floor(dist * 1e6 + 0.5)
        codes = dist.argmin(axis=2).astype("int32")  # (N, M)
        return pd.Series(list(codes))

    return encode


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_subspaces: int = 16,
    num_codes: int = 64,
    train_iters: int = 3,
    salt: int = 0x51,
    normalize: bool = True,
) -> DataFrame:
    """k-means-trained PQ codebooks in the shape ``operators/ann.py``
    consumes (``code``, ``m``, ``csub``) — same hash-sample INIT (salt
    included) as the untrained tiers, refined by Lloyd's iterations run
    for ALL subspaces simultaneously: per iteration one corpus scan
    (the (N, M, K) distance tensor is a single einsum in the Arrow
    UDF) plus one (m, code)-keyed aggregate of subvector sums whose
    shuffle moves ``M x K x (d+1)`` doubles per task. Driver state is
    the (M, K, d) codebook tensor — 16 KiB at the defaults.

    ``normalize=False`` trains over the vectors AS-IS (no l2
    normalization of either the init samples or the per-iteration
    assignments) — the residual-PQ form, where ``vec_col`` already
    holds ``x/|x| − c/|c|`` and re-normalizing would destroy the
    near-zero concentration the codebook is meant to exploit."""
    if train_iters <= 0:
        raise ValueError("train_iters must be >= 1; use the in-line hash sample otherwise")
    spark = corpus.sparkSession
    d = dim // num_subspaces
    pts = corpus.select(
        F.col(id_col).alias("_id"), as_double_array(F.col(vec_col)).alias("_v")
    )
    # init: the m-th normalized subvector of hash-sample j is code j of
    # subspace m (identical to the inline codebook in ann.pq_topk)
    # Knuth ordering with the salt offset (shared with the untrained
    # inline samples) — SQL-expressible, so the trained tier's oracle
    # can replay the exact init (r9)
    init_rows = (
        pts.withColumn("_h", repro_hash_col(F.col("_id"), salt))
        .orderBy("_h", "_id")
        .limit(num_codes)
        .select("_v")
        .collect()
    )
    if len(init_rows) < num_codes:
        raise ValueError(f"num_codes={num_codes} exceeds corpus size ({len(init_rows)})")
    S0 = np.array([r["_v"] for r in init_rows], dtype=np.float64)
    if normalize:
        S0 = S0 / np.linalg.norm(S0, axis=1, keepdims=True)
    CB = np.ascontiguousarray(S0.reshape(num_codes, num_subspaces, d).transpose(1, 0, 2))

    vec = _normed(F.col("_v")) if normalize else F.col("_v")
    norm_subs = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_subspaces - 1)),
            lambda m: F.slice(vec, m * d + 1, d),
        )
    )
    for _ in range(train_iters):
        enc = _pq_assign_udf(CB, normalize=normalize)
        stats = (
            pts.withColumn("_codes", enc(F.col("_v")))
            .select(norm_subs.alias("m", "sub"), F.col("_codes"))
            .withColumn("code", F.element_at("_codes", F.col("m") + 1))
            .groupBy("m", "code")
            .agg(
                F.count("*").alias("n"),
                # exact integer sums on the 2^-24 grid: the mean update
                # is invariant to shuffle order AND engine (the
                # kmeans_fit_reproducible rule, r9)
                *[
                    F.sum(
                        F.floor(F.element_at("sub", j + 1) * REPRO_SCALE).cast("long")
                    ).alias(f"s{j}")
                    for j in range(d)
                ],
            )
            .collect()  # M x K rows of (d+2) ints — bounded
        )
        import math

        new_CB = CB.copy()  # empty codes keep their previous centroid
        for r in stats:
            new_CB[r["m"]][r["code"]] = [
                math.floor(r[f"s{j}"] / r["n"] + 0.5) / REPRO_SCALE for j in range(d)
            ]
        CB = new_CB
    rows = [
        (j, m, CB[m][j].tolist())
        for m in range(num_subspaces)
        for j in range(num_codes)
    ]
    return F.broadcast(
        spark.createDataFrame(rows, "code int, m int, csub array<double>")
    )


def _normed(col):
    """l2-normalize (sequential-fold norm, evaluated once via let())."""
    from stream_processing_platform_spark.functions.text import let

    return let(
        F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x)),
        lambda nrm: F.transform(col, lambda x: x / nrm),
    )


class StreamingKMeans:
    """Online (mini-batch) k-means over a stream — the
    ``StreamingKMeans`` surface Spark's old DStream MLlib offered,
    rebuilt on Structured Streaming: every micro-batch assigns its
    points to the current centroids (the same Arrow one-scan pass as
    ``kmeans_fit``) and folds a decayed update:

        weight_new = weight_old * decay + n_batch
        centroid   = (centroid * weight_old * decay + sum_batch) / weight_new

    ``decay = 1.0`` weights all history equally (running mean);
    ``decay = 0`` forgets everything each batch. Model state stays on
    the driver (k×dim floats + k weights — the bounded-state design of
    the batch trainer); per batch the executors see one scan + one
    k-group aggregate, so throughput matches the batch pass.

    Drive it with ``for_each_batch(stream)`` → a started
    StreamingQuery, or feed batches manually via ``update(df)`` (the
    unit the pytest pins).
    """

    def __init__(
        self,
        initial_centroids: list[list[float]],
        vec_col: str = "embedding",
        decay: float = 1.0,
    ) -> None:
        self.C = np.asarray(initial_centroids, dtype=np.float64)
        self.weights = np.zeros(len(self.C), dtype=np.float64)
        self.vec_col = vec_col
        self.decay = float(decay)
        self.batches_seen = 0

    def update(self, batch_df: DataFrame) -> None:
        dim = self.C.shape[1]
        assigned = batch_df.select(
            _assign_udf(self.C)(as_double_array(F.col(self.vec_col))).alias("_a"),
            as_double_array(F.col(self.vec_col)).alias("_v"),
        )
        stats = (
            assigned.groupBy(F.col("_a.cluster").alias("cluster"))
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.element_at("_v", j + 1)).alias(f"s{j}") for j in range(dim)],
            )
            .collect()
        )
        self.batches_seen += 1
        for r in stats:
            i = r["cluster"]
            w_old = self.weights[i] * self.decay
            w_new = w_old + r["n"]
            sums = np.array([r[f"s{j}"] for j in range(dim)])
            self.C[i] = (self.C[i] * w_old + sums) / w_new
            self.weights[i] = w_new
        # clusters with no points this batch only decay their weight
        seen = {r["cluster"] for r in stats}
        for i in range(len(self.C)):
            if i not in seen:
                self.weights[i] *= self.decay

    def for_each_batch(self, stream: DataFrame, checkpoint: str):
        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.update(batch_df)

        return (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def assign(self, df: DataFrame, id_col: str = "vec_id") -> DataFrame:
        return kmeans_assign(df, self.C.tolist(), id_col=id_col, vec_col=self.vec_col)
