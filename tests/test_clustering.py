"""Distributed k-means (operators/clustering.py): Lloyd's objective
monotonicity, numpy-vs-expression assignment parity (the oracle-checked
twin pattern), determinism, empty-cluster handling, and the trained-IVF
recall hookup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_processing_platform_spark.operators.ann import brute_force_topk, ivf_topk
from stream_processing_platform_spark.operators.clustering import (
    KMeansModel,
    assign_expr,
    kmeans_assign,
    kmeans_fit,
    trained_centroids,
)
from stream_processing_platform_spark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_inertia_monotone_nonincreasing(spark, emb):
    m = kmeans_fit(emb, k=6, max_iter=6)
    assert len(m.inertia) == m.iterations
    for a, b in zip(m.inertia, m.inertia[1:]):
        # Lloyd's: both the assignment step and the update step can only
        # lower (or keep) the SSE objective.
        assert b <= a + 1e-9, f"inertia increased: {m.inertia}"
    # training must actually do something on random-ish vectors
    assert m.inertia[-1] < m.inertia[0]


def test_fit_is_deterministic(spark, emb):
    m1 = kmeans_fit(emb, k=4, max_iter=3)
    m2 = kmeans_fit(emb, k=4, max_iter=3)
    assert m1.inertia == m2.inertia
    # centroid sums per cluster may differ in the last float bits across
    # partition orders; assignment-level equality is the meaningful check
    a1 = sorted(kmeans_assign(emb, m1).select("vec_id", "cluster").collect())
    a2 = sorted(kmeans_assign(emb, m2).select("vec_id", "cluster").collect())
    assert a1 == a2


def test_assignment_matches_numpy_brute_force(spark, emb):
    """Every point's final cluster is the true argmin over the model
    centroids (first-min tie-break), verified against plain numpy."""
    m = kmeans_fit(emb, k=5, max_iter=4)
    C = np.asarray(m.centroids)
    got = {r.vec_id: r.cluster for r in kmeans_assign(emb, m).collect()}
    for r in emb.select("vec_id", "embedding").collect():
        x = np.asarray(r.embedding, dtype=np.float64)
        want = int(((x[None, :] - C) ** 2).sum(axis=1).argmin())
        assert got[r.vec_id] == want


def test_numpy_assignment_matches_expression_form(spark, emb):
    """The Arrow/numpy fast path and the oracle-checked expression form
    (q_kmeans_assign) agree row-for-row on the same fixed centroids —
    the same twin-pinning pattern as winnow_fingerprints_expr."""
    cents = emb.where((F.col("vec_id") % 61) == 3).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    crows = cents.collect()
    cid_by_idx = [r.cid for r in sorted(crows, key=lambda r: r.cid)]
    C = [list(r.cvec) for r in sorted(crows, key=lambda r: r.cid)]
    fast = {
        r.vec_id: cid_by_idx[r.cluster]
        for r in kmeans_assign(emb, C).collect()
    }
    expr = {r.vec_id: r.cluster for r in assign_expr(emb, cents).collect()}
    assert fast == expr


def test_empty_cluster_keeps_previous_centroid(spark):
    """k > distinct points: the surplus centroids get no members and must
    survive the update step unchanged (no NaNs, no crash)."""
    rows = [(i, [float(i % 2), 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    m = kmeans_fit(df, k=4, max_iter=3)
    C = np.asarray(m.centroids)
    assert not np.isnan(C).any()
    # the two real point-locations are (0,0) and (1,0); at least one
    # centroid converges onto each
    occupied = {r.cluster for r in kmeans_assign(df, m).collect()}
    assert len(occupied) >= 1 and len(occupied) <= 4


def test_k_exceeding_corpus_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(df, k=5, max_iter=1)


def test_trained_centroids_start_from_hash_sample_init(spark, emb):
    """trained_centroids shares the untrained tiers' init (same salt):
    shape contract (cell ids 0..n-1, double arrays) and broadcast hint."""
    cents = trained_centroids(emb, num_cells=8, train_iters=2)
    rows = cents.collect()
    assert sorted(r.cell for r in rows) == list(range(8))
    assert all(len(r._centroid) == 64 for r in rows)
    plan = cents._jdf.queryExecution().logical().toString()
    assert "broadcast" in plan.lower()


def test_trained_ivf_recall_not_worse(spark, emb):
    """k-means-trained cells must hold the untrained tier's recall floor
    and typically beat it (balanced cells -> fewer probe misses)."""
    q = emb.where(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    untrained = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=5, num_cells=16, nprobe=4).collect()
    }
    trained = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=5, num_cells=16, nprobe=4, train_iters=3).collect()
    }
    r_untrained = len(exact & untrained) / len(exact)
    r_trained = len(exact & trained) / len(exact)
    assert r_trained >= 0.5, f"trained IVF recall {r_trained:.2f} below floor"
    # allow small jitter but catch a training-made-it-worse regression
    assert r_trained >= r_untrained - 0.1, (r_trained, r_untrained)


def test_pq_trained_codebook_schema_and_recall(spark, emb):
    """pq_train_codebooks emits the exact (code, m, csub) shape the PQ
    tiers consume, and training must hold the untrained recall floor."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.operators.ann import pq_topk
    from stream_processing_platform_spark.operators.clustering import pq_train_codebooks

    cb = pq_train_codebooks(emb, train_iters=2, num_subspaces=16, num_codes=32)
    rows = cb.collect()
    assert len(rows) == 16 * 32
    assert {(r.m, r.code) for r in rows} == {
        (m, j) for m in range(16) for j in range(32)
    }
    assert all(len(r.csub) == 4 for r in rows)

    q = emb.where(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    untrained = {
        (r.query_id, r.neighbor_id) for r in pq_topk(emb, q, k=5).collect()
    }
    trained = {
        (r.query_id, r.neighbor_id) for r in pq_topk(emb, q, k=5, train_iters=2).collect()
    }
    r_u = len(exact & untrained) / len(exact)
    r_t = len(exact & trained) / len(exact)
    assert r_t >= 0.8, f"trained PQ recall {r_t:.2f} below floor"
    assert r_t >= r_u - 0.05, (r_t, r_u)


def test_pq_train_rejects_bad_args(spark, emb):
    from stream_processing_platform_spark.operators.clustering import pq_train_codebooks

    with pytest.raises(ValueError, match="train_iters"):
        pq_train_codebooks(emb, train_iters=0)
    tiny = emb.where(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="exceeds"):
        pq_train_codebooks(tiny, train_iters=1, num_codes=64)


def test_streaming_kmeans_tracks_drift(spark):
    """Online updates follow a drifting source: after feeding batches
    from shifted cluster centers, the model centroids sit near the
    RECENT centers (decay < 1 forgets the old regime); decay=1 equals
    the running mean of everything seen."""
    from stream_processing_platform_spark.operators.clustering import StreamingKMeans

    def batch(center_a, center_b, n=40, seed=0):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            c = center_a if i % 2 == 0 else center_b
            rows.append((i, [float(c[0] + rng.normal(0, 0.05)),
                             float(c[1] + rng.normal(0, 0.05))]))
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    # decay 0.2: the model chases the drift
    m = StreamingKMeans([[0.0, 0.0], [5.0, 5.0]], decay=0.2)
    for t in range(4):
        m.update(batch((0 + t, 0), (5 + t, 5), seed=t))
    assert abs(m.C[0][0] - 3.0) < 0.5  # last center_a x was 3
    assert abs(m.C[1][0] - 8.0) < 0.5

    # decay 1.0 with a stationary source: converges to the true means
    m2 = StreamingKMeans([[0.0, 0.0], [5.0, 5.0]], decay=1.0)
    for t in range(3):
        m2.update(batch((1, 1), (6, 6), seed=10 + t))
    assert abs(m2.C[0][0] - 1.0) < 0.1 and abs(m2.C[1][0] - 6.0) < 0.1


def test_streaming_kmeans_foreachbatch_runs(spark, tmp_path):
    from stream_processing_platform_spark.operators.clustering import StreamingKMeans
    from stream_processing_platform_spark.sources.streaming import file_source

    src = tmp_path / "src"
    src.mkdir()
    rows = [(i, [float(i % 2) * 4.0, 0.0]) for i in range(20)]
    spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").coalesce(
        1
    ).write.parquet(str(src / "b0"))
    m = StreamingKMeans([[0.0, 0.0], [4.0, 0.0]])
    q = m.for_each_batch(
        file_source(spark, str(src / "b0"), "vec_id bigint, embedding array<double>"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert m.batches_seen >= 1
    assert abs(m.C[0][0] - 0.0) < 1e-6 and abs(m.C[1][0] - 4.0) < 1e-6
    got = {r.vec_id: r.cluster for r in m.assign(
        spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    ).collect()}
    assert all(got[i] == i % 2 for i in range(20))


def test_reproducible_fit_rounded_assignment_matches_expression_form(spark, emb):
    """kmeans_fit_reproducible's rounded-argmin Arrow path agrees
    row-for-row with assign_expr (whose floor(d*1e6+0.5)/1e6 + low-id
    tie-break IS the generated q_kmeans_embeddings oracle's form) on
    the trained centroids — the twin pin behind the full-training
    oracle. If a boundary mismatch ever fires, the fallback switch is
    assigning via assign_expr inside the fit loop."""
    from stream_processing_platform_spark.operators.clustering import (
        _assign_udf_rounded,
        kmeans_fit_reproducible,
    )
    from stream_processing_platform_spark.functions.similarity import as_double_array

    model = kmeans_fit_reproducible(emb, k=8, iters=3)
    C = np.asarray(model.centroids)
    a = _assign_udf_rounded(C)(as_double_array(F.col("embedding")))
    fast = {r.vec_id: r.cluster for r in emb.select("vec_id", a["cluster"].alias("cluster")).collect()}
    cents = spark.createDataFrame(
        [(i, list(map(float, C[i]))) for i in range(len(C))], "cid int, cvec array<double>"
    )
    expr = {r.vec_id: r.cluster for r in assign_expr(emb, cents).collect()}
    assert fast == expr


def test_reproducible_fit_is_deterministic(spark, emb):
    from stream_processing_platform_spark.operators.clustering import (
        kmeans_fit_reproducible,
    )

    m1 = kmeans_fit_reproducible(emb, k=5, iters=2)
    m2 = kmeans_fit_reproducible(emb.repartition(7), k=5, iters=2)
    assert m1.centroids == m2.centroids  # partitioning must cancel out


def test_repro_hash_overflow_safe_at_planet_scale_ids(spark):
    """r9 advice (medium): the naive ``(id * MULT) % MOD`` Knuth mix
    overflows int64 for ids >= ~3.46e9 — an ANSI-mode job failure at
    the 10^12-row scale this engine targets. ``repro_hash_col`` must
    (a) not overflow at ids near int64 max and (b) agree exactly with
    exact big-int arithmetic (so every existing oracle hash value is
    unchanged)."""
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        REPRO_INIT_MULT,
        repro_hash_col,
        repro_hash_sql,
    )

    ids = [0, 1, 12345, 2**31 - 1, 3_460_000_000, 10**12, 2**62, 2**63 - 9]
    df = spark.createDataFrame([(i,) for i in ids], "id BIGINT")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", repro_hash_col(F.col("id"), salt=7).alias("h")).collect()
    }
    for i in ids:
        assert got[i] == ((i + 7) * REPRO_INIT_MULT) % REPRO_INIT_MOD  # Python big-int
    # the generated-oracle text computes the identical value in duckdb
    import duckdb

    sql_h = repro_hash_sql("id", 7)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    for i, h in con.execute(f"SELECT id, {sql_h} FROM t").fetchall():
        assert h == got[i]
