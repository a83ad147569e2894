"""connected_components unit tests — shapes the registered query's
near-clique clusters don't exercise: long chains (multi-round
propagation), isolated vertices, and multi-component graphs."""

from __future__ import annotations

from stream_processing_platform_spark.operators.graph import connected_components, dedup_clusters


def test_chain_propagates_min_label_multiple_hops(spark):
    # 0-1-2-3-4 chain: label 0 needs 4 propagation rounds to reach vertex 4
    vertices = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(4)], "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert got == {i: 0 for i in range(5)}


def test_components_and_isolated_vertices(spark):
    vertices = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 42]], "id long")
    edges = spark.createDataFrame([(2, 1), (2, 3), (8, 7)], "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 42: 42}


def test_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    # With a checkpoint dir set the operator switches from localCheckpoint
    # (executor-resident, non-resilient) to reliable .checkpoint() — the
    # cluster-safe mode. Output must be identical either way.
    vertices = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    local = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        reliable = {
            r.id: r.component for r in connected_components(vertices, edges).collect()
        }
    finally:
        # unset for the rest of the shared session (Scala side wraps the
        # argument in Option(...), so null restores "no checkpoint dir")
        sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None
    assert reliable == local == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_dedup_clusters_sizes_and_keepers(spark):
    vertices = spark.createDataFrame([(i,) for i in [10, 11, 12, 20, 30]], "doc_id long")
    pairs = spark.createDataFrame([(10, 11), (11, 12)], "id_a long, id_b long")
    rows = {r.doc_id: (r.cluster_id, r.cluster_size) for r in
            dedup_clusters(vertices, pairs).collect()}
    assert rows == {10: (10, 3), 11: (10, 3), 12: (10, 3), 20: (20, 1), 30: (30, 1)}


def test_pagerank_matches_power_iteration(spark):
    """Spark PageRank == dense numpy power iteration with identical
    dangling-mass redistribution, on a graph with a hub, a chain, a
    dangling sink, and an isolated vertex."""
    import numpy as np

    from stream_processing_platform_spark.operators.graph import pagerank

    ids = [0, 1, 2, 3, 4, 5]
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 3)]  # 5 isolated, 2->0 cycle
    vertices = spark.createDataFrame([(i,) for i in ids], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")

    d, n, iters = 0.85, len(ids), 10
    r = np.full(n, 1.0 / n)
    out = {i: [b for a, b in edge_list if a == i] for i in ids}
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = sum(r[i] for i in ids if not out[i])
        for i in ids:
            for j in out[i]:
                nxt[j] += r[i] / len(out[i])
        r = (1 - d) / n + d * dangling / n + d * nxt

    got = {row["id"]: row["rank"] for row in pagerank(vertices, edges, num_iter=iters).collect()}
    assert set(got) == set(ids)
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    for i in ids:
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    # hub-pointed vertex 2 outranks the chain tail
    assert got[2] > got[3] > got[5]
