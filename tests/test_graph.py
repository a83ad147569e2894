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
