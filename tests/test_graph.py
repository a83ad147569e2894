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


def test_lpa_seed_immutable_and_mode_tiebreak(spark):
    """Seeds never change even when outvoted; mode ties break (count
    desc, label asc); vertices with no labeled neighbor stay sentinel."""
    from stream_processing_platform_spark.operators.graph import label_propagation

    # star: center 0 unlabeled, leaves 1..4 seeded (two 10s, two 20s ->
    # tie on count, label 10 wins); 5 is seeded 99 but wired to three
    # 10-neighbors -> must STAY 99; 6 is isolated -> sentinel
    verts = spark.createDataFrame(
        [(0, None), (1, 10), (2, 10), (3, 20), (4, 20), (5, 99), (6, None)],
        "id bigint, seed_label int",
    )
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0), (1, 5), (2, 5), (0, 5)],
        "src bigint, dst bigint",
    )
    got = {
        r.id: r.lpa_label
        for r in label_propagation(verts, edges, num_iter=2).collect()
    }
    assert got[0] == 10  # tie 2x10 vs 2x20 -> smaller label
    assert got[5] == 99  # seed immutable
    assert got[6] == -1  # isolated -> sentinel
    assert got[1] == 10 and got[3] == 20  # seeds keep their own labels


def test_lpa_propagates_one_hop_per_round(spark):
    """A chain 0(seed)-1-2-3: after k rounds the label has walked
    exactly k hops (synchronous updates)."""
    from stream_processing_platform_spark.operators.graph import label_propagation

    verts = spark.createDataFrame(
        [(0, 7), (1, None), (2, None), (3, None)], "id bigint, seed_label int"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    for k, labeled in ((1, {0, 1}), (2, {0, 1, 2}), (3, {0, 1, 2, 3})):
        got = {
            r.id: r.lpa_label
            for r in label_propagation(verts, edges, num_iter=k).collect()
        }
        assert {v for v, l in got.items() if l == 7} == labeled, (k, got)


def test_pagerank_integer_hand_computed_and_isolated(spark):
    """Integer PageRank recurrence on a hand-computable graph: a 2-cycle
    (a<->b) plus an isolated vertex c, scale=1000, damping 85%, 1 round.
      r0 = 1000 div 3 = 333 each
      base = (15*1000) div (100*3) = 50
      a<-b contribution = (85*333) div (100*1) = 283
      => a = b = 50 + 283 = 333; c (isolated) = 50 (teleport only)
    Also pins determinism: two runs are identical."""
    from stream_processing_platform_spark.operators.graph import pagerank_integer

    v = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = {
        r.id: r.rank_scaled
        for r in pagerank_integer(v, e, damping_pct=85, num_iter=1, scale=1000).collect()
    }
    assert got == {"a": 333, "b": 333, "c": 50}
    again = {
        r.id: r.rank_scaled
        for r in pagerank_integer(v, e, damping_pct=85, num_iter=1, scale=1000).collect()
    }
    assert again == got


def test_triangle_counts_hand_computed(spark):
    """K4 on {a,b,c,d} has 4 triangles, 3 per vertex; a pendant edge
    (d-e) adds none. Duplicate + reversed input rows must not inflate."""
    from stream_processing_platform_spark.operators.graph import triangle_counts

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    rows = k4 + [("b", "a"), ("c", "a"), ("d", "e")]  # dupes reversed + pendant
    e = spark.createDataFrame(rows, "id_a string, id_b string")
    got = {r.id: r.triangles for r in triangle_counts(e).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}  # e absent: no triangle


def test_triangle_counts_skewed_hub_star_is_triangle_free(spark):
    """A star (hub h to 50 leaves) has no triangles — and with degree
    orientation the hub generates ZERO wedges (all edges point into it),
    which is the skew guarantee the docstring claims."""
    from stream_processing_platform_spark.operators.graph import triangle_counts

    e = spark.createDataFrame(
        [("h", f"l{i}") for i in range(50)], "id_a string, id_b string"
    )
    assert triangle_counts(e).count() == 0


def test_near_pairs_banding_matches_brute_force(spark):
    """Banded self-join finds exactly the brute-force pair set, incl.
    cross-bucket pairs and the value-tie id tie-break."""
    from itertools import combinations

    from stream_processing_platform_spark.operators.joins import near_pairs

    vals = [(1, "k", 100), (2, "k", 149), (3, "k", 150), (4, "k", 199),
            (5, "k", 201), (6, "x", 100), (7, "k", 100)]
    df = spark.createDataFrame(vals, "id long, k string, v long")
    got = {(r.id_a, r.id_b) for r in near_pairs(df, "id", "v", 50, "k").collect()}
    want = {
        (a[0], b[0])
        for a, b in combinations(sorted(vals, key=lambda t: (t[2], t[0])), 2)
        if a[1] == b[1] == "k" and abs(a[2] - b[2]) <= 50
    } | {(6, 6)} - {(6, 6)}  # x-key row pairs with nothing
    assert got == want and (1, 7) in got  # tie on v=100 ordered by id


def test_kcore_peel_cascade_and_fixpoint(spark):
    """Chain a-b-c-d with k=2 peels in TWO cascading rounds (endpoints
    first, then the stranded middle edge); K4 with a pendant is stable
    after one round at k=3 — and once converged, extra rounds change
    nothing (the fixpoint that justifies the bounded-round oracle)."""
    from stream_processing_platform_spark.operators.graph import kcore_peel

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "id_a string, id_b string"
    )
    assert kcore_peel(chain, k=2, rounds=1).count() == 2  # b-c survives round 1
    assert kcore_peel(chain, k=2, rounds=2).count() == 0  # cascade kills it
    assert kcore_peel(chain, k=2, rounds=5).count() == 0  # fixpoint

    k4p = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("d", "e")],  # pendant
        "id_a string, id_b string",
    )
    core1 = {(r.id, r.deg) for r in kcore_peel(k4p, k=3, rounds=1).collect()}
    core5 = {(r.id, r.deg) for r in kcore_peel(k4p, k=3, rounds=5).collect()}
    assert core1 == core5 == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}


def test_near_pairs_exact_buckets_past_2_53(spark):
    """Bucket ids come from integer floor-division, not double division:
    past 2^53 a double quotient loses ulps and a boundary row lands in
    the wrong bucket, silently dropping its qualifying pairs. Also pins
    the true-floor (not truncate-toward-zero) contract for negatives."""
    from stream_processing_platform_spark.operators.joins import near_pairs

    big = 1 << 60  # 2^60: doubles here step in units of 128
    vals = [(1, big), (2, big + 3), (3, big + 1000), (4, -7), (5, -2)]
    df = spark.createDataFrame(vals, "id long, v long")
    got = {(r.id_a, r.id_b) for r in near_pairs(df, "id", "v", 5).collect()}
    assert got == {(1, 2), (4, 5)}  # |3| <= 5 at 2^60; -7/-2 cross bucket -2/-1


def test_near_pairs_rejects_degenerate_radius(spark):
    import pytest

    from stream_processing_platform_spark.operators.joins import near_pairs

    df = spark.createDataFrame([(1, 5)], "id long, v long")
    with pytest.raises(ValueError, match="radius"):
        near_pairs(df, "id", "v", 0)


def test_clustering_coefficients_hand_computed(spark):
    """K4: cc=1.0 for all; pendant e (deg 1) excluded; d (deg 4, 3
    triangles among its 6 neighbor pairs) cc = 3/6."""
    from stream_processing_platform_spark.operators.graph import (
        clustering_coefficients,
    )

    k4p = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("d", "e")],
        "id_a string, id_b string",
    )
    got = {r.id: (r.deg, r.triangles, r.cc_ppm)
           for r in clustering_coefficients(k4p).collect()}
    assert got["a"] == (3, 3, 1_000_000)
    assert got["d"] == (4, 3, 500_000)
    assert "e" not in got  # deg 1: undefined, excluded


def test_bfs_hops_multi_source_min_and_bound(spark):
    """Chain a-b-c-d-e with sources {a, e}: hops are min-distance to the
    NEAREST source; rounds bound the frontier (rounds=1 leaves the
    middle unreached)."""
    from stream_processing_platform_spark.operators.graph import bfs_hops

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], "id_a string, id_b string"
    )
    src = spark.createDataFrame([("a",), ("e",)], "id string")
    got = {r.id: r.hops for r in bfs_hops(chain, src, rounds=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 1, "e": 0}
    one = {r.id: r.hops for r in bfs_hops(chain, src, rounds=1).collect()}
    assert one == {"a": 0, "b": 1, "d": 1, "e": 0}  # c beyond round 1
