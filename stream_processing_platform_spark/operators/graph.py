"""Connected components — dedup clustering over near-dup pair edges.

Near-dup detection emits PAIRS (operators/dedup.py); a dedup pipeline
needs GROUPS with one keeper per group, i.e. the connected components of
the pair graph. This is the standard iterative min-label propagation
(what GraphX/GraphFrames run): every vertex starts labeled with its own
id, each round takes the min of its own and its neighbors' labels, until
fixpoint. Rounds needed = graph diameter; dup clusters are near-cliques,
so 2-3 rounds in practice.

Scale notes (the parts that matter at 100 TB):
- Each round is one shuffle (join edges→labels + groupBy min) — the same
  shape GraphFrames uses; no driver-side adjacency.
- Per-round checkpointing truncates lineage — without it the plan
  doubles every iteration and analysis time explodes exponentially.
  Two modes: if the SparkContext has a checkpoint dir set
  (``spark.sparkContext.setCheckpointDir``), use RELIABLE
  ``.checkpoint()`` — blocks are re-readable from shared storage, so an
  executor loss mid-iteration recomputes from the checkpoint instead of
  aborting the job. Otherwise fall back to ``localCheckpoint`` (blocks
  live on executors — fine on local[n], non-resilient on a cluster).
- Convergence check is a ``count`` of changed labels per round: one tiny
  job on an already-materialized frame, the standard iterate-until-fixed
  idiom for Spark graph algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_processing_platform_spark.partitioning import checkpointer


# Shared materialization helper — promoted to partitioning.checkpointer
# (generic infrastructure: graph rounds, ranking baskets, dedup batch
# members all use it); kept importable here for its original callers.
_checkpointer = checkpointer


def _symmetrize(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Checkpointed undirected closure of an edge list: both directions,
    distinct, columns (_s, _d) — the shared first step of every
    undirected graph traversal in this module."""
    sym = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    return _checkpointer(edges)(
        sym.union(sym.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))).distinct()
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the smallest vertex id reachable from it.

    ``vertices``: one row per vertex (isolated vertices keep their own
    label — clusters of size 1 stay visible). ``edges``: undirected pair
    list. Output: (id, component) with component = min id in the
    component. Deterministic. Cluster-resilient when the caller has set
    ``spark.sparkContext.setCheckpointDir(...)`` (see module docstring).
    """
    ckpt = _checkpointer(edges)
    sym = _symmetrize(edges, src_col, dst_col)

    labels = ckpt(
        vertices.select(F.col(id_col).alias("_v"), F.col(id_col).alias("component"))
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["_s"] == labels["_v"])
            .select(F.col("_d").alias("_v"), "component")
            .groupBy("_v")
            .agg(F.min("component").alias("_nbr"))
        )
        new_labels = ckpt(
            labels.join(nbr_min, "_v", "left")
            .select("_v", F.least("component", F.coalesce("_nbr", "component")).alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "_v")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select(F.col("_v").alias(id_col), "component")


def dedup_clusters(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → dedup groups: component id (= keeper id, the
    smallest member) and component size per document. Output:
    (id_col, cluster_id, cluster_size)."""
    cc = connected_components(vertices, pairs, id_col=id_col, src_col=src_col, dst_col=dst_col)
    w = Window.partitionBy("component")
    return cc.select(
        id_col,
        F.col("component").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
    )


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    num_iter: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the standard
    power iteration as iterative DataFrame joins (the GraphX/GraphFrames
    shape; no driver-side adjacency).

    Per round: contributions = rank/out_degree shipped along edges (one
    join keyed on src), summed per destination (one shuffle), then
    ``rank = (1-d)/N + d * (contrib + dangling_mass/N)`` — dangling
    vertices (no out-edges) redistribute their mass uniformly, keeping
    sum(rank) == 1 every round (pinned in tests/test_graph.py).

    Scale notes: each round is join + groupBy (two key shuffles) over
    |edges| rows; per-round checkpointing (reliable when a checkpoint
    dir is set, local otherwise) truncates lineage exactly like
    connected_components above. Fixed iteration count keeps the round
    structure deterministic; 10 rounds ≈ 1e-3 max error on the graphs
    dedup pipelines see (near-clique clusters converge much faster).

    Returns ``(id_col, rank)``.
    """
    ckpt = _checkpointer(vertices)
    n = vertices.count()
    if n == 0:
        return vertices.select(F.col(id_col), F.lit(0.0).alias("rank"))
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    # Edge list annotated with the source's out-degree, reused every round.
    e_deg = ckpt(e.join(deg, "_src"))
    ranks = vertices.select(F.col(id_col).alias("_id"), F.lit(1.0 / n).alias("_rank"))
    has_out = deg.select(F.col("_src").alias("_id"))
    for _ in range(num_iter):
        contrib = (
            e_deg.join(ranks, e_deg._src == ranks._id)
            .select("_dst", (F.col("_rank") / F.col("_deg")).alias("_c"))
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_contrib"))
        )
        # Mass parked on dangling vertices redistributes uniformly.
        dangling = (
            ranks.join(has_out, "_id", "left_anti").agg(F.sum("_rank").alias("_m"))
        ).collect()[0]["_m"] or 0.0
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = ckpt(
            ranks.select("_id")
            .join(contrib, ranks._id == contrib._dst, "left_outer")
            .select(
                "_id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("_contrib"), F.lit(0.0))).alias(
                    "_rank"
                ),
            )
        )
    return ranks.select(F.col("_id").alias(id_col), F.col("_rank").alias("rank"))


def label_propagation(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    seed_col: str = "seed_label",
    src_col: str = "src",
    dst_col: str = "dst",
    num_iter: int = 3,
    sentinel: int = -1,
) -> DataFrame:
    """Semi-supervised label propagation (label spreading) over an
    undirected edge list — the "propagate the trusted labels" primitive
    an LLM-data pipeline uses to spread quality/language/topic labels
    from a small curated seed set across a similarity graph (near-dup
    pairs, embedding kNN edges).

    Semantics (synchronous, fixed ``num_iter`` rounds — deterministic,
    which is what lets q_lpa_labels carry a full generated-SQL oracle):

    - seeded vertices (``seed_col`` not null) keep their label forever;
    - an unseeded vertex takes the MODE of its neighbors' previous-round
      labels (ties: larger count wins, then smaller label — argmax as
      ``min(struct(-count, label))``, map-side combining);
    - no labeled neighbor → keep the previous round's label (possibly
      still unlabeled; emitted as ``sentinel``).

    Per round: one join shipping labels along edges + one (vertex,
    label) count + one per-vertex argmax — two key shuffles over
    |edges|, the same asymptotics as connected_components/pagerank
    above, with identical per-round lineage checkpointing. Returns
    ``(id_col, lpa_label)`` — never-null (sentinel for unlabeled).
    """
    ckpt = _checkpointer(vertices)
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    und = ckpt(e.union(e.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))))
    seeds = vertices.select(F.col(id_col).alias("_id"), F.col(seed_col).alias("_seed"))
    labels = seeds.select("_id", F.col("_seed").alias("_label"))
    for _ in range(num_iter):
        votes = (
            und.join(
                labels.where(F.col("_label").isNotNull()),
                und._src == labels._id,
            )
            .groupBy("_dst", "_label")
            .agg(F.count("*").alias("_n"))
        )
        mode = votes.groupBy("_dst").agg(
            F.min(F.struct((-F.col("_n")).alias("_neg"), F.col("_label").alias("_l")))[
                "_l"
            ].alias("_mode")
        )
        labels = ckpt(
            seeds.join(labels.select("_id", "_label"), "_id")
            .join(mode, seeds._id == mode._dst, "left_outer")
            .select(
                "_id",
                F.coalesce(F.col("_seed"), F.col("_mode"), F.col("_label")).alias("_label"),
            )
        )
    return labels.select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("_label"), F.lit(sentinel)).alias("lpa_label"),
    )


def pagerank_integer(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = 85,
    num_iter: int = 3,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Integer-exact PageRank: the float power iteration's sums are
    partition-order-dependent, which is why :func:`pagerank` can only
    be rows-only checked — this variant defines the recurrence over
    BIGINTs so the result is bit-identical across engines, partitions,
    and runs, and therefore carries a full generated SQL oracle
    (q_pagerank_exact — the q_lpa_labels iterative-oracle doctrine):

        r_0(v)     = scale div n
        r_{t+1}(v) = (100-damping_pct)*scale div (100*n)
                     + sum over in-edges (u,v) of
                       (damping_pct * r_t(u)) div (100 * deg_out(u))

    Integer sums are order-independent; every division is integral
    (Spark ``div`` truncates, duckdb ``//`` floors — identical on the
    non-negative values here). Deliberate semantic simplification vs
    the float operator: NO dangling-mass redistribution (that needs a
    global float mass per round) — dangling/isolated vertices keep
    teleport-only mass, and total mass decays by the floor losses, so
    ranks are a centrality ORDERING signal, not a probability
    distribution. Same scale shape as :func:`pagerank`: per round one
    src-keyed join + one dst-keyed aggregate over |edges| rows,
    per-round checkpointing, no driver adjacency.

    Returns ``(id_col, rank_scaled BIGINT)``.
    """
    ckpt = _checkpointer(vertices)
    n = vertices.count()
    if n == 0:
        return vertices.select(F.col(id_col), F.lit(0).cast("long").alias("rank_scaled"))
    teleport_pct = 100 - damping_pct
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    e_deg = ckpt(e.join(deg, "_src"))
    v = vertices.select(F.col(id_col).alias("_id"))
    ranks = v.select("_id", F.expr(f"CAST({scale} div {n} AS BIGINT)").alias("_rank"))
    base = F.expr(f"CAST(({teleport_pct} * {scale}) div (100 * {n}) AS BIGINT)")
    for _ in range(num_iter):
        contrib = e_deg.join(ranks, e_deg["_src"] == ranks["_id"]).select(
            F.col("_dst"),
            F.expr(f"CAST(({damping_pct} * _rank) div (100 * _deg) AS BIGINT)").alias("_c"),
        )
        sums = contrib.groupBy("_dst").agg(F.sum("_c").alias("_s"))
        ranks = ckpt(
            v.join(sums, v["_id"] == sums["_dst"], "left").select(
                "_id",
                (F.coalesce(F.col("_s"), F.lit(0)) + base).cast("long").alias("_rank"),
            )
        )
    return ranks.select(F.col("_id").alias(id_col), F.col("_rank").alias("rank_scaled"))


def triangle_counts(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected pair list.

    Degree orientation — the standard O(m^1.5) distributed triangle
    algorithm: direct every edge from its lower (degree, id) endpoint
    to the higher; each triangle {x,y,z} (ordered by that key) then
    appears EXACTLY once, as the wedge x→y, x→z closed by the oriented
    edge y→z. Orientation is the skew killer at scale: a celebrity
    vertex with degree 1M generates no 1M² wedge explosion because its
    edges all point INTO it — per-vertex wedge fan-out is bounded by
    out-degree ≤ √(2m), independent of raw degree.

    Shape: one union+groupBy for degrees, two key-partitioned joins to
    attach them, then edge-iterator closing (adjacency-array joins +
    array_intersect per edge) and one explode+groupBy for the counts —
    all shuffles on vertex ids, no driver-side adjacency, integer
    arithmetic end to end. The canonical edge set and the oriented set
    are CHECKPOINTED (the shared graph-op checkpointer): both feed
    multiple downstream branches, and without materialization each
    branch would recompute the whole upstream candidate-generation
    lineage (measured: most of the operator's cost).

    Input rows are canonicalized (unordered, distinct) first, so either
    one-row-per-pair or both-directions input is accepted.
    Output: id, triangles (BIGINT) for every vertex in ≥1 triangle.
    """
    return _triangles_from_edges(_canonical_edges(pairs, a_col, b_col))


def _canonical_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Checkpointed canonical edge set (a < b, distinct, no loops) —
    materialized once so every consumer (degrees, orientation,
    clustering coefficients) reads blocks instead of re-running the
    caller's candidate-generation lineage."""
    return _checkpointer(pairs)(
        pairs.select(
            F.least(a_col, b_col).alias("a"), F.greatest(a_col, b_col).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _triangles_from_edges(e: DataFrame) -> DataFrame:
    ckpt = _checkpointer(e)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    ed = e.join(
        deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
    lt = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    oriented = ckpt(
        ed.select(
            F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    # Edge-iterator closing: each oriented edge (u, v) closes the
    # triangles N+(u) ∩ N+(v) — two adjacency-array joins and one
    # array_intersect per EDGE, instead of materializing every wedge
    # through a shuffle (≈ Σ outdeg² rows; measured 2× the whole
    # operator at sf0.1). The per-vertex array is bounded by out-degree
    # ≤ √(2m) — the orientation guarantee — so row width stays bounded
    # where the wedge row COUNT would not.
    adj = oriented.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("_n"))
    closing = (
        oriented.select("u", "v")
        .join(adj.select(F.col("u").alias("u"), F.col("_n").alias("_nu")), "u")
        .join(adj.select(F.col("u").alias("v"), F.col("_n").alias("_nv")), "v")
        .select("u", "v", F.array_intersect("_nu", "_nv").alias("_z"))
        .filter(F.size("_z") > 0)
    )
    per_vertex = (
        closing.select(F.col("u").alias("id"), F.size("_z").alias("c"))
        .unionAll(closing.select(F.col("v").alias("id"), F.size("_z").alias("c")))
        .unionAll(closing.select(F.explode("_z").alias("id"), F.lit(1).alias("c")))
    )
    return per_vertex.groupBy("id").agg(F.sum("c").cast("long").alias("triangles"))


def kcore_peel(
    pairs: DataFrame,
    k: int,
    rounds: int,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """``rounds`` iterations of k-core peeling: repeatedly drop vertices
    with degree < k (and their edges). With enough rounds this is THE
    k-core; a fixed round count keeps the recurrence oracle-able as a
    generated per-iteration SQL chain (the q_lpa_labels doctrine) — the
    fixpoint pytest pins that extra rounds change nothing on a
    converged graph.

    Shape per round: one union+groupBy for degrees (map-side combined)
    and two key-partitioned semi-joins to drop dead edges — the same
    per-round join+aggregate cost as connected components, lineage
    truncated by the shared checkpointer. No driver-side adjacency.
    Output: id, deg (degree inside the surviving subgraph).
    """
    ckpt = _checkpointer(pairs)
    e = (
        pairs.select(
            F.least(a_col, b_col).alias("a"), F.greatest(a_col, b_col).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("a").alias("id"))
            .unionAll(edges.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )

    for _ in range(rounds):
        keep = degrees(e).filter(F.col("deg") >= k).select("id")
        e = ckpt(
            e.join(keep.withColumnRenamed("id", "a"), "a", "semi").join(
                keep.withColumnRenamed("id", "b"), "b", "semi"
            )
        )
    return degrees(e)


def clustering_coefficients(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Local clustering coefficient per vertex:
    ``2·triangles / (deg·(deg−1))`` — how close each vertex's
    neighborhood is to a clique, the standard cohesion metric next to
    triangle counts. Vertices with deg < 2 are excluded (undefined).

    Reuses :func:`triangle_counts` (edge-iterator closing) plus one
    degree aggregate and a vertex-keyed join; the ratio is exact
    integer ppm (floor division), so it crosses engines exactly.
    Output: id, deg (BIGINT), triangles (BIGINT), cc_ppm (BIGINT).
    """
    # ONE checkpointed edge set feeds both the degree branch and the
    # triangle pipeline — duplicating the canonicalization would re-run
    # the caller's candidate-generation lineage per branch
    e = _canonical_edges(pairs, a_col, b_col)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    tri = _triangles_from_edges(e)
    out = (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "id", "left")
        .withColumn("triangles", F.coalesce(F.col("triangles"), F.lit(0).cast("long")))
    )
    return out.select(
        "id",
        "deg",
        "triangles",
        F.expr("(2 * triangles * 1000000) div (deg * (deg - 1))").alias("cc_ppm"),
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    id_col: str = "id",
) -> DataFrame:
    """Multi-source BFS over an undirected edge list: hop distance from
    the nearest source, for every vertex within ``rounds`` hops — the
    reachability/neighborhood-radius primitive next to connected
    components (bounded rounds keep the recurrence oracle-able as a
    generated per-round CTE chain, the q_lpa_labels doctrine).

    Per round: ship each labeled vertex's distance along its edges
    (one key join), take the min per destination including the current
    label (one shuffle) — the frontier-relaxation step every Pregel
    BFS runs, as DataFrame ops with checkpoint-truncated lineage and
    no driver-side adjacency. Output: id, hops (BIGINT, 0 for the
    sources themselves).
    """
    ckpt = _checkpointer(edges)
    sym = _symmetrize(edges, src_col, dst_col)
    dist = ckpt(
        sources.select(F.col(id_col).alias("_v"), F.lit(0).cast("long").alias("hops"))
        .distinct()
    )
    # Frontier-only relaxation (standard Pregel BFS): a vertex settled
    # at hop k can never improve a neighbor after round k+1, so only
    # the vertices REACHED LAST ROUND ship offers — edge-join work is
    # O(reached × degree) total, not × rounds.
    frontier = dist
    for _ in range(rounds):
        offers = sym.join(frontier, sym["_s"] == frontier["_v"]).select(
            F.col("_d").alias("_v"), (F.col("hops") + 1).alias("hops")
        )
        merged = ckpt(
            dist.unionByName(offers).groupBy("_v").agg(F.min("hops").alias("hops"))
        )
        frontier = (
            merged.join(
                dist.select("_v", F.col("hops").alias("_old")), "_v", "left"
            )
            .where(F.col("_old").isNull() | (F.col("hops") < F.col("_old")))
            .select("_v", "hops")
        )
        dist = merged
    return dist.select(F.col("_v").alias(id_col), "hops")
