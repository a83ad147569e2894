"""Graph-analytics queries over relational tables. The reference engine
has no graph surface; these are the graph primitives a dedup/link-
analysis pipeline runs on pair edges (connected components, PageRank and
label propagation live in queries/similarity.py over the embedding
near-dup graph — this module hosts the purely relational ones).

The customer proximity graph: an edge links two customers of the same
nation whose account balances differ by ≤ _RADIUS cents. Spark builds
the edges with the banded self-join (operators/joins.near_pairs — two
bucket probes per row, pure equi-join, no per-nation product); the
DuckDB oracle uses the brute-force quadratic form, so a hash-MATCH
proves the banding loses no pair. Triangle counting then runs the
degree-orientation algorithm (operators/graph.triangle_counts) whose
oracle mirrors the same orientation in SQL — all-integer arithmetic, so
the match is exact with no rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_platform_spark.operators import graph, joins
from stream_processing_platform_spark.registry import query
from stream_processing_platform_spark.tables import load_table

_RADIUS = 50_000  # cents — ~5 neighbours/customer at sf0.01 density

# The proximity-graph edge CTEs, shared by every graph oracle in this
# module (generated-oracle doctrine: the brute-force edge definition
# exists once; Spark's banded near_pairs is hash-proven against it by
# whichever query runs).
_EDGE_SQL = f"""
    c AS (
      SELECT c_custkey AS id, c_nationkey AS nk,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    e AS (
      SELECT least(a.id, b.id) AS a, greatest(a.id, b.id) AS b
      FROM c a JOIN c b
        ON a.nk = b.nk
       AND (a.cents, a.id) < (b.cents, b.id)
       AND b.cents - a.cents <= {_RADIUS}
    )"""


def _customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    return joins.near_pairs(c, "id", "cents", _RADIUS, key_cols=["nk"])



# Wedge-form triangle CTE chain (deg/o/w/t/tc), shared by the
# q_triangle_counts and q_clustering_coeff oracles — the nontrivial SQL
# exists ONCE (same doctrine as _EDGE_SQL); it is an independent
# formulation of the counts the Spark edge-iterator computes.
_TRI_SQL = """
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e)
      GROUP BY id
    ),
    o AS (
      SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS u,
             CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS v,
             CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS dv
      FROM e
      JOIN deg da ON da.id = e.a
      JOIN deg db ON db.id = e.b
    ),
    w AS (
      SELECT o1.u AS x, o1.v AS y, o2.v AS z
      FROM o o1 JOIN o o2
        ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
    ),
    t AS (SELECT x, y, z FROM w JOIN o ON o.u = w.y AND o.v = w.z),
    tc AS (
      SELECT id, CAST(count(*) AS BIGINT) AS triangles
      FROM (SELECT x AS id FROM t
            UNION ALL SELECT y FROM t
            UNION ALL SELECT z FROM t)
      GROUP BY id
    )"""


@query(
    "q_triangle_counts",
    oracle=f"""
    WITH {_EDGE_SQL},{_TRI_SQL}
    SELECT id, triangles FROM tc
    """,
    description="Per-customer triangle counts over the same-nation "
    "balance-proximity graph: edges from the banded numeric self-join "
    "(operators/joins.near_pairs — bucket-probe equi-join, no per-key "
    "product; the oracle's brute-force quadratic form proves zero lost "
    "pairs), triangles via degree orientation (operators/graph."
    "triangle_counts — wedge fan-out bounded by out-degree ≤ √(2m), "
    "skew-immune). Exact integer arithmetic end to end.",
)
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.triangle_counts(_customer_pairs(spark, sf_dir))


_KCORE_K = 8
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    parts = [f"WITH {_EDGE_SQL}", "e0 AS (SELECT a, b FROM e)"]
    for t in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"d{t} AS (SELECT id, count(*) AS deg FROM"
            f" (SELECT a AS id FROM e{t - 1} UNION ALL SELECT b FROM e{t - 1})"
            f" GROUP BY id)"
        )
        parts.append(f"k{t} AS (SELECT id FROM d{t} WHERE deg >= {_KCORE_K})")
        parts.append(
            f"e{t} AS (SELECT a, b FROM e{t - 1}"
            f" WHERE a IN (SELECT id FROM k{t}) AND b IN (SELECT id FROM k{t}))"
        )
    last = f"e{_KCORE_ROUNDS}"
    return (
        ",\n".join(parts)
        + f"""
    SELECT id, CAST(count(*) AS BIGINT) AS deg
    FROM (SELECT a AS id FROM {last} UNION ALL SELECT b FROM {last})
    GROUP BY id
    """
    )


@query(
    "q_kcore",
    oracle=_kcore_oracle(),
    description=f"k-core peeling (operators/graph.kcore_peel, k="
    f"{_KCORE_K}, {_KCORE_ROUNDS} rounds) over the customer proximity "
    "graph: each round drops degree-<k vertices and their edges — one "
    "map-side-combined degree aggregate + two key-partitioned "
    "semi-joins per round, lineage checkpoint-truncated, no driver "
    "adjacency. The oracle is a GENERATED per-round CTE chain from the "
    "same constants (q_lpa_labels doctrine), over the same shared "
    "brute-force edge CTE as q_triangle_counts; a pytest pins the "
    "fixpoint (extra rounds change nothing on a converged graph). "
    "Exact integers end to end.",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.kcore_peel(
        _customer_pairs(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS
    )


def _cc_oracle() -> str:
    return f"""
    WITH {_EDGE_SQL},{_TRI_SQL}
    SELECT deg.id, deg.deg,
           CAST(COALESCE(tc.triangles, 0) AS BIGINT) AS triangles,
           CAST((2 * COALESCE(tc.triangles, 0) * 1000000)
                // (deg.deg * (deg.deg - 1)) AS BIGINT) AS cc_ppm
    FROM deg LEFT JOIN tc ON tc.id = deg.id
    WHERE deg.deg >= 2
    """


@query(
    "q_clustering_coeff",
    oracle=_cc_oracle(),
    description="Local clustering coefficients over the customer "
    "proximity graph (operators/graph.clustering_coefficients): "
    "2·triangles / (deg·(deg−1)) per vertex in exact integer ppm — "
    "neighborhood cohesion next to raw triangle counts; reuses the "
    "edge-iterator triangle pipeline plus one degree aggregate and a "
    "vertex-keyed join. Oracle shares the brute-force edge CTE with "
    "q_triangle_counts (its wedge-form triangle chain is an "
    "independent formulation of the same counts).",
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.clustering_coefficients(_customer_pairs(spark, sf_dir))


_BFS_ROUNDS = 3
_BFS_SRC_MOD = 97  # sources: custkey % 97 == 0 — a sparse seed set


def _bfs_oracle() -> str:
    parts = [
        f"WITH {_EDGE_SQL}",
        "sym AS (SELECT a AS s, b AS d FROM e UNION SELECT b, a FROM e)",
        f"d0 AS (SELECT id, CAST(0 AS BIGINT) AS hops FROM c"
        f" WHERE id % {_BFS_SRC_MOD} = 0)",
    ]
    for t in range(1, _BFS_ROUNDS + 1):
        parts.append(
            f"d{t} AS (SELECT id, CAST(min(hops) AS BIGINT) AS hops FROM ("
            f"SELECT id, hops FROM d{t - 1}"
            f" UNION ALL"
            f" SELECT sym.d AS id, p.hops + 1 AS hops"
            f" FROM sym JOIN d{t - 1} p ON sym.s = p.id"
            f") GROUP BY id)"
        )
    return ",\n".join(parts) + f"\nSELECT id, hops FROM d{_BFS_ROUNDS}"


@query(
    "q_bfs_hops",
    oracle=_bfs_oracle(),
    description=f"Multi-source BFS hop distances (operators/graph."
    f"bfs_hops, {_BFS_ROUNDS} rounds) over the customer proximity "
    "graph from a sparse seed set — per round one edge join + one "
    "min-per-vertex shuffle (the Pregel frontier relaxation), lineage "
    "checkpoint-truncated. Oracle is a GENERATED per-round CTE chain "
    "over the shared brute-force edge CTE; exact integer hops.",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _customer_pairs(spark, sf_dir)
    src = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % _BFS_SRC_MOD == 0
    ).select(F.col("c_custkey").alias("id"))
    return graph.bfs_hops(pairs, src, rounds=_BFS_ROUNDS)
