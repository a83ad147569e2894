"""Frequency-sketch operators: exact distributed heavy hitters.

Reference parity: the reference has no sketch operators at all — this is
part of the LLM-pipeline surface (SURVEY.md §7.6): finding the tokens /
domains / fingerprints that exceed a frequency share of a 100 TB corpus
without shuffling the full vocabulary.

Design (two passes, the classic sketch-then-verify shape):

1. **Candidate generation** — per-partition Misra-Gries with
   ``k = phi_denom`` counters, run as an Arrow ``mapInPandas`` that folds
   batch ``value_counts`` into the summary (the mergeable-summaries
   merge: union-add, then subtract the (k+1)-th largest count and drop
   non-positive). MG guarantees undercount ≤ n_p/k per partition, so any
   item with GLOBAL count·phi_denom > total must exceed its share in at
   least one partition and therefore survives that partition's summary:
   the candidate set is a strict superset of the true heavy hitters.
   Cost: one linear scan, O(k) memory per partition, and at most
   k·num_partitions candidate rows emitted — no vocabulary shuffle.

2. **Exact verify** — broadcast the (bounded) candidate set back as a
   left-semi filter on the item stream, aggregate exact counts for
   candidates only, and keep items with ``cnt * phi_denom > total``
   (strict, matching the MG guarantee). Because the candidates are a
   superset, the output is EXACTLY the true heavy-hitter set with EXACT
   counts — which is why this operator can carry a full DuckDB oracle
   despite being sketch-based.

At 100 TB the verify pass re-scans the input; when that matters, feed
both passes from a cached/checkpointed token stream or accept the
sketch-only candidates (superset with approximate counts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summary keys (≤ k items per partition)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for pdf in batches:
            batch = pdf[item_col].value_counts()  # vectorized exact batch counts
            counts = batch if counts is None else counts.add(batch, fill_value=0)
            if len(counts) > k:
                # Mergeable-summaries decrement: subtract the (k+1)-th
                # largest count from everything, keep the positive rest.
                pivot = counts.nlargest(k + 1).iloc[-1]
                counts = counts - pivot
                counts = counts[counts > 0]
        if counts is not None and len(counts):
            yield pd.DataFrame({item_col: counts.index})

    return df.select(item_col).mapInPandas(summarize, schema=f"{item_col} string")


def heavy_hitters(df: DataFrame, item_col: str, phi_denom: int) -> DataFrame:
    """Items occurring strictly more than ``total / phi_denom`` times,
    with exact counts. Columns: ``(item_col, cnt)``.

    ``phi_denom`` is the share denominator (e.g. 100 → items above 1% of
    the stream) and doubles as the Misra-Gries counter budget.
    """
    cands = _mg_candidates(df, item_col, phi_denom).distinct()
    total = df.agg(F.count("*").alias("_total"))
    return (
        df.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total), F.col("cnt") * phi_denom > F.col("_total"))
        .select(item_col, "cnt")
    )


# ------------------------------------------------------------------ KMV
#
# k-minimum-values distinct sketch (Bar-Yossef et al. 2002, the
# bottom-k / theta-sketch family): hash every value, keep the k smallest
# DISTINCT hashes per group, estimate |D| as (k-1) * M / h_(k) where
# h_(k) is the k-th minimum and M the hash range. Unlike HLL (whose
# register layout is engine-specific, so q_approx_distinct can only be
# rows-only checked), KMV over the SQL-expressible Knuth hash is a PURE
# FUNCTION of the data: every intermediate is a BIGINT, so a duckdb
# oracle replays the sketch exactly and the driver hash-checks the
# approximation itself — the same doctrine that made the ANN tiers and
# q_approx_percentile full-oracle.
#
# Scale shape: one (group, hash) dedup shuffle, then a rank-window
# top-k whose filter Spark rewrites to WindowGroupLimit — each map task
# keeps at most k rows per group before the exchange, so state is
# bounded by k per group everywhere, never by |D|. Estimator error is
# ~1/sqrt(k-2) relative (pytest-gated).


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
    salt: int = 7,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per group via a
    deterministic KMV sketch. Columns: group_cols + (approx_distinct,
    kth_hash). When a group holds fewer than k distinct hashes the
    sketch IS the distinct set and the exact count of distinct HASHES
    is returned (kth_hash then being the max observed hash). Distinct
    values whose Knuth hashes collide — congruent mod 2^31-1 or
    colliding after the multiply — merge even in this small-group
    branch, so "exact" means exact over hashes, not values; the oracle
    replays the same hash, so the comparison is unaffected."""
    from pyspark.sql import Window

    from stream_processing_platform_spark.functions.cols import as_col_list
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        repro_hash_col,
    )

    gcols = as_col_list(group_cols)
    d = (
        df.where(F.col(value_col).isNotNull())
        .select(*gcols, repro_hash_col(F.col(value_col), salt=salt).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*[c for c in group_cols]).orderBy("_h")
    topk = d.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return topk.groupBy(*[c for c in group_cols]).agg(
        F.when(
            F.count("*") < k, F.count("*")
        )
        .otherwise(F.expr(f"CAST({k - 1} AS BIGINT) * {REPRO_INIT_MOD} div max(_h)"))
        .alias("approx_distinct"),
        F.max("_h").alias("kth_hash"),
    )


def kmv_distinct_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
    salt: int = 7,
) -> str:
    """Generated duckdb oracle twin of :func:`kmv_distinct` — built from
    the same constants so the estimator can never drift from the
    operator (the generated-oracles doctrine)."""
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        repro_hash_sql,
    )

    g = ", ".join(group_cols)
    return f"""
    WITH d AS (
      SELECT DISTINCT {g}, {repro_hash_sql(value_col, salt=salt)} AS h
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    r AS (
      SELECT {g}, h,
             row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn
      FROM d
    )
    SELECT {g},
           CAST(CASE WHEN count(*) < {k} THEN count(*)
                ELSE (CAST({k - 1} AS BIGINT) * {REPRO_INIT_MOD}) // max(h)
                END AS BIGINT) AS approx_distinct,
           CAST(max(h) AS BIGINT) AS kth_hash
    FROM r WHERE rn <= {k}
    GROUP BY {g}
    """
