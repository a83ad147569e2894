"""Corpus mixture weighting — the knob after dedup/filter/split.

A training-data recipe says "x% of tokens from web, y% from books, …"
under a total token budget. This operator realizes the recipe
deterministically: each source's token target is an exact integer share
of the budget (``budget * parts // total_parts`` — no float weights, so
two engines compute identical targets), and within a source documents
are admitted in content-fingerprint order until the target is reached.

Scale shape (100 TB): the recipe is a handful of rows — it broadcast
joins onto the corpus. The running token sum is a per-source window
(same single-shuffle shape as sequence packing, parallel across
sources, no global sort). Fingerprint ordering makes the selection a
pure function of content: reproducible across runs, engines, and
cluster sizes, and stable under corpus growth within the un-truncated
prefix. A document straddling the target boundary is admitted whole
(same overflow semantics as q_sequence_packing: budgets are floors on
*exclusive* running sums, so each source overshoots by at most one
document).

Reference parity: the reference has no mixture operator (its pipelines
stop at per-record transforms); this is north-star LLM-pipeline
surface, same tier as dedup/packing/chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mixture_targets(weights: dict[str, int], budget_tokens: int) -> dict[str, int]:
    """Integer token target per source: ``budget * parts // total_parts``.
    Pure integer arithmetic — both Spark and any SQL oracle compute the
    same targets bit-for-bit."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("mixture weights must sum to a positive integer")
    return {s: budget_tokens * p // total for s, p in weights.items()}


def corpus_mixture(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    token_col: str,
    source_col: str = "source",
    order_col: str = "doc_id",
    hash_col: str | None = None,
) -> DataFrame:
    """Select a deterministic sub-corpus matching the mixture recipe.

    ``df`` must carry an integer ``token_col``. Sources absent from the
    recipe are dropped (inner join with the broadcast recipe). Returns
    the kept rows with a ``mix_target`` column (that source's token
    target) attached.

    ``hash_col`` orders admission within a source (default: plain
    ``order_col`` order); pass a content fingerprint for content-stable
    selection.
    """
    spark = df.sparkSession
    targets = mixture_targets(weights, budget_tokens)
    recipe = spark.createDataFrame(
        [(s, t) for s, t in sorted(targets.items())], f"{source_col} string, mix_target long"
    )
    order = [F.col(hash_col).asc(), F.col(order_col).asc()] if hash_col else [F.col(order_col).asc()]
    w = Window.partitionBy(source_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    return (
        df.join(F.broadcast(recipe), source_col)
        .withColumn("_cum_before", F.coalesce(F.sum(token_col).over(w), F.lit(0)))
        .where(F.col("_cum_before") < F.col("mix_target"))
        .drop("_cum_before")
    )
