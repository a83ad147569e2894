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


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n_picks: int,
    id_col: str = "doc_id",
    bucket_size: int = 10_000,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling — the
    sampling half of corpus construction (pick ~``n_picks`` documents
    with inclusion probability ∝ token weight, e.g. for token-budgeted
    eval subsets): classic systematic PPS over the cumulative weight
    axis, entirely in EXACT integer arithmetic (no RNG, no floats) so
    the draw is reproducible across engines, runs, and cluster sizes,
    and the duckdb oracle hash-MATCHes.

    A document with cumulative range (cum−w, cum] receives
    ``picks = (cum·N) div total − ((cum−w)·N) div total`` — its exact
    share of the N evenly-spaced selection points. The per-document
    count telescopes: ``sum(picks) == N`` EXACTLY (heavier-than-stride
    documents get multiplicity > 1, the standard PPS-with-replacement
    convention). Bound: cum·N must fit int64 — fine up to ~10^12 total
    tokens × 10^6 picks.

    The cumulative sum is the distributed two-phase prefix: bucket by
    ``id div bucket_size`` (assumes roughly-uniform id density — dense
    surrogate ids; pre-rank arbitrary keys first), per-bucket totals,
    prefix offsets over the SMALL bucket table (one-partition window
    over n_buckets rows — bounded, like a broadcast recipe), then a
    within-bucket window riding one bucket-keyed shuffle. Never a
    global single-partition window over the corpus.

    Output: id_col, weight, picks (rows with picks > 0 only).
    """
    if n_picks <= 0:
        raise ValueError("n_picks must be >= 1")
    w = F.col(weight_col).cast("long")
    base = df.select(
        F.col(id_col),
        w.alias("_w"),
        F.expr(f"`{id_col}` div {int(bucket_size)}").alias("_bk"),
    ).where(F.col("_w") > 0)
    bt = base.groupBy("_bk").agg(F.sum("_w").alias("_bt"))
    w_pref = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bt.select(
        "_bk",
        F.coalesce(F.sum("_bt").over(w_pref), F.lit(0)).alias("_off"),
    )
    totals = bt.agg(F.sum("_bt").alias("_total"))
    w_in = Window.partitionBy("_bk").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (F.col("_off") + F.sum("_w").over(w_in)).alias("_cum")
    scored = (
        base.join(F.broadcast(offsets), "_bk")
        .select(id_col, "_w", cum)
        .crossJoin(F.broadcast(totals))
    )
    picks = F.expr(f"(_cum * {int(n_picks)}) div _total") - F.expr(
        f"((_cum - _w) * {int(n_picks)}) div _total"
    )
    return (
        scored.withColumn("picks", picks)
        .where(F.col("picks") > 0)
        .select(id_col, F.col("_w").alias("weight"), "picks")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Weighted random sampling without replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): keep the k items with the largest
    u_i^(1/w_i), u_i deterministic in (0,1) — equivalently the k
    SMALLEST exponential-race keys -ln(u_i)/w_i.

    Reproducible-sampling doctrine (the r9 ANN recipe): u_i derives
    from the overflow-safe Knuth mix of the id (clustering.py:
    repro_hash_col — xxhash64 has no SQL twin), the only transcendental
    (ln) is floor-rounded to the 1e-9 grid BEFORE the rank, ties break
    on id — both engines pick the identical sample.  Zero-weight rows
    are excluded (their key diverges).

    Scale shape: a pure row-map then a global top-k — Spark plans
    TakeOrderedAndProject (per-partition partial top-k merged on the
    driver), never a full sort; the 100 TB cost is one scan.
    """
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        repro_hash_col,
    )

    h = repro_hash_col(F.col(id_col), salt=salt)
    u = (h + 1).cast("double") / F.lit(float(REPRO_INIT_MOD + 1))
    key = F.floor(
        -F.ln(u) / F.col(weight_col).cast("double") * F.lit(1000000000.0) + F.lit(0.5)
    ).cast("long")
    return (
        df.where(F.col(weight_col) > 0)
        .select(id_col, F.col(weight_col).alias("weight"), key.alias("key_nano"))
        .orderBy(F.col("key_nano").asc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_sample_sql(
    table: str, id_col: str, weight_col: str, k: int, salt: int = 0
) -> str:
    """duckdb twin of :func:`weighted_sample`, generated from the same
    constants (one generator, every consumer)."""
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        repro_hash_sql,
    )

    h = repro_hash_sql(id_col, salt=salt)
    u = f"(({h}) + 1) / CAST({REPRO_INIT_MOD + 1} AS DOUBLE)"
    key = (
        f"CAST(floor(-ln({u}) / CAST({weight_col} AS DOUBLE)"
        f" * 1000000000.0 + 0.5) AS BIGINT)"
    )
    return f"""
    SELECT {id_col}, CAST({weight_col} AS BIGINT) AS weight,
           {key} AS key_nano
    FROM {table}
    WHERE {weight_col} > 0
    ORDER BY key_nano ASC, {id_col} ASC
    LIMIT {k}
    """


def temperature_mixture(
    df: DataFrame,
    budget_tokens: int,
    token_col: str,
    source_col: str = "source",
    order_col: str = "doc_id",
    hash_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled mixture (the XLM-R/mT5 alpha-sampling rule):
    source weights derive from the corpus itself as ``n_s ** 0.5``
    instead of a hand recipe — tail sources are upweighted relative to
    their raw share, the standard fix for head-language domination in
    multilingual/multi-domain training sets.

    Alpha is fixed at 0.5 because ``sqrt`` is IEEE exact-rounded on
    every engine (``pow`` is not), so ``floor(sqrt(n_s) * 1000)`` is a
    bit-identical BIGINT weight cross-engine — the no-float-divergence
    doctrine. Targets use staged integer division (the q_dsir_weights
    rule): exact under ANSI while ``total_w^2 < 2^63`` — total_w is
    ~1000*sqrt(corpus tokens), so the bound holds to ~10^12-token
    corpora per thousand sources; beyond that, shift weights down
    before summing.

    Admission then follows :func:`corpus_mixture`'s shape — one window
    shuffle per source in fingerprint order, boundary doc admitted
    whole. Returns kept rows with ``weight_milli`` and ``mix_target``
    attached. Everything stays distributed: the per-source weight table
    (|sources| rows) is broadcast back, never collected."""
    counts = df.groupBy(source_col).agg(F.sum(token_col).alias("_n_s"))
    w = counts.select(
        source_col,
        F.floor(F.sqrt(F.col("_n_s")) * 1000).cast("long").alias("weight_milli"),
    )
    total = w.agg(F.sum("weight_milli").alias("_total_w"))
    recipe = (
        w.join(F.broadcast(total))
        .select(
            source_col,
            "weight_milli",
            (
                F.col("weight_milli") * F.expr(f"{budget_tokens} div _total_w")
                + F.expr(
                    f"weight_milli * ({budget_tokens} % _total_w) div _total_w"
                )
            ).alias("mix_target"),
        )
    )
    order = (
        [F.col(hash_col).asc(), F.col(order_col).asc()]
        if hash_col
        else [F.col(order_col).asc()]
    )
    win = (
        Window.partitionBy(source_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.join(F.broadcast(recipe), source_col)
        .withColumn("_cum_before", F.coalesce(F.sum(token_col).over(win), F.lit(0)))
        .where(F.col("_cum_before") < F.col("mix_target"))
        .drop("_cum_before")
    )
