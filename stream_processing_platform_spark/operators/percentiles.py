"""Percentile aggregates with the scale guards learned by profiling.

Two rules this module encodes once (previously living only in
q_percentiles' docstring):

1. **Composite-key bounding (exact path).** Spark's exact
   ``percentile`` buffers EVERY value of a group in one aggregation
   buffer on one executor. The group key must therefore bound the
   largest group: 3 coarse groups each buffering a third of a 100 TB
   table is an executor-OOM, while (flag, year) caps any buffer at a
   day's-worth scale. ``exact_percentiles`` refuses an empty grouping
   unless the caller passes ``allow_global=True`` and answers for the
   buffer — the true 100 TB path is ``approx_percentiles`` (t-digest
   style sketch: fixed-size mergeable state, map-side partials).

2. **Integer-cents interpolation (cross-engine exactness).**
   Interpolating raw 2dp doubles lands medians on .005 boundaries where
   engines' rounding diverges; percentiles over ``round(x * 100)``
   interpolate between integer-valued doubles, which is exact, so both
   engines round the SAME double (CLAUDE.md invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.cols import as_col_list
from stream_processing_platform_spark.partitioning import ensure_min_parallelism


def _scaled(value_col: str, scale_decimals: int) -> Column:
    return F.round(F.col(value_col) * float(10**scale_decimals), 0)


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    probs: dict[str, float],
    group_cols: list[Column | str],
    scale_decimals: int = 2,
    out_decimals: int = 2,
    allow_global: bool = False,
) -> DataFrame:
    """Exact interpolated percentiles (``percentile`` ≡ duckdb
    ``quantile_cont``) over integer-scaled values, grouped by a
    composite key that must bound per-group buffer size.

    ``probs`` maps output alias → quantile. Output: group cols +
    one rounded column per prob + ``n``.
    """
    if not group_cols and not allow_global:
        raise ValueError(
            "exact_percentiles without a grouping key buffers the ENTIRE "
            "input in one aggregation buffer — pass allow_global=True only "
            "if the input is provably small, or use approx_percentiles"
        )
    scaled = _scaled(value_col, scale_decimals)
    div = float(10**scale_decimals)
    aggs = [
        F.round(F.percentile(scaled, F.lit(p)) / div, out_decimals).alias(alias)
        for alias, p in probs.items()
    ]
    # map-side partials parallelize the gather; the final per-group sort
    # is the bounded part — widen narrow single-file scans first
    return ensure_min_parallelism(df).groupBy(*group_cols).agg(
        *aggs, F.count("*").alias("n")
    )


def approx_percentiles(
    df: DataFrame,
    value_col: str,
    probs: dict[str, float],
    group_cols: list[Column | str],
    accuracy: int = 10000,
    scale_decimals: int = 2,
    out_decimals: int = 2,
) -> DataFrame:
    """The 100 TB order-statistics path: ``approx_percentile`` sketch —
    fixed-size mergeable state, any grouping (or none) is safe. Same
    output surface as :func:`exact_percentiles`."""
    scaled = _scaled(value_col, scale_decimals)
    div = float(10**scale_decimals)
    pct = F.approx_percentile(
        scaled, F.array(*[F.lit(p) for p in probs.values()]), F.lit(accuracy)
    )
    aggs = [
        F.round(F.element_at(pct, i + 1) / div, out_decimals).alias(alias)
        for i, alias in enumerate(probs)
    ]
    return ensure_min_parallelism(df).groupBy(*group_cols).agg(
        *aggs, F.count("*").alias("n")
    )


def exact_percentiles_distributed(
    df: DataFrame,
    value_col: str,
    probs: dict[str, float],
    group_cols: list[Column | str],
    scale_decimals: int = 2,
    histogram: bool = False,
) -> DataFrame:
    """Exact interpolated percentiles with NO per-group memory buffer —
    the distributed order-statistics form that removes
    ``exact_percentiles``' composite-key restriction.

    Default shape: one partition-keyed window SORT (Tungsten external
    sort — spillable, no group-size memory bound) assigns ranks and
    group counts in a single shuffle; conditional ``min(CASE rank =
    pos)`` aggregates then pick the two bracketing order statistics per
    quantile (constant-size state, map-side combinable) and the
    read-time select interpolates ``lo + frac·(hi − lo)`` exactly as
    ``quantile_cont`` defines (h = (n−1)·q). So a single group CAN be
    the whole table: the cost is a sort, never an executor OOM. Exact
    cross-engine: integer-scaled values, the same IEEE mul/sub/add
    sequence per engine, ``floor(x+0.5)`` final rounding.

    ``histogram=True`` (r15) first aggregates a ``(keys, value)`` COUNT
    histogram — map-side combinable — and runs the cumulative window
    over DISTINCT values only: the order statistic at rank k is the
    smallest value whose running count reaches k, so the output is
    value-identical (ties share one histogram row). Choose it when the
    value grid saturates (duplication high — e.g. a whole-corpus group
    over few distinct scores), where it shrinks both the shuffle and
    the sort by the duplication factor. On near-unique values the extra
    aggregate+exchange is pure overhead (measured +50% on the sf0.1
    money columns, whose synthetic prices are ~all distinct — ratio
    1.00), so it is NOT the default; the advertised 100 TB quantile
    path remains sketch_verified_percentiles, which never sorts the
    corpus at all.

    Output: group cols + one BIGINT scaled-integer column per
    ``probs`` alias + ``n``.
    """
    from pyspark.sql import Window

    base = df.select(
        *as_col_list(group_cols),
        _scaled(value_col, scale_decimals).cast("long").alias("_c"),
    )
    keys = [c for c in base.columns if c != "_c"]
    if histogram:
        hist = base.groupBy(*keys, "_c").agg(F.count("*").alias("_f"))
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_c").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wn = Window.partitionBy(*keys)
        r = hist.select(
            *keys,
            "_c",
            F.sum("_f").over(w).alias("_cum"),
            F.sum("_f").over(wn).alias("_n"),
        )
        rank_col = F.col("_cum")
        cmp = lambda rank, pos: rank >= pos  # noqa: E731
    else:
        w = Window.partitionBy(*keys).orderBy(F.col("_c").asc())
        wn = Window.partitionBy(*keys)
        r = base.select(
            *keys,
            "_c",
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(wn).alias("_n"),
        )
        rank_col = F.col("_rn")
        cmp = lambda rank, pos: rank == pos  # noqa: E731
    agg_exprs = [F.max("_n").alias("_gn")]
    for alias, p in probs.items():
        lo_rn = F.floor((F.col("_n") - 1) * F.lit(p)).cast("long") + 1
        agg_exprs.append(
            F.min(F.when(cmp(rank_col, lo_rn), F.col("_c"))).alias(f"_lo_{alias}")
        )
        agg_exprs.append(
            F.min(F.when(cmp(rank_col, lo_rn + 1), F.col("_c"))).alias(f"_hi_{alias}")
        )
    g = r.groupBy(*keys).agg(*agg_exprs)
    outs = []
    for alias, p in probs.items():
        h = (F.col("_gn") - 1) * F.lit(p)
        frac = h - F.floor(h)
        lo = F.col(f"_lo_{alias}").cast("double")
        hi = F.coalesce(F.col(f"_hi_{alias}"), F.col(f"_lo_{alias}")).cast("double")
        outs.append(
            F.floor(lo + frac * (hi - lo) + F.lit(0.5)).cast("long").alias(alias)
        )
    return g.select(*keys, *outs, F.col("_gn").cast("long").alias("n"))


def sketch_verified_percentiles(
    df: DataFrame,
    value_col: str,
    probs: dict[str, float],
    group_cols: list[Column | str],
    accuracy: int = 10000,
    scale_decimals: int = 2,
    margin: int = 8,
) -> DataFrame:
    """Sketch-then-verify EXACT quantiles — the heavy-hitters doctrine
    (operators/sketches.py) applied to order statistics, which is what
    lets ``q_approx_percentile`` carry a full duckdb oracle despite the
    sketch (r9 verdict ask #7).

    Pass 0 (count): per-group row counts, key-only scan (column-pruned,
    shuffles k rows, driver state = k counts — the bounded-model-state
    pattern). Needed because the bracket margin must be ABSOLUTE in
    rank, not just relative: for a group with n << accuracy the
    relative margin shifts the target rank by < 1 row while the
    sketch's rank-rounding convention can still be off by one — the
    exactness pytest caught a real bracket miss at n=1004. With
    ``eps = max(margin/accuracy, 4/min_n)`` every group gets
    ``n·eps >= eps_rank·n + 2`` of cushion (proof in the pytest
    docstring's terms: GK rank error is n/accuracy, convention slop
    <= 1, so >= 2 spare ranks suffice; 4 gives 2x).

    Pass 1 (sketch): per group, one ``approx_percentile`` call brackets
    each target quantile at ``p ± eps`` (clamped). Fixed-size mergeable
    state, map-side partials — the 100 TB shape.

    Pass 2 (verify): one more scan computes, per group, the EXACT count
    strictly below each bracket (conditional sums — map-side combined)
    and sorts ONLY the in-bracket candidates (~2·margin·n/accuracy rows
    per prob, e.g. 0.16% of a group at the defaults) in a keyed window;
    ``min(CASE global_rank = pos)`` picks the two bracketing order
    statistics and the read-time select interpolates exactly as
    ``quantile_cont`` defines. The full corpus is never sorted.

    A bracket miss (impossible within the sketch's error contract)
    surfaces as a -1 sentinel, never a null — loud in the driver
    compare, and sortable (the no-nullable-columns invariant).

    Output: group cols + one BIGINT scaled-integer column per ``probs``
    alias + ``n`` — identical to ``exact_percentiles_distributed``
    (a pytest pins them equal row-for-row).
    """
    from pyspark.sql import Window

    # ensure_min_parallelism measured FASTER here (1.53 vs 1.85 s at
    # sf0.1) despite the extra exchange: base feeds three scan->agg
    # passes, and on the single-row-group testdata each would otherwise
    # run as ONE task — the exception that proves the CLAUDE.md
    # scan->agg rule (three consumers amortize one widening shuffle).
    # No-op on properly laid-out data at scale.
    base = ensure_min_parallelism(
        df.select(
            *as_col_list(group_cols),
            _scaled(value_col, scale_decimals).cast("long").alias("_c"),
        )
    )
    keys = [c for c in base.columns if c != "_c"]
    pl = list(probs.items())
    cnt_rows = base.groupBy(*keys).count().collect()  # k rows — bounded
    min_n = min((r["count"] for r in cnt_rows), default=1)
    eps = max(margin / float(accuracy), 4.0 / max(min_n, 1))
    qprobs: list[float] = []
    for _, p in pl:
        qprobs += [max(0.0, p - eps), min(1.0, p + eps)]
    sk = base.groupBy(*keys).agg(
        F.count("*").alias("_n"),
        F.approx_percentile(
            "_c", F.array(*[F.lit(q) for q in qprobs]), F.lit(accuracy)
        ).alias("_b"),
    )
    bounds = sk.select(
        *keys,
        "_n",
        *[
            e
            for i, (a, _) in enumerate(pl)
            for e in (
                F.element_at("_b", 2 * i + 1).alias(f"_vlo_{a}"),
                F.element_at("_b", 2 * i + 2).alias(f"_vhi_{a}"),
            )
        ],
    )
    # one row per group — always broadcast (AQE sees only small-SF sizes)
    j = base.join(F.broadcast(bounds), keys)
    # exact base ranks: rows strictly below each bracket, same scan.
    # The aggregate CARRIES the brackets and _n forward (first() of a
    # per-group constant) so the candidate pass below joins this ONE
    # k-row relation instead of re-joining `bounds` — without it the
    # whole sketch subtree is a second consumer of `j` and Catalyst
    # re-computes it per consumer (measured: the t-digest scan+agg
    # appeared twice in the plan, plus a third count-only scan for _n).
    nb = j.groupBy(*keys).agg(
        F.first("_n").alias("_n"),
        *[F.first(f"_vlo_{a}").alias(f"_vlo_{a}") for a, _ in pl],
        *[F.first(f"_vhi_{a}").alias(f"_vhi_{a}") for a, _ in pl],
        *[
            F.sum(F.when(F.col("_c") < F.col(f"_vlo_{a}"), 1).otherwise(0))
            .cast("long")
            .alias(f"_nb_{a}")
            for a, _ in pl
        ],
    )
    matched = F.array_compact(
        F.array(
            *[
                F.when(
                    (F.col("_c") >= F.col(f"_vlo_{a}"))
                    & (F.col("_c") <= F.col(f"_vhi_{a}")),
                    F.lit(i),
                )
                for i, (a, _) in enumerate(pl)
            ]
        )
    )
    cand = (
        base.join(F.broadcast(nb), keys)
        .select(*keys, "_c", "_n", matched.alias("_pis"),
                *[F.col(f"_nb_{a}") for a, _ in pl])
        .where(F.size("_pis") > 0)
        .select(*keys, "_c", "_n", F.explode("_pis").alias("_pi"),
                *[F.col(f"_nb_{a}") for a, _ in pl])
    )
    w = Window.partitionBy(*keys, "_pi").orderBy(F.col("_c").asc())
    p_of = F.lit(None).cast("double")
    nb_of = F.lit(None).cast("long")
    for i, (a, p) in enumerate(pl):
        p_of = F.when(F.col("_pi") == i, F.lit(float(p))).otherwise(p_of)
        nb_of = F.when(F.col("_pi") == i, F.col(f"_nb_{a}")).otherwise(nb_of)
    lo_rn = F.floor((F.col("_n") - 1) * p_of).cast("long") + 1
    grank = nb_of + F.row_number().over(w)
    picked = (
        cand.select(
            *keys, "_pi", "_c", "_n", lo_rn.alias("_lr"), grank.alias("_gr")
        )
        .groupBy(*keys, "_pi")
        .agg(
            F.min(F.when(F.col("_gr") == F.col("_lr"), F.col("_c"))).alias("_lo"),
            F.min(F.when(F.col("_gr") == F.col("_lr") + 1, F.col("_c"))).alias("_hi"),
            F.first("_n").alias("_n"),
        )
    )
    outs = []
    for i, (a, p) in enumerate(pl):
        h = (F.col("_n") - 1) * F.lit(float(p))
        frac = h - F.floor(h)
        lo = F.col(f"_l_{i}").cast("double")
        hi = F.coalesce(F.col(f"_h_{i}"), F.col(f"_l_{i}")).cast("double")
        outs.append(
            F.coalesce(
                F.floor(lo + frac * (hi - lo) + F.lit(0.5)).cast("long"), F.lit(-1)
            ).alias(a)
        )
    wide = picked.groupBy(*keys).agg(
        *[
            e
            for i in range(len(pl))
            for e in (
                F.min(F.when(F.col("_pi") == i, F.col("_lo"))).alias(f"_l_{i}"),
                F.min(F.when(F.col("_pi") == i, F.col("_hi"))).alias(f"_h_{i}"),
            )
        ],
        F.first("_n").alias("_n"),
    )
    return wide.select(*keys, *outs, F.col("_n").cast("long").alias("n"))
