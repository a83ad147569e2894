"""Time-series operators: OHLC resampling and gap-filled interpolation.

The hypertable-style surface a metrics/tick store needs on top of the
tumbling-window batch twin (``operators/windows_batch.py``):

- ``ohlc_bars`` — downsample a point series into bars: open/close via
  ``min(struct(ts, seq, value))`` / ``max(struct(...))`` argmin/argmax
  (map-side combining — never a rank window over the expansion, per the
  profiling rule in CLAUDE.md), high/low/volume as plain aggregates.
  One shuffle keyed on (series, bucket).
- ``gap_fill`` — densify each series onto a regular grid between its
  first and last observed bucket, filling empty buckets by LOCF
  (last-observation-carried-forward) or linear interpolation between
  the neighbouring observations. Shape: each observation expands the
  cells up to its NEXT observation (one ``lead()`` window + one
  ``sequence()`` explode) — no driver loop, no global calendar, no
  grid↔observation join; one shuffle on the series key total. (The
  duckdb oracle keeps the textbook grid + IGNORE-NULLS-window form,
  proving the two formulations equivalent.)

Everything is exact-integer arithmetic end to end (epoch-ms buckets,
money/metric values in integer cents, quotients rounded via
``floor(x + 0.5)``) so the duckdb oracles hash-MATCH bit-for-bit — the
cross-engine float rules from CLAUDE.md.

Scale notes (100 TB): both operators shuffle once on the series key;
grid densification expands to (span/step) rows per key — bounded by the
operator's step parameter, and generated where the key already lives
(sequence+explode after the per-key bounds aggregate), never as a
global calendar broadcast. Skewed keys (one series with a years-long
span) bound their own expansion independently.

The reference engine has no time-series surface (windows only); this is
part of the LLM/analytics extension surface alongside SURVEY.md §7.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.cols import as_col_list
from stream_processing_platform_spark.operators.windows_batch import epoch_ms


def _bucket(ts_ms, every_ms: int):
    return (F.floor(ts_ms / F.lit(every_ms)) * every_ms).cast("long")


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols,
    every_ms: int,
    seq_col: str,
) -> DataFrame:
    """Resample (key, ts, value) points into OHLC bars of ``every_ms``.

    ``seq_col`` breaks ts ties deterministically (any unique id). Values
    are scaled to integer cents before any aggregate, so sums and the
    open/close argmin/argmax are exact cross-engine. Output per (key,
    bucket_ms): open_c/high_c/low_c/close_c/sum_c (BIGINT cents), n.
    """
    keys = as_col_list(key_cols)
    cents = F.round(F.col(value_col) * 100).cast("long")
    ts_ms = epoch_ms(F.col(ts_col))
    pt = F.struct(
        ts_ms.alias("t"), F.col(seq_col).alias("s"), cents.alias("v")
    )
    prepped = df.select(
        *keys, _bucket(ts_ms, every_ms).alias("bucket_ms"), pt.alias("_p"), cents.alias("_c")
    )
    return prepped.groupBy(*[c for c in prepped.columns if c not in ("_p", "_c")]).agg(
        F.min("_p")["v"].alias("open_c"),
        F.max("_c").alias("high_c"),
        F.min("_c").alias("low_c"),
        F.max("_p")["v"].alias("close_c"),
        F.sum("_c").alias("sum_c"),
        F.count("*").alias("n"),
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    every_ms: int,
    method: str = "locf",
) -> DataFrame:
    """Densify each key's series onto an ``every_ms`` grid between its
    first and last observed bucket, and fill empty buckets.

    Observed buckets aggregate to mean value in integer cents
    (``floor(sum(cents)/n + 0.5)`` — exact cross-engine). Fill methods:

    - ``locf``: last observation carried forward. Never null: the grid
      starts at each key's first observed bucket.
    - ``linear``: straight line between the previous and next observed
      buckets, rounded half-up to a cent. Grid endpoints are observed,
      so both neighbours always exist.

    Output: key_col, bucket_ms, cents (BIGINT), observed (0/1 INT).
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown fill method {method!r}")
    cents = F.round(F.col(value_col) * 100).cast("long")
    obs = (
        df.select(
            F.col(key_col), _bucket(epoch_ms(F.col(ts_col)), every_ms).alias("bucket_ms"),
            cents.alias("_c"),
        )
        .groupBy(key_col, "bucket_ms")
        .agg(F.floor(F.sum("_c") / F.count("*") + 0.5).cast("long").alias("_obs"))
    )
    # Gap-to-next expansion: each observed bucket generates the grid
    # cells from itself up to (exclusive) the NEXT observation — one
    # lead() window + one explode, no grid/observation join and no
    # second scan of `obs` (the join form measured ~1.6 s vs ~0.6 s for
    # this shape at sf0.1). The last observation generates only itself,
    # so grid endpoints stay observed and fills are never null.
    w = Window.partitionBy(key_col).orderBy("bucket_ms")
    nxt = obs.select(
        key_col,
        F.col("bucket_ms").alias("_pb"),
        F.col("_obs").alias("_pv"),
        F.lead("bucket_ms").over(w).alias("_nb"),
        F.lead("_obs").over(w).alias("_nv"),
    )
    cells = nxt.select(
        key_col, "_pb", "_pv", "_nb", "_nv",
        F.explode(
            F.sequence(
                F.col("_pb"),
                F.coalesce(F.col("_nb") - every_ms, F.col("_pb")),
                F.lit(every_ms).cast("long"),
            )
        ).alias("bucket_ms"),
    )
    observed = (F.col("bucket_ms") == F.col("_pb")).cast("int")
    if method == "locf":
        # the generating observation IS the last one at or before the cell
        return cells.select(
            key_col, "bucket_ms", F.col("_pv").alias("cents"), observed.alias("observed")
        )
    # Observed rows: the slope term would be 0/0 at _pb — guard with the
    # observed branch instead of dividing.
    interp = F.when(F.col("bucket_ms") == F.col("_pb"), F.col("_pv")).otherwise(
        F.floor(
            F.col("_pv")
            + ((F.col("_nv") - F.col("_pv")) * (F.col("bucket_ms") - F.col("_pb")))
            / (F.col("_nb") - F.col("_pb"))
            + 0.5
        ).cast("long")
    )
    return cells.select(
        key_col, "bucket_ms", interp.cast("long").alias("cents"), observed.alias("observed")
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    every_ms: int,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the time bucket
    of their FIRST activity, and each (cohort, periods-since) cell
    counts how many of them were active that many buckets later — the
    standard product-analytics retention matrix, here over arbitrary
    bucket widths (daily/weekly = 86400000/604800000 ms).

    Scale shape: activity is distinct-ed to one row per (user, bucket)
    FIRST (map-side partial dedup), so the per-cell count is a plain
    count(*) — no count-distinct state; the first-activity aggregate
    and the activity-to-cohort join are both user-keyed (co-partitioned
    shuffles), and the final cell/size aggregates are keyed on the
    small (cohort, period) grid. Everything is exact integer
    arithmetic — no floats anywhere in the output.

    Output: cohort_bucket, periods_since, active_users, cohort_size
    (all BIGINT; periods_since 0 row carries the full cohort).
    """
    bucket = F.floor(epoch_ms(F.col(ts_col)) / F.lit(every_ms)).cast("long")
    activity = df.select(
        F.col(user_col).alias("_u"), bucket.alias("_b")
    ).distinct()
    first = activity.groupBy("_u").agg(F.min("_b").alias("_cohort"))
    ret = (
        activity.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_bucket"),
            (F.col("_b") - F.col("_cohort")).alias("periods_since"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    size = first.groupBy(F.col("_cohort").alias("cohort_bucket")).agg(
        F.count("*").alias("cohort_size")
    )
    return ret.join(size, "cohort_bucket").select(
        "cohort_bucket", "periods_since", "active_users", "cohort_size"
    )


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    alpha: float,
    seq_col: str,
) -> DataFrame:
    """Per-key exponential smoothing: fold each key's points in
    (ts, seq) order through ``s := s*(1-alpha) + x*alpha`` (first point
    initialises ``s``) and emit the final smoothed level.

    EWMA is an inherently ORDERED recursion — no commutative aggregate
    computes it — so the honest distributed shape is: one shuffle on the
    key, sort the key's points (array_sort over (t, seq, v) structs —
    lexicographic, deterministic because seq is unique), then a linear
    sequential fold per key. The per-key array is bounded by the series
    length, the same contract as any collect-within-group operator; for
    unbounded/streaming series the stateful form keeps one scalar per
    key instead (transformWithState).

    Cross-engine exactness: values are scaled to integer cents first,
    and the fold body is the SAME IEEE double op sequence DuckDB's
    ``list_reduce`` runs (mul, mul, add per element, identical order,
    first-element init) — so the result is bit-identical with NO
    rounding step, for any alpha. Pick a binary-exact alpha (0.25,
    0.5) so 1-alpha is exact too.

    Output: key, n (BIGINT), ewma_c (DOUBLE, smoothed cents).
    """
    one_m = 1.0 - alpha
    ts_ms = epoch_ms(F.col(ts_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    pt = F.struct(
        ts_ms.alias("t"), F.col(seq_col).alias("s"),
        cents.cast("double").alias("v"),
    )
    vs = F.transform(F.array_sort(F.collect_list(pt)), lambda p: p["v"])
    folded = F.aggregate(
        vs,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            acc * F.lit(one_m) + x * F.lit(alpha)
        ),
    )
    return df.groupBy(F.col(key_col).alias(key_col)).agg(
        F.count("*").alias("n"), folded.alias("ewma_c")
    )


def holt(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    alpha: float,
    beta: float,
    seq_col: str,
) -> DataFrame:
    """Per-key Holt linear (double-exponential) smoothing — EWMA's
    trend-aware sibling:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}      (l_1 = x_1, b_1 = 0)

    Same ordered-fold shape as :func:`ewma` (one key shuffle,
    array_sort, aggregate HOF), but the accumulator is a (level, trend)
    STRUCT — DuckDB's ``list_reduce`` folds the same struct with the
    same IEEE op sequence, so the result is bit-identical with no
    rounding (pick binary-exact α, β). The new level appears in both
    struct fields; the expression is duplicated textually on BOTH
    engines, so the doubles still agree.

    Output: key, n (BIGINT), level_c, trend_c, forecast_1_c (DOUBLE
    cents; forecast_1 = level + trend, the one-step-ahead forecast).
    """
    a, b = alpha, beta
    one_a, one_b = 1.0 - alpha, 1.0 - beta
    ts_ms = epoch_ms(F.col(ts_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    pt = F.struct(
        ts_ms.alias("t"), F.col(seq_col).alias("s"),
        cents.cast("double").alias("v"),
    )
    vs = F.transform(F.array_sort(F.collect_list(pt)), lambda p: p["v"])
    states = F.transform(
        vs, lambda x: F.struct(x.alias("l"), F.lit(0.0).alias("b"))
    )

    def step(acc, x):
        # new_l appears in both fields: the subtree is duplicated (and
        # re-evaluated) on BOTH engines identically, so values agree
        new_l = x["l"] * F.lit(a) + (acc["l"] + acc["b"]) * F.lit(one_a)
        return F.when(acc["l"].isNull(), x).otherwise(
            F.struct(
                new_l.alias("l"),
                ((new_l - acc["l"]) * F.lit(b) + acc["b"] * F.lit(one_b)).alias("b"),
            )
        )

    init = F.lit(None).cast("struct<l:double,b:double>")
    folded = F.aggregate(states, init, step)
    # materialize the fold ONCE per group; field extraction afterwards
    # (three references to `folded` in agg would run the fold 3×)
    g = df.groupBy(F.col(key_col).alias(key_col)).agg(
        F.count("*").alias("n"), folded.alias("_hb")
    )
    return g.select(
        key_col,
        "n",
        F.col("_hb")["l"].alias("level_c"),
        F.col("_hb")["b"].alias("trend_c"),
        (F.col("_hb")["l"] + F.col("_hb")["b"]).alias("forecast_1_c"),
    )


def holt_winters(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    seq_col: str,
) -> DataFrame:
    """Per-key Holt-Winters ADDITIVE seasonal (triple-exponential)
    smoothing — the seasonal sibling of :func:`holt`:

        l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}

    with the textbook simple initialisation at t = m: l_m = mean of the
    first m points (exact: integer-cents sums are exact doubles in any
    summation order, so the one division is the only float op and both
    engines divide the same integers), b_m = 0, s_i = x_i − l_m.

    Same ordered-fold shape as :func:`holt` (one key shuffle,
    array_sort, aggregate HOF), but the accumulator carries the ROLLING
    SEASONAL WINDOW as an m-element array (oldest first): each step
    reads s_{t−m} at index 1, drops it, appends s_t — the duckdb oracle
    is a recursive CTE rotating a LIST column through the identical
    scalar op sequence, so level/trend/seasonal/forecast are
    bit-identical with NO rounding (pick binary-exact α, β, γ). The
    new-level subtree is textually duplicated into the trend and
    seasonal expressions on BOTH engines (the q_holt doctrine —
    list_reduce's in-order struct-field mutation makes it unusable for
    coupled state).

    Keys with fewer than period+1 points are dropped (not enough data
    to initialise AND step). Output: key, n (BIGINT), level_c, trend_c,
    season_1_c (the next period's seasonal index), forecast_1_c
    (= level + trend + season_1) — DOUBLE cents.
    """
    a, bb, g, m = alpha, beta, gamma, period
    one_a, one_b, one_g = 1.0 - alpha, 1.0 - beta, 1.0 - gamma
    ts_ms = epoch_ms(F.col(ts_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    pt = F.struct(
        ts_ms.alias("t"), F.col(seq_col).alias("s"),
        cents.cast("double").alias("v"),
    )
    vs = F.transform(F.array_sort(F.collect_list(pt)), lambda p: p["v"])
    firstm = F.slice(vs, 1, m)
    l0 = F.aggregate(firstm, F.lit(0.0), lambda acc, x: acc + x) / float(m)
    init = F.struct(
        l0.alias("l"),
        F.lit(0.0).alias("b"),
        F.transform(firstm, lambda x: x - l0).alias("s"),
    )

    def step(acc, x):
        # new_l referenced three times = three textual copies of the
        # subtree, mirrored exactly in the oracle SQL (values agree;
        # only bounded CPU is duplicated)
        new_l = (x - F.element_at(acc["s"], 1)) * F.lit(a) + (
            acc["l"] + acc["b"]
        ) * F.lit(one_a)
        new_b = (new_l - acc["l"]) * F.lit(bb) + acc["b"] * F.lit(one_b)
        new_s = (x - new_l) * F.lit(g) + F.element_at(acc["s"], 1) * F.lit(one_g)
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            F.concat(F.slice(acc["s"], 2, m - 1), F.array(new_s)).alias("s"),
        )

    rest = F.slice(vs, m + 1, F.greatest(F.size(vs) - m, F.lit(0)))
    folded = F.aggregate(rest, init, step)
    grp = df.groupBy(F.col(key_col).alias(key_col)).agg(
        F.count("*").alias("n"), folded.alias("_hw")
    )
    return grp.where(F.col("n") > m).select(
        key_col,
        "n",
        F.col("_hw")["l"].alias("level_c"),
        F.col("_hw")["b"].alias("trend_c"),
        F.element_at(F.col("_hw")["s"], 1).alias("season_1_c"),
        (
            F.col("_hw")["l"] + F.col("_hw")["b"] + F.element_at(F.col("_hw")["s"], 1)
        ).alias("forecast_1_c"),
    )


def _centered_milli(df: DataFrame, value_col: str, key_cols, order_col: str) -> DataFrame:
    """(keys, _seq, _d): per-key mean-centered values in EXACT integer
    milli-cents — d = 1000*cents - floor(1000*sum/n + 0.5).  The
    quantized mean makes centering cross-engine exact (one IEEE double
    division of exact integers, the kmeans_fit_reproducible form);
    everything downstream is integer arithmetic.

    The mean comes from a whole-partition window aggregate, NOT a
    groupBy+join: every consumer (ACF's lead window, CUSUM's running
    windows) already shuffles+sorts on the same key, so the stats ride
    the SAME exchange — one scan, one shuffle total, vs two scans plus
    a broadcast join for the aggregate-then-join form (measured: the
    join plan re-read the parquet)."""
    keys = as_col_list(key_cols)
    key_names = [df.select(k).columns[0] for k in keys]
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(*keys, F.col(order_col).alias("_seq"), cents.alias("_c"))
    # ordered spec with an explicit whole-partition frame: same sort
    # keys as the consumers' running/lead windows, so Catalyst plans
    # ONE Sort for the whole chain (a key-only spec added a second).
    wk = (
        Window.partitionBy(*key_names)
        .orderBy("_seq")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    m = F.floor(
        (F.sum("_c").over(wk) * 1000).cast("double")
        / F.count("*").over(wk).cast("double")
        + F.lit(0.5)
    ).cast("long")
    return base.select(
        *key_names, "_seq", (F.lit(1000) * F.col("_c") - m).alias("_d")
    )


def acf(
    df: DataFrame,
    value_col: str,
    key_cols,
    order_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Per-series autocorrelation function at lags 1..max_lag, on the
    1e-6 grid (acf{k}_micro BIGINT).

    Estimator: r_k = sum(d_t * d_{t+k}) / sum(d_t^2) with d the
    exact-integer centered milli-cents from :func:`_centered_milli` —
    every sum is an exact BIGINT (order-free), the single ratio is
    floor-rounded to micro units.  int64 bound: |d| <= ~1e6 at
    cent-scale values, so sum(d*d) holds to ~9e6 points per series;
    longer series get bucketed (per-day ACF) before this operator.

    Scale shape: ONE key-partitioned shuffle feeds one window sort
    (all max_lag leads computed in the same pass) and the final
    per-key aggregate — no self-join, no per-lag rescan.
    """
    keys = as_col_list(key_cols)
    key_names = [df.select(k).columns[0] for k in keys]
    d = _centered_milli(df, value_col, key_cols, order_col)
    w = Window.partitionBy(*key_names).orderBy("_seq")
    leads = d.select(
        *key_names,
        F.col("_d"),
        *[F.lead("_d", k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    den = F.sum(F.col("_d") * F.col("_d"))
    # A constant-valued series centers to all-zero _d: den == 0 and the
    # ratio is 0/0 = NaN, whose floor/cast differs across engines. Emit
    # the 0 sentinel on both sides (oracle carries the matching
    # CASE WHEN) — no-nullable/no-NaN output invariant.
    aggs = [
        F.when(
            den != F.lit(0),
            F.floor(
                F.sum(F.col("_d") * F.col(f"_l{k}")).cast("double")
                * F.lit(1000000.0)
                / den.cast("double")
                + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias(f"acf{k}_micro")
        for k in range(1, max_lag + 1)
    ]
    return leads.groupBy(*key_names).agg(
        F.count("*").cast("long").alias("n"), *aggs
    )


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    key_cols,
    order_col: str,
    kappa_milli: int = 0,
) -> DataFrame:
    """Per-series one-sided CUSUM statistic (Page 1954) and its argmax —
    the most-likely upward-changepoint location plus evidence magnitude.

    Uses the prefix-sum identity instead of the sequential fold:
    S_t = max(0, S_{t-1} + a_t)  ==  P_t - min(0, min_{j<=t} P_j)
    with a_t = d_t - kappa and P the running sum of a.  That turns the
    inherently-sequential recursion into two stacked window functions
    over ONE key-partitioned sort (running sum, then running min) —
    exact BIGINT arithmetic end to end, no fold, no Python.  Reports
    max(S) per series with its position (min(struct(-s, seq)) argmax —
    map-side combinable, low-seq tie-break).
    """
    keys = as_col_list(key_cols)
    key_names = [df.select(k).columns[0] for k in keys]
    d = _centered_milli(df, value_col, key_cols, order_col)
    w = (
        Window.partitionBy(*key_names)
        .orderBy("_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.select(
        *key_names,
        "_seq",
        F.sum(F.col("_d") - F.lit(kappa_milli)).over(w).alias("_p"),
    )
    s = p.select(
        *key_names,
        "_seq",
        (F.col("_p") - F.least(F.lit(0).cast("long"), F.min("_p").over(w))).alias("_s"),
    )
    best = F.min(F.struct((-F.col("_s")).alias("ns"), F.col("_seq").alias("seq")))
    return s.groupBy(*key_names).agg(
        (-best["ns"]).alias("s_max"),
        best["seq"].alias("at_seq"),
        F.count("*").cast("long").alias("n"),
    )


def seasonal_decompose(
    df: DataFrame,
    value_col: str,
    key_cols,
    order_col: str,
    period: int = 24,
    trend_window: int = 25,
) -> DataFrame:
    """Classical seasonal decomposition (the moving-average half of
    STL): per-series centered-MA trend, then per-phase seasonal
    indices over the detrended residuals — the seasonality profile a
    metrics pipeline stores next to its rollups.

    Integer doctrine end to end: cents -> trend = quantized mean of
    the centered window (floor(sum*1000/w + 0.5), exact BIGINT sum,
    one IEEE division), detrended d = 1000*c - trend (exact ints),
    seasonal index = quantized per-(key, phase) mean of d.  Rows
    without a full trend window are excluded (count-over-window gate),
    matching the textbook estimator.  Phase = per-series row_number %
    period (order-based, deterministic).

    Scale shape: ONE key-partitioned sort carries row_number, the MA
    sum and the window count in a single Window pass, then one
    (key, phase)-keyed map-side-combined aggregate — two shuffles
    total, no self-join, no per-phase rescan.
    """
    if trend_window % 2 == 0:
        raise ValueError("trend_window must be odd (centered MA)")
    h = trend_window // 2
    keys = as_col_list(key_cols)
    key_names = [df.select(k).columns[0] for k in keys]
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(*keys, F.col(order_col).alias("_seq"), cents.alias("_c"))
    wo = Window.partitionBy(*key_names).orderBy("_seq")
    wma = wo.rowsBetween(-h, h)
    trend = F.floor(
        (F.sum("_c").over(wma) * 1000).cast("double")
        / F.count("*").over(wma).cast("double")
        + F.lit(0.5)
    ).cast("long")
    rows = base.select(
        *key_names,
        ((F.row_number().over(wo) - 1) % period).alias("phase"),
        F.count("*").over(wma).alias("_wn"),
        (F.lit(1000) * F.col("_c") - trend).alias("_d"),
    ).where(F.col("_wn") == trend_window)
    return rows.groupBy(*key_names, "phase").agg(
        F.floor(
            F.sum("_d").cast("double") / F.count("*").cast("double") + F.lit(0.5)
        )
        .cast("long")
        .alias("seasonal_milli"),
        F.count("*").cast("long").alias("n"),
    )
