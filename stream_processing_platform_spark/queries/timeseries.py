"""Time-series queries over the `events` table — OHLC resampling and
gap-filled interpolation (operators/timeseries.py). The reference engine
has windows but no time-series surface; these are the hypertable-style
operations a metrics/tick pipeline runs, each with a full DuckDB oracle
(exact-integer cents arithmetic end to end — CLAUDE.md float rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_platform_spark.operators import timeseries
from stream_processing_platform_spark.registry import query
from stream_processing_platform_spark.tables import load_table

_HOUR_MS = 3_600_000
_SIX_H_MS = 21_600_000


@query(
    "q_ohlc_bars",
    oracle=f"""
    WITH p AS (
      SELECT event_type,
             epoch_ms(ts) // {_HOUR_MS} * {_HOUR_MS} AS bucket_ms,
             CAST(round(value * 100) AS BIGINT) AS c,
             {{'t': epoch_ms(ts), 's': event_id,
               'v': CAST(round(value * 100) AS BIGINT)}} AS pt
      FROM events
    )
    SELECT event_type, bucket_ms,
           (min(pt)).v AS open_c,
           max(c) AS high_c,
           min(c) AS low_c,
           (max(pt)).v AS close_c,
           CAST(sum(c) AS BIGINT) AS sum_c,
           CAST(count(*) AS BIGINT) AS n
    FROM p
    GROUP BY event_type, bucket_ms
    """,
    description="OHLC downsampling: per (event_type, hour) bar with "
    "open/close as argmin/argmax over (ts, event_id) — min(struct)/"
    "max(struct), map-side combining, deterministic tie-break — plus "
    "high/low/volume. Integer cents end to end; one shuffle keyed on "
    "(series, bucket). The candlestick/metrics-rollup primitive.",
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.ohlc_bars(
        e, ts_col="ts", value_col="value", key_cols=["event_type"],
        every_ms=_HOUR_MS, seq_col="event_id",
    )


_OBS_SQL = f"""
      SELECT user_id,
             epoch_ms(ts) // {_SIX_H_MS} * {_SIX_H_MS} AS bucket_ms,
             CAST(floor(sum(CAST(round(value * 100) AS BIGINT)) / count(*) + 0.5)
                  AS BIGINT) AS obs
      FROM events
      GROUP BY user_id, bucket_ms
"""

_GRID_SQL = f"""
      SELECT user_id, unnest(range(mn, mx + 1, {_SIX_H_MS})) AS bucket_ms
      FROM (SELECT user_id, min(bucket_ms) AS mn, max(bucket_ms) AS mx
            FROM obs GROUP BY user_id)
"""


@query(
    "q_gap_fill_locf",
    oracle=f"""
    WITH obs AS ({_OBS_SQL}),
         grid AS ({_GRID_SQL}),
         j AS (
           SELECT g.user_id, g.bucket_ms, o.obs
           FROM grid g LEFT JOIN obs o
             ON o.user_id = g.user_id AND o.bucket_ms = g.bucket_ms
         )
    SELECT user_id, bucket_ms,
           last_value(obs IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY bucket_ms
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents,
           CAST(CASE WHEN obs IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS observed
    FROM j
    """,
    description="Gap-filled per-user series, LOCF fill: densify each "
    "user's 6-hour buckets onto a regular grid between their first and "
    "last observation (sequence+explode where the key lives — no global "
    "calendar), then last-observation-carried-forward via an IGNORE "
    "NULLS window. Grid endpoints are observed, so the fill is never "
    "null. One shuffle on the series key.",
)
def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.gap_fill(
        e, ts_col="ts", value_col="value", key_col="user_id",
        every_ms=_SIX_H_MS, method="locf",
    )


@query(
    "q_gap_fill_linear",
    oracle=f"""
    WITH obs AS ({_OBS_SQL}),
         grid AS ({_GRID_SQL}),
         j AS (
           SELECT g.user_id, g.bucket_ms, o.obs
           FROM grid g LEFT JOIN obs o
             ON o.user_id = g.user_id AND o.bucket_ms = g.bucket_ms
         ),
         n AS (
           SELECT user_id, bucket_ms, obs,
                  last_value(obs IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY bucket_ms
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                  last_value(CASE WHEN obs IS NOT NULL THEN bucket_ms END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY bucket_ms
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
                  first_value(obs IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY bucket_ms
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                  first_value(CASE WHEN obs IS NOT NULL THEN bucket_ms END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY bucket_ms
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
           FROM j
         )
    SELECT user_id, bucket_ms,
           CAST(CASE WHEN obs IS NOT NULL THEN obs
                ELSE floor(pv + (nv - pv) * (bucket_ms - pb) / (nb - pb) + 0.5)
                END AS BIGINT) AS cents,
           CAST(CASE WHEN obs IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS observed
    FROM n
    """,
    description="Gap-filled per-user series, LINEAR fill: empty buckets "
    "interpolate between the neighbouring observations ((nv-pv) scaled "
    "by the time fraction), computed on integer cents with the quotient "
    "rounded via floor(x+0.5) — pure IEEE ops, bit-identical cross-"
    "engine (the CLAUDE.md half-boundary rule). Same grid/window shape "
    "as LOCF; prev/next always exist because grid endpoints are "
    "observed.",
)
def q_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.gap_fill(
        e, ts_col="ts", value_col="value", key_col="user_id",
        every_ms=_SIX_H_MS, method="linear",
    )


_DAY_MS = 86_400_000


@query(
    "q_cohort_retention",
    oracle=f"""
    WITH act AS (SELECT DISTINCT user_id AS u, epoch_ms(ts) // {_DAY_MS} AS b
                 FROM events),
    cohorts AS (SELECT u, min(b) AS cohort FROM act GROUP BY u),
    ret AS (SELECT c.cohort AS cohort_bucket,
                   a.b - c.cohort AS periods_since,
                   CAST(count(*) AS BIGINT) AS active_users
            FROM act a JOIN cohorts c USING (u)
            GROUP BY 1, 2),
    sz AS (SELECT cohort AS cohort_bucket, CAST(count(*) AS BIGINT) AS cohort_size
           FROM cohorts GROUP BY 1)
    SELECT ret.cohort_bucket, ret.periods_since, ret.active_users, sz.cohort_size
    FROM ret JOIN sz USING (cohort_bucket)
    """,
    description="Cohort retention triangle (operators/timeseries.py:"
    "cohort_retention): users cohorted by first-activity DAY, each "
    "(cohort, days-since) cell counting the cohort members active that "
    "day — the standard product-analytics retention matrix. Activity "
    "is distinct-ed per (user, day) first so cells are plain count(*) "
    "(no count-distinct state); user-keyed co-partitioned join, exact "
    "integer output end to end.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.cohort_retention(
        e, ts_col="ts", user_col="user_id", every_ms=_DAY_MS
    )


def ewma_oracle(key_alias: str = "user_id") -> str:
    """The EWMA fold oracle, shared by the batch and LIVE streaming
    queries (generated-oracle doctrine — the fold expression exists
    once; both registrations emit from it)."""
    return f"""
    WITH p AS (
      SELECT user_id,
             {{'t': epoch_ms(ts), 's': event_id,
              'v': CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)}} AS pt
      FROM events
    )
    SELECT user_id AS {key_alias},
           CAST(count(*) AS BIGINT) AS n,
           list_reduce(
             list_transform(list_sort(list(pt)), p -> p.v),
             (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)
           ) AS ewma_c
    FROM p
    GROUP BY user_id
    """


@query(
    "q_ewma",
    oracle=ewma_oracle(),
    description="Per-user EWMA (exponential smoothing, alpha=0.25) over "
    "the user's events in (ts, event_id) order — an ordered per-key "
    "fold (array_sort + aggregate HOF), the recursion no commutative "
    "aggregate expresses. Bit-identical to DuckDB's list_reduce with NO "
    "rounding: integer-cents inputs, identical IEEE op sequence, "
    "first-element init. One shuffle on the key; per-key cost linear "
    "in series length.",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.ewma(
        e, ts_col="ts", value_col="value", key_col="user_id",
        alpha=0.25, seq_col="event_id",
    )


def holt_oracle(key_alias: str = "user_id") -> str:
    """The Holt recursive-CTE oracle, shared by the batch and LIVE
    streaming queries (generated-oracle doctrine)."""
    return f"""
    WITH RECURSIVE p AS (
      SELECT user_id,
             CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts), event_id) AS i
      FROM events
    ),
    sz AS (SELECT user_id, CAST(max(i) AS BIGINT) AS n FROM p GROUP BY user_id),
    rec AS (
      SELECT user_id, i, v AS l, CAST(0.0 AS DOUBLE) AS b FROM p WHERE i = 1
      UNION ALL
      SELECT p.user_id, p.i,
             p.v * CAST(0.5 AS DOUBLE)
               + (rec.l + rec.b) * CAST(0.5 AS DOUBLE) AS l,
             (p.v * CAST(0.5 AS DOUBLE)
               + (rec.l + rec.b) * CAST(0.5 AS DOUBLE) - rec.l)
               * CAST(0.25 AS DOUBLE)
               + rec.b * CAST(0.75 AS DOUBLE) AS b
      FROM rec JOIN p ON p.user_id = rec.user_id AND p.i = rec.i + 1
    )
    SELECT r.user_id AS {key_alias}, sz.n,
           r.l AS level_c,
           r.b AS trend_c,
           r.l + r.b AS forecast_1_c
    FROM rec r JOIN sz ON sz.user_id = r.user_id AND r.i = sz.n
    """


@query(
    "q_holt",
    oracle=holt_oracle(),
    description="Per-user Holt linear (double-exponential) smoothing, "
    "alpha=0.5 beta=0.25 (operators/timeseries.holt): the trend-aware "
    "sibling of q_ewma — same ordered per-key fold, but the "
    "accumulator is a (level, trend) STRUCT. The oracle is a RECURSIVE "
    "CTE stepping each key's sorted series one row at a time with the "
    "identical scalar IEEE op sequence (list_reduce is unusable here: "
    "DuckDB updates struct accumulators field-by-field, so a trend "
    "referencing the old level would see the new one), making "
    "level/trend/one-step forecast bit-identical with no rounding "
    "step. One shuffle on the key.",
)
def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.holt(
        e, ts_col="ts", value_col="value", key_col="user_id",
        alpha=0.5, beta=0.25, seq_col="event_id",
    )


# Holt-Winters constants: binary-exact smoothing weights, weekly-ish
# period. Every float op below is the identical IEEE sequence on both
# engines; the only division (the init mean) divides exact integers.
_HW_A, _HW_B, _HW_G, _HW_M = 0.5, 0.25, 0.25, 7
_HW_NEW_L = (
    f"(p.v - rec.s[1]) * CAST({_HW_A} AS DOUBLE)"
    f" + (rec.l + rec.b) * CAST({1.0 - _HW_A} AS DOUBLE)"
)


def holt_winters_oracle(key_alias: str = "user_id") -> str:
    """The Holt-Winters list-rotating recursive-CTE oracle, shared by
    the batch and LIVE streaming queries (generated-oracle doctrine)."""
    return f"""
    WITH RECURSIVE p AS (
      SELECT user_id,
             CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts), event_id) AS i
      FROM events
    ),
    sz AS (SELECT user_id, CAST(max(i) AS BIGINT) AS n FROM p GROUP BY user_id),
    init AS (
      SELECT user_id,
             list_sum(list(v ORDER BY i) FILTER (i <= {_HW_M}))
               / CAST({_HW_M} AS DOUBLE) AS l0,
             list(v ORDER BY i) FILTER (i <= {_HW_M}) AS firstm
      FROM p GROUP BY user_id
    ),
    rec AS (
      SELECT user_id, CAST({_HW_M} AS BIGINT) AS i, l0 AS l,
             CAST(0.0 AS DOUBLE) AS b,
             list_transform(firstm, x -> x - l0) AS s
      FROM init
      UNION ALL
      SELECT p.user_id, p.i,
             {_HW_NEW_L} AS l,
             (({_HW_NEW_L}) - rec.l) * CAST({_HW_B} AS DOUBLE)
               + rec.b * CAST({1.0 - _HW_B} AS DOUBLE) AS b,
             rec.s[2:{_HW_M}] ||
               [(p.v - ({_HW_NEW_L})) * CAST({_HW_G} AS DOUBLE)
                + rec.s[1] * CAST({1.0 - _HW_G} AS DOUBLE)] AS s
      FROM rec JOIN p ON p.user_id = rec.user_id AND p.i = rec.i + 1
    )
    SELECT r.user_id AS {key_alias}, sz.n,
           r.l AS level_c,
           r.b AS trend_c,
           r.s[1] AS season_1_c,
           r.l + r.b + r.s[1] AS forecast_1_c
    FROM rec r JOIN sz ON sz.user_id = r.user_id AND r.i = sz.n
    WHERE sz.n > {_HW_M}
    """


@query(
    "q_holt_winters",
    oracle=holt_winters_oracle(),
    description=f"Per-user Holt-Winters ADDITIVE seasonal (triple-"
    f"exponential) smoothing, alpha={_HW_A} beta={_HW_B} gamma={_HW_G} "
    f"period={_HW_M} (operators/timeseries.holt_winters): the seasonal "
    f"sibling of q_holt. The fold accumulator carries the rolling "
    f"m-seasonal window as an ARRAY (read s_t-m at the head, rotate, "
    f"append s_t); the oracle is a recursive CTE rotating a LIST column "
    f"through the identical scalar IEEE sequence, textbook l_m=mean/"
    f"b_m=0/s_i=x_i-l_m init — level/trend/seasonal/one-step forecast "
    f"all bit-identical, no rounding. One shuffle on the key.",
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.holt_winters(
        e, ts_col="ts", value_col="value", key_col="user_id",
        alpha=_HW_A, beta=_HW_B, gamma=_HW_G, period=_HW_M, seq_col="event_id",
    )


# --------------------------------------------------------------------------
# ACF + CUSUM (r10): series diagnostics on exact-integer centered
# milli-cents.  Both oracles share one generated CTE prefix (the
# centered series) — one generator, every consumer.
# --------------------------------------------------------------------------

_ACF_MAX_LAG = 5
_CUSUM_KAPPA = 0


def _centered_ctes() -> str:
    """b/st/d: the duckdb twin of operators/timeseries._centered_milli
    over (events, value, event_type, event_id)."""
    return """b AS (SELECT event_type, event_id,
                 CAST(round(value * 100) AS BIGINT) AS c FROM events),
    st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s,
                  CAST(count(*) AS BIGINT) AS n FROM b GROUP BY event_type),
    d AS (SELECT b.event_type, b.event_id,
                 1000 * b.c - CAST(floor(CAST(st.s * 1000 AS DOUBLE)
                     / CAST(st.n AS DOUBLE) + 0.5) AS BIGINT) AS d
          FROM b JOIN st USING (event_type))"""


def _acf_oracle() -> str:
    lead_cols = ",\n               ".join(
        f"lead(d, {k}) OVER w AS l{k}" for k in range(1, _ACF_MAX_LAG + 1)
    )
    ratios = ",\n           ".join(
        f"CASE WHEN sum(d * d) <> 0 THEN "
        f"CAST(floor(CAST(sum(d * l{k}) AS DOUBLE) * 1000000.0"
        f" / CAST(sum(d * d) AS DOUBLE) + 0.5) AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END AS acf{k}_micro"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
    WITH {_centered_ctes()},
    l AS (SELECT event_type, d,
               {lead_cols}
          FROM d WINDOW w AS (PARTITION BY event_type ORDER BY event_id))
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           {ratios}
    FROM l GROUP BY event_type
    """


@query(
    "q_acf",
    oracle=None,  # generated below (_dc_replace) from _ACF_MAX_LAG
    description="Per-series autocorrelation function, lags 1..5 "
    "(operators/timeseries.acf): seasonality/memory diagnostic before "
    "picking window sizes or forecasting models. Exact-integer "
    "centered milli-cents (quantized mean, the kmeans division form), "
    "every sum an order-free BIGINT, one floor-rounded ratio per lag. "
    "Scale shape: one key shuffle feeds one window sort computing ALL "
    "lags via lead() in a single pass, then the per-key aggregate — "
    "no self-join, no per-lag rescan. int64 bound ~9e6 points/series "
    "at cent-scale values (bucket longer series per-day first).",
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.acf(
        e, value_col="value", key_cols=["event_type"], order_col="event_id",
        max_lag=_ACF_MAX_LAG,
    )


def _cusum_oracle() -> str:
    return f"""
    WITH {_centered_ctes()},
    p AS (SELECT event_type, event_id,
                 sum(d - {_CUSUM_KAPPA}) OVER (PARTITION BY event_type
                     ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS p
          FROM d),
    s AS (SELECT event_type, event_id,
                 p - least(CAST(0 AS BIGINT),
                           min(p) OVER (PARTITION BY event_type
                               ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING)) AS s
          FROM p)
    SELECT event_type,
           CAST(-((min({{'ns': -s, 'seq': event_id}})).ns) AS BIGINT) AS s_max,
           CAST((min({{'ns': -s, 'seq': event_id}})).seq AS BIGINT) AS at_seq,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY event_type
    """


@query(
    "q_cusum_changepoint",
    oracle=None,  # generated below (_dc_replace) from _CUSUM_KAPPA
    description="Per-series one-sided CUSUM changepoint estimate "
    "(Page 1954; operators/timeseries.cusum_changepoint): max CUSUM "
    "statistic + its argmax position — the most-likely upward-shift "
    "location and evidence magnitude, threshold-free (scale-stable: "
    "no alarm-rate predicate to go degenerate at larger SF, the q20 "
    "lesson). The sequential max(0, S+a) recursion is replaced by the "
    "prefix-sum identity S_t = P_t - min(0, running_min(P)) — two "
    "stacked window functions over ONE key-partitioned sort, exact "
    "BIGINT end to end, no fold, no Python. Argmax via "
    "min(struct(-s, seq)) (map-side combinable, low-seq tie-break).",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.cusum_changepoint(
        e, value_col="value", key_cols=["event_type"], order_col="event_id",
        kappa_milli=_CUSUM_KAPPA,
    )


_REG_TS = __import__(
    "stream_processing_platform_spark.registry", fromlist=["REGISTRY"]
).REGISTRY
from dataclasses import replace as _dc_replace_ts  # noqa: E402

_REG_TS["q_acf"] = _dc_replace_ts(_REG_TS["q_acf"], oracle=_acf_oracle())
_REG_TS["q_cusum_changepoint"] = _dc_replace_ts(
    _REG_TS["q_cusum_changepoint"], oracle=_cusum_oracle()
)


_STL_PERIOD = 24
_STL_WINDOW = 25


def _seasonal_oracle() -> str:
    h = _STL_WINDOW // 2
    return f"""
    WITH b AS (SELECT event_type, event_id,
                   CAST(round(value * 100) AS BIGINT) AS c FROM events),
    t AS (SELECT event_type,
               (row_number() OVER w - 1) % {_STL_PERIOD} AS phase,
               count(*) OVER (PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING) AS wn,
               1000 * c - CAST(floor(CAST(sum(c) OVER (PARTITION BY event_type
                   ORDER BY event_id
                   ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING) * 1000
                   AS DOUBLE) / CAST(count(*) OVER (PARTITION BY event_type
                   ORDER BY event_id
                   ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)
                   AS DOUBLE) + 0.5) AS BIGINT) AS d
          FROM b
          WINDOW w AS (PARTITION BY event_type ORDER BY event_id))
    SELECT event_type, CAST(phase AS BIGINT) AS phase,
           CAST(floor(CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5)
                AS BIGINT) AS seasonal_milli,
           CAST(count(*) AS BIGINT) AS n
    FROM t WHERE wn = {_STL_WINDOW}
    GROUP BY event_type, phase
    """


@query(
    "q_seasonal_decompose",
    oracle=None,  # generated below from the same (period, window)
    description="Classical seasonal decomposition (the moving-average "
    "half of STL; operators/timeseries.seasonal_decompose): per-series "
    "centered-MA trend (quantized mean over a 25-row window), "
    "detrended residuals, per-phase seasonal indices (period 24) — "
    "integer-exact end to end (cents, quantized divisions, order-free "
    "BIGINT sums). Scale shape: one key sort computes row_number + MA "
    "sum + window count in a single Window pass, then one "
    "(key, phase) map-side-combined aggregate — two shuffles, no "
    "self-join, no per-phase rescan.",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return timeseries.seasonal_decompose(
        e, value_col="value", key_cols=["event_type"], order_col="event_id",
        period=_STL_PERIOD, trend_window=_STL_WINDOW,
    )


_REG_TS["q_seasonal_decompose"] = _dc_replace_ts(
    _REG_TS["q_seasonal_decompose"], oracle=_seasonal_oracle()
)


@query(
    "q_sequence_patterns",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    )
    SELECT event_type AS t1, t2, t3, CAST(count(*) AS BIGINT) AS n
    FROM o WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC
    LIMIT 20
    """,
    description="Sequential pattern mining (SPADE-lite): support counts "
    "of consecutive event-type trigrams per user journey, corpus-wide "
    "top-20 — the behavioral-motif sibling of q_association_rules "
    "(co-occurrence) and q_event_sequence (single-pattern CEP). One "
    "user-keyed sort computes both leads in one window pass, the "
    "trigram aggregate is map-side combined over a tiny key space "
    "(|types|^3), and the top-20 is TakeOrderedAndProject with full "
    "lexicographic tie-break — deterministic at every SF.",
)
def q_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from stream_processing_platform_spark.operators.windows_batch import epoch_ms

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        epoch_ms(F.col("ts")), F.col("event_id")
    )
    o = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t3").isNotNull())
    return (
        o.groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n").desc(), F.col("t1").asc(), F.col("t2").asc(), F.col("t3").asc()
        )
        .limit(20)
    )
