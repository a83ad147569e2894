"""operators/timeseries.py edge cases the sf oracles can't isolate:
single-observation keys, fully dense series, tie-breaking in OHLC, and
linear-vs-locf agreement on observed rows."""

from __future__ import annotations

import datetime as dt

import pytest

from stream_processing_platform_spark.operators.timeseries import gap_fill, ohlc_bars

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, minutes_after_t0, user_id, value)"""
    data = [
        (eid, _T0 + dt.timedelta(minutes=m), uid, "x", v, "{}")
        for eid, m, uid, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )


MIN_MS = 60_000


def test_ohlc_open_close_tie_break_on_seq(spark):
    # two points with the SAME timestamp: seq (event_id) must decide
    df = _events(spark, [(1, 0, 1, 5.0), (2, 0, 1, 9.0), (3, 1, 1, 7.0)])
    [bar] = ohlc_bars(
        df, "ts", "value", ["user_id"], every_ms=5 * MIN_MS, seq_col="event_id"
    ).collect()
    assert bar.open_c == 500  # event_id 1 wins the ts tie
    assert bar.close_c == 700
    assert bar.high_c == 900 and bar.low_c == 500
    assert bar.n == 3 and bar.sum_c == 2100


def test_gap_fill_single_observation_key(spark):
    # one observation -> grid is exactly one bucket, no nulls, no divide-by-zero
    df = _events(spark, [(1, 0, 7, 3.25)])
    for method in ("locf", "linear"):
        [row] = gap_fill(df, "ts", "value", "user_id", MIN_MS, method).collect()
        assert (row.user_id, row.cents, row.observed) == (7, 325, 1)


def test_gap_fill_locf_carries_forward(spark):
    df = _events(spark, [(1, 0, 1, 10.0), (2, 3, 1, 40.0)])
    rows = sorted(
        gap_fill(df, "ts", "value", "user_id", MIN_MS, "locf").collect(),
        key=lambda r: r.bucket_ms,
    )
    assert [r.cents for r in rows] == [1000, 1000, 1000, 4000]
    assert [r.observed for r in rows] == [1, 0, 0, 1]


def test_gap_fill_linear_interpolates_half_up(spark):
    # 10.00 -> 40.01 over 3 buckets: exact thirds round half-up per cent
    df = _events(spark, [(1, 0, 1, 10.00), (2, 3, 1, 40.01)])
    rows = sorted(
        gap_fill(df, "ts", "value", "user_id", MIN_MS, "linear").collect(),
        key=lambda r: r.bucket_ms,
    )
    # slope = 3001 cents / 3 buckets = 1000.333..; floor(x + .5) per bucket
    assert [r.cents for r in rows] == [1000, 2000, 3001, 4001]


def test_gap_fill_dense_series_untouched(spark):
    # observations in every bucket: both methods return the observed means
    df = _events(spark, [(i, i, 1, float(i + 1)) for i in range(4)])
    for method in ("locf", "linear"):
        rows = sorted(
            gap_fill(df, "ts", "value", "user_id", MIN_MS, method).collect(),
            key=lambda r: r.bucket_ms,
        )
        assert [r.cents for r in rows] == [100, 200, 300, 400]
        assert all(r.observed == 1 for r in rows)


def test_gap_fill_multi_key_independent_grids(spark):
    # keys with different spans build disjoint grids (no global calendar)
    df = _events(spark, [(1, 0, 1, 1.0), (2, 2, 1, 3.0), (3, 10, 2, 5.0)])
    rows = gap_fill(df, "ts", "value", "user_id", MIN_MS, "locf").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    assert len(by_key[1]) == 3 and len(by_key[2]) == 1


def test_gap_fill_unknown_method_raises(spark):
    df = _events(spark, [(1, 0, 1, 1.0)])
    with pytest.raises(ValueError, match="unknown fill method"):
        gap_fill(df, "ts", "value", "user_id", MIN_MS, "spline")


def test_ohlc_bucket_mean_aggregation_in_gap_fill(spark):
    # two observations in one bucket average (half-up) before filling
    df = _events(spark, [(1, 0, 1, 1.00), (2, 0, 1, 2.01)])
    [row] = gap_fill(df, "ts", "value", "user_id", MIN_MS, "locf").collect()
    assert row.cents == 151  # (100 + 201) / 2 = 150.5 -> 151


def test_cohort_retention_triangle(spark):
    """Synthetic 2-cohort fixture: the period-0 cell always equals the
    cohort size, later cells count only returning users, and a user's
    cohort is their FIRST bucket even when they skip periods."""
    from datetime import datetime

    from stream_processing_platform_spark.operators.timeseries import cohort_retention

    day = 86_400_000

    def ts(d):
        return datetime(2024, 1, 1 + d)

    rows = [
        # cohort day0: users 1,2,3; user1 returns d1+d2, user2 returns d2, user3 never
        (1, ts(0)), (1, ts(1)), (1, ts(2)),
        (2, ts(0)), (2, ts(2)),
        (3, ts(0)), (3, ts(0)),  # duplicate same-day activity collapses
        # cohort day1: user 4 only
        (4, ts(1)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r.cohort_bucket, r.periods_since): (r.active_users, r.cohort_size)
        for r in cohort_retention(df, "ts", "user_id", day).collect()
    }
    c0 = min(k[0] for k in got)
    assert got[(c0, 0)] == (3, 3)
    assert got[(c0, 1)] == (1, 3)
    assert got[(c0, 2)] == (2, 3)
    assert got[(c0 + 1, 0)] == (1, 1)
    assert set(got) == {(c0, 0), (c0, 1), (c0, 2), (c0 + 1, 0)}


def test_ewma_hand_computed_fold_order(spark):
    from stream_processing_platform_spark.operators.timeseries import ewma

    # values 4.0, 8.0, 16.0 cents->400,800,1600; alpha=.25:
    # s1=400, s2=400*.75+800*.25=500, s3=500*.75+1600*.25=775
    df = _events(spark, [(1, 0, 1, 4.0), (2, 1, 1, 8.0), (3, 2, 1, 16.0)])
    [row] = ewma(df, "ts", "value", "user_id", alpha=0.25, seq_col="event_id").collect()
    assert row.n == 3 and row.ewma_c == 775.0


def test_ewma_ties_broken_by_seq_and_single_point(spark):
    from stream_processing_platform_spark.operators.timeseries import ewma

    # same ts: event_id order decides the fold sequence; lone key passes through
    df = _events(spark, [(2, 0, 1, 8.0), (1, 0, 1, 4.0), (9, 0, 2, 12.0)])
    rows = {
        r.user_id: r
        for r in ewma(df, "ts", "value", "user_id", alpha=0.25, seq_col="event_id").collect()
    }
    assert rows[1].ewma_c == 400 * 0.75 + 800 * 0.25  # id 1 first, then id 2
    assert rows[2].n == 1 and rows[2].ewma_c == 1200.0


def test_holt_hand_computed_level_and_trend(spark):
    from stream_processing_platform_spark.operators.timeseries import holt

    # cents 100,200,300; alpha=.5 beta=.25:
    # l1=100,b1=0; l2=150,b2=12.5; l3=231.25,b3=29.6875
    df = _events(spark, [(1, 0, 1, 1.0), (2, 1, 1, 2.0), (3, 2, 1, 3.0)])
    [r] = holt(df, "ts", "value", "user_id", alpha=0.5, beta=0.25,
               seq_col="event_id").collect()
    assert (r.n, r.level_c, r.trend_c) == (3, 231.25, 29.6875)
    assert r.forecast_1_c == 231.25 + 29.6875


def test_holt_winters_matches_python_reference(spark):
    """Triple exponential smoothing vs a literal pure-Python transcription
    of the recurrence (the oracle is a third, SQL transcription): the
    rolling seasonal array must rotate correctly, the init must be the
    textbook l_m=mean / b_m=0 / s_i=x_i−l_m, and every output is
    bit-equal (==, not approx). Keys with n <= m are dropped."""
    from stream_processing_platform_spark.operators.timeseries import holt_winters

    a, b, g, m = 0.5, 0.25, 0.25, 3
    vals = [1.0, 2.0, 3.0, 2.5, 1.5, 3.5, 4.0, 2.0]
    rows = [(i + 1, i, 1, v) for i, v in enumerate(vals)]
    rows += [(100 + i, i, 2, 9.9) for i in range(m)]  # user 2: only m points
    df = _events(spark, rows)

    x = [v * 100.0 for v in vals]  # integer cents as doubles
    l = sum(x[:m]) / m
    bt = 0.0
    s = [xi - l for xi in x[:m]]
    for xi in x[m:]:
        new_l = (xi - s[0]) * a + (l + bt) * (1.0 - a)
        bt = (new_l - l) * b + bt * (1.0 - b)
        s = s[1:] + [(xi - new_l) * g + s[0] * (1.0 - g)]
        l = new_l

    out = holt_winters(df, "ts", "value", "user_id", alpha=a, beta=b,
                       gamma=g, period=m, seq_col="event_id").collect()
    assert [r.user_id for r in out] == [1]  # user 2 lacks m+1 points
    [r] = out
    assert (r.n, r.level_c, r.trend_c) == (len(vals), l, bt)
    assert r.season_1_c == s[0] and r.forecast_1_c == l + bt + s[0]


# --------------------------------------------------------------------------
# ACF + CUSUM (r10)
# --------------------------------------------------------------------------


def _series_df(spark, vals, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "event_type STRING, event_id BIGINT, value DOUBLE")


def test_acf_matches_numpy_reference(spark):
    import numpy as np

    from stream_processing_platform_spark.operators.timeseries import acf

    vals = [1.00, 2.00, 1.50, 3.25, 2.75, 4.00, 3.50, 5.25, 4.75, 6.00]
    df = _series_df(spark, vals)
    got = acf(df, "value", ["event_type"], "event_id", max_lag=3).collect()[0]
    # reference: same quantized-mean centering, exact ints, then ratio
    import math

    c = [round(v * 100) for v in vals]
    m = math.floor(sum(c) * 1000 / len(c) + 0.5)
    d = [1000 * x - m for x in c]
    den = sum(x * x for x in d)
    for k in (1, 2, 3):
        num = sum(d[i] * d[i + k] for i in range(len(d) - k))
        want = math.floor(float(num) * 1e6 / float(den) + 0.5)
        assert got[f"acf{k}_micro"] == want, k
    # sanity vs numpy's plain estimator (same centering up to quantization)
    a = np.array(vals) - np.mean(vals)
    np_r1 = float(np.sum(a[:-1] * a[1:]) / np.sum(a * a))
    assert abs(got["acf1_micro"] / 1e6 - np_r1) < 2e-3


def test_acf_detects_alternating_series(spark):
    from stream_processing_platform_spark.operators.timeseries import acf

    df = _series_df(spark, [1.0, 5.0] * 20)
    got = acf(df, "value", ["event_type"], "event_id", max_lag=2).collect()[0]
    assert got["acf1_micro"] < -900_000  # strong negative at lag 1
    assert got["acf2_micro"] > 900_000  # strong positive at lag 2


def test_cusum_identity_equals_sequential_fold(spark):
    """The prefix-sum window form must equal the literal
    max(0, S + a) recursion run in Python."""
    import math

    from stream_processing_platform_spark.operators.timeseries import (
        cusum_changepoint,
    )

    vals = [1.00, 1.10, 0.90, 1.05, 4.00, 4.10, 3.90, 4.20, 4.05, 3.95]
    df = _series_df(spark, vals)
    got = cusum_changepoint(df, "value", ["event_type"], "event_id").collect()[0]

    c = [round(v * 100) for v in vals]
    m = math.floor(sum(c) * 1000 / len(c) + 0.5)
    d = [1000 * x - m for x in c]
    s, best, at = 0, None, None
    for i, x in enumerate(d):
        s = max(0, s + x)
        if best is None or s > best:
            best, at = s, i
    assert got["s_max"] == best
    assert got["at_seq"] == at
    # the shift upward at index 4 should dominate: argmax in the high segment
    assert got["at_seq"] >= 4


def test_cusum_flat_series_is_zero(spark):
    from stream_processing_platform_spark.operators.timeseries import (
        cusum_changepoint,
    )

    df = _series_df(spark, [2.0] * 12)
    got = cusum_changepoint(df, "value", ["event_type"], "event_id").collect()[0]
    assert got["s_max"] == 0


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """A planted period-4 cycle on a linear trend must come back as the
    seasonal profile (trend removed by the centered MA)."""
    import math

    from stream_processing_platform_spark.operators.timeseries import (
        seasonal_decompose,
    )

    season = [2.00, -1.00, 0.50, -1.50]  # sums to 0
    vals = [10.0 + 0.01 * i + season[i % 4] for i in range(80)]
    df = _series_df(spark, vals)
    got = {
        r["phase"]: r["seasonal_milli"]
        for r in seasonal_decompose(
            df, "value", ["event_type"], "event_id", period=4, trend_window=5
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for ph in range(4):
        # planted amplitude in milli-cents, loose tolerance for the MA
        # leaking a little seasonality into the trend at window 5
        assert abs(got[ph] - season[ph] * 100_000) < 60_000, (ph, got[ph])
    # ordering of the profile is exactly the planted ordering
    assert sorted(got, key=got.get) == sorted(range(4), key=lambda p: season[p])
    assert math.isclose(sum(got.values()) / 1e5, 0.0, abs_tol=0.6)


def test_seasonal_decompose_rejects_even_window(spark):
    import pytest

    from stream_processing_platform_spark.operators.timeseries import (
        seasonal_decompose,
    )

    df = _series_df(spark, [1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        seasonal_decompose(df, "value", ["event_type"], "event_id", trend_window=4)
