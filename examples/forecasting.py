"""Time-series forecasting — EWMA vs Holt (level+trend) smoothing, the
ordered-fold operators (operators/timeseries.ewma / .holt), self-checking.

Part 1 (synthetic, the self-check): on a rising linear series the Holt
one-step forecast must beat the trendless EWMA level — EWMA always lags
a trend, Holt's trend state closes the gap.
Part 2 (real data): per-user smoothed levels and one-step forecasts over
the events table.

Run:  python examples/forecasting.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime as dt

from stream_processing_platform_spark.operators.timeseries import ewma, holt
from stream_processing_platform_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="forecasting")

    # ---- Part 1: linear trend, next true value = 2100 cents
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 7, float(i + 1))  # 1.00, 2.00, … 20.00
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    [e] = ewma(df, "ts", "value", "user_id", alpha=0.25, seq_col="event_id").collect()
    [h] = holt(df, "ts", "value", "user_id", alpha=0.5, beta=0.25, seq_col="event_id").collect()
    truth = 2100.0  # cents of the next point (21.00)
    ewma_err = abs(e.ewma_c - truth)
    holt_err = abs(h.forecast_1_c - truth)
    print(f"linear series: next={truth:.0f}c  ewma level={e.ewma_c:.1f}c "
          f"(err {ewma_err:.1f})  holt forecast={h.forecast_1_c:.1f}c (err {holt_err:.1f})")
    assert holt_err < ewma_err, "Holt must out-forecast EWMA on a trend"
    assert holt_err < 60, "Holt should be within a few steps' noise of the trend"

    # ---- Part 2: real events
    from stream_processing_platform_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = holt(events, "ts", "value", "user_id", alpha=0.5, beta=0.25, seq_col="event_id")
    top = out.orderBy("user_id").limit(5).collect()
    for r in top:
        print(f"user {r.user_id}: n={r.n} level={r.level_c:.1f}c "
              f"trend={r.trend_c:+.2f}c/step forecast={r.forecast_1_c:.1f}c")
    print("OK: forecasting operators ran end to end")


if __name__ == "__main__":
    main(*sys.argv[1:])
