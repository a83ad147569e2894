"""Tick analytics — the round-6 surface end to end: custom Python
DataSource (offset-tracked tick feed) → streaming OHLC candlesticks →
batch gap-fill → MAD outlier report, finishing with a k-means regime
clustering of the per-symbol bars.

Self-checking: every stage asserts an invariant a broken pipeline would
violate. Run:

    python examples/tick_analytics.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from stream_processing_platform_spark.operators.clustering import kmeans_assign, kmeans_fit
from stream_processing_platform_spark.operators.timeseries import gap_fill, ohlc_bars
from stream_processing_platform_spark.session import get_spark
from stream_processing_platform_spark.sources.custom_datasource import (
    SYMBOLS,
    read_manifested,
    register_custom_sources,
)


def main() -> None:
    spark = get_spark(app_name="tick-analytics")
    register_custom_sources(spark)

    # 1. Custom-source batch scan with pushed-down range predicate.
    ticks = (
        spark.read.format("spp_ticks")
        .option("rows", 50_000)
        .load()
        .where(F.col("tick_id") < 40_000)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )
    n = ticks.count()
    assert n == 40_000, n
    print(f"ticks scanned (range pushed to the generator): {n}")

    # 2. OHLC candlesticks, one-minute bars per symbol.
    bars = ohlc_bars(
        ticks, ts_col="ts", value_col="price", key_cols=["symbol"],
        every_ms=60_000, seq_col="tick_id",
    )
    b = bars.count()
    assert b > 0
    sane = bars.where(
        (F.col("low_c") <= F.col("open_c")) & (F.col("open_c") <= F.col("high_c"))
        & (F.col("low_c") <= F.col("close_c")) & (F.col("close_c") <= F.col("high_c"))
    ).count()
    assert sane == b, "OHLC invariant violated"
    print(f"1-minute bars: {b} across {len(SYMBOLS)} symbols — low<=open/close<=high holds")

    # 3. Gap-fill each symbol's close onto the full minute grid (LOCF).
    closes = bars.select(
        "symbol", F.timestamp_millis(F.col("bucket_ms")).alias("ts"),
        (F.col("close_c") / 100.0).alias("close"),
    )
    dense = gap_fill(closes, "ts", "close", "symbol", every_ms=60_000, method="locf")
    assert dense.where(F.col("cents").isNull()).count() == 0
    print(f"gap-filled close series: {dense.count()} rows, zero nulls")

    # 4. Stream the SAME feed through the streaming engine into the
    #    two-phase-commit manifest sink, then cross-check totals.
    out = tempfile.mkdtemp(prefix="tick_sink_")
    s = (
        spark.readStream.format("spp_ticks")
        .option("max_ticks", 40_000).option("partitions", 8).load()
    )
    q = (
        s.writeStream.format("spp_manifest").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="tick_ckpt_"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    streamed = read_manifested(out)
    assert len(streamed) == 40_000 and len({r["tick_id"] for r in streamed}) == 40_000
    print("streaming path: 40000 ticks, exactly-once (manifested, no dupes)")

    # 5. Per-symbol daily profile -> k-means regimes over (volatility,
    #    volume) feature vectors.
    profile = bars.groupBy("symbol").agg(
        F.avg(F.col("high_c") - F.col("low_c")).alias("range_c"),
        F.avg("n").alias("ticks_per_bar"),
        F.stddev(F.col("close_c")).alias("close_sd"),
    )
    feats = profile.select(
        F.col("symbol"),
        F.array("range_c", "ticks_per_bar", "close_sd").alias("f"),
    )
    model = kmeans_fit(feats, id_col="symbol", vec_col="f", k=2, max_iter=5)
    assert model.inertia == sorted(model.inertia, reverse=True) or all(
        a >= b - 1e-9 for a, b in zip(model.inertia, model.inertia[1:])
    )
    regimes = kmeans_assign(feats, model, id_col="symbol", vec_col="f")
    print("symbol regimes:")
    for r in regimes.orderBy("symbol").collect():
        print(f"  {r.symbol}: cluster {r.cluster}")
    print("OK")


if __name__ == "__main__":
    main()
