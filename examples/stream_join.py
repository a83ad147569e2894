"""Click attribution — interval join of clicks to ad impressions
(reference: examples/stream_join.py:18-35,80-103: join on ad_id within
5 min, compute time_to_click_ms).

Each matched pair is emitted once (the reference's double-emission is an
artifact — SURVEY.md §7 risk #2). Run:

    python examples/stream_join.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.api.environment import StreamExecutionEnvironment

IMPRESSIONS = [
    ("ad_1", "imp_1", 1_000_000),
    ("ad_2", "imp_2", 1_030_000),
    ("ad_3", "imp_3", 1_060_000),
]
CLICKS = [
    ("ad_1", "click_1", 1_090_000),   # 90 s after imp_1 → match
    ("ad_2", "click_2", 1_400_000),   # 370 s after imp_2 → outside 5 min
    ("ad_1", "click_3", 1_240_000),   # 240 s after imp_1 → match
]


def main() -> None:
    env = StreamExecutionEnvironment("click-attribution")
    imps = env.from_collection(IMPRESSIONS, "ad_id string, imp_id string, imp_ts long")
    clicks = env.from_collection(CLICKS, "ad_id string, click_id string, click_ts long")
    joined = (
        imps.interval_join(
            clicks, on=["ad_id"], left_ts_ms="imp_ts", right_ts_ms="click_ts",
            lower_ms=0, upper_ms=300_000,  # click within 5 min after impression
        )
        .map({"time_to_click_ms": F.col("click_ts") - F.col("imp_ts")})
        .select("ad_id", "imp_id", "click_id", "time_to_click_ms")
    )
    rows = joined.collect()
    print(f"attributed clicks: {len(rows)}")
    for r in rows:
        print(f"  {r['ad_id']}: {r['imp_id']} -> {r['click_id']} "
              f"after {r['time_to_click_ms']} ms")
    assert {(r["imp_id"], r["click_id"]) for r in rows} == {
        ("imp_1", "click_1"), ("imp_1", "click_3")
    }


if __name__ == "__main__":
    main()
