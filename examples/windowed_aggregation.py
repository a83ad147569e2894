"""Windowed aggregation — per-key tumbling-window min/avg/max
(reference: examples/windowed_aggregation.py:41-59: json.loads → float
casts → keyBy sensor → 10 s window → min/avg/max fold).

Here: events table → key_by(user_id) → 1 h tumbling window →
min/avg/max(value). Run:

    python examples/windowed_aggregation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.api.environment import StreamExecutionEnvironment
from stream_processing_platform_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    env = StreamExecutionEnvironment("windowed-aggregation")
    events = env.add_source(load_table(env.spark, sf_dir, "events"))
    result = (
        events.key_by("user_id")
        .window("ts", "1 hour")
        .agg(
            F.round(F.min("value"), 2).alias("min_v"),
            F.round(F.avg("value"), 2).alias("avg_v"),
            F.round(F.max("value"), 2).alias("max_v"),
            F.count("*").alias("n"),
        )
    )
    rows = result.collect()
    print(f"(user, window) aggregates: {len(rows)}")
    for r in rows[:5]:
        print(f"  user={r['user_id']} [{r['window_start']}] "
              f"min={r['min_v']} avg={r['avg_v']} max={r['max_v']} n={r['n']}")
    assert rows


if __name__ == "__main__":
    main(*sys.argv[1:])
