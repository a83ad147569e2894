"""Stateful deduplication — drop repeated (user_id, event_id) pairs
(reference: examples/stateful_deduplication.py:18-49: per-user seen-set
on KeyedProcessOperator, state capped at 10k ids with arbitrary
eviction).

Spark replaces the hand-rolled seen-set with dropDuplicates — batch here;
the streaming form (watermark-bounded state, the scalable fix for the
reference's unbounded-state problem) is tested in
tests/test_streaming.py::test_dedup_stream_drops_duplicates. Run:

    python examples/stateful_deduplication.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processing_platform_spark.api.environment import StreamExecutionEnvironment

EVENTS = [
    ("user_1", "evt_a", 100, "page_view"),
    ("user_1", "evt_a", 150, "page_view"),     # duplicate delivery
    ("user_1", "evt_b", 200, "purchase"),
    ("user_2", "evt_a", 120, "page_view"),     # same evt id, other user → keep
    ("user_2", "evt_c", 300, "search"),
    ("user_2", "evt_c", 310, "search"),        # duplicate delivery
]


def main() -> None:
    env = StreamExecutionEnvironment("stateful-dedup")
    events = env.from_collection(
        EVENTS, "user_id string, event_id string, ts_ms long, event_type string"
    )
    deduped = events.key_by("user_id", "event_id").dedup(ts_col="ts_ms")
    rows = deduped.collect()
    print(f"{len(EVENTS)} events -> {len(rows)} after dedup")
    for r in sorted(rows, key=lambda r: (r["user_id"], r["event_id"])):
        print(f"  {r['user_id']} {r['event_id']} ts={r['ts_ms']}")
    assert len(rows) == 4
    # keep-first semantics: the earliest delivery survives
    assert {(r["user_id"], r["event_id"], r["ts_ms"]) for r in rows} == {
        ("user_1", "evt_a", 100), ("user_1", "evt_b", 200),
        ("user_2", "evt_a", 120), ("user_2", "evt_c", 300),
    }


if __name__ == "__main__":
    main()
