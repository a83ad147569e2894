"""Event-analytics trio over the events table:

    CEP pattern matches (click -> view -> purchase, consecutive per user)
      + per-user inter-event gap profile (cadence stats)
      + 3-sigma z-score anomalies (exact integer test)

Each is the registered-query shape (q_event_sequence, q_interevent_gaps,
q_anomaly_zscore). Run:

    python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processing_platform_spark.registry import queries
from stream_processing_platform_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="event-analytics")
    qs = queries()

    seqs = qs["q_event_sequence"](spark, sf_dir)
    n_seq = seqs.count()
    print(f"CEP click->view->purchase matches: {n_seq}")
    seqs.orderBy("span_ms").show(5, truncate=False)

    gaps = qs["q_interevent_gaps"](spark, sf_dir)
    gaps.selectExpr(
        "count(*) AS users",
        "min(min_gap_ms) AS tightest_gap_ms",
        "max(max_gap_ms) AS widest_gap_ms",
    ).show(truncate=False)

    anom = qs["q_anomaly_zscore"](spark, sf_dir)
    n_anom = anom.count()
    print(f"3-sigma anomalies: {n_anom}")
    anom.show(5, truncate=False)

    assert n_seq >= 0 and n_anom >= 0
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
