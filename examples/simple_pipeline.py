"""Simple passthrough pipeline — source → map → filter → sink
(reference: examples/simple_pipeline.py; also the GUI demo's
source→sink passthrough job, gui/app_gcp.py:727-771).

Demonstrates the three stateless operators chained (FORWARD edges fuse
into one whole-stage-codegen span — the reference's operator chaining,
jobmanager/job_graph.py:160-215, for free). Run:

    python examples/simple_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.api.environment import StreamExecutionEnvironment
from stream_processing_platform_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    env = StreamExecutionEnvironment("simple-pipeline")
    out = (
        env.add_source(load_table(env.spark, sf_dir, "events"))
        .map({
            "value_x10": F.round(F.col("value") * 10, 2),
            "type_upper": F.upper(F.col("event_type")),
        })
        .filter(F.col("value") > 0)
        .select("event_id", "type_upper", "value_x10")
    )
    rows = out.collect()
    print(f"passthrough rows: {len(rows)}")
    for r in rows[:5]:
        print(f"  {r['event_id']} {r['type_upper']} {r['value_x10']}")
    assert rows


if __name__ == "__main__":
    main(*sys.argv[1:])
