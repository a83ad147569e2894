"""Word count — the reference's canonical pipeline
(reference: examples/word_count.py:69-75: source → flatMap split → map
lower → keyBy word → 10 s tumbling window → reduce sum → filter count>5).

Here: documents.text → flat_map(explode(split)) → key_by(word) →
tumbling window on a synthetic event time → count → filter. Run:

    python examples/word_count.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.api.environment import StreamExecutionEnvironment


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    env = StreamExecutionEnvironment("word-count")
    result = (
        env.from_parquet(f"{sf_dir}/documents.parquet")
        # event time: stamp each doc into a 10 s-spaced timeline
        .map({"ts": F.timestamp_millis(F.col("doc_id") * 1000)})
        .flat_map("word", F.split(F.lower(F.col("text")), r"\s+"))
        .filter(F.col("word") != "")
        .key_by("word")
        .window("ts", "10 seconds")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 5)
    )
    rows = result.collect()
    print(f"windows with count>5: {len(rows)}")
    for r in sorted(rows, key=lambda r: -r["cnt"])[:10]:
        print(f"  [{r['window_start']}] {r['word']!r}: {r['cnt']}")
    assert rows, "expected at least one frequent word"


if __name__ == "__main__":
    main(*sys.argv[1:])
