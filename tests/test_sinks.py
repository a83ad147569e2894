"""Streaming sinks beyond memory/console: parquet (exactly-once file
sink with its own commit log) and foreachBatch (the custom-sink escape
hatch; the reference's KafkaSinkOperator delivery guarantees map here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_platform_spark import sinks
from stream_processing_platform_spark.sources.streaming import file_source
from tests.test_streaming import EVENT_SCHEMA, T, stage


def test_parquet_sink_writes_exactly_the_input(spark, tmp_path):
    src = stage(spark, tmp_path, [[(1, "a", T(1), 10.0), (2, "b", T(2), 1.0)]])
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck1")
    q = sinks.parquet_sink(file_source(spark, src, EVENT_SCHEMA), out_dir, ckpt)
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(out_dir)
    assert sorted(r.event_id for r in back.collect()) == ["a", "b"]


def test_foreach_batch_sink_sees_each_batch_once(spark, tmp_path):
    src = stage(spark, tmp_path, [[(1, "a", T(1), 10.0)], [(1, "b", T(2), 2.0)]])
    seen: list[tuple[int, int]] = []

    def collect_batch(df, epoch_id):
        seen.append((epoch_id, df.count()))

    stream = file_source(spark, src, EVENT_SCHEMA, max_files_per_trigger=1)
    q = sinks.foreach_batch_sink(
        stream.withColumn("v2", F.col("value") * 2),
        collect_batch,
        str(tmp_path / "ck2"),
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(n for _, n in seen) == [1, 1]
    assert len({e for e, _ in seen}) == 2  # distinct epochs, no re-delivery
