"""Streaming sinks beyond memory/console: parquet (exactly-once file
sink with its own commit log) and foreachBatch (the custom-sink escape
hatch; the reference's KafkaSinkOperator delivery guarantees map here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_platform_spark import sinks
from stream_processing_platform_spark.sources.streaming import file_source
from tests.test_streaming import EVENT_SCHEMA, T, stage

import pytest

# r15 verify-window tiering: staged-batch streaming / TWS / fuzz /
# cluster tests run in the slow tier (pytest.ini; -m slow at round close)
pytestmark = pytest.mark.slow





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


def test_scd2_sink_streaming_cdc_matches_sequential_apply(spark, tmp_path):
    """CDC stream -> maintained SCD2 dimension: two staged micro-batches
    through scd2_sink must yield the same snapshot as applying the
    batches sequentially with scd2_apply, and every version must stay
    readable (time travel)."""
    import os

    from stream_processing_platform_spark.operators import scd
    from stream_processing_platform_spark.sinks import scd2_latest_path, scd2_sink
    from stream_processing_platform_spark.sources.streaming import file_source, stage_collection

    stage = str(tmp_path / "cdc")
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    schema = "k int, v string, effective_ms long"
    # batch 0 bootstraps; batch 1 changes k=1, no-ops k=2, inserts k=3
    stage_collection(spark, [(1, "a", 0), (2, "b", 0)], schema, stage)
    stage_collection(spark, [(1, "x", 100), (2, "b", 100), (3, "c", 150)], schema, stage)

    stream = file_source(spark, stage, spark.createDataFrame([], schema).schema,
                         max_files_per_trigger=1)
    q = scd2_sink(stream, dim, ["k"], ["v"], ckpt)
    q.awaitTermination(120)

    versions = sorted(d for d in os.listdir(dim) if d.startswith("v="))
    assert len(versions) == 2  # one snapshot per micro-batch, all readable

    # sequential reference: init from batch 0, apply batch 1
    t0 = scd.scd2_init(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
                       ["k"], ["v"])
    b1 = spark.createDataFrame([(1, "x", 100), (2, "b", 100), (3, "c", 150)], schema)
    got = {tuple(r) for r in spark.read.parquet(scd2_latest_path(dim))
           .select("k", "v", "valid_from_ms", "valid_to_ms", "is_current").collect()}
    want = {tuple(r) for r in scd.scd2_apply(t0, b1, ["k"], ["v"])
            .select("k", "v", "valid_from_ms", "valid_to_ms", "is_current").collect()}
    assert got == want
    # history chained: k=1 has a closed row ending at 100 and an open 'x'
    rows = {(r.k, r.v): (r.valid_from_ms, r.valid_to_ms, r.is_current)
            for r in spark.read.parquet(scd2_latest_path(dim)).collect()}
    assert rows[(1, "a")] == (0, 100, 0)
    assert rows[(1, "x")][2] == 1 and rows[(3, "c")][0] == 150
