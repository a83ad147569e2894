"""Fluent-API facade tests: the reference's five example pipelines
(SURVEY.md §5 item 2) re-expressed through
StreamExecutionEnvironment/DataStream and checked end-to-end.
"""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from stream_processing_platform_spark.api import StreamExecutionEnvironment


@pytest.fixture
def env(spark):
    return StreamExecutionEnvironment("facade-test", spark=spark)


def T(seconds: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=seconds)


def test_word_count_pipeline(env):
    """examples/word_count.py:69-75: flatMap split → lower → key_by →
    window sum → filter count>5 (batch form; the windowed streaming twin
    is covered in test_streaming)."""
    lines = [("the quick brown fox the lazy dog the end",), ("the dog and the fox run",)]
    ds = (
        env.from_collection(lines, schema=["value"])
        .flat_map("word", F.split(F.lower("value"), r"\s+"))
        .filter(F.col("word") != "")
        .key_by("word")
        .aggregate("count", "word")
    )
    counts = {r.word: r["count"] for r in ds.collect()}
    assert counts["the"] == 5
    assert counts["fox"] == 2


def test_map_filter_anomaly_pipeline(env):
    """IoT anomaly predicate (examples/test_with_real_data.py:40-44)."""
    rows = [
        ("s1", 22.0, 50.0),
        ("s2", 45.0, 50.0),   # hot
        ("s3", -999.9, 50.0), # sentinel
        ("s4", 20.0, 10.0),   # dry
    ]
    ds = (
        env.from_collection(rows, schema=["sensor_id", "temperature", "humidity"])
        .map(
            {
                "is_anomaly": (
                    (F.col("temperature") < 10)
                    | (F.col("temperature") > 35)
                    | (F.col("humidity") < 20)
                    | (F.col("humidity") > 80)
                    | (F.col("temperature") == -999.9)
                )
            }
        )
        .filter(F.col("is_anomaly"))
    )
    assert sorted(r.sensor_id for r in ds.collect()) == ["s2", "s3", "s4"]


def test_interval_join_pipeline(env):
    """examples/stream_join.py click-attribution: clicks to impressions
    on ad_id within 5 min, derive time_to_click_ms."""
    imps = [("u1", "ad1", 0), ("u2", "ad2", 0)]
    clicks = [("u1", "ad1", 60_000), ("u2", "ad2", 400_000)]  # second outside 5 min
    imp = env.from_collection(imps, schema=["user_id", "ad_id", "ts_ms"]).select(
        "ad_id", F.col("ts_ms").alias("imp_ms")
    )
    clk = env.from_collection(clicks, schema=["user_id", "ad_id", "ts_ms"]).select(
        F.col("ad_id").alias("c_ad_id"), F.col("ts_ms").alias("click_ms")
    )
    joined = imp.interval_join(
        clk, on=[], left_ts_ms="imp_ms", right_ts_ms="click_ms", lower_ms=0, upper_ms=300_000
    ).filter(F.col("ad_id") == F.col("c_ad_id"))
    rows = joined.map({"time_to_click_ms": F.col("click_ms") - F.col("imp_ms")}).collect()
    assert len(rows) == 1 and rows[0].time_to_click_ms == 60_000


def test_keyed_dedup_batch(env):
    ds = env.from_collection(
        [("u1", "e1", 1), ("u1", "e1", 2), ("u1", "e2", 3)],
        schema=["user_id", "event_id", "ts_ms"],
    ).key_by("user_id", "event_id").dedup(ts_col="ts_ms")
    assert len(ds.collect()) == 2


def test_windowed_reduce_streaming_via_facade(env, spark, tmp_path):
    """Facade streaming path: file stream → key_by → tumbling window →
    reduce → memory sink."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", T(1), 10.0), (1, "b", T(3), 5.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(9, "flush", T(600), 0.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    name = "t" + uuid.uuid4().hex[:8]
    q = (
        env.from_file_stream(src, schema)
        .key_by("user_id")
        .window("ts", "10 seconds")
        .reduce(F.sum("value").alias("total"))
        .df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r.user_id, r.total) for r in spark.table(name).collect()}
    assert (1, 15.0) in rows


def test_rebalance_and_broadcast_join(env):
    fact = env.from_collection([(1, 10.0), (2, 20.0), (1, 5.0)], schema=["k", "v"]).rebalance(4)
    dim = env.from_collection([(1, "one"), (2, "two")], schema=["k", "name"])
    out = fact.broadcast_join(dim, on="k").key_by("name").aggregate("sum", "v")
    got = {r.name: r["sum"] for r in out.collect()}
    assert got == {"one": 15.0, "two": 20.0}
