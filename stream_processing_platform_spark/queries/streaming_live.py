"""Live Structured Streaming queries inside the correctness gate.

Unlike streaming_batch.py (batch *twins* of the window operators), these
run an actual streaming job — file source over the staged events table →
watermarked stateful operator → memory sink, availableNow trigger — and
return the sink table as the result DataFrame. The duckdb oracle then
checks the STREAMING engine's output itself, not a batch re-expression:
the strongest possible parity statement for the reference's runtime
(WindowOperator stateful.py:147-262, AggregateOperator stateful.py:
265-342, dedup examples/stateful_deduplication.py:18-49).

Update output mode + a single availableNow batch means every window/key
emits exactly its final aggregate, which is what the SQL oracle computes.
Each invocation uses a fresh query name + checkpoint (driver may call a
query more than once).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from stream_processing_platform_spark.operators.windows_batch import epoch_ms
from stream_processing_platform_spark.registry import query
from stream_processing_platform_spark.sources.streaming import file_source
from stream_processing_platform_spark.streaming import windows as W

HOUR_MS = 3_600_000


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table: stage the single parquet file into a
    directory (file source wants one), normalize the nanos-as-long ts."""
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    static = spark.read.parquet(path)
    stage = tempfile.mkdtemp(prefix="spp_stream_src_")
    os.symlink(path, os.path.join(stage, "events.parquet"))
    stream = file_source(spark, stage, static.schema)
    if isinstance(static.schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def _run_to_table(df: DataFrame, mode: str = "update") -> DataFrame:
    spark = df.sparkSession
    name = "live_" + uuid.uuid4().hex[:10]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spp_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_window_tumbling",
    oracle=f"""
    SELECT CAST(floor(epoch_ms(ts) / {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="LIVE Structured Streaming run of WindowOperator "
    "(stateful.py:147-262): file stream → watermark → 1 h tumbling window "
    "→ memory sink; the streaming engine's own output is oracle-checked.",
)
def q_stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    windowed = W.tumbling_agg(
        _events_stream(spark, sf_dir),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    out = _run_to_table(windowed)
    return out.select(
        epoch_ms(F.col("window_start")).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


@query(
    "q_stream_running_agg",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS total
    FROM events
    GROUP BY user_id
    """,
    description="LIVE streaming run of AggregateOperator (stateful.py:"
    "265-342): running per-key aggregate in update mode — final emission "
    "per key equals the batch GROUP BY.",
)
def q_stream_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = W.running_agg(
        _events_stream(spark, sf_dir),
        ["user_id"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    return _run_to_table(agg)


@query(
    "q_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    """,
    description="LIVE streaming run of the dedup pipeline "
    "(examples/stateful_deduplication.py:18-49 semantics): streaming "
    "dropDuplicates on the key columns; key set equals batch DISTINCT.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir).select("user_id", "event_type")
    return _run_to_table(stream.dropDuplicates(["user_id", "event_type"]), mode="append")
