"""Streaming sources (SURVEY.md §2.1).

Reference → Spark mapping:
- `KafkaSourceOperator` (sources.py:25-198, manual offsets + exactly-once
  + watermark strategy) → ``readStream.format("kafka")``; offsets,
  recovery and exactly-once live in the checkpoint dir; watermarks are
  declarative (`withWatermark`). No broker exists in this container, so
  the builder is constructed but only smoke-testable.
- `CollectionSourceOperator` → file source over a staged directory (the
  deterministic test idiom: write parquet rows, stream the directory) or
  the `rate` source for load generation.
- Synthetic generators (IoT/e-commerce/financial) → `rate` source +
  column expressions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# The fixed relation schema Spark's kafka source produces (Structured
# Streaming + Kafka integration guide). Contract tests build static
# DataFrames with this schema so the decode projection is exercised
# without a broker or the connector jar.
KAFKA_RELATION_DDL = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key:string,value:binary>>"
)


def kafka_reader_options(
    topic: str, bootstrap_servers: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The reader options kafka_source wires — one place, so the contract
    test fails if an option is dropped. `includeHeaders` keeps the
    reference's StreamRecord.headers (taskmanager/operators/sources.py
    manual-offset consumer exposes them); offsets/recovery live in the
    checkpoint, so `startingOffsets` only applies to first start."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "includeHeaders": "true",
    }


def decode_kafka_records(df: DataFrame, value_schema: StructType) -> DataFrame:
    """Kafka relation → typed columns: cast key, parse the JSON value
    payload (the reference's json.loads map), keep event timestamp and
    headers. Separated from the reader so it is unit-testable on a
    static kafka-shaped DataFrame."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("timestamp"),
        F.col("headers"),
    ).select("key", "v.*", "timestamp", "headers")


def kafka_source(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    value_schema: StructType | None = None,
) -> DataFrame:
    """Kafka stream; with ``value_schema`` the JSON payload is parsed to
    typed columns (the reference's json.loads map). Key/headers are kept —
    StreamRecord(key, value, timestamp, headers) maps onto the Kafka
    source's native columns (SURVEY §1.4)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(topic, bootstrap_servers, starting_offsets).items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_schema is not None:
        df = decode_kafka_records(df, value_schema)
    return df


def file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-directory stream — the deterministic CollectionSource
    replacement for tests; ``maxFilesPerTrigger`` is the micro-batch
    admission control (the reference's credit-based backpressure,
    flow_control.py:15-286, collapses to this option)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def rate_source(
    spark: SparkSession, rows_per_second: int = 1000, num_partitions: int | None = None
) -> DataFrame:
    """Synthetic load generator (replaces examples/data_generator_*.py):
    columns (timestamp, value); shape further with column expressions."""
    reader = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()


def stage_collection(
    spark: SparkSession, rows: list, schema, stage_dir: str, batch: int = 0
) -> StructType:
    """Write rows as one parquet batch file into ``stage_dir`` so a
    file_source stream picks them up as a micro-batch; returns the
    DataFrame schema (pass to file_source). Deterministic streaming-test
    idiom: stage batch 0, start query, stage batch 1, ..."""
    df = spark.createDataFrame(rows, schema=schema)
    df.coalesce(1).write.mode("append").parquet(os.path.join(stage_dir))
    return df.schema
