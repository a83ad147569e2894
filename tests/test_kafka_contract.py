"""Kafka contract tests — no broker (or connector jar) exists in this
container, so these pin the *wiring*: the reader/writer options the
builders set, and the decode/encode projections over the kafka relation
schema, exercised on static kafka-shaped DataFrames. A dropped option or
column fails here instead of in production.

Reference behavior being mapped: the manual-offset consumer with headers
(`taskmanager/operators/sources.py:58-78`) and the acks/ordered producer
(`taskmanager/operators/sinks.py:42-97`) — both collapse to options plus
the Structured Streaming checkpoint protocol.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from stream_processing_platform_spark.sinks import json_payload, kafka_writer_options
from stream_processing_platform_spark.sources.streaming import (
    KAFKA_RELATION_DDL,
    decode_kafka_records,
    kafka_reader_options,
)


def test_kafka_reader_options_complete():
    opts = kafka_reader_options("events", "broker1:9092,broker2:9092", "latest")
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "latest"
    # headers must survive: the reference exposes StreamRecord.headers
    assert opts["includeHeaders"] == "true"
    # offset tracking is the checkpoint's job — a manual-commit option
    # here would fight exactly-once recovery
    assert not any(k.startswith("kafka.enable.auto.commit") for k in opts)


def test_kafka_writer_options_complete():
    opts = kafka_writer_options("out", "b:9092", "/tmp/ckpt")
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["topic"] == "out"
    # exactly-once hinges on the checkpoint — losing this option silently
    # downgrades to at-least-once-with-reprocessing
    assert opts["checkpointLocation"] == "/tmp/ckpt"


def _kafka_shaped(spark, payloads: list[dict], key: str = "k1"):
    """Build a static DataFrame with the kafka source's relation schema."""
    rows = [
        (
            key.encode(),
            json.dumps(p).encode(),
            "events",
            0,
            i,
            None,
            0,
            [("h1", b"v1")],
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, schema=KAFKA_RELATION_DDL)


def test_decode_kafka_records_schema_and_values(spark):
    value_schema = StructType.fromDDL("user_id bigint, event_type string, value double")
    raw = _kafka_shaped(
        spark,
        [
            {"user_id": 7, "event_type": "click", "value": 1.5},
            {"user_id": 8, "event_type": "view", "value": 2.0},
        ],
    )
    out = decode_kafka_records(raw, value_schema)
    # contract: key + exploded value fields + timestamp + headers, in order
    assert out.columns == ["key", "user_id", "event_type", "value", "timestamp", "headers"]
    rows = {r.user_id: r for r in out.collect()}
    assert rows[7].key == "k1" and rows[7].event_type == "click" and rows[7].value == 1.5
    assert rows[8].headers == [("h1", bytearray(b"v1"))]


def test_kafka_wire_format_end_to_end_with_headers(spark):
    """The full broker-free wire path: recorded kafka-relation rows
    (binary key/value + headers) → decode_kafka_records → a pipeline
    transform (filter + derived column) → json_payload producer frame.
    Asserts (a) the producer frame has exactly the columns the kafka
    sink accepts (key, value, headers), (b) headers survive byte-exact
    in the source relation's array<struct<key,value:binary>> shape, and
    (c) the JSON value decodes back to the transformed records."""
    value_schema = StructType.fromDDL("user_id bigint, event_type string, value double")
    raw = _kafka_shaped(
        spark,
        [
            {"user_id": 1, "event_type": "click", "value": 0.5},
            {"user_id": 2, "event_type": "click", "value": 1.5},
            {"user_id": 3, "event_type": "view", "value": 2.5},
        ],
    )
    decoded = decode_kafka_records(raw, value_schema)
    transformed = decoded.where(F.col("value") >= 1.0).withColumn(
        "flagged", F.col("value") > 2.0
    )
    frame = json_payload(
        transformed.drop("timestamp"), key_col="key", headers_col="headers"
    )
    assert frame.columns == ["key", "value", "headers"]
    # the sink-side headers type must equal the source-relation type —
    # a consumer of our producer output sees what we consumed
    expected = dict(zip(raw.schema.names, raw.schema.fields))
    assert frame.schema["headers"].dataType == expected["headers"].dataType
    rows = frame.collect()
    assert len(rows) == 2
    for r in rows:
        assert r.key == "k1"
        assert r.headers == [("h1", bytearray(b"v1"))]
    payloads = {json.loads(r.value)["user_id"]: json.loads(r.value) for r in rows}
    assert payloads[2]["flagged"] is False and payloads[3]["flagged"] is True
    assert payloads[3]["event_type"] == "view" and payloads[3]["key"] == "k1"


def test_json_payload_round_trips_through_decode(spark):
    """Producer encode (json_payload) and consumer decode must be
    inverses: pack rows to key/value, wrap in the kafka relation shape,
    decode, and get the original rows back."""
    src = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5)], "id bigint, tag string, score double"
    )
    packed = json_payload(src, key_col="tag")
    assert packed.columns == ["key", "value"]
    wire = packed.select(
        F.encode("key", "utf-8").alias("key"),
        F.encode("value", "utf-8").alias("value"),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
        F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
    )
    decoded = decode_kafka_records(wire, StructType.fromDDL("id bigint, tag string, score double"))
    got = sorted((r.id, r.tag, r.score, r.key) for r in decoded.collect())
    assert got == [(1, "a", 0.5, "a"), (2, "b", 1.5, "b")]
