"""Kafka loopback harness: the exactly-once offsets path, minus the socket.

No broker (or Kafka connector jar) exists in this container, so the
`kafka_source`/`kafka_sink` builders can pin only their option wiring.
This module closes the rest of the gap by exercising every ENGINE-side
piece of the Kafka path end-to-end against a directory standing in for
a topic:

- records staged with the EXACT relation schema Spark's kafka source
  produces (``KAFKA_RELATION_DDL``: binary key/value, topic/partition/
  offset, timestamp, headers), streamed through the same
  ``decode_kafka_records`` projection `kafka_source` uses;
- a producer-shaped sink: ``json_payload`` encode (the kafka_sink
  projection) through ``foreachBatch`` with batch-id-keyed OVERWRITE —
  the idempotent-commit half of exactly-once;
- fault injection: the sink can be told to crash AFTER writing a batch
  but before the checkpoint commit (the classic ack-lost window);
  restarting from the same checkpoint replays that batch, and the
  overwrite makes the replay invisible downstream — the exactly-once
  contract ``kafka_sink`` delegates to the checkpoint protocol,
  demonstrated rather than asserted.

THE ONE UNVERIFIABLE SEAM (and exactly that): the Kafka wire protocol
itself — broker connection, consumer-group/partition assignment, and
the transactional producer inside the connector jar. Those are Spark's
kafka connector, not this engine; everything this repo ADDS around it
(option wiring, decode/encode projections, offset replay, idempotent
commit, recovery) is executed by this harness + tests/test_kafka_loopback.py.
The component stays `partial` in PARITY.md until a broker exists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from stream_processing_platform_spark.sources.streaming import (
    KAFKA_RELATION_DDL,
    decode_kafka_records,
    file_source,
)


def stage_kafka_records(
    spark: SparkSession,
    stage_dir: str,
    payloads: list[dict],
    topic: str = "events",
    partition: int = 0,
    start_offset: int = 0,
    key: str | None = None,
) -> int:
    """Append one 'producer batch' of kafka-relation-shaped records
    (JSON-encoded payloads) to the loopback topic directory; returns the
    next offset. One staged file == one micro-batch when streamed with
    ``max_files_per_trigger=1`` — the same admission granularity a
    broker poll gives the real source."""
    import datetime as dt
    import json

    rows = [
        (
            (key or f"k{start_offset + i}").encode(),
            json.dumps(p).encode(),
            topic,
            partition,
            start_offset + i,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=start_offset + i),
            0,
            [("h1", b"v1")],
        )
        for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(rows, KAFKA_RELATION_DDL)
    df.coalesce(1).write.mode("append").parquet(stage_dir)
    return start_offset + len(payloads)


def kafka_loopback_source(
    spark: SparkSession,
    stage_dir: str,
    value_schema: StructType,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Stream the loopback topic directory through the SAME decode
    projection `kafka_source` applies — downstream code cannot tell the
    difference (same columns, same types, same headers)."""
    raw = file_source(
        spark,
        stage_dir,
        StructType.fromDDL(KAFKA_RELATION_DDL),
        max_files_per_trigger=max_files_per_trigger,
    )
    return decode_kafka_records(raw, value_schema)


class LoopbackProducerSink:
    """Producer-shaped exactly-once sink with fault injection.

    Each micro-batch is encoded with ``json_payload`` (the kafka_sink
    projection) and written to ``out_dir/batch_id=N`` with OVERWRITE —
    a replayed batch id rewrites its directory instead of duplicating,
    which is the idempotence the real kafka_sink gets from checkpointed
    offsets + broker-side idempotent producing.

    ``fail_after_write_on_batch``: crash ONCE after writing that batch
    but before foreachBatch returns — i.e. after the 'send' but before
    the checkpoint commit, the ack-lost window a broker outage opens.
    """

    def __init__(self, out_dir: str, fail_after_write_on_batch: int | None = None):
        self.out_dir = out_dir
        self._fail_on = fail_after_write_on_batch
        self._fail_armed = fail_after_write_on_batch is not None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from stream_processing_platform_spark.sinks import json_payload

        encoded = json_payload(batch_df)
        encoded.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"batch_id={batch_id}")
        )
        if self._fail_armed and batch_id == self._fail_on:
            self._fail_armed = False
            raise RuntimeError(
                f"injected producer failure after writing batch {batch_id}"
            )
