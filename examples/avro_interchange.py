"""Avro interchange — batch write/read + streaming consumption of the
``spp_avro`` format (sources/avrocodec.py, sources/avro_datasource.py):
the Kafka-ecosystem container format, self-checking end to end.

Pipeline: events.parquet → deflate Avro OCF (one file per task,
two-phase manifest commit) → batch read-back (file-per-partition) →
aggregate; then the same directory consumed as a STREAM (file-log
offsets, availableNow) and the two aggregates are asserted identical.

Run:  python examples/avro_interchange.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.session import get_spark
from stream_processing_platform_spark.sources.avro_datasource import (
    register_avro_source,
)
from stream_processing_platform_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="avro-interchange")
    register_avro_source(spark)
    out = tempfile.mkdtemp(prefix="spp_avro_example_")

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.write.format("spp_avro").mode("overwrite").save(out)
    print(f"wrote {len(os.listdir(out)) - 1} avro part files -> {out}")

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_c"),
        )

    batch = {r.event_type: (r.n, r.sum_c) for r in agg(
        spark.read.format("spp_avro").load(out)).collect()}
    print("batch read-back:", batch)

    stream = spark.readStream.format("spp_avro").load(out)
    q = (
        agg(stream).writeStream.format("memory").queryName("avro_stream")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spp_avro_ck_"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    streamed = {r.event_type: (r.n, r.sum_c) for r in spark.table("avro_stream").collect()}
    print("stream read-back:", streamed)

    assert batch == streamed, "batch and streaming decode disagree!"
    source = {r.event_type: (r.n, r.sum_c) for r in agg(events).collect()}
    assert batch == source, "avro round-trip lost data!"
    print("OK: avro batch == avro stream == parquet source")


if __name__ == "__main__":
    main(*sys.argv[1:])
