"""SparkSession factory.

Tuned for the test harness (local[32], 128 GiB) but every setting is the
one you'd want on a 1000-executor cluster too: AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for any Python exchange, UTC
session time so event-time arithmetic is zone-free, and a shuffle
partition count that AQE coalesces downward when partitions are small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def metrics_conf() -> dict[str, str]:
    """Configs that expose the engine's metrics to a Prometheus scrape
    (see monitoring/prometheus.yml — the reference ships the same scrape
    topology for its jobmanager/taskmanager exporters):

    - the driver servlet at ``:4040/metrics/prometheus`` and the executor
      roll-up at ``:4040/metrics/executors/prometheus``;
    - Structured Streaming query metrics (input/processing rate, batch
      duration, state rows) routed into the metrics system so per-job
      panels work without polling the REST facade.

    Off by default locally (the UI adds scheduler chatter to tests);
    enabled when ``SPARK_GRAFT_METRICS=1`` or on any real deployment.
    """
    return {
        "spark.ui.enabled": "true",
        "spark.ui.prometheus.enabled": "true",
        "spark.sql.streaming.metricsEnabled": "true",
        "spark.metrics.conf.*.sink.prometheusServlet.class":
            "org.apache.spark.metrics.sink.PrometheusServlet",
        "spark.metrics.conf.*.sink.prometheusServlet.path":
            "/metrics/prometheus",
    }


def get_spark(
    app_name: str = "stream-processing-platform-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Local mode puts driver + all 32 executor threads in ONE JVM;
        # Spark's 1g default heap GC-thrashes under that (GCLocker retry
        # aborts killed a bench run). Only effective at JVM launch —
        # sessions created by spark-submit keep the submitted value.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
        # Event-time arithmetic must be zone-free and match the duckdb oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: coalesce tiny shuffle partitions, split skewed ones, convert
        # sort-merge to broadcast when runtime stats allow. Essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for every pandas_udf / applyInPandas / toPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Small dims (region/nation/supplier) should always broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Keep scheduler chatter down in local mode.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark cannot
        # read natively; read as long and convert in tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if os.environ.get("SPARK_GRAFT_METRICS") == "1":
        for k, v in metrics_conf().items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
