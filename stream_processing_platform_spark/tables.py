"""Fixture-table loaders for the driver-generated parquet tables.

Tables (see TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings. One parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Loading is a plain ``spark.read.parquet`` so Catalyst keeps full pushdown:
filters and column pruning reach the parquet scan (check ``PushedFilters``
/ ``ReadSchema`` in ``.explain``). Do NOT cache here — at 100 TB these are
scans, not materializations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

# Correctness-critical session confs, runtime-settable. The driver hands
# us ITS SparkSession (entry/queries contract), which may not carry our
# builder config: without nanosAsLong the events scan throws
# PARQUET_TYPE_ILLEGAL, and a non-UTC session zone shifts every
# NTZ→timestamp cast and thus every epoch-ms window against the oracle.
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # static conf on some build — builder config must cover it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it loads as BIGINT nanos.
        # Truncate to micros — the same truncation duckdb applies when it
        # reads nanos into its micro-precision TIMESTAMP.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # Integer division — (ts / 1000) as double loses precision at
            # 1e18 nanos and rounds up across the microsecond boundary.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
