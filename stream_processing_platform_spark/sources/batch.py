"""Batch sources (SURVEY.md §2.1 batch paths).

Reference equivalents: CSV/JSON file ingest (`gui/app_gcp.py:244-264`,
DictReader → schema inference), `CollectionSourceOperator`
(`taskmanager/operators/sources.py:201-261`) for tests. Parquet is the
primary analytical format (columnar, predicate pushdown, partition
pruning — none of which the reference had).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV ingest — replaces the reference's csv.DictReader loop
    (gui/app_gcp.py:251-254) with a distributed, schema-aware scan."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | None = None, multiline: bool = False
) -> DataFrame:
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC ingest — the second columnar format with native predicate
    pushdown / column pruning (Spark ships the reader; no extra deps).
    Same contract as read_parquet; interchange with warehouses that
    default to ORC."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def from_collection(
    spark: SparkSession, data: Iterable, schema: StructType | list[str] | None = None
) -> DataFrame:
    """CollectionSourceOperator batch twin — in-memory rows for tests
    (sources.py:201-261 'Useful for testing')."""
    return spark.createDataFrame(list(data), schema=schema)


CORRUPT_COL = "_corrupt_record"


def read_json_with_policy(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    multiline: bool = False,
) -> DataFrame:
    """JSON ingest with an EXPLICIT malformed-record policy — the
    declared answer to the reference's silent-drop semantics (every
    reference operator swallows records whose UDF throws,
    taskmanager/operators/stateless.py:39-45,73-79; SURVEY §7 risk 4):

    - ``PERMISSIVE`` (default, and this engine's policy): malformed rows
      survive with typed columns null and the raw line captured in
      ``_corrupt_record`` — nothing is silently lost, bad payloads are
      routable to a quarantine sink (``corrupt_records``/``valid_records``
      below).
    - ``DROPMALFORMED``: the reference's behavior, opt-in only.
    - ``FAILFAST``: abort the job on the first malformed record.

    The corrupt-record column is appended to the caller's schema here
    (Spark requires it declared when a schema is supplied).
    """
    mode = mode.upper()
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"unknown malformed-record mode {mode!r}")
    full = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        from pyspark.sql.types import StringType, StructField

        full = StructType([*schema.fields, StructField(CORRUPT_COL, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("multiLine", multiline)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def corrupt_records(df: DataFrame) -> DataFrame:
    """The quarantine split of a PERMISSIVE read: rows whose raw line
    failed to parse (route to a dead-letter sink for replay after a
    schema fix). All columns are kept — Spark disallows a scan that
    references ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    typed-null columns cost nothing on the quarantine path anyway."""
    from pyspark.sql import functions as F

    return df.where(F.col(CORRUPT_COL).isNotNull())


def valid_records(df: DataFrame) -> DataFrame:
    """The clean side of a PERMISSIVE read, corrupt column dropped."""
    from pyspark.sql import functions as F

    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
