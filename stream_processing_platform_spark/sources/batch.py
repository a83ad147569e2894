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
