"""Partition-layout helpers.

The CPU-bound operators (shingling, MinHash, SimHash, embedding math)
are only as parallel as their input scan. A single unsplittable parquet
file (one row group) yields ONE task no matter what
``spark.sql.files.maxPartitionBytes`` says — byte-range splits cannot
divide a row group. On a real cluster the input is thousands of files
and this helper is a no-op; on small/skewed layouts it restores
parallelism with one cheap round-robin shuffle *before* the expensive
map work, which is exactly the standard remedy for unsplittable small
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition iff the physical scan has fewer partitions
    than the cluster has cores. No-op (and therefore scale-safe: never an
    extra shuffle at 100 TB) when the input is already wide enough.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
