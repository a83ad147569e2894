"""Table maintenance utilities — the operational side of 100 TB.

Streaming sinks and incremental ingests accrete small files; scan cost
is per-file (open/footer/seek), so a million 1 MB files reads far
slower than eight thousand 128 MB files even at identical bytes.
``compact_parquet`` rewrites a parquet directory into size-targeted
files. It writes to a NEW directory: atomically swapping a live table
is a catalog/metastore transaction (or a Delta/Iceberg commit), not a
filesystem rename — callers flip their readers to the new path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    """Resolve ``path`` through the Hadoop FileSystem API — the same
    abstraction every Spark read/write uses, so maintenance ops work on
    any Spark-supported store (``file:``, ``hdfs:``, ``s3a:``, …), not
    just the driver's local disk. Returns ``(fs, jpath)``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def parquet_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of parquet data files under ``path`` (recursive),
    via the Hadoop FS API — works against any Spark-supported scheme."""
    fs, jpath = _hadoop_fs(spark, path)
    total = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    return total


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> DataFrame:
    """Rewrite ``src_path`` into ``dst_path`` with files sized toward
    ``target_file_mb``. File count = ceil(input_bytes / target) — a
    byte-based estimate (post-compaction encoding usually shrinks files
    further; the target is an upper-bound steer, not a guarantee).
    Uses ``coalesce`` when shrinking the file count (no shuffle — the
    whole point of compaction is to avoid paying one) and falls back to
    ``repartition`` only when the source has FEWER partitions than the
    target (splitting requires a shuffle). Returns the compacted
    DataFrame reading from ``dst_path``."""
    df = spark.read.parquet(src_path)
    n_files = max(1, math.ceil(parquet_bytes(spark, src_path) / (target_file_mb * 1024 * 1024)))
    n_input = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_input >= n_files else df.repartition(n_files)
    out.write.mode("error").parquet(dst_path)
    return spark.read.parquet(dst_path)


def compact_parquet_zorder(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    zorder_cols: list[tuple[str, float, float]],
    target_file_mb: int = 128,
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Compaction + Z-order clustering in one rewrite (the OPTIMIZE
    ZORDER BY maintenance op): each ``(col, lo, hi)`` is normalized to
    ``bits`` bits and bit-interleaved into a Morton key; output files are
    range-partitioned and sorted on it, so every listed column gets
    file- AND row-group-level min/max skipping (tests/test_layout.py
    pins the row-group effect; test_maintenance pins the file-level
    stats). Unlike plain compaction this pays one range shuffle — the
    price of re-clustering, same cost class as any sorted write."""
    from stream_processing_platform_spark.operators import layout

    from pyspark.sql import functions as F

    df = spark.read.parquet(src_path)
    n_files = num_files or max(
        1, math.ceil(parquet_bytes(spark, src_path) / (target_file_mb * 1024 * 1024))
    )
    z = layout.zorder_value(
        [layout.normalize_to_bits(F.col(c), lo, hi, bits) for c, lo, hi in zorder_cols],
        bits,
    )
    layout.zorder_repartition(df, z, n_files).write.mode("error").parquet(dst_path)
    return spark.read.parquet(dst_path)


def retention_prune(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_from: str,
    dry_run: bool = False,
) -> list[str]:
    """Retention policy over a partitioned table: drop whole partition
    directories whose ``partition_col`` value sorts below ``keep_from``
    (hypertable ``drop_chunks`` / `ALTER TABLE DROP PARTITION`
    semantics — the data-lifecycle half of the rollup pyramid: raw
    events age out, the coarser rollup levels keep the history).

    Deletion is partition-PRUNED, never row-scanned: candidates come
    from the directory names (``col=value``), so a 100 TB table prunes
    by listing directories — no data file is opened. Values compare as
    strings, which is correct for zero-padded date/hour layouts
    (``dt=2024-01-07``) — the standard lake layout this targets.
    Because string comparison is the selection mechanism, ``keep_from``
    is VALIDATED against the observed partition-value layout before
    anything is deleted: a stray ``col=`` prefix or a value whose
    length/character-class skeleton differs from every on-disk value
    (e.g. ``2024-1-7`` against zero-padded ``2024-01-07``) raises
    instead of silently dropping the wrong set. Listing and deletion go
    through the Hadoop FileSystem API — the same abstraction every
    Spark read/write uses — so this works against any Spark-supported
    store (``file:``, ``hdfs:``, ``s3a:``, …), not just the driver's
    local disk (the 100 TB framing assumes an object store).
    Returns the dropped (or would-drop, with ``dry_run``) partition
    values; refuses paths that are not partitioned by ``partition_col``.
    """
    fs, jpath = _hadoop_fs(spark, path)

    prefix = f"{partition_col}="
    parts = sorted(
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    )
    if not parts:
        raise ValueError(f"{path!r} has no {prefix}* partition directories")
    if keep_from.startswith(prefix):
        raise ValueError(
            f"keep_from must be a bare partition value, not {prefix!r}-prefixed: "
            f"{keep_from!r}"
        )

    def skeleton(v: str) -> str:
        return "".join("9" if ch.isdigit() else "a" if ch.isalpha() else ch for ch in v)

    observed = {skeleton(e[len(prefix):]) for e in parts}
    if skeleton(keep_from) not in observed:
        raise ValueError(
            f"keep_from {keep_from!r} does not match the partition-value layout "
            f"on disk (observed shapes: {sorted(observed)}); string comparison "
            "against a differently-shaped value would select the wrong partitions"
        )
    doomed = [e for e in parts if e[len(prefix):] < keep_from]
    if not dry_run:
        jvm = spark._jvm
        for e in doomed:
            fs.delete(jvm.org.apache.hadoop.fs.Path(jpath, e), True)
    return [e[len(prefix):] for e in doomed]
