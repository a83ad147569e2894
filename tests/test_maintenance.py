"""Small-files compaction: fewer files, same rows, no shuffle when
shrinking."""

from __future__ import annotations

import glob

from stream_processing_platform_spark.maintenance import compact_parquet, parquet_bytes


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    # 20 tiny files
    spark.range(10_000).selectExpr("id", "id * 2 AS v").repartition(20).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 20
    assert parquet_bytes(src) > 0
    out = compact_parquet(spark, src, dst, target_file_mb=128)
    assert len(glob.glob(dst + "/*.parquet")) == 1  # tiny input -> one file
    assert out.count() == 10_000
    assert out.selectExpr("sum(v)").first()[0] == spark.read.parquet(src).selectExpr("sum(v)").first()[0]


def test_compact_parquet_shrink_plan_has_no_shuffle(spark, tmp_path):
    src = str(tmp_path / "src2")
    spark.range(1000).repartition(8).write.parquet(src)
    df = spark.read.parquet(src).coalesce(1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # coalesce path: compaction never shuffles down
