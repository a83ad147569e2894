"""Hierarchical rollup: the pyramid must reuse partials (one fact scan)
and mergeable HLL sketch columns must survive the fold within rsd."""

from __future__ import annotations

import pyspark.sql.functions as F

from stream_processing_platform_spark.operators.rollup import bucket_ms, hierarchical_rollup

HOUR = 3_600_000


def _events(spark, sf_dir):
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts")
    ts_ms = (
        (ts / 1_000_000).cast("long")
        if str(e.schema["ts"].dataType) == "LongType()"
        else F.unix_millis(ts.cast("timestamp"))
    )
    return e.withColumn("ts_ms", ts_ms)


def test_rollup_levels_agree_and_scan_once(spark, sf_dir):
    e = _events(spark, sf_dir).withColumn("v", F.round(F.col("value") * 100, 0).cast("long"))
    levels = hierarchical_rollup(e, "ts_ms", ["event_type"], "v", [HOUR, 6 * HOUR, 24 * HOUR])

    # Coarsest level from the pyramid == direct aggregation of raw data.
    direct = (
        e.groupBy("event_type", bucket_ms(F.col("ts_ms"), 24 * HOUR).alias("bucket"))
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("sum_v"),
             F.min("v").alias("min_v"), F.max("v").alias("max_v"))
    )
    assert levels[2].exceptAll(direct).count() == 0
    assert direct.exceptAll(levels[2]).count() == 0

    # One fact scan total: levels 1 and 2 aggregate level-0 partials,
    # so their plans contain exactly one parquet scan of events.
    plan = levels[2]._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("parquet") <= 1


def test_rollup_hll_sketch_column_merges_within_rsd(spark, sf_dir):
    """Distinct counts can't ride sum-of-sums; the mergeable HLL sketch
    column can: hll_sketch_agg at the finest grain, hll_union_agg
    upward. The coarsest level's estimate must track the exact distinct
    count within the sketch's default rsd (~2-3%)."""
    e = _events(spark, sf_dir)
    levels = hierarchical_rollup(
        e, "ts_ms", ["event_type"], "value", [HOUR, 24 * HOUR], distinct_col="user_id"
    )
    est = levels[1].select(
        "event_type", "bucket", F.hll_sketch_estimate("hll").alias("est")
    )
    exact = e.groupBy(
        "event_type", bucket_ms(F.col("ts_ms"), 24 * HOUR).alias("bucket")
    ).agg(F.countDistinct("user_id").alias("exact"))
    joined = est.join(exact, ["event_type", "bucket"]).collect()
    assert joined
    for r in joined:
        assert abs(r["est"] - r["exact"]) <= max(2, 0.05 * r["exact"]), r


def test_aggregate_state_merge_equals_recompute(spark):
    """Three disjoint slices (one empty) merge to exactly the full
    recompute — the delta-refresh contract, including empty batches."""
    from stream_processing_platform_spark.operators.rollup import (
        aggregate_state,
        merge_aggregate_state,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", -3), ("a", 2), ("b", 7)], "k string, v long"
    )
    slices = [
        df.where("v < 0"), df.where("v >= 0"), df.where("v > 100"),  # last: empty
    ]
    merged = merge_aggregate_state(
        [aggregate_state(s, ["k"], "v") for s in slices], ["k"]
    )
    full = aggregate_state(df, ["k"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
