"""Bucketed co-located joins: the 100 TB answer to repeated fact-fact
joins (SCALE.md). Writing both sides bucketed by the join key lets the
sort-merge join read pre-partitioned data — the plan must contain NO
shuffle Exchange on the join path."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    warehouse = str(tmp_path / "wh")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", f"{warehouse}/li_b"
    ).saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", f"{warehouse}/o_b"
    ).saveAsTable("o_b")
    try:
        lb, ob = spark.table("li_b"), spark.table("o_b")
        joined = lb.join(
            ob.hint("merge"), lb.l_orderkey == ob.o_orderkey
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either bucketed side; the only
        # allowed exchange is the aggregation's
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part
        # and results match the plain (shuffling) join
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
