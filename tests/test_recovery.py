"""Checkpoint recovery (SURVEY §3.1 step 7): the reference's coordinator/
barrier/S3/PG apparatus + POST /jobs/{id}/recover (jobmanager/
api.py:446-515) collapses to restarting a query with the same
checkpointLocation. Assert exactly-once across a stop/restart: state
(running counts) carries over, no batch is reprocessed or lost."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from stream_processing_platform_spark.sources.streaming import file_source
from stream_processing_platform_spark.streaming import windows as W
from tests.test_streaming import EVENT_SCHEMA, T, stage

import pytest

# r15 verify-window tiering: staged-batch streaming / TWS / fuzz /
# cluster tests run in the slow tier (pytest.ini; -m slow at round close)
pytestmark = pytest.mark.slow





def test_restart_from_checkpoint_resumes_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    name1, name2 = "rec_" + uuid.uuid4().hex[:8], "rec_" + uuid.uuid4().hex[:8]

    def start(qname):
        stream = file_source(spark, src, EVENT_SCHEMA)
        agg = W.running_agg(
            stream, ["user_id"], [F.sum("value").alias("total"), F.count("*").alias("n")]
        )
        return (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # run 1: first batch only
    stage(spark, tmp_path, [[(1, "a", T(1), 10.0), (2, "b", T(2), 1.0)]])
    q1 = start(name1)
    q1.awaitTermination(120)
    r1 = {r.user_id: (r.total, r.n) for r in spark.table(name1).collect()}
    assert r1 == {1: (10.0, 1), 2: (1.0, 1)}

    # crash/cancel happened here; second batch arrives while job is down
    stage(spark, tmp_path, [[(1, "c", T(3), 5.0)]])

    # run 2: same checkpoint — must consume ONLY the new batch, on top of
    # recovered state (batch "a"/"b" not reprocessed: counts stay exact)
    q2 = start(name2)
    q2.awaitTermination(120)
    r2 = {r.user_id: (r.total, r.n) for r in spark.table(name2).collect()}
    assert r2 == {1: (15.0, 2), 2: (1.0, 1)}
