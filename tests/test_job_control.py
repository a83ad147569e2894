"""Job-control facade: the reference's REST lifecycle (submit/status/
metrics/cancel, jobmanager/api.py:169-626) on spark.streams."""

from __future__ import annotations

import time

from stream_processing_platform_spark.api import job_control as jc
from stream_processing_platform_spark.sources.streaming import rate_source


def test_job_lifecycle(spark, tmp_path):
    df = rate_source(spark, rows_per_second=500)
    q = (
        df.writeStream.format("memory")
        .queryName("jc_test_job")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        job_id = str(q.id)
        jobs = jc.list_jobs(spark)
        assert any(j["job_id"] == job_id for j in jobs)

        status = jc.job_status(spark, job_id)
        assert status["active"] is True
        assert status["state"] in ("CREATED", "RUNNING")

        # by-name lookup works too
        assert jc.job_status(spark, "jc_test_job")["job_id"] == job_id

        deadline = time.time() + 30
        while time.time() < deadline and not q.lastProgress:
            time.sleep(0.5)
        metrics = jc.job_metrics(spark, job_id)
        assert metrics["job_id"] == job_id
        assert metrics["batch_id"] is not None

        out = jc.cancel_job(spark, job_id)
        assert out["found"] is True
        assert not q.isActive
        assert jc.job_status(spark, job_id)["active"] is False

        cm = jc.cluster_metrics(spark)
        assert cm["default_parallelism"] >= 1
    finally:
        if q.isActive:
            q.stop()


def test_metrics_conf_exposes_prometheus_surface():
    """The monitoring artifacts (monitoring/prometheus.yml + grafana
    dashboard) depend on these exact conf keys — pin them so a rename
    breaks here, not silently in a deployment."""
    from stream_processing_platform_spark.session import metrics_conf

    conf = metrics_conf()
    assert conf["spark.ui.prometheus.enabled"] == "true"
    assert conf["spark.sql.streaming.metricsEnabled"] == "true"
    assert conf["spark.metrics.conf.*.sink.prometheusServlet.path"] == (
        "/metrics/prometheus"
    )
