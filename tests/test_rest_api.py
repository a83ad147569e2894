"""End-to-end REST facade test: submit → status → metrics → savepoint →
cancel-with-savepoint → recover → cancel, all over real HTTP against the
in-process server, with a real Structured Streaming job underneath
(rate source → running count → memory sink). The reference serves the
same verbs from jobmanager/api.py but with hard-coded metric mocks
(api.py:340-352); here every number comes from StreamingQuery progress.
"""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from stream_processing_platform_spark.api.rest import JobServer, serve


def _call(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _rate_parquet_pipeline(spark, checkpoint_dir, path, rows_per_second=200):
    """Rate source → parquet sink: the file sink commits through the
    checkpoint, so cancel + recover resumes exactly-once (a memory sink
    cannot recover a checkpoint — Spark refuses)."""
    from stream_processing_platform_spark.sinks import parquet_sink
    from stream_processing_platform_spark.sources.streaming import rate_source

    df = rate_source(spark, rows_per_second)
    return parquet_sink(df, path, checkpoint_dir)


@pytest.fixture(scope="module")
def rest(spark):
    server = JobServer(spark)
    server.register_pipeline("rate_parquet", _rate_parquet_pipeline)
    httpd = serve(server)
    yield httpd.server_address[1]
    httpd.shutdown()


def _wait(predicate, timeout=30.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return True
        time.sleep(0.25)
    return False


def test_rest_job_lifecycle(spark, rest, tmp_path):
    port = rest
    code, health = _call(port, "GET", "/health")
    assert code == 200 and health["status"] == "ok"

    code, out = _call(
        port, "POST", "/jobs/submit",
        {"pipeline": "rate_parquet", "options": {"path": str(tmp_path / "out")}},
    )
    assert code == 200, out
    job_id, ckpt = out["job_id"], out["checkpoint_dir"]

    assert any(j["job_id"] == job_id for j in _call(port, "GET", "/jobs")[1]["jobs"])

    # metrics become real once a batch commits
    assert _wait(lambda: _call(port, "GET", f"/jobs/{job_id}/metrics")[1].get("batch_id")
                 is not None)
    code, m = _call(port, "GET", f"/jobs/{job_id}/metrics")
    assert m["job_id"] == job_id and m["num_input_rows"] >= 0

    code, st = _call(port, "GET", f"/jobs/{job_id}/status")
    assert st["state"] == "RUNNING" and st["active"]

    # checkpoints listing reflects the commit log (≥1 committed batch)
    code, ck = _call(port, "GET", f"/jobs/{job_id}/checkpoints")
    assert code == 200 and ck["latest_checkpoint_id"] is not None
    assert ck["checkpoints"][0]["status"] == "COMPLETED"
    assert ck["checkpoints"][0]["checkpoint_id"] == ck["latest_checkpoint_id"]

    # taskmanagers = live executors (local mode: the driver, all slots)
    code, tm = _call(port, "GET", "/taskmanagers")
    assert code == 200 and len(tm["task_managers"]) >= 1
    assert tm["task_managers"][0]["status"] == "ACTIVE"
    assert tm["task_managers"][0]["total_slots"] >= 1

    # SSE push channel: ≥2 live metric frames while the job runs
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/jobs/{job_id}/metrics/stream"
        "?interval_ms=200&max_events=3"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        events = [
            json.loads(line[len(b"data: "):])
            for line in r
            if line.startswith(b"data: ")
        ]
    assert len(events) >= 2, events
    assert all(e["job_id"] == job_id and e["state"] == "RUNNING" for e in events)

    code, sp = _call(port, "POST", f"/jobs/{job_id}/savepoint")
    assert code == 200 and sp["savepoint"] == ckpt

    # recover refuses while the job is live
    code, _ = _call(port, "POST", f"/jobs/{job_id}/recover")
    assert code == 409

    code, c = _call(port, "POST", f"/jobs/{job_id}/cancel?with_savepoint=true")
    assert code == 200 and c["found"] and c["savepoint"] == ckpt
    assert _wait(lambda: not _call(port, "GET", f"/jobs/{job_id}/status")[1]["active"])

    # recover resumes on the SAME checkpoint (exactly-once restart)
    code, r = _call(port, "POST", f"/jobs/{job_id}/recover")
    assert code == 200 and r["checkpoint_dir"] == ckpt and r["recovered_from"] == job_id
    new_id = r["job_id"]
    assert _wait(lambda: _call(port, "GET", f"/jobs/{new_id}/status")[1]["active"])
    _call(port, "POST", f"/jobs/{new_id}/cancel")


def test_rest_submit_unknown_pipeline_404(spark, rest):
    code, out = _call(rest, "POST", "/jobs/submit", {"pipeline": "nope"})
    assert code == 404 and "registered" in out


def test_rest_stream_metrics_unknown_job_404(spark, rest):
    # must 404 BEFORE SSE headers, consistent with /checkpoints — not a
    # 200 followed by a bogus CANCELED frame
    code, out = _call(rest, "GET", "/jobs/nope/metrics/stream")
    assert code == 404 and "unknown job" in out["error"]


_CSV = "name,temp\nalpha,12.5\nbeta,99.1\ngamma,7.0\n"


def test_rest_data_process_json_and_history(spark, rest):
    """POST /api/data/process with a JSON body (inline content) runs the
    file_ops DataFrame plan and records history; GET /api/data/history
    returns runs newest-first (reference gui/app_gcp.py:212-410)."""
    port = rest
    code, out = _call(
        port, "POST", "/api/data/process",
        {"filename": "t.csv", "content": _CSV, "op": "anomaly",
         "params": {"column": "temp", "threshold": 50}},
    )
    assert code == 200, out
    assert out["row_count"] == 3 and "status" in out["columns"]
    by_name = {r["name"]: r["status"] for r in out["rows"]}
    assert by_name == {"alpha": "NORMAL", "beta": "ANOMALY", "gamma": "NORMAL"}

    code, out2 = _call(
        port, "POST", "/api/data/process",
        {"filename": "t.csv", "content": _CSV, "op": "aggregate",
         "params": {"group_by": "name", "agg": "avg", "column": "temp"}},
    )
    assert code == 200 and out2["row_count"] == 3 and "avg_temp" in out2["columns"]

    code, hist = _call(port, "GET", "/api/data/history")
    assert code == 200
    ops = [h["op"] for h in hist["history"][:2]]
    assert ops == ["aggregate", "anomaly"]  # newest first
    assert all({"id", "filename", "op", "row_count", "processed_at"} <= set(h)
               for h in hist["history"])


def test_rest_data_process_multipart_upload(spark, rest):
    """The reference's upload form is multipart/form-data: file part +
    op/params fields. The row preview honors the limit field."""
    port = rest
    boundary = "testboundary42"
    parts = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="up.csv"\r\nContent-Type: text/csv\r\n\r\n{_CSV}\r\n'
        f'--{boundary}\r\nContent-Disposition: form-data; name="op"\r\n\r\nfilter\r\n'
        f'--{boundary}\r\nContent-Disposition: form-data; name="params"\r\n\r\n'
        f'{json.dumps({"column": "name", "value": "beta"})}\r\n'
        f'--{boundary}\r\nContent-Disposition: form-data; name="limit"\r\n\r\n500\r\n'
        f"--{boundary}--\r\n"
    )
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/data/process",
        method="POST",
        data=parts.encode(),
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    assert out["row_count"] == 1 and out["rows"][0]["name"] == "beta"

    # history recorded the multipart upload by its real filename
    _, hist = _call(port, "GET", "/api/data/history")
    assert hist["history"][0]["filename"] == "up.csv"


def test_rest_data_process_error_paths(spark, rest):
    port = rest
    code, out = _call(port, "POST", "/api/data/process",
                      {"content": _CSV, "op": "nope"})
    assert code == 400 and "unknown op" in out["error"]
    code, out = _call(port, "POST", "/api/data/process", {"op": "passthrough"})
    assert code == 400 and "content" in out["error"]
    # missing required param for the op → 400, not a 500
    code, out = _call(port, "POST", "/api/data/process",
                      {"content": _CSV, "op": "aggregate", "params": {}})
    assert code == 400, out


def test_rest_demo_lifecycle(spark, rest):
    """POST /api/demo/start launches the real IoT generator pipeline;
    /api/demo/status reports live counts (total/anomalies/throughput/
    checkpoints) from the StreamingQuery + memory sink — not the
    reference's mocks; start is idempotent; stop cancels the query
    (reference gui/app_gcp.py:700-791)."""
    port = rest
    code, out = _call(port, "POST", "/api/demo/start")
    assert code == 200 and out["status"] == "started"
    job_id = out["job_id"]

    # idempotent start
    code, again = _call(port, "POST", "/api/demo/start")
    assert again["status"] == "already running" and again["job_id"] == job_id

    # events flow: totals grow, anomaly labeling is live, checkpoint commits
    def has_events():
        _, st = _call(port, "GET", "/api/demo/status")
        return st["running"] and st["stats"]["total_events"] > 0
    assert _wait(has_events)
    _, st = _call(port, "GET", "/api/demo/status")
    assert st["stats"]["total_events"] >= st["stats"]["anomalies"] >= 0
    assert len(st["recent_events"]) > 0
    ev = st["recent_events"][0]
    assert {"ts", "sensor_id", "temperature", "humidity", "is_anomaly"} <= set(ev)
    assert _wait(lambda: _call(port, "GET", "/api/demo/status")[1]["stats"]["checkpoints"] > 0)

    code, out = _call(port, "POST", "/api/demo/stop")
    assert code == 200 and out["status"] == "stopped"
    assert _wait(lambda: not _call(port, "GET", "/api/demo/status")[1]["running"])
    # status still serves the final tallies after stop
    _, st = _call(port, "GET", "/api/demo/status")
    assert st["stats"]["total_events"] > 0


def test_dashboard_served_at_root(spark, rest):
    """GET / (and /dashboard) returns the embedded single-file GUI —
    the engine-side answer to the reference's Flask dashboard."""
    port = rest
    for path in ("/", "/dashboard"):
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/html")
            html = resp.read().decode()
    assert "EventSource" in html          # SSE live-metrics wiring
    assert "/cluster/metrics" in html     # cluster panel
    assert "cancel" in html               # job actions
    # XSS hardening: job fields must never be interpolated into innerHTML
    assert "${j.pipeline}" not in html and "${j.state}" not in html


def test_rest_preview_limit_clamped_and_history_bounded(spark, rest):
    """r8 advice: the preview limit is clamped server-side (limit=10**9
    must not drive an unbounded driver collect) and the history ring
    keeps at most its cap."""
    from stream_processing_platform_spark.api.rest import (
        _HISTORY_MAX,
        _PREVIEW_LIMIT_MAX,
        JobServer,
    )

    port = rest
    csv = "a,b\n" + "\n".join(f"{i},{i * 2}" for i in range(_PREVIEW_LIMIT_MAX + 50))
    status, out = _call(
        port, "POST", "/api/data/process",
        {"content": csv, "filename": "big.csv", "op": "passthrough", "limit": 10**9},
    )
    assert status == 200
    assert out["row_count"] == _PREVIEW_LIMIT_MAX  # clamped, not 550
    # history ring bound, checked directly on a fresh server
    srv = JobServer(spark)
    srv.history = [{"id": i} for i in range(_HISTORY_MAX)]
    status, out = srv.data_process(
        {"content": "a\n1", "filename": "t.csv", "op": "passthrough"}
    )
    assert status == 200 and len(srv.history) == _HISTORY_MAX
