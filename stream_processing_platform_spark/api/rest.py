"""REST job-control server — the reference's jobmanager HTTP surface
(`jobmanager/api.py:169-626`: submit/list/status/cancel/savepoint/
recover/metrics) served over the real `spark.streams` state via
stdlib ``http.server`` (no web framework in the container; the handlers
are the plain dicts from ``api/job_control.py``, so porting to FastAPI
is a route-decorator exercise).

Semantics mapping:
- POST /jobs/submit      — body ``{"pipeline": name, "options": {...}}``
  starts a registered pipeline builder (the reference deserializes an
  uploaded job-graph file, api.py:169-253; here a pipeline IS a Python
  builder ``(spark, checkpoint_dir, **options) -> StreamingQuery``).
- POST /jobs/{id}/cancel?with_savepoint=true — Spark's checkpoint is
  always a consistent savepoint; the response returns its location
  (reference api.py:281-311 pauses the job to cut an explicit one).
- POST /jobs/{id}/savepoint — reports the checkpoint location + last
  committed batch without stopping (reference api.py:355-381).
- POST /jobs/{id}/recover — restarts the SAME pipeline on the SAME
  checkpoint: exactly-once resume (reference api.py:446-515).
- GET /jobs/{id}/metrics/stream — live per-job metrics push, one frame
  per interval (reference WS /ws/jobs/{id}, api.py:612-626 +
  websocket_server.py), as server-sent events (stdlib-only container).
- GET /jobs/{id}/checkpoints — completed micro-batch commits from the
  checkpoint's commit log (reference api.py:401-429).
- GET /taskmanagers — live executors from the status tracker
  (reference api.py:517-539).
- POST /api/data/process — upload-and-process a CSV/JSON file with one
  of the five ``api/file_ops`` ops (reference gui/app_gcp.py:212-410,
  ``POST /api/data/process``): multipart/form-data (``file`` + ``op`` +
  ``params`` fields, the reference's upload form) or a JSON body with
  inline ``content``. Returns the processed rows (capped, like the
  reference's 500-row preview) and records a history entry.
- GET /api/data/history — past processing runs, newest first
  (reference gui/app_gcp.py:392-410, ``GET /api/data/history``).
- POST /api/demo/start|stop + GET /api/demo/status — demo orchestration
  (reference gui/app_gcp.py:700-791): start launches the real IoT
  synthetic generator through an anomaly-labeling streaming pipeline
  (the reference spins a Python thread + auto-submits a Kafka job);
  status reports LIVE numbers from the StreamingQuery and the sink
  table where the reference returns mocks.
"""

from __future__ import annotations

import json
import logging
import re
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

# /api/data/process preview cap (the reference caps its row loop at 500)
# and the history ring size a long-lived server retains.
_PREVIEW_LIMIT_MAX = 500
_HISTORY_MAX = 100
from pyspark.sql.streaming import StreamingQuery

from stream_processing_platform_spark.api import job_control as jc

PipelineBuilder = Callable[..., StreamingQuery]


class JobServer:
    """Route handlers + the submitted-job registry (job_id → pipeline,
    checkpoint, options) that lets cancel/savepoint/recover reference a
    job after its StreamingQuery object is gone."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.pipelines: dict[str, PipelineBuilder] = {}
        self.jobs: dict[str, dict[str, Any]] = {}
        self.history: list[dict[str, Any]] = []  # data-process runs, newest first
        self._lock = threading.Lock()
        # held across demo_start's check+start so two concurrent starts
        # can't race past the existence check into a duplicate
        # queryName start (self._lock can't cover it: the streaming
        # start is slow and other endpoints need the main lock)
        self._demo_lock = threading.Lock()

    def register_pipeline(self, name: str, builder: PipelineBuilder) -> None:
        self.pipelines[name] = builder

    # -- route handlers (all return (status_code, payload)) --------------

    def health(self) -> tuple[int, dict]:
        return 200, {"status": "ok", "active_jobs": len(self.spark.streams.active)}

    def submit(self, body: dict) -> tuple[int, dict]:
        name = body.get("pipeline")
        if name not in self.pipelines:
            return 404, {"error": f"unknown pipeline {name!r}",
                         "registered": sorted(self.pipelines)}
        checkpoint = body.get("checkpoint_dir") or tempfile.mkdtemp(prefix="spp_rest_ckpt_")
        options = body.get("options") or {}
        try:
            q = self.pipelines[name](self.spark, checkpoint, **options)
        except Exception as e:  # surface builder errors as a 400, not a 500
            return 400, {"error": str(e)}
        with self._lock:
            self.jobs[str(q.id)] = {
                "pipeline": name, "checkpoint": checkpoint, "options": options,
                "name": q.name, "run_id": str(q.runId),
            }
        return 200, {"job_id": str(q.id), "run_id": str(q.runId),
                     "state": jc.JobState.CREATED.value, "checkpoint_dir": checkpoint}

    def list_jobs(self) -> tuple[int, dict]:
        return 200, {"jobs": jc.list_jobs(self.spark)}

    def status(self, job_id: str) -> tuple[int, dict]:
        return 200, jc.job_status(self.spark, job_id)

    def metrics(self, job_id: str) -> tuple[int, dict]:
        return 200, jc.job_metrics(self.spark, job_id)

    def cancel(self, job_id: str, with_savepoint: bool) -> tuple[int, dict]:
        out = jc.cancel_job(self.spark, job_id)
        if with_savepoint:
            meta = self.jobs.get(job_id)
            out["savepoint"] = meta["checkpoint"] if meta else None
        return 200, out

    def savepoint(self, job_id: str) -> tuple[int, dict]:
        meta = self.jobs.get(job_id)
        if meta is None:
            return 404, {"error": f"unknown job {job_id!r}"}
        m = jc.job_metrics(self.spark, job_id)
        return 200, {"job_id": job_id, "savepoint": meta["checkpoint"],
                     "batch_id": m.get("batch_id")}

    def recover(self, job_id: str) -> tuple[int, dict]:
        meta = self.jobs.get(job_id)
        if meta is None:
            return 404, {"error": f"unknown job {job_id!r}"}
        live = [str(q.id) for q in self.spark.streams.active]
        if job_id in live:
            return 409, {"error": f"job {job_id!r} still active — cancel first"}
        try:
            q = self.pipelines[meta["pipeline"]](self.spark, meta["checkpoint"], **meta["options"])
        except Exception as e:  # e.g. a sink that cannot resume this checkpoint
            return 400, {"error": str(e)}
        with self._lock:
            self.jobs[str(q.id)] = {**meta, "run_id": str(q.runId), "recovered_from": job_id}
        return 200, {"job_id": str(q.id), "recovered_from": job_id,
                     "checkpoint_dir": meta["checkpoint"], "run_id": str(q.runId)}

    def cluster_metrics(self) -> tuple[int, dict]:
        return 200, jc.cluster_metrics(self.spark)

    def data_process(self, body: dict) -> tuple[int, dict]:
        """POST /api/data/process (reference gui/app_gcp.py:212-410):
        stage the uploaded content to a temp file, run the requested
        ``api/file_ops`` op as a DataFrame plan, return a capped row
        preview, and append a history entry. The reference row-loops in
        Python capped at 500 rows; here only the PREVIEW is capped —
        the plan itself is distributed."""
        import datetime
        import os

        from stream_processing_platform_spark.api import file_ops

        op = body.get("op", "passthrough")
        if op not in file_ops.OPS:
            return 400, {"error": f"unknown op {op!r}", "expected": list(file_ops.OPS)}
        content = body.get("content")
        if content is None:
            return 400, {"error": "no file content (multipart 'file' field or JSON 'content')"}
        filename = body.get("filename") or "upload.csv"
        try:
            limit = int(body.get("limit", 500))
        except (TypeError, ValueError):
            return 400, {"error": f"limit must be an integer, got {body.get('limit')!r}"}
        # clamp: the preview is driver-side .collect() — an unbounded
        # client value (limit=10**9) would pull the whole upload onto
        # the driver (the reference caps its row loop at 500)
        limit = max(0, min(limit, _PREVIEW_LIMIT_MAX))
        suffix = "." + filename.rsplit(".", 1)[-1] if "." in filename else ".csv"
        fd, path = tempfile.mkstemp(prefix="spp_upload_", suffix=suffix)
        try:
            with os.fdopen(fd, "w") as fh:
                fh.write(content)
            df = file_ops.process_file(self.spark, path, op, body.get("params") or {})
            rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
            columns = df.columns
        except KeyError as e:  # missing required param for the op
            return 400, {"error": f"missing required param {e}"}
        except Exception as e:  # malformed file / bad column — caller error
            return 400, {"error": str(e)}
        finally:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        with self._lock:
            entry = {
                "id": len(self.history) + 1,
                "filename": filename,
                "op": op,
                "row_count": len(rows),
                "columns": columns,
                "processed_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            }
            self.history.insert(0, entry)
            del self.history[_HISTORY_MAX:]  # bound a long-lived server's memory
        return 200, {
            "history_id": entry["id"],
            "op": op,
            "columns": columns,
            "rows": rows,
            "row_count": len(rows),
        }

    def data_history(self) -> tuple[int, dict]:
        """GET /api/data/history — processing runs, newest first
        (reference gui/app_gcp.py:392-410)."""
        with self._lock:
            return 200, {"history": list(self.history)}

    # -- demo orchestration (reference gui/app_gcp.py:700-791) -----------
    # The reference's demo spins a Python generator thread + auto-submits
    # a Kafka passthrough job, then reports MOCKED stats. Here /demo/start
    # launches the real IoT synthetic generator (sources/generators.py)
    # through an anomaly-labeling pipeline into a memory sink, and
    # /demo/status reads every number from the live StreamingQuery and
    # the sink table — no mocks.

    _DEMO_TABLE = "spp_demo_events"

    def demo_start(self, rows_per_second: int = 200) -> tuple[int, dict]:
        with self._demo_lock:
            return self._demo_start_locked(rows_per_second)

    def _demo_start_locked(self, rows_per_second: int) -> tuple[int, dict]:
        from pyspark.sql import functions as F

        from stream_processing_platform_spark.sources.generators import (
            iot_sensor_stream,
        )

        with self._lock:
            demo = self.jobs.get("__demo__")
            if demo is not None and any(
                str(q.id) == demo["job_id"] for q in self.spark.streams.active
            ):
                return 200, {"status": "already running", "job_id": demo["job_id"]}
        checkpoint = tempfile.mkdtemp(prefix="spp_demo_ckpt_")
        events = iot_sensor_stream(self.spark, rows_per_second).withColumn(
            "is_anomaly", F.col("temperature") == -999.9
        )
        q = (
            events.writeStream.format("memory")
            .queryName(self._DEMO_TABLE)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .start()
        )
        with self._lock:
            self.jobs["__demo__"] = {
                "job_id": str(q.id),
                "checkpoint": checkpoint,
                "pipeline": "demo_iot",
                "options": {"rows_per_second": rows_per_second},
            }
            self.jobs[str(q.id)] = self.jobs["__demo__"]
        return 200, {"status": "started", "job_id": str(q.id)}

    def demo_stop(self) -> tuple[int, dict]:
        with self._lock:
            demo = self.jobs.get("__demo__")
        if demo is None:
            return 200, {"status": "stopped"}
        jc.cancel_job(self.spark, demo["job_id"])
        return 200, {"status": "stopped", "job_id": demo["job_id"]}

    def demo_status(self) -> tuple[int, dict]:
        from pyspark.sql import functions as F

        with self._lock:
            demo = self.jobs.get("__demo__")
        if demo is None:
            return 200, {"running": False, "stats": {}, "recent_events": [],
                         "latest_checkpoint": None}
        m = jc.job_metrics(self.spark, demo["job_id"])
        running = any(
            str(q.id) == demo["job_id"] for q in self.spark.streams.active
        )
        try:
            t = self.spark.table(self._DEMO_TABLE)
            agg = t.agg(
                F.count("*").alias("n"),
                F.count(F.when(F.col("is_anomaly"), 1)).alias("anom"),
            ).collect()[0]
            recent = [
                r.asDict() for r in
                t.orderBy(F.col("ts").desc()).limit(20).collect()
            ]
        except Exception:  # sink table not materialized yet
            agg, recent = None, []
        ck = jc.job_checkpoints(self.spark, demo["job_id"], demo["checkpoint"])
        return 200, {
            "running": running,
            "stats": {
                "total_events": int(agg["n"]) if agg is not None else 0,
                "anomalies": int(agg["anom"]) if agg is not None else 0,
                "throughput": m.get("records_per_second", 0.0),
                "checkpoints": len(ck.get("checkpoints", [])),
            },
            "recent_events": recent,
            "latest_checkpoint": ck.get("latest_checkpoint_id"),
        }

    def checkpoints(self, job_id: str) -> tuple[int, dict]:
        meta = self.jobs.get(job_id)
        if meta is None:
            return 404, {"error": f"unknown job {job_id!r}"}
        return 200, jc.job_checkpoints(self.spark, job_id, meta["checkpoint"])

    def taskmanagers(self) -> tuple[int, dict]:
        return 200, jc.task_managers(self.spark)

    def stream_metrics(self, wfile, job_id: str, interval: float, max_events: int) -> None:
        """Server-sent-events body for GET /jobs/{id}/metrics/stream —
        the reference's WS /ws/jobs/{id} push channel
        (jobmanager/api.py:612-626 + websocket_server.py: one metrics
        frame per second until disconnect), served as SSE because the
        container has no websocket lib; same payloads, same cadence.
        Ends on client disconnect, after ``max_events`` (0 = unbounded),
        or one final frame after the job stops."""
        import time

        sent = 0
        while True:
            # Frame construction can raise; after SSE headers there is no
            # way to report a status code, so every failure ends the
            # stream — but a client disconnect (Broken pipe / Connection
            # reset) is business as usual and closes silently, while a
            # real error (Spark mid-poll, serialization) is logged and
            # signalled with a terminal `event: error` frame so the two
            # are distinguishable on both ends.
            try:
                status = jc.job_status(self.spark, job_id)
                frame = jc.job_metrics(self.spark, job_id)
                frame["state"] = status["state"]
                wfile.write(f"data: {json.dumps(frame, default=str)}\n\n".encode())
                wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                return
            except Exception as e:
                logging.getLogger(__name__).warning(
                    "SSE metrics stream for job %s aborted: %s", job_id, e
                )
                try:
                    wfile.write(
                        f"event: error\ndata: {json.dumps({'error': str(e)})}\n\n".encode()
                    )
                    wfile.flush()
                except OSError:
                    pass  # client went away while we reported — nothing to do
                return
            sent += 1
            if max_events and sent >= max_events:
                return
            if not status.get("active", False):
                return
            time.sleep(interval)


_ROUTES: list[tuple[str, re.Pattern, str]] = [
    ("GET", re.compile(r"^/health$"), "health"),
    ("GET", re.compile(r"^/jobs$"), "list_jobs"),
    ("GET", re.compile(r"^/jobs/([^/]+)/status$"), "status"),
    ("GET", re.compile(r"^/jobs/([^/]+)/metrics$"), "metrics"),
    ("GET", re.compile(r"^/jobs/([^/]+)/metrics/stream$"), "stream_metrics"),
    ("GET", re.compile(r"^/jobs/([^/]+)/checkpoints$"), "checkpoints"),
    ("GET", re.compile(r"^/taskmanagers$"), "taskmanagers"),
    ("GET", re.compile(r"^/cluster/metrics$"), "cluster_metrics"),
    ("GET", re.compile(r"^/api/data/history$"), "data_history"),
    ("GET", re.compile(r"^/api/demo/status$"), "demo_status"),
    ("POST", re.compile(r"^/api/demo/start$"), "demo_start"),
    ("POST", re.compile(r"^/api/demo/stop$"), "demo_stop"),
    ("POST", re.compile(r"^/jobs/submit$"), "submit"),
    ("POST", re.compile(r"^/jobs/([^/]+)/cancel$"), "cancel"),
    ("POST", re.compile(r"^/jobs/([^/]+)/savepoint$"), "savepoint"),
    ("POST", re.compile(r"^/jobs/([^/]+)/recover$"), "recover"),
    ("POST", re.compile(r"^/api/data/process$"), "data_process"),
]


def _multipart_to_body(content_type: str, raw: bytes) -> dict:
    """Minimal multipart/form-data parser (the stdlib ``cgi`` module is
    gone in 3.13): the ``file`` part supplies filename + content; other
    parts are plain fields (``params`` is parsed as JSON). Enough for
    the reference's upload form — not a general MIME implementation."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("multipart body without a boundary")
    body: dict = {}
    for part in raw.split(b"--" + m.group(1).encode()):
        part = part.removeprefix(b"\r\n")
        if part in (b"", b"--", b"--\r\n"):
            continue
        header, sep, value = part.partition(b"\r\n\r\n")
        if not sep:
            continue
        value = value.removesuffix(b"\r\n")
        headers = header.decode("utf-8", errors="replace")
        name = re.search(r'name="([^"]+)"', headers)
        if not name:
            continue
        fname = re.search(r'filename="([^"]*)"', headers)
        if fname:
            body["filename"] = fname.group(1)
            body["content"] = value.decode("utf-8", errors="replace")
        else:
            body[name.group(1)] = value.decode("utf-8", errors="replace")
    if isinstance(body.get("params"), str):
        body["params"] = json.loads(body["params"])
    return body


def _make_handler(server: JobServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _dispatch(self, method: str) -> None:
            parsed = urlparse(self.path)
            if method == "GET" and parsed.path in ("/", "/dashboard"):
                from stream_processing_platform_spark.api.dashboard import DASHBOARD_HTML

                data = DASHBOARD_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            for m, pat, fn in _ROUTES:
                match = pat.match(parsed.path)
                if m == method and match:
                    args = list(match.groups())
                    if fn == "stream_metrics":
                        # SSE: headers now, then a long-lived chunked body.
                        # Unknown ids must 404 BEFORE headers go out
                        # (consistent with /checkpoints); param parsing
                        # must answer 400 (not a dropped connection) on
                        # garbage; interval is floored so interval_ms=0
                        # can't busy-loop the server.
                        if args[0] not in server.jobs:
                            data = json.dumps(
                                {"error": f"unknown job {args[0]!r}"}
                            ).encode()
                            self.send_response(404)
                            self.send_header("Content-Type", "application/json")
                            self.send_header("Content-Length", str(len(data)))
                            self.end_headers()
                            self.wfile.write(data)
                            return
                        try:
                            qs = parse_qs(parsed.query)
                            interval = max(
                                0.05, float(qs.get("interval_ms", ["1000"])[0]) / 1000.0
                            )
                            max_events = int(qs.get("max_events", ["0"])[0])
                        except ValueError as e:
                            data = json.dumps({"error": str(e)}).encode()
                            self.send_response(400)
                            self.send_header("Content-Type", "application/json")
                            self.send_header("Content-Length", str(len(data)))
                            self.end_headers()
                            self.wfile.write(data)
                            return
                        self.send_response(200)
                        self.send_header("Content-Type", "text/event-stream")
                        self.send_header("Cache-Control", "no-cache")
                        self.end_headers()
                        server.stream_metrics(self.wfile, args[0], interval, max_events)
                        return
                    try:
                        if fn == "submit":
                            n = int(self.headers.get("Content-Length") or 0)
                            body = json.loads(self.rfile.read(n) or b"{}")
                            code, payload = server.submit(body)
                        elif fn == "data_process":
                            n = int(self.headers.get("Content-Length") or 0)
                            raw = self.rfile.read(n)
                            ctype = self.headers.get("Content-Type", "")
                            try:
                                body = (
                                    _multipart_to_body(ctype, raw)
                                    if ctype.startswith("multipart/form-data")
                                    else json.loads(raw or b"{}")
                                )
                            except (ValueError, json.JSONDecodeError) as e:
                                body, code, payload = None, 400, {"error": str(e)}
                            if body is not None:
                                code, payload = server.data_process(body)
                        elif fn == "cancel":
                            qs = parse_qs(parsed.query)
                            wsp = (qs.get("with_savepoint", ["false"])[0]).lower() == "true"
                            code, payload = server.cancel(args[0], wsp)
                        else:
                            code, payload = getattr(server, fn)(*args)
                    except Exception as e:  # never drop the connection
                        code, payload = 500, {"error": str(e)}
                    data = json.dumps(payload, default=str).encode()
                    self.send_response(code)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
            self.send_response(404)
            self.end_headers()

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

    return Handler


def serve(server: JobServer, port: int = 0) -> ThreadingHTTPServer:
    """Start the HTTP server on localhost:``port`` (0 = ephemeral) in a
    daemon thread; returns the ThreadingHTTPServer (``.server_address``
    for the bound port, ``.shutdown()`` to stop)."""
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(server))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
