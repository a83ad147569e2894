"""Job-control facade — the reference's REST surface on spark.streams.

Reference (jobmanager/api.py:169-626): POST /jobs/submit, GET /jobs,
GET /jobs/{id}/status, POST /jobs/{id}/cancel, GET /jobs/{id}/metrics,
WS /ws/jobs/{id}; job states CREATED/RUNNING/FAILING/FAILED/CANCELLING/
CANCELED/FINISHED (api.py:42-50). In Spark each streaming job IS a
StreamingQuery: submit = writeStream.start(), job_id = query.id, cancel =
query.stop(), recover = restart with the same checkpointLocation,
metrics = lastProgress. These helpers return plain dicts so any HTTP
layer (FastAPI etc.) can serve them verbatim; unlike the reference's
hard-coded mock numbers (api.py:340-352) these are real.
"""

from __future__ import annotations

from enum import Enum
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


class JobState(str, Enum):
    """Reference job lifecycle (jobmanager/api.py:42-50) projected onto
    the StreamingQuery lifecycle."""

    CREATED = "CREATED"
    RUNNING = "RUNNING"
    FAILED = "FAILED"
    CANCELED = "CANCELED"
    FINISHED = "FINISHED"


def _find(spark: SparkSession, job_id: str) -> StreamingQuery | None:
    for q in spark.streams.active:
        if str(q.id) == job_id or q.name == job_id:
            return q
    return None


def job_state(q: StreamingQuery) -> JobState:
    if q.isActive:
        return JobState.RUNNING if q.lastProgress else JobState.CREATED
    if q.exception() is not None:
        return JobState.FAILED
    return JobState.FINISHED


def list_jobs(spark: SparkSession) -> list[dict[str, Any]]:
    """GET /jobs (api.py:256-270)."""
    return [
        {"job_id": str(q.id), "run_id": str(q.runId), "name": q.name,
         "state": job_state(q).value}
        for q in spark.streams.active
    ]


def job_status(spark: SparkSession, job_id: str) -> dict[str, Any]:
    """GET /jobs/{id}/status (api.py:273-287)."""
    q = _find(spark, job_id)
    if q is None:
        return {"job_id": job_id, "state": JobState.CANCELED.value, "active": False}
    return {
        "job_id": str(q.id),
        "name": q.name,
        "state": job_state(q).value,
        "active": q.isActive,
        "status": q.status,
    }


def job_metrics(spark: SparkSession, job_id: str) -> dict[str, Any]:
    """GET /jobs/{id}/metrics (api.py:326-352) — but real numbers from
    lastProgress instead of the reference's hard-coded mocks."""
    q = _find(spark, job_id)
    if q is None or not q.lastProgress:
        return {"job_id": job_id, "records_per_second": 0.0, "batch_duration_ms": 0}
    p = q.lastProgress
    duration = p.get("durationMs", {}) or {}
    state_ops = p.get("stateOperators", []) or []
    return {
        "job_id": str(q.id),
        "batch_id": p.get("batchId"),
        "records_per_second": p.get("processedRowsPerSecond", 0.0),
        "input_rows_per_second": p.get("inputRowsPerSecond", 0.0),
        "num_input_rows": p.get("numInputRows", 0),
        "batch_duration_ms": duration.get("triggerExecution", 0),
        "state_rows": sum(op.get("numRowsTotal", 0) for op in state_ops),
        "state_bytes": sum(op.get("memoryUsedBytes", 0) for op in state_ops),
        "watermark": p.get("eventTime", {}).get("watermark"),
    }


def cancel_job(spark: SparkSession, job_id: str) -> dict[str, Any]:
    """POST /jobs/{id}/cancel (api.py:290-311). Spark's checkpoint is
    always a consistent savepoint — restarting with the same
    checkpointLocation resumes exactly-once (the reference's
    cancel-with-savepoint + /recover flow, api.py:446-515)."""
    q = _find(spark, job_id)
    if q is None:
        return {"job_id": job_id, "state": JobState.CANCELED.value, "found": False}
    q.stop()
    return {"job_id": str(q.id), "state": JobState.CANCELED.value, "found": True}


def cluster_metrics(spark: SparkSession) -> dict[str, Any]:
    """GET /cluster/metrics (api.py:529-551)."""
    sc = spark.sparkContext
    return {
        "active_jobs": len(spark.streams.active),
        "default_parallelism": sc.defaultParallelism,
        "spark_version": spark.version,
        "app_id": sc.applicationId,
    }


def job_checkpoints(spark: SparkSession, job_id: str, checkpoint_dir: str) -> dict[str, Any]:
    """GET /jobs/{id}/checkpoints (reference api.py:401-429, which reads
    the checkpoint coordinator's completed map). Spark's commit log IS
    the completed-checkpoint list: one file per committed micro-batch
    under ``<checkpoint>/commits/<batchId>``, written only after offsets
    + state are durable. Listed via the Hadoop FileSystem API so any
    scheme works (file://, hdfs://, s3a:// — where a checkpoint dir
    actually lives at scale), not just the local filesystem."""
    jvm = spark._jvm
    commits = jvm.org.apache.hadoop.fs.Path(checkpoint_dir, "commits")
    fs = commits.getFileSystem(spark._jsc.hadoopConfiguration())
    entries: list[dict[str, Any]] = []
    if fs.exists(commits):
        for st in fs.listStatus(commits):
            name = st.getPath().getName()
            if name.isdigit():
                entries.append(
                    {
                        "checkpoint_id": int(name),
                        "timestamp": st.getModificationTime(),
                        "status": "COMPLETED",
                        "storage_path": st.getPath().toString(),
                    }
                )
    entries.sort(key=lambda e: e["checkpoint_id"], reverse=True)
    return {
        "job_id": job_id,
        "checkpoints": entries,
        "latest_checkpoint_id": entries[0]["checkpoint_id"] if entries else None,
    }


def task_managers(spark: SparkSession) -> dict[str, Any]:
    """GET /taskmanagers (reference api.py:517-539): the reference's
    TaskManager = a Spark executor; list them from the status tracker.
    In local mode the driver is the single executor holding every slot;
    slots-per-executor is approximated as parallelism / executor count
    (exact per-executor core counts aren't in the public tracker API)."""
    sc = spark.sparkContext
    infos = sc._jsc.sc().statusTracker().getExecutorInfos()
    slots = max(1, sc.defaultParallelism // max(1, len(infos)))
    out = []
    for info in infos:
        running = info.numRunningTasks()
        out.append(
            {
                "task_manager_id": f"{info.host()}:{info.port()}",
                "host": info.host(),
                "port": info.port(),
                "status": "ACTIVE",  # the tracker only reports live executors
                "total_slots": slots,
                "available_slots": max(slots - running, 0),
                "num_running_tasks": running,
                "cache_memory_bytes": info.cacheSize(),
            }
        )
    return {"task_managers": out}
