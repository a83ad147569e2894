"""Custom Python DataSource (sources/custom_datasource.py): the
engine-side custom source/sink path — batch determinism, filter
pushdown, offset-tracked streaming with exactly-once resume, and the
manifest sink's two-phase commit protocol."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan, StringContains

from stream_processing_platform_spark.sources.custom_datasource import (
    ManifestStreamWriter,
    PartFile,
    TickBatchReader,
    TickRange,
    read_manifested,
    register_custom_sources,
    tick_row,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_custom_sources(spark)


def test_batch_read_is_deterministic(spark):
    df = spark.read.format("spp_ticks").option("rows", 500).load()
    assert df.count() == 500
    got = {tuple(r) for r in df.where(F.col("tick_id") < 10).collect()}
    assert got == {tick_row(t) for t in range(10)}


def test_push_filters_prune_and_leftovers():
    r = TickBatchReader({"rows": "1000", "partitions": "4"})
    leftovers = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("tick_id",), 100),
                LessThan(("tick_id",), 200),
                EqualTo(("symbol",), "AAPL"),
                StringContains(("symbol",), "A"),  # not ours -> returned
            ]
        )
    )
    assert [type(f).__name__ for f in leftovers] == ["StringContains"]
    assert (r.lo, r.hi, r.symbol) == (100, 200, "AAPL")
    parts = r.partitions()
    # pruned BEFORE generation: no partition covers ticks outside [100, 200)
    assert min(p.start for p in parts) == 100
    assert max(p.end for p in parts) == 200


def test_pushdown_results_match_unpushed(spark):
    df = spark.read.format("spp_ticks").option("rows", 1000).load()
    pushed = df.where(
        (F.col("tick_id") >= 100) & (F.col("tick_id") < 200) & (F.col("symbol") == "AAPL")
    )
    expect = [tick_row(t) for t in range(100, 200) if tick_row(t)[2] == "AAPL"]
    assert sorted(tuple(r) for r in pushed.collect()) == sorted(expect)


def test_stream_drains_to_max_ticks(spark):
    ckpt = tempfile.mkdtemp(prefix="spp_ds_ckpt_")
    s = spark.readStream.format("spp_ticks").option("max_ticks", 250).load()
    name = "spp_ds_drain"
    q = (
        s.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    t = spark.table(name)
    assert t.count() == 250
    # content identical to the batch form over the same range
    assert {tuple(r) for r in t.where(F.col("tick_id") < 5).collect()} == {
        tick_row(t) for t in range(5)
    }


def test_stream_resume_is_exactly_once(spark):
    """Restart from the checkpoint with a larger max_ticks: the second
    run emits ONLY ticks past the committed offset — the reference's
    KafkaSourceOperator recovery contract (sources.py:86-130), executed
    through Spark's offset log against our offsets."""
    out = tempfile.mkdtemp(prefix="spp_ds_out_")
    ckpt = tempfile.mkdtemp(prefix="spp_ds_ckpt_")
    clog = os.path.join(tempfile.mkdtemp(prefix="spp_ds_log_"), "commits.jsonl")

    def run(max_ticks: int) -> None:
        s = (
            spark.readStream.format("spp_ticks")
            .option("max_ticks", max_ticks).option("commit_log", clog).load()
        )
        q = (
            s.writeStream.format("spp_manifest").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run(300)
    first = read_manifested(out)
    assert len(first) == 300 and len({r["tick_id"] for r in first}) == 300
    run(450)
    rows = read_manifested(out)
    ids = sorted(r["tick_id"] for r in rows)
    assert len(ids) == 450 and len(set(ids)) == 450  # no loss, no dupes
    assert ids[0] == 0 and ids[-1] == 449
    # the source's ack hook observed the committed offset of run 1
    commits = [json.loads(line) for line in open(clog)]
    assert {"tick": 300} in commits


def test_manifest_reader_ignores_orphan_files(spark):
    out = tempfile.mkdtemp(prefix="spp_ds_orphan_")
    w = ManifestStreamWriter({"path": out}, overwrite=False)
    # a committed batch...
    os.makedirs(os.path.join(out, "_data"), exist_ok=True)
    good = os.path.join(out, "_data", "part-good.jsonl")
    with open(good, "w") as fh:
        fh.write(json.dumps({"tick_id": 1}) + "\n")
    w.commit([PartFile(path="part-good.jsonl", rows=1)], batchId=0)
    # ...plus an orphan from a crashed attempt (written, never committed)
    with open(os.path.join(out, "_data", "part-orphan.jsonl"), "w") as fh:
        fh.write(json.dumps({"tick_id": 99}) + "\n")
    assert [r["tick_id"] for r in read_manifested(out)] == [1]


def test_manifest_replayed_batch_overwrites_not_duplicates(spark):
    """The ack-lost window: a batch committed twice (replay after crash)
    publishes ONE manifest for that batch id — the idempotent half of
    exactly-once (kafka_sink delegates this to Kafka transactions)."""
    out = tempfile.mkdtemp(prefix="spp_ds_replay_")
    w = ManifestStreamWriter({"path": out}, overwrite=False)
    for attempt in ("a", "b"):  # replay writes fresh part files
        name = f"part-{attempt}.jsonl"
        with open(os.path.join(out, "_data", name), "w") as fh:
            fh.write(json.dumps({"tick_id": 7, "attempt": attempt}) + "\n")
        w.commit([PartFile(path=name, rows=1)], batchId=3)
    rows = read_manifested(out)
    assert len(rows) == 1 and rows[0]["attempt"] == "b"


def test_abort_removes_partials(spark):
    out = tempfile.mkdtemp(prefix="spp_ds_abort_")
    w = ManifestStreamWriter({"path": out}, overwrite=False)
    name = "part-doomed.jsonl"
    full = os.path.join(out, "_data", name)
    with open(full, "w") as fh:
        fh.write("{}\n")
    w.abort([PartFile(path=name, rows=1)], batchId=9)
    assert not os.path.exists(full)
    assert read_manifested(out) == []


def test_partitions_cover_range_exactly():
    r = TickBatchReader({"rows": "10", "partitions": "4"})
    parts = r.partitions()
    covered = sorted((p.start, p.end) for p in parts)
    # contiguous, non-overlapping, exact cover of [0, 10)
    assert covered[0][0] == 0 and covered[-1][1] == 10
    for (s1, e1), (s2, _) in zip(covered, covered[1:]):
        assert e1 == s2
    # degenerate: more partitions than rows still covers without empties
    r2 = TickBatchReader({"rows": "2", "partitions": "8"})
    p2 = sorted((p.start, p.end) for p in r2.partitions())
    assert p2[0][0] == 0 and p2[-1][1] == 2
