"""Custom Python DataSource: the engine-side custom source/sink path.

The reference implements its transports as operator classes —
``KafkaSourceOperator`` (taskmanager/operators/sources.py:25-198) owns
offset tracking and recovery, ``KafkaSinkOperator`` (sinks.py:19-104)
owns delivery. In Spark 4 the idiomatic way to add such a custom
transport is the Python DataSource API; this module implements it
fully, so the offset/commit machinery the Kafka pair can't demonstrate
without a broker runs END TO END here, in-engine:

- ``TickDataSource`` — a deterministic synthetic tick feed (same
  symbol/price/volume shape as ``generators.financial_tick_stream``)
  exposed as BOTH a batch reader (with partition planning + filter
  pushdown: pushed predicates prune whole generated partitions before
  a single row exists) and a ``DataSourceStreamReader`` with real
  offset semantics: ``initialOffset → latestOffset → partitions(start,
  end) → commit`` — the exact lifecycle the reference's source runs
  (sources.py:86-130 poll/ack loop), driven by Spark's checkpointed
  offset log, so restart-resumes-at-committed-offset is *executed* in
  tests, not asserted.
- ``ManifestStreamWriter``-backed sink (``format("spp_manifest")``) —
  a two-phase commit file sink: tasks write uuid-named part files and
  return them as ``WriterCommitMessage``s; the driver's ``commit``
  writes a per-batch manifest ATOMICALLY (tmp + rename), ``abort``
  drops the orphans. Readers trust only manifested files, so a batch
  replayed after an ack-lost crash overwrites one manifest instead of
  duplicating rows — the exactly-once contract ``kafka_sink`` delegates
  to Kafka transactions, demonstrated against the local filesystem.

Determinism: every generated field is a pure function of ``tick_id``
(splitmix64 bit-mix), so any (start, end) range re-reads identically —
which is what makes offset replay provably exactly-once in tests.

At 100 TB scale: partitions() is the only driver-side work (range
arithmetic); generation happens inside each task, filters prune ranges
before generation, and the sink's commit protocol is O(files) at the
driver — the same asymptotics as Spark's own file-source commit log.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SYMBOLS = ("AAPL", "GOOGL", "MSFT", "AMZN", "TSLA", "NVDA", "META", "NFLX")

TICK_SCHEMA_DDL = "tick_id bigint, ts_ms bigint, symbol string, price double, volume int"

_BASE_TS_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
_MS_PER_TICK = 250


def _mix64(x: int) -> int:
    """splitmix64 finalizer — deterministic 64-bit mix, pure Python."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def tick_row(tick_id: int) -> tuple:
    """The one generation rule — every reader path calls this, so batch,
    stream, and replayed-stream reads of the same tick_id are identical."""
    sym = SYMBOLS[tick_id % len(SYMBOLS)]
    u = _mix64(tick_id) % 10**9 / 10**9  # uniform [0, 1)
    price = round(150.0 * (1.0 + (u - 0.5) * 0.2), 2)
    volume = _mix64(tick_id * 7919 + 1) % 1000 + 1
    return (tick_id, _BASE_TS_MS + tick_id * _MS_PER_TICK, sym, price, volume)


@dataclass
class TickRange(InputPartition):
    start: int  # inclusive
    end: int  # exclusive
    symbol: str | None = None  # pushed-down symbol equality, if any


def _generate(part: TickRange):
    for t in range(part.start, part.end):
        row = tick_row(t)
        if part.symbol is not None and row[2] != part.symbol:
            continue
        yield row


class TickBatchReader(DataSourceReader):
    """Batch reader with filter pushdown: tick_id range predicates
    narrow the generated range (partition pruning before any row
    exists); a symbol equality is applied inside the generator. All
    other filters are returned to Spark to evaluate."""

    def __init__(self, options):
        self.num_rows = int(options.get("rows", 10_000))
        self.num_partitions = int(options.get("partitions", 8))
        self.lo = 0
        self.hi = self.num_rows
        self.symbol: str | None = None

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr else None
            if isinstance(f, EqualTo) and col == "symbol" and isinstance(f.value, str):
                self.symbol = f.value
            elif isinstance(f, GreaterThan) and col == "tick_id":
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and col == "tick_id":
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan) and col == "tick_id":
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and col == "tick_id":
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f  # not our predicate — Spark evaluates it post-scan

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.num_partitions, hi - lo or 1))
        step = max(1, (hi - lo + n - 1) // n)
        return [
            TickRange(s, min(s + step, hi), self.symbol) for s in range(lo, hi, step)
        ] or [TickRange(0, 0)]

    def read(self, partition: TickRange):
        return _generate(partition)


class TickStreamReader(DataSourceStreamReader):
    """Offset-tracked stream reader — the KafkaSourceOperator lifecycle
    (poll → process → ack, sources.py:86-130) on Spark's offset log.

    The offset is ``{"tick": n}`` = first unread tick. ``latestOffset``
    reports everything available up to ``max_ticks`` (the current "end
    of topic" — an availableNow run drains exactly to it, and a later
    run with a higher cap resumes from the checkpointed offset, never
    re-reading). ``commit`` appends to a commit journal when
    ``commit_log`` is set so tests can observe the ack sequence."""

    def __init__(self, options):
        self.max_ticks = int(options.get("max_ticks", 1_000))
        self.num_partitions = int(options.get("partitions", 4))
        self.commit_log = options.get("commit_log")

    def initialOffset(self):
        return {"tick": 0}

    def latestOffset(self):
        return {"tick": self.max_ticks}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["tick"]), int(end["tick"])
        if hi <= lo:
            return [TickRange(lo, lo)]
        n = max(1, min(self.num_partitions, hi - lo))
        step = max(1, (hi - lo + n - 1) // n)
        return [TickRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: TickRange):
        return _generate(partition)

    def commit(self, end: dict) -> None:
        if self.commit_log:
            with open(self.commit_log, "a") as fh:
                fh.write(json.dumps(end) + "\n")

    def stop(self) -> None:
        pass


@dataclass
class PartFile(WriterCommitMessage):
    path: str
    rows: int


class ManifestStreamWriter(DataSourceStreamWriter):
    """Two-phase-commit file sink. Tasks write uuid part files (never
    visible to readers on their own); the driver's per-batch ``commit``
    publishes them via an ATOMIC manifest rename keyed by batch id. A
    replayed batch (crash after data write, before checkpoint commit)
    rewrites manifest-<id> instead of appending — idempotent, the
    exactly-once half ``kafka_sink`` gets from Kafka transactions."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("spp_manifest sink requires option 'path'")
        os.makedirs(os.path.join(self.path, "_data"), exist_ok=True)

    def write(self, iterator) -> PartFile:
        name = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, "_data", name)
        n = 0
        with open(full, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return PartFile(path=name, rows=n)

    def commit(self, messages, batchId: int) -> None:
        manifest = {
            "batch_id": batchId,
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        tmp = os.path.join(self.path, f"._manifest-{batchId}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, f"manifest-{batchId}.json"))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, "_data", m.path))
                except FileNotFoundError:
                    pass


def read_manifested(path: str) -> list[dict]:
    """Reader-side contract of the manifest sink: rows from manifested
    part files ONLY — orphans from uncommitted/aborted attempts are
    invisible. Committed manifests for a replayed batch id overwrite,
    so each batch contributes exactly once."""
    rows: list[dict] = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("manifest-") and entry.endswith(".json"):
            with open(os.path.join(path, entry)) as fh:
                manifest = json.load(fh)
            for name in manifest["files"]:
                with open(os.path.join(path, "_data", name)) as fh:
                    rows.extend(json.loads(line) for line in fh)
    return rows


class TickDataSource(DataSource):
    """``spark.read.format("spp_ticks")`` / ``readStream.format(...)``."""

    @classmethod
    def name(cls) -> str:
        return "spp_ticks"

    def schema(self) -> str:
        return TICK_SCHEMA_DDL

    def reader(self, schema: StructType) -> TickBatchReader:
        return TickBatchReader(self.options)

    def streamReader(self, schema: StructType) -> TickStreamReader:
        return TickStreamReader(self.options)


class ManifestSinkDataSource(DataSource):
    """``df.writeStream.format("spp_manifest").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "spp_manifest"

    def schema(self) -> str:  # sink-only; schema comes from the stream
        return "value string"

    def streamWriter(self, schema: StructType, overwrite: bool) -> ManifestStreamWriter:
        return ManifestStreamWriter(self.options, overwrite)


def register_custom_sources(spark) -> None:
    """Idempotently register both formats with the session (and enable
    Python-source filter pushdown, off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TickDataSource)
    spark.dataSource.register(ManifestSinkDataSource)
