"""``spp_warc`` — WARC/WET files as a Spark 4 Python DataSource, backed
by the from-scratch ISO 28500 codec (sources/warccodec.py).

The canonical LLM-pipeline input: Common Crawl ships ``.warc.gz`` /
``.wet.gz`` segments, and the curation stages this engine already has
(q_html_extract's strip chain, Gopher rules, dedup, mixture) all start
from these records. The reference platform has no WARC surface
(sources are Kafka/CSV/JSON/collection — taskmanager/operators/
sources.py), so this is north-star capability, same chassis as the
``spp_avro`` and ``spp_ticks`` sources (custom_datasource.py).

Read schema (fixed — WARC is self-describing per record, not per file):

    warc_file string, warc_type string, record_id string,
    warc_date string, target_uri string, content_type string,
    content_length bigint, payload binary

Scale shape: ONE input partition per file — the honest parallelism unit
for member-gzipped archives (gzip is not block-splittable without a
side index; Common Crawl segments are ~1 GB each and a 100 TB crawl is
~100k files, far above any executor count, so per-file parallelism
saturates the cluster). Within a task the codec streams record by
record: the working set is one record, never the file. ``pushFilters``
accepts ``warc_type`` equality (e.g. ``response`` only) — records of
other types are skipped right after their header block parses, before
any row materializes (a CPU/allocation prune; the bytes still stream
past, as they must under gzip).

Write side (fixture/export path): each task writes one
``part-<uuid>.warc[.gz]`` led by a ``warcinfo`` record (the standard
file-level provenance convention), two-phase manifest commit — the
same atomic rename + union/seed protocol as spp_avro, commit cost
O(files) at the driver.

Input rows for the writer: (warc_type, record_id, warc_date,
target_uri, content_type, payload) — record_id/warc_date/target_uri
may be empty strings, in which case the writer fills a deterministic
UUIDv5 id and omits the URI header.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from stream_processing_platform_spark.sources.warccodec import (
    decode_records,
    encode_record,
    record_id_from,
    write_warc,
)

MANIFEST = "_spp_warc_manifest.json"

WARC_SCHEMA_DDL = (
    "warc_file string, warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, content_length bigint, payload binary"
)

_EXTS = (".warc", ".warc.gz", ".wet", ".wet.gz")


def _list_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    mf = os.path.join(path, MANIFEST)
    if os.path.exists(mf):
        with open(mf) as fh:
            return [os.path.join(path, n) for n in json.load(fh)["files"]]
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, e)
            for e in os.listdir(path)
            if e.endswith(_EXTS)
        )
    return sorted(p for p in _glob.glob(path) if p.endswith(_EXTS))


@dataclass
class WarcFilePartition(InputPartition):
    path: str
    warc_type: str | None = None  # pushed-down WARC-Type equality


class WarcBatchReader(DataSourceReader):
    """Batch reader with ADVISORY warc_type pushdown.

    Spark reuses ONE reader instance across every scan of the same
    ``load()`` relation, and pushFilters for ALL branches runs before
    any partitions() call — so two branches filtering on different
    warc_type values would overwrite a single pushed slot and the
    last filter would silently apply to both scans (caught live by
    q_warc_pair_capture's request/response self-join: the request
    branch read response records). The safe contract: every filter is
    YIELDED BACK so Spark always re-applies it post-scan, and the
    source prunes only when exactly one distinct warc_type was pushed
    (the single-branch case — q_warc_extract keeps its warcinfo
    prune); conflicting pushdowns disable pruning, never correctness."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("spp_warc requires a path")
        self._pushed_types: set[str] = set()

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr else None
            if isinstance(f, EqualTo) and col == "warc_type" and isinstance(f.value, str):
                self._pushed_types.add(f.value)
            yield f  # ALWAYS re-evaluated by Spark (advisory pushdown)

    def partitions(self):
        files = _list_files(self._path)
        if not files:
            raise ValueError(f"no WARC files under {self._path!r}")
        wt = next(iter(self._pushed_types)) if len(self._pushed_types) == 1 else None
        return [WarcFilePartition(p, wt) for p in files]

    def read(self, partition: WarcFilePartition):
        # Arrow batches instead of per-row tuples: the row path pickles
        # every record (payload bytes included) across the Python
        # worker boundary; columnar batches cross it once per chunk
        # (same change as WdsBatchReader.read — measured the dominant
        # read-side cost there).
        import pyarrow as pa

        base = os.path.basename(partition.path)
        cols: list[list] = [[] for _ in range(8)]

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.string()),
                    pa.array(cols[1], pa.string()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.string()),
                    pa.array(cols[4], pa.string()),
                    pa.array(cols[5], pa.string()),
                    pa.array(cols[6], pa.int64()),
                    pa.array(cols[7], pa.binary()),
                ],
                names=[
                    "warc_file", "warc_type", "record_id", "warc_date",
                    "target_uri", "content_type", "content_length", "payload",
                ],
            )
            for c in cols:
                c.clear()
            return batch

        pending = 0
        with open(partition.path, "rb") as fh:
            for headers, body in decode_records(fh):
                rtype = headers.get("WARC-Type", "")
                if partition.warc_type is not None and rtype != partition.warc_type:
                    continue
                cols[0].append(base)
                cols[1].append(rtype)
                cols[2].append(headers.get("WARC-Record-ID", ""))
                cols[3].append(headers.get("WARC-Date", ""))
                cols[4].append(headers.get("WARC-Target-URI", ""))
                cols[5].append(headers.get("Content-Type", ""))
                cols[6].append(len(body))
                cols[7].append(body)
                pending += len(body) + 256
                # cap batch payload (binary Arrow arrays hold 2 GiB max;
                # stay far below to bound worker memory)
                if pending >= 64 << 20:
                    yield flush()
                    pending = 0
        if cols[0]:
            yield flush()


@dataclass
class WarcPartFile(WriterCommitMessage):
    name: str


class WarcBatchWriter(DataSourceWriter):
    """One WARC file per task, warcinfo-led, two-phase manifest commit
    (protocol identical to spp_avro's writer — see that module's
    comments for why temp names + union/seed semantics are load-bearing)."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("spp_warc requires a path")
        self._gzip = str(options.get("gzip", "true")).lower() == "true"
        self._date = options.get("warc_date", "2024-01-01T00:00:00Z")
        self._overwrite = overwrite
        names = [f.name for f in schema.fields]
        want = ["warc_type", "record_id", "warc_date", "target_uri", "content_type", "payload"]
        if names != want:
            raise ValueError(f"spp_warc writer needs columns {want}, got {names}")
        os.makedirs(self._path, exist_ok=True)

    def _records(self, name: str, iterator):
        info = f"software: stream-processing-platform-spark\r\nformat: WARC file version 1.0\r\n".encode()
        yield (
            {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": record_id_from(f"warcinfo:{name}"),
                "WARC-Date": self._date,
                "Content-Type": "application/warc-fields",
            },
            info,
        )
        for row in iterator:
            wtype, rid, wdate, uri, ctype, payload = row
            headers = {
                "WARC-Type": wtype,
                "WARC-Record-ID": rid or record_id_from(f"{wtype}:{uri}"),
                "WARC-Date": wdate or self._date,
                "Content-Type": ctype,
            }
            if uri:
                headers["WARC-Target-URI"] = uri
            yield headers, bytes(payload)

    def write(self, iterator) -> WarcPartFile:
        ext = ".warc.gz" if self._gzip else ".warc"
        name = f"part-{uuid.uuid4().hex}{ext}"
        full = os.path.join(self._path, "." + name + ".tmp")
        write_warc(full, self._records(name, iterator), gzip_members=self._gzip)
        return WarcPartFile(name)

    def commit(self, messages) -> None:
        files = [m.name for m in messages if m is not None]
        for name in files:
            os.replace(
                os.path.join(self._path, "." + name + ".tmp"),
                os.path.join(self._path, name),
            )
        mf_path = os.path.join(self._path, MANIFEST)
        if not self._overwrite:
            if os.path.exists(mf_path):
                with open(mf_path) as fh:
                    files = json.load(fh)["files"] + files
            else:
                new = set(files)
                files = sorted(
                    e
                    for e in os.listdir(self._path)
                    if e.endswith(_EXTS) and e not in new
                ) + files
        tmp = os.path.join(self._path, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"files": files}, fh)
        os.replace(tmp, mf_path)
        if self._overwrite:
            keep = set(files)
            for e in os.listdir(self._path):
                if e.endswith(_EXTS) and e not in keep:
                    try:
                        os.remove(os.path.join(self._path, e))
                    except FileNotFoundError:
                        pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                for name in ("." + m.name + ".tmp", m.name):
                    try:
                        os.remove(os.path.join(self._path, name))
                    except FileNotFoundError:
                        pass


class WarcStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader — continuous crawl ingestion:
    a micro-batch per slice of the sorted archive listing, the same
    files-are-the-log model as spp_avro's stream reader (offsets are
    ``{"index": n}`` = archives [0, n) consumed; append-only directory
    with lexicographically increasing names, the standard file-stream
    contract; ``latestOffset`` reports everything listed — correct for
    availableNow and for continuous polling). Record-type pruning is a
    post-scan filter in the stream DataFrame (pushFilters is a
    batch-read surface)."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("spp_warc requires a path")

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": len(_list_files(self._path))}

    def partitions(self, start: dict, end: dict):
        files = _list_files(self._path)[start["index"]:end["index"]]
        return [WarcFilePartition(p) for p in files]

    def read(self, partition: WarcFilePartition):
        base = os.path.basename(partition.path)
        with open(partition.path, "rb") as fh:
            for headers, body in decode_records(fh):
                yield (
                    base,
                    headers.get("WARC-Type", ""),
                    headers.get("WARC-Record-ID", ""),
                    headers.get("WARC-Date", ""),
                    headers.get("WARC-Target-URI", ""),
                    headers.get("Content-Type", ""),
                    len(body),
                    body,
                )

    def commit(self, end: dict) -> None:
        pass  # the checkpointed offset log is the source of truth

    def stop(self) -> None:
        pass


class WarcDataSource(DataSource):
    """``spark.read.format("spp_warc").load(path)`` — path may be a
    file, a directory, or a glob; ``df.write.format("spp_warc")``;
    ``spark.readStream.format("spp_warc")`` (archive-per-batch log)."""

    @classmethod
    def name(cls) -> str:
        return "spp_warc"

    def schema(self) -> str:
        return WARC_SCHEMA_DDL

    def reader(self, schema: StructType) -> WarcBatchReader:
        return WarcBatchReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcBatchWriter:
        return WarcBatchWriter(self.options, schema, overwrite)

    def streamReader(self, schema: StructType) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration (and enable Python-source filter
    pushdown, off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
