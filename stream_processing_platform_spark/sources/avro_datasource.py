"""``spp_avro`` — an Avro OCF batch source/sink as a Spark 4 Python
DataSource, backed by the from-scratch pure-Python codec
(sources/avrocodec.py). The stock Spark distribution here ships
without the external ``spark-avro`` module, so this provides the
Kafka-ecosystem container format the reference's transport world
implies (its Kafka operators move JSON; Avro OCF is the at-rest twin)
— implemented against the public Avro spec, no Avro library.

Layout & commit protocol (same two-phase contract as the
``spp_manifest`` streaming sink, custom_datasource.py): each write
task produces one ``part-<uuid>.avro`` file and returns it as a
commit message; the driver's ``commit`` writes
``_spp_avro_manifest.json`` ATOMICALLY (tmp + rename) listing exactly
the committed files, ``abort`` deletes the orphans. Readers trust the
manifest when present (stale part files from a failed/overwritten job
are invisible) and fall back to ``*.avro`` listing for
foreign-written directories.

Scale shape: one input partition per file (the OCF block structure
streams within a task — no whole-file materialization); the writer is
one file per task, commit cost O(files) at the driver — the same
asymptotics as Spark's own file commit protocol. Schema inference
reads ONE header, not data.
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
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from stream_processing_platform_spark.sources.avrocodec import (
    read_header,
    read_ocf,
    record_fields,
    write_ocf,
)

MANIFEST = "_spp_avro_manifest.json"

_AVRO_TO_SPARK = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}
_SPARK_TO_AVRO = {
    BooleanType(): "boolean",
    IntegerType(): "int",
    LongType(): "long",
    FloatType(): "float",
    DoubleType(): "double",
    BinaryType(): "bytes",
    StringType(): "string",
}


def _avro_type_to_spark(norm):
    nullable = False
    if isinstance(norm, tuple) and norm[0] == "nullable":
        nullable, norm = True, norm[1]
    if isinstance(norm, tuple) and norm[0] == "array":
        inner, inner_null = _avro_type_to_spark(norm[1])
        return ArrayType(inner, containsNull=inner_null), nullable
    return _AVRO_TO_SPARK[norm], nullable


def avro_schema_to_struct(schema: dict) -> StructType:
    fields = []
    for name, norm in record_fields(schema):
        dt, nullable = _avro_type_to_spark(norm)
        fields.append(StructField(name, dt, nullable))
    return StructType(fields)


def _spark_type_to_avro(dt, nullable: bool):
    if isinstance(dt, ArrayType):
        inner = _spark_type_to_avro(dt.elementType, dt.containsNull)
        t: object = {"type": "array", "items": inner}
    else:
        t = _SPARK_TO_AVRO[dt]
    return ["null", t] if nullable else t


def struct_to_avro_schema(st: StructType, name: str = "row") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": _spark_type_to_avro(f.dataType, f.nullable)}
            for f in st.fields
        ],
    }


def _list_files(path: str) -> list[str]:
    mf = os.path.join(path, MANIFEST)
    if os.path.exists(mf):
        with open(mf) as fh:
            names = json.load(fh)["files"]
        return [os.path.join(path, n) for n in names]
    return sorted(
        os.path.join(path, e) for e in os.listdir(path) if e.endswith(".avro")
    )


@dataclass
class AvroFilePartition(InputPartition):
    path: str


# Rows per Arrow batch: bounds worker memory while keeping batches large
# enough that the columnar transpose amortizes (the WDS/WARC readers'
# per-shard batching, adapted to row-oriented OCF files).
_BATCH_ROWS = 65536


def _read_ocf_batches(path: str, struct_schema: StructType, check: bool = True):
    """Decode one OCF file into pyarrow.RecordBatches. The Python
    DataSource row path pickles every row across the worker boundary;
    yielding Arrow batches crosses it columnar instead (same rationale
    as the WDS/WARC readers)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from stream_processing_platform_spark.sources.avrocodec import (
        read_ocf_column_blocks,
    )

    with open(path, "rb") as f:
        schema, _, _ = read_header(f)
    names = [n for n, _ in record_fields(schema)]
    if check:
        want = [f.name for f in struct_schema.fields]
        if names != want:
            raise ValueError(f"{path}: field order {names} != expected {want}")
    aschema = to_arrow_schema(struct_schema)

    def flush(cols):
        return pa.RecordBatch.from_arrays(
            [pa.array(c, type=fld.type) for c, fld in zip(cols, aschema)],
            schema=aschema,
        )

    # blocks arrive columnar from the schema-specialized compiled
    # decoder (avrocodec.read_ocf_column_blocks); regroup to
    # _BATCH_ROWS-sized Arrow batches
    cols: list[list] = [[] for _ in names]
    for _n, block_cols in read_ocf_column_blocks(path):
        if len(block_cols) != len(names):  # pragma: no cover
            raise ValueError(f"{path}: column count mismatch")
        for acc, c in zip(cols, block_cols):
            acc.extend(c)
        if len(cols[0]) >= _BATCH_ROWS:
            yield flush(cols)
            cols = [[] for _ in names]
    if cols and cols[0]:
        yield flush(cols)


class AvroBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("spp_avro requires a path")
        self._schema = schema

    def partitions(self):
        files = _list_files(self._path)
        if not files:
            raise ValueError(f"no .avro files under {self._path!r}")
        return [AvroFilePartition(p) for p in files]

    def read(self, partition: AvroFilePartition):
        yield from _read_ocf_batches(partition.path, self._schema)


@dataclass
class AvroPartFile(WriterCommitMessage):
    name: str


class AvroBatchWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("spp_avro requires a path")
        self._codec = options.get("codec", "deflate")
        self._schema = struct_to_avro_schema(schema)
        self._overwrite = overwrite
        os.makedirs(self._path, exist_ok=True)

    def write(self, iterator) -> AvroPartFile:
        # Tasks write DOT-PREFIXED temp names (invisible to the *.avro
        # listing fallback and to the foreign-dir manifest seeding
        # below); commit() renames the acknowledged set into place.
        # Without this, an orphan part from a failed/retried attempt of
        # THIS job — final-named on disk but absent from the commit
        # messages — would be indistinguishable from foreign data and
        # get committed, surfacing uncommitted/duplicate rows.
        name = f"part-{uuid.uuid4().hex}.avro"
        full = os.path.join(self._path, "." + name + ".tmp")
        write_ocf(full, self._schema, (tuple(row) for row in iterator), codec=self._codec)
        return AvroPartFile(name)

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
                # append mode UNIONS with the committed set — a manifest
                # listing only the new job's files would silently hide
                # all previously committed data from manifest-trusting
                # readers
                with open(mf_path) as fh:
                    files = json.load(fh)["files"] + files
            else:
                # appending into a FOREIGN-written directory (*.avro
                # files, no manifest): readers previously saw that data
                # via the listing fallback — seed the committed set from
                # the listing so the first manifest doesn't hide it.
                # Safe against this job's own parts: they were renamed
                # from dot-temps just above, so subtract them; orphans
                # from failed attempts never got final names.
                new = set(files)
                files = sorted(
                    e for e in os.listdir(self._path)
                    if e.endswith(".avro") and e not in new
                ) + files
        tmp = os.path.join(self._path, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"files": files}, fh)
        os.replace(tmp, mf_path)
        if self._overwrite:
            # overwrite retires the replaced job's part files — left on
            # disk they would resurface through the manifest-less
            # *.avro listing fallback for foreign-written directories
            keep = set(files)
            for e in os.listdir(self._path):
                if e.endswith(".avro") and e not in keep:
                    try:
                        os.remove(os.path.join(self._path, e))
                    except FileNotFoundError:
                        pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                # temp name normally; final name too, in case abort
                # raced a partially-run commit's renames
                for name in ("." + m.name + ".tmp", m.name):
                    try:
                        os.remove(os.path.join(self._path, name))
                    except FileNotFoundError:
                        pass


class AvroStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader: a micro-batch per slice of
    the SORTED file listing — the same files-are-the-log model Spark's
    own file stream source uses. Offsets are ``{"index": n}`` (files
    [0, n) consumed); the directory contract is append-only with
    lexicographically increasing names (the staging harnesses write
    ``b0001_…``-prefixed files), the standard file-stream assumption.
    ``latestOffset`` reports everything currently listed — correct for
    availableNow (which calls it once) and for continuous polling
    (files landing later surface in the next trigger).
    """

    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("spp_avro requires a path")
        self._schema = schema

    def _files(self) -> list[str]:
        return _list_files(self._path)

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()[start["index"]:end["index"]]
        return [AvroFilePartition(p) for p in files]

    def read(self, partition: AvroFilePartition):
        # check=True: the header is already read, so field-order
        # validation is free — a foreign-written OCF with reordered
        # same-typed fields must not silently misattribute columns
        # (r14 advice item)
        yield from _read_ocf_batches(partition.path, self._schema)

    def commit(self, end: dict) -> None:
        pass  # the checkpointed offset log is the source of truth

    def stop(self) -> None:
        pass


class AvroDataSource(DataSource):
    """``spark.read.format("spp_avro").load(dir)`` /
    ``df.write.format("spp_avro").mode(...).save(dir)`` /
    ``spark.readStream.format("spp_avro")...`` (file-per-batch log)."""

    @classmethod
    def name(cls) -> str:
        return "spp_avro"

    def schema(self):
        files = _list_files(self.options.get("path", ""))
        if not files:
            raise ValueError("cannot infer schema: no .avro files")
        with open(files[0], "rb") as f:
            avro_schema, _, _ = read_header(f)
        return avro_schema_to_struct(avro_schema)

    def reader(self, schema: StructType) -> AvroBatchReader:
        return AvroBatchReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> AvroBatchWriter:
        return AvroBatchWriter(self.options, schema, overwrite)

    def streamReader(self, schema: StructType) -> AvroStreamReader:
        return AvroStreamReader(self.options, schema)


def register_avro_source(spark) -> None:
    """Idempotent registration of the spp_avro format."""
    spark.dataSource.register(AvroDataSource)
