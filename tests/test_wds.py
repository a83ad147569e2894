"""WebDataset tar-shard source/sink tests (sources/wds_datasource.py).

The tar container layer is stdlib ``tarfile`` (nothing re-implemented),
so what needs testing is the WebDataset SEMANTICS this source adds:
member-name splitting, consecutive-key sample grouping (including the
non-contiguous-key contract), gzip and plain shards parsing
identically, deterministic writer output, and the two-phase manifest
commit protocol shared with spp_warc/spp_avro."""

from __future__ import annotations

import io
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from stream_processing_platform_spark.sources.wds_datasource import (
    MANIFEST,
    register_wds_source,
    split_member_name,
)


def _make_tar(path, members, gz=False):
    mode = "w:gz" if gz else "w"
    with tarfile.open(path, mode=mode, format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(data))


def test_split_member_name_convention():
    assert split_member_name("000123.jpg") == ("000123", "jpg")
    # directories stripped; multi-dot extensions stay whole (webdataset)
    assert split_member_name("a/b/0001.seg.txt") == ("0001", "seg.txt")
    assert split_member_name("noext") == ("noext", "")


@pytest.mark.parametrize("gz", [False, True])
def test_read_groups_consecutive_members(spark, tmp_path, gz):
    register_wds_source(spark)
    shard = str(tmp_path / ("s0.tar.gz" if gz else "s0.tar"))
    _make_tar(
        shard,
        [
            ("0000.txt", b"alpha"),
            ("0000.json", b"{}"),
            ("0001.txt", b"beta"),
            ("0001.cls", b"en"),
            ("0001.json", b"{1}"),
        ],
        gz=gz,
    )
    rows = {
        r["key"]: r
        for r in spark.read.format("spp_wds").load(shard).collect()
    }
    assert set(rows) == {"0000", "0001"}
    assert rows["0000"]["n_files"] == 2
    assert bytes(rows["0000"]["files"]["txt"]) == b"alpha"
    assert rows["0001"]["n_files"] == 3
    assert rows["0001"]["total_bytes"] == len(b"beta") + len(b"en") + len(b"{1}")
    assert bytes(rows["0001"]["cls"] if False else rows["0001"]["files"]["cls"]) == b"en"


def test_non_contiguous_keys_make_separate_samples(spark, tmp_path):
    """WebDataset requires samples stored contiguously; a key that
    reappears later is a NEW sample (faithful to the wds contract),
    not silently merged."""
    register_wds_source(spark)
    shard = str(tmp_path / "s1.tar")
    _make_tar(
        shard,
        [("k.txt", b"one"), ("other.txt", b"x"), ("k.json", b"{}")],
    )
    rows = spark.read.format("spp_wds").load(shard).collect()
    assert len(rows) == 3
    ks = sorted((r["key"], r["n_files"]) for r in rows)
    assert ks == [("k", 1), ("k", 1), ("other", 1)]


def test_extensionless_and_non_regular_members_skipped(spark, tmp_path):
    register_wds_source(spark)
    shard = str(tmp_path / "s2.tar")
    with tarfile.open(shard, "w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("dir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ti = tarfile.TarInfo("README")  # no extension -> no field name
        ti.size = 2
        tf.addfile(ti, io.BytesIO(b"hi"))
        ti = tarfile.TarInfo("0.txt")
        ti.size = 1
        tf.addfile(ti, io.BytesIO(b"a"))
    rows = spark.read.format("spp_wds").load(shard).collect()
    assert len(rows) == 1 and rows[0]["key"] == "0"


def test_writer_roundtrip_manifest_append_and_determinism(spark, tmp_path):
    register_wds_source(spark)
    out = str(tmp_path / "shards")
    df = spark.range(0, 10).select(
        F.format_string("%04d", F.col("id")).alias("key"),
        F.create_map(
            F.lit("txt"), F.encode(F.col("id").cast("string"), "UTF-8")
        ).alias("files"),
    )
    df.coalesce(1).write.format("spp_wds").mode("overwrite").save(out)
    with open(os.path.join(out, MANIFEST)) as fh:
        m1 = json.load(fh)["files"]
    assert len(m1) == 1 and m1[0].endswith(".tar")
    # append mode unions the manifest
    df2 = spark.createDataFrame(
        [("zzzz", {"txt": bytearray(b"tail")})], "key string, files map<string,binary>"
    )
    df2.coalesce(1).write.format("spp_wds").mode("append").save(out)
    with open(os.path.join(out, MANIFEST)) as fh:
        m2 = json.load(fh)["files"]
    assert len(m2) == 2 and m1[0] in m2
    back = spark.read.format("spp_wds").load(out)
    assert back.count() == 11
    got = {r["key"]: bytes(r["files"]["txt"]) for r in back.collect()}
    assert got["0007"] == b"7" and got["zzzz"] == b"tail"
    # deterministic member metadata: same single-partition sorted input
    # -> byte-identical tar payload (names differ; content compared)
    out_a, out_b = str(tmp_path / "da"), str(tmp_path / "db")
    src = df.orderBy("key").coalesce(1)
    src.write.format("spp_wds").mode("overwrite").save(out_a)
    src.write.format("spp_wds").mode("overwrite").save(out_b)

    def tar_bytes(d):
        (name,) = [e for e in os.listdir(d) if e.endswith(".tar")]
        with open(os.path.join(d, name), "rb") as fh:
            return fh.read()

    assert tar_bytes(out_a) == tar_bytes(out_b)


def test_writer_rejects_wrong_schema(spark, tmp_path):
    register_wds_source(spark)
    df = spark.range(3).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(Exception, match="needs columns"):
        df.write.format("spp_wds").mode("overwrite").save(str(tmp_path / "bad"))


def test_stream_reader_consumes_shards_and_resumes(spark, tmp_path):
    """spp_wds STREAM reader (r11): availableNow drains every shard
    listed; a checkpointed restart after a new shard lands reads only
    it — the training-ingest contract. Recoverable spp_manifest sink
    (the memory sink cannot resume a checkpoint)."""
    from stream_processing_platform_spark.sources.custom_datasource import (
        read_manifested,
        register_custom_sources,
    )

    register_wds_source(spark)
    register_custom_sources(spark)
    src = tmp_path / "shards"
    src.mkdir()
    for i in range(2):
        _make_tar(
            str(src / f"s{i}.tar"),
            [(f"{i}{j}.txt", b"x") for j in range(3)],
        )
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("spp_wds")
            .load(str(src))
            .select("shard", "key")
            .writeStream.format("spp_manifest")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return read_manifested(out)

    assert len(drain()) == 6
    _make_tar(str(src / "zz.tar"), [("n0.txt", b"y"), ("n1.txt", b"y")])
    rows = drain()
    assert len(rows) == 8
    assert sum(1 for r in rows if r["shard"] == "zz.tar") == 2


def test_writer_rejects_dotted_or_pathy_keys(spark, tmp_path):
    """r11 ADVICE: the reader splits member names on the FIRST dot, so a
    key containing '.' (or '/') would round-trip to a different key and
    silently splinter/merge samples — the writer must reject it."""
    register_wds_source(spark)
    for bad in ("a.b", "a/b"):
        df = spark.createDataFrame(
            [(bad, {"txt": bytearray(b"x")})],
            "key string, files map<string,binary>",
        )
        with pytest.raises(Exception, match="must not contain"):
            df.coalesce(1).write.format("spp_wds").mode("overwrite").save(
                str(tmp_path / "badkey")
            )
