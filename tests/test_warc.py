"""WARC codec + spp_warc DataSource tests (r10 verdict ask #2).

Covers the ISO 28500 framing directly (crafted multi-record archives,
member-gzip layout, adversarial bodies, truncation), the HTTP response
splitter, and the Spark-side source: schema, per-file partitions,
warc_type filter pushdown, writer commit protocol.
"""

from __future__ import annotations

import gzip
import io
import zlib

import pytest

from stream_processing_platform_spark.sources.warccodec import (
    decode_records,
    encode_record,
    record_id_from,
    split_http_response,
    write_warc,
)

H = {
    "WARC-Type": "response",
    "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000001>",
    "WARC-Date": "2024-01-01T00:00:00Z",
    "WARC-Target-URI": "https://example.test/a",
    "Content-Type": "application/http; msgtype=response",
}


def _mk_records():
    """One record of every WARC type, including adversarial bodies."""
    recs = []
    info = b"software: test\r\nformat: WARC file version 1.0\r\n"
    recs.append(
        (
            {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": record_id_from("info"),
                "WARC-Date": "2024-01-01T00:00:00Z",
                "Content-Type": "application/warc-fields",
            },
            info,
        )
    )
    recs.append((dict(H), b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"))
    recs.append(
        (
            {**H, "WARC-Type": "request", "WARC-Record-ID": record_id_from("req")},
            b"GET /a HTTP/1.1\r\nHost: example.test\r\n\r\n",
        )
    )
    # body that CONTAINS a fake record header — framing must rely on
    # Content-Length, never on scanning for the magic
    evil = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nnot a real record\r\n\r\n"
    recs.append(
        ({**H, "WARC-Type": "metadata", "WARC-Record-ID": record_id_from("meta")}, evil)
    )
    recs.append(
        ({**H, "WARC-Type": "conversion", "Content-Type": "text/plain"}, b"plain text body")
    )
    recs.append(({**H, "WARC-Type": "resource"}, b""))  # empty body
    return recs


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_all_types(tmp_path, gz):
    recs = _mk_records()
    p = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    assert write_warc(p, recs, gzip_members=gz) == len(recs)
    with open(p, "rb") as fh:
        back = list(decode_records(fh))
    assert len(back) == len(recs)
    for (h0, b0), (h1, b1) in zip(recs, back):
        assert b1 == b0
        assert h1["WARC-Type"] == h0["WARC-Type"]
        assert int(h1["Content-Length"]) == len(b0)


def test_gzip_member_per_record(tmp_path):
    """Common Crawl layout: each record its own gzip member, so a raw
    zlib loop decodes record boundaries without any WARC parsing."""
    recs = _mk_records()
    p = str(tmp_path / "t.warc.gz")
    write_warc(p, recs, gzip_members=True)
    raw = open(p, "rb").read()
    members = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        members.append(d.decompress(raw[pos:]))
        consumed = len(raw) - pos - len(d.unused_data)
        assert consumed > 0
        pos += consumed
    assert len(members) == len(recs)
    for m, (h, b) in zip(members, recs):
        assert m == encode_record(h, b)


def test_plain_and_gzip_parse_identically(tmp_path):
    recs = _mk_records()
    pa, pb = str(tmp_path / "a.warc"), str(tmp_path / "b.warc.gz")
    write_warc(pa, recs)
    write_warc(pb, recs, gzip_members=True)
    with open(pa, "rb") as f1, open(pb, "rb") as f2:
        assert list(decode_records(f1)) == list(decode_records(f2))


def test_header_value_crlf_rejected():
    with pytest.raises(ValueError, match="CR/LF"):
        encode_record({**H, "WARC-Target-URI": "https://x/\r\nEvil: y"}, b"")


def test_truncated_body_rejected(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, [(dict(H), b"0123456789")])
    raw = open(p, "rb").read()
    with pytest.raises(ValueError, match="truncated|terminator"):
        list(decode_records(io.BufferedReader(io.BytesIO(raw[:-8]))))


def test_bad_terminator_rejected():
    rec = encode_record(dict(H), b"abc")
    corrupt = rec[:-4] + b"XXXX"
    with pytest.raises(ValueError, match="terminator"):
        list(decode_records(io.BufferedReader(io.BytesIO(corrupt))))


def test_continuation_header_folds():
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a/\r\n"
        b"  continued\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    (h, b), = decode_records(io.BufferedReader(io.BytesIO(rec)))
    assert h["WARC-Target-URI"] == "https://a/ continued"
    assert b == b"hi"


def test_split_http_response():
    status, headers, body = split_http_response(
        b"HTTP/1.1 301 Moved\r\nLocation: /b\r\nContent-Type: text/html\r\n\r\n<x>"
    )
    assert status == 301 and headers["Location"] == "/b" and body == b"<x>"
    # non-HTTP payloads pass through whole with status 0
    status, headers, body = split_http_response(b"plain text, no head")
    assert status == 0 and body == b"plain text, no head"
    status, _, body = split_http_response(b"stuff\r\n\r\nmore")
    assert status == 0 and body == b"stuff\r\n\r\nmore"


# ---------------------------------------------------------------- Spark side


@pytest.fixture(scope="module")
def spark():
    from stream_processing_platform_spark.session import get_spark

    return get_spark(app_name="test-warc")


def _write_archive(tmp_path, n_files=3, recs_per=4):
    paths = []
    for i in range(n_files):
        recs = [
            (
                {
                    "WARC-Type": "warcinfo",
                    "WARC-Record-ID": record_id_from(f"info{i}"),
                    "WARC-Date": "2024-01-01T00:00:00Z",
                    "Content-Type": "application/warc-fields",
                },
                b"software: test\r\n",
            )
        ]
        for j in range(recs_per):
            recs.append(
                (
                    {
                        **H,
                        "WARC-Record-ID": record_id_from(f"r{i}:{j}"),
                        "WARC-Target-URI": f"https://example.test/{i}/{j}",
                    },
                    f"HTTP/1.1 200 OK\r\n\r\ndoc {i} {j}".encode(),
                )
            )
        p = str(tmp_path / f"f{i}.warc.gz")
        write_warc(p, recs, gzip_members=True)
        paths.append(p)
    return paths


def test_source_reads_directory(spark, tmp_path):
    from stream_processing_platform_spark.sources.warc_datasource import (
        register_warc_source,
    )

    register_warc_source(spark)
    _write_archive(tmp_path)
    df = spark.read.format("spp_warc").load(str(tmp_path))
    assert df.count() == 3 * 5
    assert df.rdd.getNumPartitions() == 3  # one per file
    got = {r["warc_type"] for r in df.select("warc_type").distinct().collect()}
    assert got == {"warcinfo", "response"}


def test_source_type_pushdown_prunes(spark, tmp_path):
    from stream_processing_platform_spark.sources.warc_datasource import (
        register_warc_source,
    )
    from pyspark.sql import functions as F

    register_warc_source(spark)
    _write_archive(tmp_path)
    df = (
        spark.read.format("spp_warc")
        .load(str(tmp_path))
        .where(F.col("warc_type") == "response")
    )
    rows = df.collect()
    assert len(rows) == 12
    assert all(r["warc_type"] == "response" for r in rows)
    assert all(r["payload"].startswith(b"HTTP/1.1 200") for r in rows)
    # content_length matches the body bytes exactly
    assert all(r["content_length"] == len(r["payload"]) for r in rows)


def test_writer_roundtrip_and_manifest(spark, tmp_path):
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.sources.warc_datasource import (
        register_warc_source,
    )

    register_warc_source(spark)
    out = str(tmp_path / "out")
    df = spark.range(20).select(
        F.lit("conversion").alias("warc_type"),
        F.lit("").alias("record_id"),
        F.lit("").alias("warc_date"),
        F.concat(F.lit("https://t/"), F.col("id")).alias("target_uri"),
        F.lit("text/plain").alias("content_type"),
        F.encode(F.concat(F.lit("body "), F.col("id")), "UTF-8").alias("payload"),
    )
    df.write.format("spp_warc").mode("overwrite").save(out)
    back = spark.read.format("spp_warc").load(out)
    conv = back.where(F.col("warc_type") == "conversion").collect()
    assert sorted(bytes(r["payload"]).decode() for r in conv) == sorted(
        f"body {i}" for i in range(20)
    )
    # every part file is warcinfo-led
    infos = back.where(F.col("warc_type") == "warcinfo")
    assert infos.count() == back.select("warc_file").distinct().count()
    # overwrite replaces, never appends
    df.limit(5).write.format("spp_warc").mode("overwrite").save(out)
    again = spark.read.format("spp_warc").load(out)
    assert again.where(F.col("warc_type") == "conversion").count() == 5


def test_stream_reader_consumes_archives_and_resumes(spark, tmp_path):
    """The spp_warc STREAM reader (r11): availableNow drains every
    archive currently listed; a restart from the same checkpoint after
    a NEW archive lands consumes only the new one (offset = archives
    consumed) — the continuous-crawl contract. Sink is the recoverable
    spp_manifest writer (the memory sink cannot resume a checkpoint)."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.sources.custom_datasource import (
        read_manifested,
        register_custom_sources,
    )
    from stream_processing_platform_spark.sources.warc_datasource import (
        register_warc_source,
    )

    register_warc_source(spark)
    register_custom_sources(spark)
    src = tmp_path / "archives"
    src.mkdir()
    _write_archive(src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("spp_warc")
            .load(str(src))
            .where(F.col("warc_type") == "response")
            .select("warc_file", "target_uri")
            .writeStream.format("spp_manifest")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return read_manifested(out)

    assert len(drain()) == 12  # 3 archives x 4 response records
    # a new archive lands ('zz-' sorts after the existing names, the
    # append-only contract); the resumed stream reads ONLY it
    import shutil

    extra = src / "zz-extra.warc.gz"
    shutil.copy(sorted(src.glob("f*.warc.gz"))[0], extra)
    rows = drain()
    assert len(rows) == 16  # 12 + the new archive's 4, no re-reads
    assert sum(1 for r in rows if r["warc_file"] == "zz-extra.warc.gz") == 4


def test_pushdown_is_advisory_under_conflicting_scans():
    """Spark reuses ONE Python DataSource reader per load() relation,
    so two branches pushing different warc_type values overwrite a
    single slot — the request/response pair join read response records
    on both sides when pushdown was trusted (caught by
    q_warc_pair_capture). The reader must (a) yield every filter back
    so Spark re-applies it, and (b) prune only when the pushed value
    is unambiguous."""
    from pyspark.sql.datasource import EqualTo

    from stream_processing_platform_spark.sources.warc_datasource import (
        WarcBatchReader,
    )

    r = WarcBatchReader({"path": "/tmp"})
    f1 = EqualTo(("warc_type",), "request")
    # the filter comes back (Spark will re-evaluate it post-scan)
    assert list(r.pushFilters([f1])) == [f1]
    assert r._pushed_types == {"request"}
    # a second scan pushes a different value -> ambiguity disables the
    # source-side prune instead of last-write-wins mis-scanning
    f2 = EqualTo(("warc_type",), "response")
    assert list(r.pushFilters([f2])) == [f2]
    assert r._pushed_types == {"request", "response"}


def test_pair_capture_branches_use_independent_relations(spark, tmp_path):
    """End-to-end guard: with SEPARATE load() calls per branch, the
    request/response pairing keeps both record types intact."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.sources.warc_datasource import (
        register_warc_source,
    )

    register_warc_source(spark)
    recs = []
    for j in range(3):
        uri = f"https://example.test/{j}"
        recs.append((
            {**H, "WARC-Type": "request", "WARC-Record-ID": record_id_from(f"rq{j}"),
             "WARC-Target-URI": uri},
            f"GET /{j} HTTP/1.1\r\n\r\n".encode(),
        ))
        recs.append((
            {**H, "WARC-Record-ID": record_id_from(f"rs{j}"), "WARC-Target-URI": uri},
            b"HTTP/1.1 200 OK\r\n\r\nbody",
        ))
    p = str(tmp_path / "pairs.warc.gz")
    write_warc(p, recs, gzip_members=True)
    req = spark.read.format("spp_warc").load(p).where(F.col("warc_type") == "request")
    resp = spark.read.format("spp_warc").load(p).where(F.col("warc_type") == "response")
    j = req.select("target_uri").join(resp.select("target_uri", "content_length"), "target_uri")
    rows = j.collect()
    assert len(rows) == 3
    assert all(r["content_length"] == len(b"HTTP/1.1 200 OK\r\n\r\nbody") for r in rows)
