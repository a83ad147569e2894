"""Multimodal plumbing tests: binaryFile ingest → metadata struct →
Arrow-batched feature extraction (deterministic fake decoder), plus the
stub boundaries."""

from __future__ import annotations

import pytest

from stream_processing_platform_spark.multimodal.codecs import (
    extract_features,
    read_binary_files,
    resize_images,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.jpg").write_bytes(b"\xff\xd8\xff fake-jpeg-bytes-aaaa")
    (d / "b.png").write_bytes(b"\x89PNG fake-png-bytes-bbbb")
    (d / "c.wav").write_bytes(b"RIFF fake-wav-bytes-cccc")
    return str(d)


def test_binary_ingest_and_metadata(spark, media_dir):
    df = with_media_metadata(read_binary_files(spark, media_dir))
    rows = {r.media_meta.mime for r in df.collect()}
    assert rows == {"image/jpeg", "image/png", "audio/wav"}
    r = df.select("content_hash", "content_size").collect()
    assert all(len(x.content_hash) == 64 and x.content_size > 0 for x in r)


def test_feature_extraction_deterministic(spark, media_dir):
    df = with_media_metadata(read_binary_files(spark, media_dir))
    f1 = {r.content_hash: r.feature for r in extract_features(df, dim=16).collect()}
    f2 = {r.content_hash: r.feature for r in extract_features(df, dim=16).collect()}
    assert f1 == f2  # deterministic across runs
    assert all(len(v) == 16 for v in f1.values())
    assert len({tuple(v) for v in f1.values()}) == 3  # distinct payloads → distinct features


def test_glob_filter(spark, media_dir):
    df = read_binary_files(spark, media_dir, glob="*.jpg")
    assert df.count() == 1


def test_stubs_raise(spark, media_dir):
    df = read_binary_files(spark, media_dir)
    with pytest.raises(NotImplementedError):
        extract_features(df, decoder="image")
    with pytest.raises(NotImplementedError):
        resize_images(df, 224, 224)
