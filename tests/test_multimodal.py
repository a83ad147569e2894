"""Multimodal plumbing tests: binaryFile ingest → metadata struct →
Arrow-batched feature extraction (deterministic fake decoder), plus the
stub boundaries."""

from __future__ import annotations

import pytest

from stream_processing_platform_spark.multimodal.codecs import (
    extract_features,
    read_binary_files,
    resize_images,
    sample_video_frames,
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


def test_resize_plumbing_shape_and_determinism(spark, media_dir):
    df = with_media_metadata(read_binary_files(spark, media_dir))
    # 15x15 = 225 bytes, NOT divisible by 4 — catches the float32-block
    # under-production bug (w*h//4 floats = 224 bytes)
    r1 = {r.content_hash: r for r in resize_images(df, 15, 15).collect()}
    r2 = {r.content_hash: r for r in resize_images(df, 15, 15).collect()}
    assert len(r1) == 3  # 1-in-1-out contract
    for h, row in r1.items():
        assert (row.width, row.height) == (15, 15)
        assert len(row.content) == 15 * 15  # resized payload is w*h bytes
        assert bytes(row.content) == bytes(r2[h].content)  # deterministic


def test_frame_sampling_fanout(spark, media_dir):
    df = with_media_metadata(read_binary_files(spark, media_dir))
    sizes = {r.content_hash: r.content_size for r in df.collect()}
    frames = sample_video_frames(df, every_ms=5).collect()
    by_hash: dict[str, list] = {}
    for f in frames:
        by_hash.setdefault(f.content_hash, []).append(f)
    assert set(by_hash) == set(sizes)
    for h, fs in by_hash.items():
        # stub treats content_size as duration_ms: size//5 frames each
        assert len(fs) == max(1, sizes[h] // 5)
        fs.sort(key=lambda f: f.frame_idx)
        assert [f.frame_idx for f in fs] == list(range(len(fs)))
        assert all(f.frame_ts_ms == f.frame_idx * 5 for f in fs)
        assert len({bytes(f.frame) for f in fs}) == len(fs)  # per-frame payloads


def test_stubs_raise(spark, media_dir):
    df = with_media_metadata(read_binary_files(spark, media_dir))
    with pytest.raises(NotImplementedError):
        extract_features(df, decoder="image")
    with pytest.raises(NotImplementedError):
        resize_images(df, 224, 224, decoder="image")
    with pytest.raises(NotImplementedError):
        sample_video_frames(df, 40, decoder="video")
