"""From-scratch ISO-BMFF container codec (multimodal/mp4codec.py):
muxer↔parser round trips with MJPEG payloads our jpegcodec decodes for
real, sample-table fidelity (stts timeline, stss keyframes, chunk map),
the Spark frame-sampling path over MP4, and the mixed-corpus
on_foreign='skip' quarantine (r8 advice: one foreign payload must not
kill a full-corpus sampling job)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_processing_platform_spark.multimodal import mp4codec
from stream_processing_platform_spark.multimodal.jpegcodec import decode_jpeg, encode_jpeg


def _img(seed: int, w: int = 16, h: int = 24) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 9 + seed * 31) % 256, (xx * 13) % 256, ((yy + xx) * 7) % 256], -1
    ).astype(np.uint8)


def _mjpeg_mp4(n: int = 3, delays=None, **kw) -> tuple[bytes, list[bytes]]:
    frames = [encode_jpeg(_img(i), quality=90) for i in range(n)]
    return mp4codec.encode_mp4(frames, delays or [40] * n, 16, 24, **kw), frames


def test_roundtrip_samples_and_timeline():
    mp4, frames = _mjpeg_mp4(3, delays=[40, 60, 40])
    f = mp4codec.parse_mp4(mp4)
    assert f.brand == "isom"
    [t] = f.video_tracks()
    assert (t.codec, t.handler, t.width, t.height) == ("jpeg", "vide", 16, 24)
    assert t.times_ms() == [0, 40, 100]
    assert t.duration_ms() == 140  # mdhd duration, not a fencepost guess
    samples = mp4codec.extract_samples(mp4, t)
    assert [p for _, _, p, _ in samples] == frames
    for _, _, p, _ in samples:
        assert decode_jpeg(p).shape == (24, 16, 3)


def test_stss_keyframes_and_sync_only_extraction():
    mp4, _ = _mjpeg_mp4(5, delays=[40] * 5, keyframe_every=2)
    [t] = mp4codec.parse_mp4(mp4).video_tracks()
    assert t.sync == [True, False, True, False, True]
    assert [i for i, _, _, _ in mp4codec.extract_samples(mp4, t, sync_only=True)] == [0, 2, 4]


def test_no_stss_means_all_sync():
    mp4, _ = _mjpeg_mp4(3)
    [t] = mp4codec.parse_mp4(mp4).video_tracks()
    assert t.sync == [True, True, True]


def test_parse_rejects_non_mp4_and_validates_sizes():
    with pytest.raises(ValueError, match="ftyp"):
        mp4codec.parse_mp4(b"\x89PNG not an mp4 at all....")
    mp4, _ = _mjpeg_mp4(2)
    # corrupt a box size so it overruns its container
    bad = bytearray(mp4)
    bad[0:4] = (len(mp4) + 999).to_bytes(4, "big")
    with pytest.raises(ValueError, match="overruns"):
        list(mp4codec.parse_boxes(bytes(bad)))


def test_encoder_validates_frame_delay_pairing():
    frames = [encode_jpeg(_img(0))]
    with pytest.raises(ValueError, match="pair 1:1"):
        mp4codec.encode_mp4(frames, [40, 40], 16, 24)
    with pytest.raises(ValueError, match="at least one"):
        mp4codec.encode_mp4([], [], 16, 24)


def test_decode_image_takes_first_mp4_frame():
    from stream_processing_platform_spark.multimodal.imagecodec import decode_image

    mp4, frames = _mjpeg_mp4(3)
    assert np.array_equal(decode_image(mp4), decode_jpeg(frames[0]))


def test_spark_frame_sampling_decodes_mjpeg_mp4(spark):
    """The GIF timeline semantics applied to MP4's stts: frame k shows
    during [t_k, t_{k+1}); ticks 0,70→frame0, 140→frame1,
    210,280→frame2 for 100 ms deltas sampled every 70 ms."""
    from stream_processing_platform_spark.multimodal.codecs import sample_video_frames
    from stream_processing_platform_spark.multimodal.imagecodec import decode_image

    mp4, frames = _mjpeg_mp4(3, delays=[100, 100, 100])
    df = spark.createDataFrame([(bytearray(mp4),)], "content binary").withColumns(
        {
            "content_hash": F.sha2(F.col("content"), 256),
            "content_size": F.length(F.col("content")).cast("long"),
        }
    )
    rows = sorted(
        sample_video_frames(df, every_ms=70, decoder="image").collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [
        (0, 0), (1, 70), (2, 140), (3, 210), (4, 280),
    ]
    want = [0, 0, 1, 2, 2]
    for r, wi in zip(rows, want):
        assert np.array_equal(decode_image(bytes(r.frame)), decode_jpeg(frames[wi]))


def test_mixed_corpus_on_foreign_skip(spark):
    """One undecodable payload (PNG magic / AVC-only MP4) must not kill
    the sampling job under on_foreign='skip' — it just emits no rows."""
    from stream_processing_platform_spark.multimodal.codecs import sample_video_frames
    from stream_processing_platform_spark.multimodal.gifcodec import encode_gif

    q = (_img(1) // 64) * 64
    gif = encode_gif([q, q], [50, 50])
    mp4, _ = _mjpeg_mp4(2, delays=[50, 50])
    png = b"\x89PNG\r\n\x1a\n" + b"not-a-video" * 3
    df = spark.createDataFrame(
        [(bytearray(gif),), (bytearray(mp4),), (bytearray(png),)], "content binary"
    ).withColumns(
        {
            "content_hash": F.sha2(F.col("content"), 256),
            "content_size": F.length(F.col("content")).cast("long"),
        }
    )
    rows = sample_video_frames(df, every_ms=50, decoder="image", on_foreign="skip").collect()
    assert len(rows) == 4  # 2 ticks from the GIF + 2 from the MP4, PNG skipped
    with pytest.raises(Exception):  # default stays loud
        sample_video_frames(df, every_ms=50, decoder="image").collect()
    with pytest.raises(ValueError, match="on_foreign"):
        sample_video_frames(df, every_ms=50, decoder="image", on_foreign="quarantine")


def test_malformed_streams_fail_loudly_never_hang():
    """Truncations/corruptions of a valid MP4 must raise promptly
    (ValueError / struct.error from a truncated table read), never
    loop or return garbage silently — parse_boxes' size >= header
    check forbids zero-advance."""
    import struct as _struct

    mp4, _ = _mjpeg_mp4(2)
    for cut in (10, 30, len(mp4) // 2, len(mp4) - 5):
        try:
            mp4codec.parse_mp4(mp4[:cut])
        except (ValueError, _struct.error, NotImplementedError):
            pass
    # bit flips in the box-structure region
    for pos in range(0, 60, 7):
        bad = bytearray(mp4)
        bad[pos] ^= 0xFF
        try:
            mp4codec.parse_mp4(bytes(bad))
        except (ValueError, _struct.error, NotImplementedError):
            pass
