"""From-scratch GIF codec: lossless LZW round-trips, spec features the
encoder doesn't emit (interlace, transparency, disposal) decoded from
hand-assembled streams, and the REAL frame-sampling path in Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stream_processing_platform_spark.multimodal.gifcodec import (
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _quantized(seed: int, h: int = 37, w: int = 29) -> np.ndarray:
    r = np.random.default_rng(seed)
    return (r.integers(0, 4, (h, w, 3)) * 85).astype(np.uint8)


def test_multiframe_roundtrip_lossless_with_delays():
    frames = [_quantized(i) for i in range(5)]
    b = encode_gif(frames, [50, 100, 150, 200, 250])
    dec, delays = decode_gif(b)
    assert delays == [50, 100, 150, 200, 250]
    assert len(dec) == 5
    for a, d in zip(frames, dec):
        assert np.array_equal(a, d)


def test_lzw_table_reset_and_palette_edges():
    # 200x300 quantized noise forces LZW past 4096 codes (table resets)
    big = _quantized(99, 200, 300)
    assert np.array_equal(decode_gif(encode_gif([big]))[0][0], big)
    # 1-color palette (min bits) and exactly-256-color palette (max)
    flat = np.full((8, 8, 3), 200, np.uint8)
    assert np.array_equal(decode_gif(encode_gif([flat]))[0][0], flat)
    pal = np.array([[i, (i * 3) % 256, (i * 7) % 256] for i in range(256)], np.uint8)
    img = pal[np.arange(256).reshape(16, 16)]
    assert np.array_equal(decode_gif(encode_gif([img]))[0][0], img)
    # >256 distinct colors is a modelling problem, not a codec one
    i = np.arange(300)
    many = np.stack([i % 256, (i // 256) % 256, np.full_like(i, 7)], -1)
    with pytest.raises(ValueError, match="palette overflow"):
        encode_gif([many.reshape(20, 15, 3).astype(np.uint8)])


def _manual_gif(w, h, palette, blocks):
    bits = max(1, (len(palette) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF0 | (bits - 1), 0, 0)
    out += pal.tobytes()
    for blk in blocks:
        out += blk
    out += b"\x3b"
    return bytes(out)


def _image_block(indices, w, h, interlace=False, min_code=2):
    out = bytearray(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0))
    out += bytes([min_code])
    lzw = _lzw_encode(indices.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def test_interlaced_image_decodes_to_original():
    """The decoder must undo the 4-pass interlace row shuffle. The
    encoder never interlaces, so the fixture is hand-assembled: rows
    are stored in pass order (0,8,16.. then 4,12.. then 2,6.. then
    odd), exactly what a GIF87a-era interlaced writer emits."""
    h, w = 13, 7
    img_ix = (np.arange(h * w).reshape(h, w) % 4).astype(np.uint8)
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    stored = img_ix[order]  # rows in interlace pass order
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    b = _manual_gif(w, h, palette, [_image_block(stored, w, h, interlace=True)])
    frames, _ = decode_gif(b)
    assert np.array_equal(frames[0], palette[img_ix])


def test_transparency_and_disposal_compose_frames():
    """Frame 2 paints only its opaque pixels over frame 1 (transparency)
    and disposal=2 restores the background region before frame 3."""
    w = h = 4
    palette = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], np.uint8)
    f1 = np.zeros((h, w), np.uint8)
    f1[:] = 1  # all red
    f2 = np.full((h, w), 2, np.uint8)
    f2[0, :] = 0  # index 0 declared transparent below: top row keeps red
    gce_plain = b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x00, 5, 0, 0)
    # transparent index 0, disposal 2 (restore background afterwards)
    gce_trans = b"\x21\xf9" + struct.pack("<BBHBB", 4, (2 << 2) | 1, 5, 0, 0)
    b = _manual_gif(
        w, h, palette,
        [
            gce_plain, _image_block(f1, w, h),
            gce_trans, _image_block(f2, w, h),
            gce_plain, _image_block(f1, w, h),
        ],
    )
    frames, _ = decode_gif(b)
    assert len(frames) == 3
    # frame 2: green everywhere except the transparent top row (still red)
    assert np.array_equal(frames[1][0], np.tile(palette[1], (w, 1)))
    assert np.array_equal(frames[1][1:], np.tile(palette[2], (h - 1, w, 1)))
    # frame 3 drew over a background-restored canvas: all red again
    assert np.array_equal(frames[2], np.tile(palette[1], (h, w, 1)))


def test_decode_image_returns_first_gif_frame():
    from stream_processing_platform_spark.multimodal.imagecodec import decode_image

    frames = [_quantized(1), _quantized(2)]
    assert np.array_equal(decode_image(encode_gif(frames)), frames[0])


def test_spark_frame_sampling_decodes_real_gif(spark):
    """sample_video_frames(decoder='image'): a 3-frame GIF with 100 ms
    delays sampled every 70 ms emits the frame ON SCREEN at each tick —
    frame k shows during [100k, 100(k+1)), so ticks 0,70→frame0,
    140→frame1, 210,280→frame2 — each payload a PNG of the COMPOSED
    frame, decoded back and compared pixel-for-pixel."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.multimodal.codecs import (
        sample_video_frames,
    )
    from stream_processing_platform_spark.multimodal.imagecodec import decode_image

    frames = [_quantized(i, 16, 12) for i in range(3)]
    payload = encode_gif(frames, [100, 100, 100])
    df = spark.createDataFrame([(bytearray(payload),)], "content binary").withColumns(
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
    want = [0, 0, 1, 2, 2]  # which source frame is on screen per tick
    for r, k in zip(rows, want):
        assert np.array_equal(decode_image(bytes(r.frame)), frames[k])
