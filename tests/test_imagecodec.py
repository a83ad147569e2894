"""Pure-Python codec unit tests (no Spark): netpbm/BMP/WAV round-trips,
resize sampling, and feature math — the real-decoder layer under
multimodal/codecs.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stream_processing_platform_spark.multimodal import imagecodec as ic


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    # width 53: row stride 159 bytes is not a multiple of 4 — exercises
    # BMP row padding
    return rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)


def test_ppm_roundtrip(img):
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(img)), img)


def test_ppm_header_comments(img):
    b = b"P6\n# a comment\n53 37\n255\n" + img.tobytes()
    assert np.array_equal(ic.decode_ppm(b), img)


def test_pgm_grayscale_replicates_channels():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = b"P5\n4 3\n255\n" + gray.tobytes()
    out = ic.decode_ppm(b)
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_bmp_roundtrip_with_row_padding(img):
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(img)), img)


def test_decode_image_sniffs_magic(img):
    assert np.array_equal(ic.decode_image(ic.encode_ppm(img)), img)
    assert np.array_equal(ic.decode_image(ic.encode_bmp(img)), img)
    # JPEG dispatches to the real jpegcodec decoder now — garbage after
    # the magic is a parse error, not a missing-library gate
    with pytest.raises(ValueError, match="JPEG"):
        ic.decode_image(b"\xff\xd8\xff fake jpeg")
    with pytest.raises(ValueError):
        ic.decode_image(b"garbage")


def test_resize_nearest(img):
    assert ic.resize_nearest(img, 8, 5).shape == (5, 8, 3)
    assert np.array_equal(ic.resize_nearest(img, 53, 37), img)  # identity
    up = ic.resize_nearest(img, 106, 74)  # 2x upsample repeats pixels
    assert np.array_equal(up[::2, ::2], img)


def test_image_features_range_and_constant(img):
    f = ic.image_features(img, 64)
    assert f.shape == (64,) and f.dtype == np.float32
    assert (f >= 0).all() and (f < 1).all()
    white = np.full((10, 10, 3), 255, np.uint8)
    fw = ic.image_features(white, 16)
    assert np.allclose(fw, fw[0]) and fw[0] > 0.95


def test_wav_roundtrip_and_rms():
    t = np.arange(16000) / 16000
    sine = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    rate, dec = ic.decode_wav(ic.encode_wav(sine, 16000))
    assert rate == 16000 and len(dec) == 16000
    assert np.abs(dec - sine).max() < 1e-3
    af = ic.audio_features(dec, 10)
    assert af.shape == (10,) and np.allclose(af, 0.5 / np.sqrt(2), atol=0.01)
    assert ic.audio_features(np.zeros(100, np.float32), 4).max() == 0


def test_wav_stereo_downmix_and_8bit():
    t = np.arange(16000) / 16000
    sine = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    st = np.empty(32000, dtype="<i2")
    st[0::2] = st[1::2] = (sine * 32767).astype("<i2")
    data = st.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 16000, 64000, 4, 16)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + fmt
        + struct.pack("<4sI", b"data", len(data))
    ) + data
    rate, mono = ic.decode_wav(wav)
    assert rate == 16000 and len(mono) == 16000
    assert np.abs(mono - sine).max() < 1e-3

    pcm8 = np.round(sine * 127 + 128).astype(np.uint8).tobytes()
    fmt8 = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 16000, 16000, 1, 8)
    wav8 = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(pcm8), b"WAVE")
        + fmt8
        + struct.pack("<4sI", b"data", len(pcm8))
    ) + pcm8
    _, d8 = ic.decode_wav(wav8)
    assert np.abs(d8 - sine).max() < 0.02


# ---------------------------------------------------------------- PNG


def _ref_filtered_scanlines(img, ftypes):
    """Spec-literal PNG filtering (RFC 2083 §6) — the independent
    reference the decoder's unfilter is checked against."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)
    out = b""
    prev = [0] * stride
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        row = flat[y]
        enc = []
        for i in range(stride):
            a = row[i - ch] if i >= ch else 0
            b_ = prev[i]
            c = flat[y - 1][i - ch] if (y > 0 and i >= ch) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b_
            elif ft == 3:
                pred = (a + b_) // 2
            else:
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
            enc.append((row[i] - pred) & 0xFF)
        out += bytes([ft]) + bytes(enc)
        prev = row
    return out


def _build_png(img, ftypes, color_type, palette=None):
    import zlib

    h, w = img.shape[:2]
    raw = _ref_filtered_scanlines(img, ftypes)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    plte = chunk(b"PLTE", palette.tobytes()) if palette is not None else b""
    return (
        ic._PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_through_own_encoder(img):
    assert (ic.decode_png(ic.encode_png(img)) == img).all()
    # and via the magic sniffer
    assert (ic.decode_image(ic.encode_png(img)) == img).all()


def test_png_all_filter_types_unfilter_correctly(img):
    """Every PNG filter (Sub/Up/Average/Paeth, plus mixed rows) decoded
    against an independently-built spec-literal filtered stream."""
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        png = _build_png(img, ftypes, color_type=2)
        assert (ic.decode_png(png) == img).all(), f"filters {ftypes}"


def test_png_color_types():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (5, 7, 1), dtype=np.uint8)
    dec = ic.decode_png(_build_png(gray, [4], color_type=0))
    assert dec.shape == (5, 7, 3)
    assert (dec[:, :, 0] == gray[:, :, 0]).all() and (dec[:, :, 1] == dec[:, :, 0]).all()

    rgba = rng.integers(0, 256, (6, 4, 4), dtype=np.uint8)
    assert (ic.decode_png(_build_png(rgba, [2, 4], color_type=6)) == rgba[:, :, :3]).all()

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (8, 8, 1), dtype=np.uint8)
    dec = ic.decode_png(_build_png(idx, [1], color_type=3, palette=pal))
    assert (dec == pal[idx[:, :, 0]]).all()


def test_png_unsupported_shapes_raise_cleanly():
    import pytest as _pytest

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    png = bytearray(ic.encode_png(img))
    # flip bit depth byte in IHDR (offset: 8 magic + 8 len/type + 8 w/h)
    png[24] = 16
    with _pytest.raises(NotImplementedError, match="8-bit"):
        ic.decode_png(bytes(png))
    png[24] = 8
    png[28] = 1  # interlace byte
    with _pytest.raises(NotImplementedError, match="interlace"):
        ic.decode_png(bytes(png))
