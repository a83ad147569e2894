"""FLAC codec round-trips (multimodal/flaccodec.py — from-scratch
Rice + fixed/LPC prediction per the public spec, RFC 9639).

No codec library exists in this container, so the decoder is verified
the same way the JPEG/PNG/GIF/MP4 codecs are: our encoder emits real,
spec-conformant streams (CRC-8 header, CRC-16 frame, STREAMINFO MD5)
and every subframe type / stereo decorrelation mode must survive the
bit-exact round trip; corruption tests prove the CRCs actually gate."""

from __future__ import annotations

import numpy as np
import pytest

from stream_processing_platform_spark.multimodal.flaccodec import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _mono(n: int = 9000, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    return (12000 * np.sin(2 * np.pi * 440 * t) + rng.integers(-60, 60, n)).astype(
        np.int16
    )


def test_crc_reference_vectors():
    # classic check value for CRC-8/0x07 and CRC-16/BUYPASS (0x8005,
    # init 0, no reflection) over b"123456789"
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_mono_fixed_roundtrip_and_compression():
    x = _mono()
    data = encode_flac(x, 8000)
    rate, y = decode_flac(data)
    assert rate == 8000
    assert np.array_equal(x.astype(np.int64), y.astype(np.int64))
    assert len(data) < 2 * len(x) * 0.8  # actually compresses vs raw PCM


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_roundtrip(mode):
    x = _mono()
    st = np.stack([x, (x // 2 + 101).astype(np.int16)], axis=1)
    rate, y = decode_flac(encode_flac(st, 8000, stereo_mode=mode))
    assert np.array_equal(st.astype(np.int64), y.astype(np.int64))


def test_mid_side_odd_sums_and_negatives():
    # mid=(l+r)>>1 floors; reconstruction must recover odd sums and
    # negative values exactly
    st = np.array([[-3, 2], [5, -4], [1, 2], [-7, -8], [32767, -32768]], np.int16)
    st = np.repeat(st, 40, axis=0)
    rate, y = decode_flac(encode_flac(st, 8000, stereo_mode="mid_side"))
    assert np.array_equal(st.astype(np.int64), y.astype(np.int64))


def test_constant_verbatim_wasted_and_lpc_subframes():
    x = _mono()
    c = np.full(4096, -1234, dtype=np.int16)
    assert np.array_equal(c, decode_flac(encode_flac(c, 8000, subframe="constant"))[1])
    assert np.array_equal(
        x[:2000], decode_flac(encode_flac(x[:2000], 8000, subframe="verbatim"))[1]
    )
    w = (x[:3000].astype(np.int64) & ~7).astype(np.int16)  # 3 wasted bits
    assert np.array_equal(
        w, decode_flac(encode_flac(w, 8000, subframe="wasted_verbatim"))[1]
    )
    rate, y = decode_flac(
        encode_flac(x, 8000, subframe="lpc", lpc_coefs=[3, -3, 1], lpc_shift=1)
    )
    assert np.array_equal(x.astype(np.int64), y.astype(np.int64))


def test_multiframe_and_8bit():
    x = _mono(10000)
    rate, y = decode_flac(encode_flac(x, 8000, block_size=1024))
    assert np.array_equal(x.astype(np.int64), y.astype(np.int64))
    x8 = (x // 256).astype(np.int16)
    rate, y = decode_flac(encode_flac(x8, 8000, bps=8))
    assert np.array_equal(x8.astype(np.int64), y.astype(np.int64))


def test_corruption_is_caught():
    x = _mono(4000)
    d = bytearray(encode_flac(x, 8000))
    d[len(d) // 2] ^= 0x10  # flip a residual bit mid-frame
    with pytest.raises(ValueError, match="CRC|MD5|sync|truncated"):
        decode_flac(bytes(d))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFnot-a-flac-stream" * 4)


def test_honest_gates():
    x = _mono(1000)
    with pytest.raises(NotImplementedError, match="bps"):
        encode_flac(x, 8000, bps=20)
    # unknown-total streaming header is gated, not silently empty
    d = bytearray(encode_flac(x, 8000))
    # zero the 36-bit total field (last 4.5 bytes of the 18-byte
    # bit-packed STREAMINFO prefix at offset 8)
    d[21] &= 0xF0
    d[22:26] = b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="total-samples"):
        decode_flac(bytes(d))
