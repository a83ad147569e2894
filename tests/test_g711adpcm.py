"""G.711 mu-law/A-law and IMA ADPCM (multimodal/g711adpcm.py): code-
level self-consistency (the companding reconstruction-level property),
round-trip SNR, WAV container dispatch, and block handling.
"""

from __future__ import annotations

import numpy as np
import pytest

from stream_processing_platform_spark.multimodal import g711adpcm as G
from stream_processing_platform_spark.multimodal.imagecodec import decode_wav


def _sine(seconds=0.5, rate=8000, freq=440.0, amp=0.5):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_companding_codes_are_fixed_points():
    """encode(decode(c)) == c for every 8-bit code — the defining
    property of a companding codec's reconstruction levels. The single
    mu-law exception is negative zero (0x7F), which decodes to 0 and
    re-encodes as positive zero 0xFF (canonical G.711 aliasing)."""
    codes = np.arange(256, dtype=np.uint8)
    re_u = G.ulaw_encode(G.ulaw_decode(codes))
    bad = codes[re_u != codes]
    assert list(bad) == [0x7F]
    assert G.ulaw_decode(np.array([0x7F]))[0] == 0
    assert np.array_equal(G.alaw_encode(G.alaw_decode(codes)), codes)


def test_ulaw_anchors():
    assert G.ulaw_encode(np.array([0]))[0] == 0xFF
    assert G.ulaw_decode(np.array([0xFF]))[0] == 0
    # companding is symmetric: enc(-x) flips only the sign bit
    x = np.array([1234, 5678, 30000])
    assert np.array_equal(
        G.ulaw_encode(-x) ^ 0x80, G.ulaw_encode(x)
    )


def test_roundtrip_snr_bounds():
    x = _sine()
    for name, payload in (
        ("ulaw", G.encode_wav_g711(x, 8000, "ulaw")),
        ("alaw", G.encode_wav_g711(x, 8000, "alaw")),
        ("ima", G.encode_wav_ima(x, 8000)),
    ):
        rate, y = decode_wav(payload)
        assert rate == 8000 and len(y) == len(x), name
        snr = 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))
        assert snr > 25.0, (name, snr)  # textbook: ~36/39/32 dB


def test_ima_decode_matches_encoder_reconstruction():
    """ADPCM decode is EXACT against the encoder's internal predictor
    trajectory (the codec quantizes the residual against its own
    reconstruction, not the raw input) — replay the encoder's state
    machine and compare sample-for-sample."""
    x = (_sine(seconds=0.2) * 32767).astype(np.int16)
    blk = x[: G.IMA_SAMPLES_PER_BLOCK]
    block, _ = G.ima_encode_block(blk, 0)
    got = G.ima_decode_block(block)
    # reference trajectory: run the same quantize+update loop inline
    pred, idx = int(blk[0]), 0
    want = [pred]
    for s in blk[1:]:
        step = int(G._IMA_STEPS[idx])
        delta = int(s) - pred
        code = 8 if delta < 0 else 0
        delta = abs(delta)
        if delta >= step:
            code |= 4
            delta -= step
        if delta >= step >> 1:
            code |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            code |= 1
        pred, idx = G._ima_step(code, pred, idx)
        want.append(pred)
    assert np.array_equal(got, np.array(want, dtype=np.int16))
    # and decoding is deterministic + stable under re-encode (~40 dB)
    _, y = decode_wav(G.encode_wav_ima(_sine(seconds=0.2), 8000))
    _, y2 = decode_wav(G.encode_wav_ima(y, 8000))
    snr = 10 * np.log10(np.mean(y**2) / (np.mean((y - y2) ** 2) + 1e-30))
    assert snr > 30.0


def test_ima_fact_chunk_truncates_padding():
    x = _sine(seconds=0.1)  # 800 samples — not a multiple of 505
    rate, y = decode_wav(G.encode_wav_ima(x, 8000))
    assert len(y) == len(x)


def test_wav_dispatch_rejects_stereo_compressed():
    import struct

    x = _sine(seconds=0.05)
    payload = bytearray(G.encode_wav_g711(x, 8000, "ulaw"))
    # corrupt channel count to 2 inside fmt (offset 12+8+2)
    struct.pack_into("<H", payload, 22, 2)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(payload))


def test_unknown_format_tag_fails_loudly():
    import struct

    x = _sine(seconds=0.05)
    payload = bytearray(G.encode_wav_g711(x, 8000, "alaw"))
    struct.pack_into("<H", payload, 20, 0x99)
    with pytest.raises(ValueError):
        decode_wav(bytes(payload))
