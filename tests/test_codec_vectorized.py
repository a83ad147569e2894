"""Focused equivalence pins for the r14 codec vectorizations.

Each optimized decode path is pinned bit-identical to a straight
per-sample/per-block reference implementation of the same spec
arithmetic — the internals changed, the outputs must not have.
No SparkSession needed; pure codec-level tests.
"""

from __future__ import annotations

import struct

import numpy as np

from stream_processing_platform_spark.multimodal import avccodec, g711adpcm


def _ima_reference(block: bytes) -> np.ndarray:
    """Per-sample IMA decode via _ima_step — the pre-vectorization form."""
    predictor, index, _ = struct.unpack_from("<hBB", block, 0)
    out = [predictor]
    for byte in block[4:]:
        for code in (byte & 0x0F, byte >> 4):
            predictor, index = g711adpcm._ima_step(code, predictor, index)
            out.append(predictor)
    return np.array(out, dtype=np.int16)


def test_ima_decode_block_matches_per_sample_reference():
    rng = np.random.default_rng(7)
    blocks = [
        struct.pack(
            "<hBB", int(rng.integers(-32768, 32768)), int(rng.integers(0, 89)), 0
        )
        + rng.integers(0, 256, size=252, dtype=np.uint8).tobytes()
        for _ in range(150)
    ]
    # clamp-stress: max step + extreme codes pin both ±32768 predictor
    # clamps and the [0, 88] index clamps; silence pins index at 0
    blocks += [
        struct.pack("<hBB", 32000, 88, 0) + b"\x77" * 252,
        struct.pack("<hBB", -32000, 88, 0) + b"\xff" * 252,
        struct.pack("<hBB", 0, 0, 0) + b"\x88" * 252,
        struct.pack("<hBB", 5, 10, 0),  # header-only block (no nibbles)
    ]
    for b in blocks:
        assert np.array_equal(_ima_reference(b), g711adpcm.ima_decode_block(b))


def _inv4x4_single(coefs: np.ndarray) -> np.ndarray:
    """Spec 8.5.12.2 butterfly on one 4x4 block, scalar loops."""
    d = coefs.astype(np.int64)
    e = np.empty((4, 4), np.int64)
    for r in range(4):
        a = d[r, 0] + d[r, 2]
        b = d[r, 0] - d[r, 2]
        c = (d[r, 1] >> 1) - d[r, 3]
        t = d[r, 1] + (d[r, 3] >> 1)
        e[r] = (a + t, b + c, b - c, a - t)
    f = np.empty((4, 4), np.int64)
    for c2 in range(4):
        a = e[0, c2] + e[2, c2]
        b = e[0, c2] - e[2, c2]
        c = (e[1, c2] >> 1) - e[3, c2]
        t = e[1, c2] + (e[3, c2] >> 1)
        f[:, c2] = (a + t, b + c, b - c, a - t)
    return f


def test_inv4x4_stack_matches_per_block():
    rng = np.random.default_rng(11)
    stack = rng.integers(-(2**15), 2**15, size=(16, 4, 4)).astype(np.int64)
    batched = avccodec.inv4x4(stack)
    for bi in range(16):
        ref = _inv4x4_single(stack[bi])
        assert np.array_equal(batched[bi], ref)
        # the single-block entry point must agree with itself too
        assert np.array_equal(avccodec.inv4x4(stack[bi]), ref)


def test_recon_mb_luma_matches_per_block_recon():
    rng = np.random.default_rng(13)
    pred = rng.integers(0, 256, size=(16, 16)).astype(np.int64)
    stack = rng.integers(-4000, 4000, size=(16, 4, 4)).astype(np.int64)
    got = avccodec._recon_mb_luma(pred, stack)
    for bi, (bx, by) in enumerate(avccodec._BLK_XY):
        ref = avccodec._recon_block(pred[by : by + 4, bx : bx + 4], stack[bi])
        assert np.array_equal(got[by : by + 4, bx : bx + 4], ref)
