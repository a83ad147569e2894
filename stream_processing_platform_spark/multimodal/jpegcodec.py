"""Baseline JPEG (JFIF) codec — pure Python + numpy, no codec libraries.

Closes the last honestly-gated image format (imagecodec.decode_image
raised ``NotImplementedError`` for JPEG while PPM/PGM/BMP/PNG decode for
real). Scope: baseline sequential DCT, 8-bit, Huffman, grayscale or
color at ANY integral sampling-factor layout — 4:4:4, the real-world
default 4:2:0 (16×16 MCUs: 4 luma blocks + box-averaged Cb/Cr), 4:2:2
et al. — plus restart-marker handling for foreign files. Progressive,
arithmetic-coded, 12-bit and non-integral-ratio streams raise with a
clear message rather than decoding wrong.

The decoder trusts nothing from the encoder: quantization and Huffman
tables are parsed from the stream's DQT/DHT segments (as the spec
requires), entropy-coded data is bit-read with 0xFF00 de-stuffing, and
blocks go through dequant → de-zigzag → IDCT → level shift → (for
color) YCbCr→RGB. Verified by encode→decode round-trips at several
qualities/sizes plus analytic single-block cases (a flat field must
survive near-exactly; DCT of a constant block is DC-only).

All tables below are public constants from the JPEG spec (ITU-T T.81
Annex K); the decoder never assumes them — they only shape the
encoder's output.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II basis matrix: block_dct = C @ B @ C.T, inverse = C.T @ D @ C.
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 → spec table, 100 → all ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int64)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _huff_encode_table(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, raw bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    raw = v if v >= 0 else v + (1 << size) - 1
    return size, raw


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("JPEG: unexpected marker inside scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def byte_align(self) -> None:
        self._n = 0


# ---------------------------------------------------------------- encoder

def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Baseline JFIF bytes for an (H, W) grayscale or (H, W, 3) RGB
    uint8 array. ``subsampling``: "444" (one 8×8 block per component
    per MCU) or "420" (the real-world default: 16×16 MCUs of 4 luma
    blocks + one 2×2-box-averaged block each of Cb/Cr — a 2× byte
    saving before entropy coding even starts).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every N MCUs (byte-aligned, DC predictors reset) — the
    error-resilience feature real-world encoders use, here mainly to
    exercise the decoder's restart path in tests."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168735892 * rgb[..., 0] - 0.331264108 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418687589 * rgb[..., 1] - 0.081312411 * rgb[..., 2]
        if subsampling == "444":
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":

            def box2(p: np.ndarray) -> np.ndarray:
                pp = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
                return (
                    pp.reshape(pp.shape[0] // 2, 2, pp.shape[1] // 2, 2).mean((1, 3))
                )

            planes = [y, box2(cb), box2(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsampling must be '444' or '420': {subsampling!r}")
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    ql = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)
    quants = [ql] if gray else [ql, qc]  # table 0 = luma, 1 = chroma

    # De-zigzag view of the quant tables (they are stored in zigzag order).
    raster_q = []
    for t in quants:
        r = np.empty(64, dtype=np.int64)
        r[ZIGZAG] = t
        raster_q.append(r.reshape(8, 8))

    # Pad each plane to its MCU grid, DCT + quantize all blocks at once;
    # keep the (rows, cols) block GRID so the MCU loop can interleave.
    quantized = []
    for ci, plane in enumerate(planes):
        hi, vi = samps[ci]
        th, tw = mcus_y * vi * 8, mcus_x * hi * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        grid = (
            plane.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        )
        dct = np.einsum("ij,rcjk,lk->rcil", _C, grid, _C)
        q = raster_q[0 if ci == 0 else 1]
        quantized.append(np.round(dct / q).astype(np.int64))

    dc_tabs = [_huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_tabs = [_huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_huff_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_tabs.append(_huff_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    bw = _BitWriter()
    pred = [0] * len(planes)

    def emit_block(block: np.ndarray, ci: int) -> None:
        ti = 0 if ci == 0 else 1
        zz = block.reshape(64)[ZIGZAG]
        # DC
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, raw = _magnitude(diff)
        code, ln = dc_tabs[ti][size]
        bw.write(code, ln)
        if size:
            bw.write(raw, size)
        # AC
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_tabs[ti][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size, raw = _magnitude(v)
            code, ln = ac_tabs[ti][(run << 4) | size]
            bw.write(code, ln)
            bw.write(raw, size)
            run = 0
            if k == last_nz:
                break
        if last_nz < 63:
            code, ln = ac_tabs[ti][0x00]  # EOB
            bw.write(code, ln)

    rst = 0
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()  # byte-align (pad bits are 1s; a 0xFF pad is stuffed)
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred[:] = [0] * len(planes)
            for ci in range(len(planes)):
                hi, vi = samps[ci]
                for v in range(vi):
                    for u in range(hi):
                        emit_block(quantized[ci][my * vi + v, mx * hi + u], ci)
            mcu += 1
    bw.flush()

    # ---- marker segments
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, t in enumerate(quants):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + bytes(int(x) for x in t)
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hi, vi = samps[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])  # id, sampling, quant id
    huffs = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        huffs += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS), (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tc, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])  # dc/ac table ids
    out += b"\x00\x3f\x00"  # spectral selection 0..63, approx 0
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes → (H, W) or (H, W, 3) uint8 array."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    scan = None
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        length = struct.unpack(">H", b[pos:pos + 2])[0]
        seg = b[pos + 2:pos + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables unsupported")
                quants[tq] = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                table = _huff_decode_table(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = table
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if precision != 8:
                raise NotImplementedError("JPEG: only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, tq, samp >> 4, samp & 0xF))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG: only baseline sequential supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            pos += length
            break  # entropy data follows
        pos += length
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF/SOS")

    h, w, comps = frame
    nc = len(comps)
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    for cid, _, hi, vi in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"JPEG: non-integral sampling ratio for component {cid}"
            )
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    comp_q = {cid: quants[tq] for cid, tq, _, _ in comps}
    comp_samp = {cid: (hi, vi) for cid, _, hi, vi in comps}
    planes = {
        cid: np.zeros((mcus_y * vi * 8, mcus_x * hi * 8))
        for cid, _, hi, vi in comps
    }

    br = _BitReader(b[pos:])
    pred = {cid: 0 for cid, _, _ in scan}
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.byte_align()
                # skip stuffed pad bytes (0xFF00) then the RST marker
                while (
                    br.pos + 1 < len(br.data)
                    and br.data[br.pos] == 0xFF
                    and br.data[br.pos + 1] == 0x00
                ):
                    br.pos += 2
                if (
                    br.pos + 1 < len(br.data)
                    and br.data[br.pos] == 0xFF
                    and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                ):
                    br.pos += 2
                pred = {cid: 0 for cid in pred}
            for cid, tdc, tac in scan:
                hi, vi = comp_samp[cid]
                for v in range(vi):
                    for u in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        size = br.read_symbol(dc_tabs[tdc])
                        diff = _extend(br.read_bits(size), size)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            sym = br.read_symbol(ac_tabs[tac])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("JPEG: bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG: AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coeff = np.zeros(64, dtype=np.float64)
                        coeff[ZIGZAG] = zz * comp_q[cid]
                        block = _C.T @ coeff.reshape(8, 8) @ _C + 128.0
                        r0, c0 = (my * vi + v) * 8, (mx * hi + u) * 8
                        planes[cid][r0:r0 + 8, c0:c0 + 8] = block
            mcu += 1

    # crop each component to its own resolution, then upsample to (h, w)
    full = []
    for cid, _, hi, vi in comps:
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        p = planes[cid][:ch, :cw]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    planes = full
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bch], axis=-1)), 0, 255).astype(np.uint8)
