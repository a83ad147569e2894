"""JPEG (JFIF) codec — pure Python + numpy, no codec libraries.

Closes the last honestly-gated image format (imagecodec.decode_image
raised ``NotImplementedError`` for JPEG while PPM/PGM/BMP/PNG decode for
real). Scope: baseline sequential DCT (SOF0/1) AND progressive DCT
(SOF2 — spectral selection + successive approximation, ITU-T T.81
Annex G: real web corpora are heavily progressive), Huffman, grayscale
or color at ANY integral sampling-factor layout — 4:4:4, the
real-world default 4:2:0 (16×16 MCUs: 4 luma blocks + box-averaged
Cb/Cr), 4:2:2 et al. — plus restart-marker handling (baseline and
per-scan progressive), at 8-bit AND 12-bit precision (r9:
extended-sequential SOF1 with 16-bit DQT entries, 2048 level shift,
extended Huffman alphabets — DC categories to 15, AC sizes to 14 —
decoding to uint16; ``encode_jpeg(bits=12)`` produces it).
Arithmetic-coded, lossless, hierarchical, and 12-bit-progressive
streams raise with a clear message rather than decoding wrong.

Both modes decode through ONE coefficient-domain path: every scan
accumulates into per-component zigzag coefficient grids (baseline is
simply the single full-band Ss=0..Se=63 Ah=Al=0 scan) and the final
dequant + IDCT runs once, vectorized over all blocks.

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

# 12-bit extended-sequential Huffman tables: flat canonical tables
# covering the larger symbol alphabets T.81 F.1.2 allows at 12-bit
# precision (DC categories 0..15, AC sizes 1..14). Kraft-safe: 16
# symbols at length 5 and 226 at length 9 leave slack below the
# reserved all-ones codeword (226 = EOB + ZRL + 16 runs x 14 sizes).
_DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC12_VALS = list(range(16))
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0]
_AC12_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]

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

# Progressive entropy coding uses FIXED uniform-length Huffman tables:
# the 12 DC size symbols at 4 bits, and ALL 176 possible AC symbols —
# (run 0-15, size 1-10) pairs, the 15 EOBn run-length symbols 0x00-0xE0,
# and ZRL 0xF0 — at 8 bits. Real encoders optimize tables per scan with
# a statistics pass; uniform tables keep this emitter single-pass and
# deterministic, cost only compression ratio, and crucially INCLUDE the
# EOBn symbols the standard baseline tables lack (T.81 Annex K has no
# 0x10..0xE0 entries), so multi-block EOB runs are exercised for real.
# Canonical assignment leaves the all-ones code unassigned (12 < 15,
# 176 < 255), as the spec requires for pad-bit disambiguation.
_PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_DC_VALS = list(range(12))
_PROG_AC_VALS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [n << 4 for n in range(15)]
    + [0xF0]
)
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

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


class _HuffTable(dict):
    """(length, code) -> symbol decode dict, plus ``lut``: a 65536-entry
    list indexed by the next 16 bits of the stream (left-aligned) whose
    entries pack ``(code_length << 8) | symbol`` — one list index
    replaces the old bit-by-bit prefix walk. Entries are ``None`` where
    no code matches (invalid prefix)."""

    __slots__ = ("lut",)

    def __init__(self, dec: dict[tuple[int, int], int]) -> None:
        super().__init__(dec)
        lut: list[int | None] = [None] * 65536
        for (ln, code), sym in dec.items():
            span = 1 << (16 - ln)
            start = code * span
            lut[start:start + span] = [(ln << 8) | sym] * span
        self.lut = lut


def _huff_decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    """(length, code) -> symbol (with a 16-bit-prefix fast LUT). MJPEG
    streams repeat identical DHT segments every frame, so the build is
    memoized on the raw table bytes."""
    return _huff_decode_table_cached(tuple(bits), tuple(vals))


def _huff_decode_table_cached(bits: tuple[int, ...], vals: tuple[int, ...]) -> _HuffTable:
    key = (bits, vals)
    tab = _HUFF_CACHE.get(key)
    if tab is None:
        enc = _huff_encode_table(list(bits), list(vals))
        tab = _HuffTable({(ln, code): sym for sym, (code, ln) in enc.items()})
        if len(_HUFF_CACHE) >= 64:
            _HUFF_CACHE.clear()
        _HUFF_CACHE[key] = tab
    return tab


_HUFF_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], _HuffTable] = {}


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
    """Bit reader over one scan's entropy-coded bytes. The raw stream is
    split ONCE at RSTn markers and each piece unstuffed (FF00 -> FF) up
    front, so the hot bit loop has no per-byte marker conditionals:
    reads pull up to 8 unstuffed bytes at a time into an int
    accumulator, and Huffman symbols resolve with ONE 16-bit-prefix LUT
    index instead of a bit-by-bit prefix walk."""

    __slots__ = ("data", "_segs", "_si", "_seg", "_bp", "_acc", "_n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        segs = []
        start = i = 0
        n = len(data)
        while True:
            j = data.find(b"\xff", i)
            if j < 0 or j + 1 >= n:
                segs.append(data[start:])
                break
            if 0xD0 <= data[j + 1] <= 0xD7:  # restart marker: piece boundary
                segs.append(data[start:j])
                start = i = j + 2
            else:  # stuffed FF00 (unstuffed below); data byte otherwise
                i = j + 2
        self._segs = [s.replace(b"\xff\x00", b"\xff") for s in segs]
        self._si = 0
        self._seg = self._segs[0]
        self._bp = 0  # byte position within the current piece
        self._acc = 0
        self._n = 0

    def _fill(self) -> bool:
        take = min(8, len(self._seg) - self._bp)
        if take <= 0:
            return False
        bp = self._bp
        self._acc = ((self._acc & ((1 << self._n) - 1)) << (take * 8)) | int.from_bytes(
            self._seg[bp:bp + take], "big"
        )
        self._bp = bp + take
        self._n += take * 8
        return True

    def read_bit(self) -> int:
        n = self._n
        if n == 0:
            if not self._fill():
                raise ValueError("JPEG: entropy data truncated")
            n = self._n
        n -= 1
        self._n = n
        return (self._acc >> n) & 1

    def read_bits(self, n: int) -> int:
        while self._n < n:
            if not self._fill():
                raise ValueError("JPEG: entropy data truncated")
        rem = self._n - n
        self._n = rem
        return (self._acc >> rem) & ((1 << n) - 1)

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        n = self._n
        if n < 16:
            self._fill()
            n = self._n
        p = ((self._acc >> (n - 16)) if n >= 16 else (self._acc << (16 - n))) & 0xFFFF
        e = table.lut[p]
        if e is not None:
            ln = e >> 8
            if ln <= n:
                self._n = n - ln
                return e & 0xFF
        if n < 16:  # piece exhausted mid-code (the old walk's read_bit raise)
            raise ValueError("JPEG: entropy data truncated")
        raise ValueError("JPEG: invalid Huffman code")

    def byte_align(self) -> None:
        self._n -= self._n % 8

    def skip_rst(self) -> None:
        """Byte-align and continue at the next restart piece — the old
        reader's 'skip stuffed pad bytes, then the RST marker'."""
        self.byte_align()
        if self._si + 1 < len(self._segs):
            self._si += 1
            self._seg = self._segs[self._si]
            self._bp = 0
            self._acc = 0
            self._n = 0


# ---------------------------------------------------------------- encoder

def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
    bits: int = 8,
) -> bytes:
    """JFIF bytes for an (H, W) grayscale or (H, W, 3) RGB uint8 array.
    ``subsampling``: "444" (one 8×8 block per component per MCU) or
    "420" (the real-world default: 16×16 MCUs of 4 luma blocks + one
    2×2-box-averaged block each of Cb/Cr — a 2× byte saving before
    entropy coding even starts).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every N MCUs/blocks (byte-aligned, DC predictors + EOB runs reset) —
    the error-resilience feature real-world encoders use, here mainly
    to exercise the decoder's restart paths in tests.
    ``progressive`` emits SOF2 with a libjpeg-style default scan script
    (interleaved DC first at Al=1, per-component spectral-selection AC
    bands, then one successive-approximation refinement pass per
    component and a DC refinement) over the fixed uniform Huffman
    tables above.
    ``bits=12`` emits EXTENDED SEQUENTIAL (SOF1, T.81 12-bit
    precision): samples in [0, 4095] (uint16 input), level shift 2048,
    quant tables scaled x16 and written as 16-bit DQT entries, extended
    flat Huffman tables covering DC categories 0..15 / AC sizes 1..14.
    Progressive stays 8-bit (SOF2 at 12-bit would need its own scan
    script — honestly gated)."""
    img = np.asarray(img)
    if bits not in (8, 12):
        raise ValueError(f"bits must be 8 or 12, got {bits}")
    if bits == 12 and progressive:
        raise NotImplementedError("12-bit progressive JPEG unsupported (SOF2 is 8-bit here)")
    center = float(1 << (bits - 1))
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = center - 0.168735892 * rgb[..., 0] - 0.331264108 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = center + 0.5 * rgb[..., 0] - 0.418687589 * rgb[..., 1] - 0.081312411 * rgb[..., 2]
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
    if bits == 12:
        # x16 keeps quantized coefficient magnitudes in the 8-bit
        # regime over the 16x larger sample range (the standard
        # practice); entries exceed 255, forcing the 16-bit DQT form
        ql = np.clip(ql * 16, 1, 65535)
        qc = np.clip(qc * 16, 1, 65535)
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
            plane.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3) - center
        )
        dct = np.einsum("ij,rcjk,lk->rcil", _C, grid, _C)
        q = raster_q[0 if ci == 0 else 1]
        quantized.append(np.round(dct / q).astype(np.int64))

    if progressive:
        return _encode_progressive(
            quantized, samps, gray, h, w, mcus_x, mcus_y, quants, restart_interval
        )

    if bits == 12:
        dc_tabs = [_huff_encode_table(_DC12_BITS, _DC12_VALS)]
        ac_tabs = [_huff_encode_table(_AC12_BITS, _AC12_VALS)]
        if not gray:
            dc_tabs.append(dc_tabs[0])
            ac_tabs.append(ac_tabs[0])
    else:
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
        if bits == 12 or int(t.max()) > 255:  # 16-bit entries (pq=1)
            out += b"\xff\xdb" + struct.pack(">H", 131) + bytes([0x10 | ti])
            out += b"".join(struct.pack(">H", int(x)) for x in t)
        else:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti])
            out += bytes(int(x) for x in t)
    nc = 1 if gray else 3
    sof = b"\xff\xc0" if bits == 8 else b"\xff\xc1"  # SOF1: extended sequential
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, bits, h, w, nc)
    for ci in range(nc):
        hi, vi = samps[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])  # id, sampling, quant id
    if bits == 12:
        huffs = [(0x00, _DC12_BITS, _DC12_VALS), (0x10, _AC12_BITS, _AC12_VALS)]
        if not gray:
            huffs += [(0x01, _DC12_BITS, _DC12_VALS), (0x11, _AC12_BITS, _AC12_VALS)]
    else:
        huffs = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
        if not gray:
            huffs += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS), (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for tc, hbits, hvals in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(hvals)) + bytes([tc])
        out += bytes(hbits) + bytes(hvals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])  # dc/ac table ids
    out += b"\x00\x3f\x00"  # spectral selection 0..63, approx 0
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------ progressive enc

def _prog_scan_script(gray: bool) -> list[tuple[list[int], int, int, int, int]]:
    """(component indexes, Ss, Se, Ah, Al) per scan — the libjpeg-style
    default progression: interleaved DC first at Al=1, luma AC split
    into a low band (1-5) then the tail, chroma full-band, one extra
    luma approximation level, then the Al→0 refinement passes."""
    if gray:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([1], 1, 63, 0, 1),
        ([2], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([1], 1, 63, 1, 0),
        ([2], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def _rst_marker(bw: _BitWriter, idx: int) -> None:
    bw.flush()
    bw.out += bytes([0xFF, 0xD0 + idx % 8])


def _emit_dc_scan(bw, zzq, samps, comp_ids, ah, al, dc_tab, mcus_x, mcus_y,
                  comp_blocks, ri) -> None:
    """DC scan: first pass (Ah=0) codes diffs of the point-transformed
    DC (arithmetic shift — T.81 A.4.1 for DC); refinement (Ah>0) is one
    raw bit per block. Interleaved MCU order when the scan has several
    components, the component's own block raster otherwise (T.81 A.2.2)."""
    pred = {ci: 0 for ci in comp_ids}
    if len(comp_ids) > 1:
        units = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                blocks = []
                for ci in comp_ids:
                    hi, vi = samps[ci]
                    blocks += [
                        (ci, my * vi + v, mx * hi + u)
                        for v in range(vi)
                        for u in range(hi)
                    ]
                units.append(blocks)
    else:
        ci = comp_ids[0]
        bh, bwid = comp_blocks(ci)
        units = [[(ci, by, bx)] for by in range(bh) for bx in range(bwid)]
    rst = 0
    for n, blocks in enumerate(units):
        if ri and n and n % ri == 0:
            _rst_marker(bw, rst)
            rst += 1
            pred = {ci: 0 for ci in comp_ids}
        for ci, by, bx in blocks:
            dc = int(zzq[ci][by, bx, 0]) >> al
            if ah == 0:
                diff = dc - pred[ci]
                pred[ci] = dc
                size, raw = _magnitude(diff)
                code, ln = dc_tab[size]
                bw.write(code, ln)
                if size:
                    bw.write(raw, size)
            else:
                bw.write(dc & 1, 1)


def _flush_eobrun(bw, ac_tab, eobrun: int, pending: list[int]) -> int:
    """Emit the EOBn symbol (n = floor(log2(run)), run - 2^n extension
    bits) followed by the correction bits riding it; returns 0."""
    if eobrun:
        n = eobrun.bit_length() - 1
        code, ln = ac_tab[n << 4]
        bw.write(code, ln)
        if n:
            bw.write(eobrun - (1 << n), n)
    for bit in pending:
        bw.write(bit, 1)
    pending.clear()
    return 0


def _emit_ac_first_scan(bw, zz, ss, se, al, ac_tab, dims, ri) -> None:
    """First AC scan of a band (Ah=0): baseline-style (run, size) coding
    of the point-transformed values (sign · |v| >> Al — T.81 A.4.1 for
    AC truncates the MAGNITUDE), with all-zero block tails folded into
    cross-block EOB runs."""
    bh, bwid = dims
    eobrun = 0
    pending: list[int] = []  # always empty here; shared flush helper
    rst = 0
    for n_unit in range(bh * bwid):
        if ri and n_unit and n_unit % ri == 0:
            eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
            _rst_marker(bw, rst)
            rst += 1
        by, bx = divmod(n_unit, bwid)
        coefs = zz[by, bx]
        vals = [
            (1 if int(c) > 0 else -1) * (abs(int(c)) >> al)
            for c in coefs[ss:se + 1]
        ]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
            continue
        eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                run -= 16
            size, raw = _magnitude(v)
            code, ln = ac_tab[(run << 4) | size]
            bw.write(code, ln)
            bw.write(raw, size)
            run = 0
        if nz[-1] < len(vals) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
    _flush_eobrun(bw, ac_tab, eobrun, pending)


def _emit_ac_refine_scan(bw, zz, ss, se, al, ac_tab, dims, ri) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3): one
    correction bit per previously-significant coefficient, a
    (run, 1) + sign pair per newly-significant one, with correction
    bits emitted after the symbol whose run span covers them and
    trailing ones riding the next EOB run. A ZRL is emitted at any
    nonzero coefficient while >15 zero-HISTORY coefficients are pending
    and the last newly-significant coefficient hasn't been passed
    (beyond it, runs fold into the EOB)."""
    bh, bwid = dims
    eobrun = 0
    pending: list[int] = []  # correction bits riding the next EOBn
    rst = 0
    for n_unit in range(bh * bwid):
        if ri and n_unit and n_unit % ri == 0:
            eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
            _rst_marker(bw, rst)
            rst += 1
        by, bx = divmod(n_unit, bwid)
        coefs = zz[by, bx]
        mags = [abs(int(c)) >> al for c in coefs[ss:se + 1]]
        if 1 not in mags:
            # no newly-significant coefficient: the whole block folds
            # into the EOB run; its correction bits ride along
            eobrun += 1
            pending.extend(m & 1 for m in mags if m > 1)
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
            continue
        eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
        eobpos = max(i for i, m in enumerate(mags) if m == 1)
        run = 0
        runbits: list[int] = []
        for i, m in enumerate(mags):
            if m == 0:
                run += 1
                continue
            while run > 15 and i <= eobpos:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                run -= 16
                for bit in runbits:
                    bw.write(bit, 1)
                runbits = []
            if m > 1:
                runbits.append(m & 1)
                continue
            # m == 1: newly significant at this precision
            code, ln = ac_tab[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if int(coefs[ss + i]) > 0 else 0, 1)
            for bit in runbits:
                bw.write(bit, 1)
            runbits = []
            run = 0
        if run > 0 or runbits:
            eobrun += 1
            pending.extend(runbits)
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, ac_tab, eobrun, pending)
    _flush_eobrun(bw, ac_tab, eobrun, pending)


def _encode_progressive(quantized, samps, gray, h, w, mcus_x, mcus_y, quants,
                        restart_interval) -> bytes:
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    # zigzag-order coefficient grids per component
    zzq = [q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG] for q in quantized]

    def comp_blocks(ci: int) -> tuple[int, int]:
        hi, vi = samps[ci]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    dc_tab = _huff_encode_table(_PROG_DC_BITS, _PROG_DC_VALS)
    ac_tab = _huff_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)

    scans = []
    for comp_ids, ss, se, ah, al in _prog_scan_script(gray):
        bw = _BitWriter()
        if ss == 0:
            _emit_dc_scan(bw, zzq, samps, comp_ids, ah, al, dc_tab,
                          mcus_x, mcus_y, comp_blocks, restart_interval)
        elif ah == 0:
            _emit_ac_first_scan(bw, zzq[comp_ids[0]], ss, se, al, ac_tab,
                                comp_blocks(comp_ids[0]), restart_interval)
        else:
            _emit_ac_refine_scan(bw, zzq[comp_ids[0]], ss, se, al, ac_tab,
                                 comp_blocks(comp_ids[0]), restart_interval)
        bw.flush()
        scans.append((comp_ids, ss, se, ah, al, bytes(bw.out)))

    nc = len(quantized)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, t in enumerate(quants):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + bytes(int(x) for x in t)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)  # SOF2
    for ci in range(nc):
        hi, vi = samps[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(_PROG_DC_VALS)) + bytes([0x00])
    out += bytes(_PROG_DC_BITS) + bytes(_PROG_DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(_PROG_AC_VALS)) + bytes([0x10])
    out += bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for comp_ids, ss, se, ah, al, data in scans:
        ns = len(comp_ids)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_ids:
            out += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0 throughout
        out += bytes([ss, se, (ah << 4) | al])
        out += data
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decoder

def _entropy_end(b: bytes, pos: int) -> int:
    """Index of the first marker after ``pos`` that is NOT a stuffed
    0xFF00 or an RSTn (both belong to the entropy-coded segment)."""
    i = pos
    while i + 1 < len(b):
        if b[i] == 0xFF:
            nxt = b[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return len(b)


def _skip_rst(br: _BitReader) -> None:
    """Byte-align, skip stuffed pad bytes, then the RST marker."""
    br.skip_rst()


def _decode_block_first(br, zz, dc_tab, ac_tab, ss, se, al, pred, eobrun):
    """First pass over a band (Ah=0). Covers baseline too (ss=0, se=63,
    al=0): the baseline EOB symbol 0x00 is simply EOBn with n=0 (run of
    0 further blocks). Returns (new DC pred, remaining eobrun)."""
    if ss == 0:
        size = br.read_symbol(dc_tab)
        diff = _extend(br.read_bits(size), size)
        pred += diff
        zz[0] = pred << al
    k = max(ss, 1)
    while k <= se:
        sym = br.read_symbol(ac_tab)
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << run) - 1 + (br.read_bits(run) if run else 0)
            break
        k += run
        if k > se:
            raise ValueError("JPEG: AC run past band end")
        zz[k] = _extend(br.read_bits(size), size) << al
        k += 1
    return pred, eobrun


def _decode_block_refine_ac(br, zz, ac_tab, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3): every previously-nonzero coefficient passed over reads one
    correction bit; a (run, 1) symbol plants a newly-significant ±2^Al
    after skipping ``run`` zero-HISTORY coefficients; EOBn covers whole
    blocks whose nonzero coefficients still each read a correction bit.
    Returns the remaining eobrun."""
    p1, m1 = 1 << al, -(1 << al)

    def refine(k: int) -> None:
        if br.read_bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    if eobrun > 0:
        for k in range(ss, se + 1):
            if zz[k] != 0:
                refine(k)
        return eobrun - 1
    k = ss
    while k <= se:
        sym = br.read_symbol(ac_tab)
        run, size = sym >> 4, sym & 0xF
        newval = 0
        if size == 0:
            if run < 15:
                eobrun = (1 << run) - 1 + (br.read_bits(run) if run else 0)
                run = 64  # sweep the rest of the block, refining nonzeros
            # run == 15: ZRL — skip 16 zero-history coefficients
        else:
            if size != 1:
                raise ValueError("JPEG: refinement size must be 1")
            newval = p1 if br.read_bit() else m1
        while k <= se:
            if zz[k] != 0:
                refine(k)
            else:
                if run == 0:
                    if newval:
                        zz[k] = newval
                    k += 1
                    break
                run -= 1
            k += 1
    return eobrun


def _decode_scan(entropy, scan, ss, se, ah, al, dc_tabs, ac_tabs, coefs,
                 comp_samp, comp_dims, mcus_x, mcus_y, restart_interval,
                 progressive) -> None:
    """Decode one entropy-coded segment into the coefficient grids.
    Interleaved (ns>1) scans walk the MCU grid; single-component scans
    walk the component's own block raster (T.81 A.2.2)."""
    ns = len(scan)
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("JPEG: progressive scan mixes DC and AC")
        if ss > 0 and ns != 1:
            raise ValueError("JPEG: interleaved progressive AC scan")
    br = _BitReader(entropy)
    preds = {cid: 0 for cid, _, _ in scan}
    eobrun = 0

    if ns > 1:
        units: list[list[tuple[int, int, int, int, int]]] = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                blocks = []
                for cid, tdc, tac in scan:
                    hi, vi = comp_samp[cid]
                    blocks += [
                        (cid, tdc, tac, my * vi + v, mx * hi + u)
                        for v in range(vi)
                        for u in range(hi)
                    ]
                units.append(blocks)
    else:
        cid, tdc, tac = scan[0]
        bh, bw_ = comp_dims[cid]
        units = [
            [(cid, tdc, tac, by, bx)] for by in range(bh) for bx in range(bw_)
        ]

    for n, blocks in enumerate(units):
        if restart_interval and n and n % restart_interval == 0:
            _skip_rst(br)
            preds = {cid: 0 for cid in preds}
            eobrun = 0
        for cid, tdc, tac, by, bx in blocks:
            zz = coefs[cid][by, bx]
            if ah == 0:
                if eobrun > 0:  # only reachable in AC scans (ss >= 1)
                    eobrun -= 1
                    continue
                preds[cid], eobrun = _decode_block_first(
                    br, zz, dc_tabs.get(tdc), ac_tabs.get(tac) if se > 0 else None,
                    ss, se, al, preds[cid], eobrun,
                )
            elif ss == 0:
                if br.read_bit():  # DC refinement: one raw bit
                    zz[0] |= 1 << al
            else:
                eobrun = _decode_block_refine_ac(
                    br, zz, ac_tabs[tac], ss, se, al, eobrun
                )


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode JFIF bytes → (H, W) or (H, W, 3) uint8 array. Baseline
    (SOF0/1) and progressive (SOF2) both decode through one
    coefficient-domain path: each scan accumulates into per-component
    zigzag coefficient grids, then dequant + IDCT runs once, vectorized
    over every block."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    saw_scan = False
    coefs: dict[int, np.ndarray] = {}
    comp_samp: dict[int, tuple[int, int]] = {}
    comp_dims: dict[int, tuple[int, int]] = {}
    mcus_x = mcus_y = 0
    while pos + 1 < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xFF:  # optional fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            continue
        length = struct.unpack(">H", b[pos:pos + 2])[0]
        seg = b[pos + 2:pos + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq == 0:
                    quants[tq] = np.frombuffer(
                        seg[p + 1:p + 65], dtype=np.uint8
                    ).astype(np.int64)
                    p += 65
                else:  # 16-bit entries (the 12-bit-precision form)
                    quants[tq] = np.frombuffer(
                        seg[p + 1:p + 129], dtype=">u2"
                    ).astype(np.int64)
                    p += 129
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            precision = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"JPEG: {precision}-bit precision unsupported (8/12 decode)"
                )
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, tq, samp >> 4, samp & 0xF))
            frame = (h, w, comps)
            hmax = max(hi for _, _, hi, _ in comps)
            vmax = max(vi for _, _, _, vi in comps)
            for cid, _, hi, vi in comps:
                if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"JPEG: non-integral sampling ratio for component {cid}"
                    )
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            for cid, _, hi, vi in comps:
                comp_samp[cid] = (hi, vi)
                cw = (w * hi + hmax - 1) // hmax
                ch = (h * vi + vmax - 1) // vmax
                comp_dims[cid] = ((ch + 7) // 8, (cw + 7) // 8)
                coefs[cid] = np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: arithmetic/lossless/hierarchical modes unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if not progressive:
                ss, se, a = 0, 63, 0  # baseline scans are always full-band
            data_start = pos + length
            end = _entropy_end(b, data_start)
            _decode_scan(
                b[data_start:end], scan, ss, se, a >> 4, a & 0xF,
                dc_tabs, ac_tabs, coefs, comp_samp, comp_dims,
                mcus_x, mcus_y, restart_interval, progressive,
            )
            saw_scan = True
            pos = end
            continue
        pos += length
    if frame is None or not saw_scan:
        raise ValueError("JPEG: missing SOF/SOS")

    h, w, comps = frame
    nc = len(comps)
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)

    # Dequant + IDCT, vectorized over every block of every component.
    full = []
    for cid, tq, hi, vi in comps:
        zz = coefs[cid]
        by, bx = zz.shape[:2]
        raster = np.zeros((by, bx, 64), dtype=np.float64)
        raster[..., ZIGZAG] = zz * quants[tq]
        blocks = raster.reshape(by, bx, 8, 8)
        center = float(1 << (precision - 1))
        pix = np.einsum("ji,rcjk,kl->rcil", _C, blocks, _C) + center
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        p = plane[:ch, :cw]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    center = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    if nc == 1:
        return np.clip(np.round(full[0]), 0, maxv).astype(dtype)
    y, cb, cr = full
    r = y + 1.402 * (cr - center)
    g = y - 0.344136286 * (cb - center) - 0.714136286 * (cr - center)
    bch = y + 1.772 * (cb - center)
    return np.clip(np.round(np.stack([r, g, bch], axis=-1)), 0, maxv).astype(dtype)
