"""From-scratch H.264/AVC baseline I-frame codec (CAVLC entropy layer).

Real crawl MP4 is overwhelmingly AVC; r9 shipped the ISO-BMFF container
layer with AVC honestly gated at entropy decode. This module closes the
keyframe half of that gate with no codec library:

- **Decode**: Annex-B / length-prefixed NAL parsing, RBSP de-escaping,
  SPS/PPS, IDR slice headers, macroblock layer for I slices — I_PCM,
  I_16x16 (all four luma prediction modes, DC/H/V/Plane chroma), and
  I_4x4 (all nine 4x4 prediction modes, predicted-mode signaling,
  Table 9-4 coded_block_pattern), CAVLC residual decoding (coeff_token / levels with adaptive suffix
  length / total_zeros / run_before, all five nC table classes
  including the chroma-DC table), dequantization, the 4x4 inverse
  integer transform, the 4x4 luma-DC Hadamard and the 2x2 chroma-DC
  transform, 4:2:0 chroma reconstruction.
- **Encode**: a fixture-grade I_16x16 + I_PCM encoder producing
  conformant streams (forward transform + quantization with the
  standard MF tables, CAVLC emission, in-loop reconstruction identical
  to the decoder) so every decode path is exercised by bit-exact
  round-trip tests in-container.

Honest gates (loud ``NotImplementedError``): CABAC, P/B slices,
fields/MBAFF, high-profile tools (8x8 transform,
scaling lists, monochrome), and in-loop deblocking — the encoder
always signals ``disable_deblocking_filter_idc = 1`` and the decoder
refuses streams that enable the filter rather than return wrong
pixels.

Conformance note: the VLC tables are transcribed from the public spec
(ITU-T H.264 Tables 9-5, 9-7/9-8, 9-9, 9-10); with no reference
decoder in this container, conformance is verified structurally
(prefix-freeness of every table, pytest) plus bit-exact round-trips
through the independently-written encode and decode paths.

The reference platform has no video code at all — this is LLM-pipeline
multimodal surface (SURVEY.md §7.6), same tier as jpegcodec/mp4codec.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- bit io


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def ue(self, v: int) -> None:
        code = v + 1
        nbits = code.bit_length()
        self.u(0, nbits - 1)
        self.u(code, nbits)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        if self._n:
            self.u(0, 8 - self._n)

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        self.align_zero()

    def getvalue(self) -> bytes:
        assert self._n == 0
        return bytes(self.buf)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        lz = 0
        while self.u(1) == 0:
            lz += 1
            if lz > 32:
                raise ValueError("AVC: invalid exp-golomb code")
        return (1 << lz) - 1 + self.u(lz)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        # true unless only the rbsp_stop_one_bit + zeros remain
        nbits = len(self.data) * 8
        if self.pos >= nbits:
            return False
        last = nbits - 1
        while last > self.pos:
            if (self.data[last >> 3] >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last


def rbsp_escape(raw: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def rbsp_unescape(data: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# ------------------------------------------------- CAVLC tables (9-5 etc.)

# coeff_token: per table class, rows = TotalCoeff 0..16, cols =
# TrailingOnes 0..3, entries (length, code). Class 0: 0<=nC<2,
# class 1: 2<=nC<4, class 2: 4<=nC<8; nC>=8 is a 6-bit FLC; class -1
# is the 4:2:0 chroma-DC table (TotalCoeff 0..4).
_CT_LEN = {
    0: [
        [1], [6, 2], [8, 6, 3], [9, 8, 7, 5], [10, 9, 8, 6],
        [11, 10, 9, 7], [13, 11, 10, 8], [13, 13, 11, 9],
        [13, 13, 13, 10], [14, 14, 13, 11], [14, 14, 14, 13],
        [15, 15, 14, 14], [15, 15, 15, 14], [16, 15, 15, 15],
        [16, 16, 16, 15], [16, 16, 16, 16], [16, 16, 16, 16],
    ],
    1: [
        [2], [6, 2], [6, 5, 3], [7, 6, 6, 4], [8, 6, 6, 4],
        [8, 7, 7, 5], [9, 8, 8, 6], [11, 9, 9, 6], [11, 11, 11, 7],
        [12, 11, 11, 9], [12, 12, 12, 11], [12, 12, 12, 11],
        [13, 13, 13, 12], [13, 13, 13, 13], [13, 14, 14, 13],
        [14, 14, 14, 13], [14, 14, 14, 14],
    ],
    2: [
        [4], [6, 4], [6, 5, 4], [6, 5, 5, 4], [7, 5, 5, 4],
        [7, 5, 5, 4], [7, 6, 6, 4], [7, 6, 6, 4], [8, 7, 7, 5],
        [8, 8, 7, 6], [9, 8, 8, 7], [9, 9, 8, 8], [9, 9, 9, 8],
        [10, 9, 9, 9], [10, 10, 10, 10], [10, 10, 10, 10],
        [10, 10, 10, 10],
    ],
    -1: [[2], [6, 1], [6, 6, 3], [6, 7, 7, 6], [6, 8, 8, 7]],
}
_CT_CODE = {
    0: [
        [1], [5, 1], [7, 4, 1], [7, 6, 5, 3], [7, 6, 5, 3],
        [7, 6, 5, 4], [15, 6, 5, 4], [11, 14, 5, 4], [8, 10, 13, 4],
        [15, 14, 9, 4], [11, 10, 13, 12], [15, 14, 9, 12],
        [11, 10, 13, 8], [15, 1, 9, 12], [11, 14, 13, 8],
        [7, 10, 9, 12], [4, 6, 5, 8],
    ],
    1: [
        [3], [11, 2], [7, 7, 3], [7, 10, 9, 5], [7, 6, 5, 4],
        [4, 6, 5, 6], [7, 6, 5, 8], [15, 6, 5, 4], [11, 14, 13, 4],
        [15, 10, 9, 4], [11, 14, 13, 12], [8, 10, 9, 8],
        [15, 14, 13, 12], [11, 10, 9, 12], [7, 11, 10, 8],
        [9, 8, 13, 1], [7, 6, 5, 4],
    ],
    2: [
        [15], [15, 14], [11, 15, 13], [8, 12, 14, 12], [15, 10, 11, 11],
        [11, 8, 9, 10], [9, 14, 13, 9], [8, 10, 9, 8], [15, 14, 13, 13],
        [11, 14, 10, 12], [15, 10, 13, 12], [11, 14, 9, 12],
        [8, 10, 13, 8], [13, 7, 9, 12], [9, 12, 11, 10], [5, 8, 7, 6],
        [1, 4, 3, 2],
    ],
    -1: [[1], [7, 1], [4, 6, 1], [3, 3, 2, 5], [2, 3, 2, 0]],
}

# total_zeros, 4x4 blocks (Tables 9-7/9-8): [TotalCoeff 1..15] ->
# per total_zeros value (0..16-TC) a (length, code) pair.
_TZ_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
_TZ_CODE = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]

# chroma-DC total_zeros (Table 9-9a, 4:2:0): [TotalCoeff 1..3]
_TZC_LEN = [[1, 2, 3, 3], [1, 2, 2], [1, 1]]
_TZC_CODE = [[1, 1, 1, 0], [1, 1, 0], [1, 0]]

# run_before (Table 9-10): [min(zerosLeft,7) 1..7] -> per run value
_RB_LEN = [
    [1, 1],
    [1, 2, 2],
    [2, 2, 2, 2],
    [2, 2, 2, 3, 3],
    [2, 2, 3, 3, 3, 3],
    [2, 3, 3, 3, 3, 3, 3],
    [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11],
]
_RB_CODE = [
    [1, 0],
    [1, 1, 0],
    [3, 2, 1, 0],
    [3, 2, 1, 1, 0],
    [3, 2, 3, 2, 1, 0],
    [3, 0, 1, 3, 2, 5, 4],
    [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
]

_ZIGZAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]


def _ct_class(nC: int) -> int:
    if nC == -1:
        return -1
    if nC < 2:
        return 0
    if nC < 4:
        return 1
    if nC < 8:
        return 2
    return 3  # 6-bit FLC


def _write_coeff_token(bw: BitWriter, nC: int, total: int, t1s: int) -> None:
    cls = _ct_class(nC)
    if cls == 3:
        if total == 0:
            bw.u(0b000011, 6)
        else:
            bw.u(((total - 1) << 2) | t1s, 6)
        return
    bw.u(_CT_CODE[cls][total][t1s], _CT_LEN[cls][total][t1s])


def _vlc_read(br: BitReader, lens, codes) -> int:
    """Decode one prefix code: lens/codes are parallel flat lists; the
    row tables are small, so a scan-by-length match is fine."""
    acc = 0
    nbits = 0
    candidates = list(zip(lens, codes, range(len(lens))))
    while nbits < 32:
        acc = (acc << 1) | br.u(1)
        nbits += 1
        for ln, code, idx in candidates:
            if ln == nbits and code == acc:
                return idx
    raise ValueError("AVC: invalid VLC code")


def _read_coeff_token(br: BitReader, nC: int) -> tuple[int, int]:
    cls = _ct_class(nC)
    if cls == 3:
        v = br.u(6)
        if v == 0b000011:
            return 0, 0
        return (v >> 2) + 1, v & 3
    lens, codes, pairs = [], [], []
    table_len, table_code = _CT_LEN[cls], _CT_CODE[cls]
    for total in range(len(table_len)):
        for t1s in range(len(table_len[total])):
            lens.append(table_len[total][t1s])
            codes.append(table_code[total][t1s])
            pairs.append((total, t1s))
    idx = _vlc_read(br, lens, codes)
    return pairs[idx]


def encode_residual_block(
    bw: BitWriter, coeffs: list[int], nC: int, max_coeffs: int
) -> int:
    """CAVLC-encode one scanned coefficient array (len == max_coeffs,
    already in scan order). Returns TotalCoeff (for nC bookkeeping)."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total = len(nz)
    if total > max_coeffs:
        raise ValueError("more coefficients than block size")
    # trailing ones: up to 3 |1| values at the high-frequency end
    t1s = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and t1s < 3:
            t1s += 1
        else:
            break
    _write_coeff_token(bw, nC, total, t1s)
    if total == 0:
        return 0
    # signs of trailing ones, highest frequency first
    for _, c in list(reversed(nz))[:t1s]:
        bw.u(1 if c < 0 else 0, 1)
    # remaining levels, highest frequency first
    levels = [c for _, c in list(reversed(nz))[t1s:]]
    suffix_len = 1 if total > 10 and t1s < 3 else 0
    for i, level in enumerate(levels):
        code = (level << 1) - 2 if level > 0 else -(level << 1) - 1
        if i == 0 and t1s < 3:
            code -= 2
        if suffix_len == 0:
            if code < 14:
                bw.u(1, code + 1)  # prefix zeros + stop bit
            elif code < 30:
                bw.u(1, 15)  # prefix 14
                bw.u(code - 14, 4)
            elif code < 14 + 15 + 4096 - 15:  # prefix 15, 12-bit suffix
                bw.u(1, 16)
                bw.u(code - 30, 12)
            else:
                raise NotImplementedError("AVC encode: level too large")
        else:
            if (code >> suffix_len) < 15:
                bw.u(1, (code >> suffix_len) + 1)
                bw.u(code & ((1 << suffix_len) - 1), suffix_len)
            elif code - (15 << suffix_len) < 4096:
                bw.u(1, 16)
                bw.u(code - (15 << suffix_len), 12)
            else:
                raise NotImplementedError("AVC encode: level too large")
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    zeros_total = nz[-1][0] + 1 - total
    if total < max_coeffs:
        if max_coeffs == 4:  # chroma DC
            bw.u(_TZC_CODE[total - 1][zeros_total], _TZC_LEN[total - 1][zeros_total])
        else:
            bw.u(_TZ_CODE[total - 1][zeros_total], _TZ_LEN[total - 1][zeros_total])
    # run_before, highest frequency first
    zeros_left = zeros_total
    positions = [i for i, _ in nz]
    for k in range(total - 1, 0, -1):
        if zeros_left == 0:
            break
        run = positions[k] - positions[k - 1] - 1
        tab = min(zeros_left, 7) - 1
        bw.u(_RB_CODE[tab][run], _RB_LEN[tab][run])
        zeros_left -= run
    return total


def decode_residual_block(br: BitReader, nC: int, max_coeffs: int) -> list[int]:
    """CAVLC-decode one residual block → coefficient array in scan
    order (length max_coeffs)."""
    total, t1s = _read_coeff_token(br, nC)
    coeffs = [0] * max_coeffs
    if total == 0:
        return coeffs
    levels: list[int] = []
    for _ in range(t1s):
        levels.append(-1 if br.u(1) else 1)
    suffix_len = 1 if total > 10 and t1s < 3 else 0
    for i in range(total - t1s):
        prefix = 0
        while br.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("AVC: level prefix overflow")
        if suffix_len > 0:
            size = suffix_len if prefix < 15 else 12
        else:
            size = 0 if prefix < 14 else (4 if prefix == 14 else 12)
        suffix = br.u(size) if size else 0
        code = (min(15, prefix) << suffix_len) + suffix
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1s < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if total < max_coeffs:
        if max_coeffs == 4:
            tz = _vlc_read(br, _TZC_LEN[total - 1], _TZC_CODE[total - 1])
        else:
            tz = _vlc_read(br, _TZ_LEN[total - 1], _TZ_CODE[total - 1])
    else:
        tz = 0
    # place coefficients, highest frequency first
    zeros_left = tz
    pos = total - 1 + tz  # index of highest-frequency coefficient
    for k in range(total):
        coeffs[pos] = levels[k]
        if k == total - 1:
            break
        if zeros_left > 0:
            tab = min(zeros_left, 7) - 1
            run = _vlc_read(br, _RB_LEN[tab], _RB_CODE[tab])
            zeros_left -= run
        else:
            run = 0
        pos -= run + 1
    return coeffs


# ------------------------------------------- transforms & quantization

# MF (forward) and V (dequant) per qp%6, by coefficient class:
# class a = positions (0,0),(0,2),(2,0),(2,2); b = odd,odd; c = rest.
_MF = {
    "a": [13107, 11916, 10082, 9362, 8192, 7282],
    "b": [5243, 4660, 4194, 3647, 3355, 2893],
    "c": [8066, 7490, 6554, 5825, 5243, 4559],
}
_V = {
    "a": [10, 11, 13, 14, 16, 18],
    "b": [16, 18, 20, 23, 25, 29],
    "c": [13, 14, 16, 18, 20, 23],
}


def _pos_class(i: int, j: int) -> str:
    ei, ej = i % 2 == 0, j % 2 == 0
    if ei and ej:
        return "a"
    if not ei and not ej:
        return "b"
    return "c"


_MF4 = np.array(
    [[[_MF[_pos_class(i, j)][m] for j in range(4)] for i in range(4)] for m in range(6)],
    dtype=np.int64,
)
_V4 = np.array(
    [[[_V[_pos_class(i, j)][m] for j in range(4)] for i in range(4)] for m in range(6)],
    dtype=np.int64,
)

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
               dtype=np.int64)
_CI = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -2, 2, -1]],
               dtype=np.int64)  # placeholder; inverse uses butterfly below
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
               dtype=np.int64)


def fwd4x4(block: np.ndarray) -> np.ndarray:
    x = block.astype(np.int64)
    return _CF @ x @ _CF.T


def inv4x4(coefs: np.ndarray) -> np.ndarray:
    """Inverse 4x4 integer transform (spec 8.5.12.2 butterfly), output
    NOT yet rounded — caller applies (x + 32) >> 6."""
    d = coefs.astype(np.int64)
    e = np.empty_like(d)
    # horizontal
    for i in range(4):
        a = d[i, 0] + d[i, 2]
        b = d[i, 0] - d[i, 2]
        c = (d[i, 1] >> 1) - d[i, 3]
        t = d[i, 1] + (d[i, 3] >> 1)
        e[i] = [a + t, b + c, b - c, a - t]
    f = np.empty_like(e)
    for j in range(4):
        a = e[0, j] + e[2, j]
        b = e[0, j] - e[2, j]
        c = (e[1, j] >> 1) - e[3, j]
        t = e[1, j] + (e[3, j] >> 1)
        f[:, j] = [a + t, b + c, b - c, a - t]
    return f


def quant4x4(w: np.ndarray, qp: int, intra: bool = True) -> np.ndarray:
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    mf = _MF4[qp % 6]
    return (np.sign(w) * ((np.abs(w) * mf + f) >> qbits)).astype(np.int64)


def dequant4x4_ac(z: np.ndarray, qp: int) -> np.ndarray:
    return (z.astype(np.int64) * _V4[qp % 6]) << (qp // 6)


def fwd_hadamard4(dc: np.ndarray) -> np.ndarray:
    return (_H4 @ dc.astype(np.int64) @ _H4.T) >> 1


def inv_hadamard4(z: np.ndarray) -> np.ndarray:
    return _H4 @ z.astype(np.int64) @ _H4.T


def quant_luma_dc(wd: np.ndarray, qp: int) -> np.ndarray:
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    mf0 = _MF["a"][qp % 6]
    return (np.sign(wd) * ((np.abs(wd) * mf0 + 2 * f) >> (qbits + 1))).astype(np.int64)


def dequant_luma_dc(z: np.ndarray, qp: int) -> np.ndarray:
    f = inv_hadamard4(z)
    v0 = _V["a"][qp % 6]
    if qp >= 12:
        return (f * v0) << (qp // 6 - 2)
    return (f * v0 + (1 << (1 - qp // 6))) >> (2 - qp // 6)


_H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)


def fwd_chroma_dc(dc: np.ndarray) -> np.ndarray:
    return _H2 @ dc.astype(np.int64) @ _H2


def quant_chroma_dc(wd: np.ndarray, qp: int) -> np.ndarray:
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    mf0 = _MF["a"][qp % 6]
    return (np.sign(wd) * ((np.abs(wd) * mf0 + 2 * f) >> (qbits + 1))).astype(np.int64)


def dequant_chroma_dc(z: np.ndarray, qp: int) -> np.ndarray:
    f = _H2 @ z.astype(np.int64) @ _H2
    v0 = _V["a"][qp % 6]
    return ((f * v0) << (qp // 6)) >> 1


_CHROMA_QP = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                                36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39]


def chroma_qp(qp: int, offset: int = 0) -> int:
    return _CHROMA_QP[min(51, max(0, qp + offset))]


def _recon_block(pred: np.ndarray, coefs: np.ndarray) -> np.ndarray:
    res = (inv4x4(coefs) + 32) >> 6
    return np.clip(pred.astype(np.int64) + res, 0, 255)


# ------------------------------------------------------ intra prediction

# luma 4x4-block coding order within a MB -> (x, y) pixel offsets
_BLK_XY = [
    (4 * (2 * ((i >> 2) & 1) + (i & 1)), 4 * (2 * (i >> 3) + ((i >> 1) & 1)))
    for i in range(16)
]


def _pred16(mode: int, top, left) -> np.ndarray:
    """Intra_16x16 luma prediction. top/left are length-16 arrays of
    reconstructed neighbor pixels or None when unavailable."""
    if mode == 0:  # Vertical
        if top is None:
            raise ValueError("AVC: vertical pred without top neighbor")
        return np.tile(top, (16, 1))
    if mode == 1:  # Horizontal
        if left is None:
            raise ValueError("AVC: horizontal pred without left neighbor")
        return np.tile(left[:, None], (1, 16))
    if mode == 2:  # DC
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int64)
    if mode == 3:  # Plane
        if top is None or left is None:
            raise ValueError("AVC: plane pred needs both neighbors")
        # spec 8.3.3.4; p[-1,-1] approximated by left[0]-? — requires
        # the corner pixel, carried as top_left
        raise ValueError("plane handled in _pred16_plane")
    raise ValueError(f"AVC: bad Intra16x16 pred mode {mode}")


def _pred16_plane(top, left, top_left) -> np.ndarray:
    h = sum((x + 1) * (int(top[8 + x]) - int(top[6 - x])) for x in range(7))
    h += 8 * (int(top[15]) - int(top_left))
    v = sum((y + 1) * (int(left[8 + y]) - int(left[6 - y])) for y in range(7))
    v += 8 * (int(left[15]) - int(top_left))
    a = 16 * (int(left[15]) + int(top[15]))
    b = (5 * h + 32) >> 6
    c = (5 * v + 32) >> 6
    ys, xs = np.mgrid[0:16, 0:16]
    return np.clip((a + b * (xs - 7) + c * (ys - 7) + 16) >> 5, 0, 255)


def _pred_chroma(mode: int, top, left, top_left) -> np.ndarray:
    """Intra chroma 8x8 prediction (modes: 0 DC, 1 Horizontal,
    2 Vertical, 3 Plane)."""
    if mode == 1:
        if left is None:
            raise ValueError("AVC: chroma H pred without left")
        return np.tile(left[:, None], (1, 8))
    if mode == 2:
        if top is None:
            raise ValueError("AVC: chroma V pred without top")
        return np.tile(top, (8, 1))
    if mode == 3:
        if top is None or left is None:
            raise ValueError("AVC: chroma plane needs both neighbors")
        h = sum((x + 1) * (int(top[4 + x]) - int(top[2 - x])) for x in range(3))
        h += 4 * (int(top[7]) - int(top_left))
        v = sum((y + 1) * (int(left[4 + y]) - int(left[2 - y])) for y in range(3))
        v += 4 * (int(left[7]) - int(top_left))
        a = 16 * (int(left[7]) + int(top[7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        ys, xs = np.mgrid[0:8, 0:8]
        return np.clip((a + b * (xs - 3) + c * (ys - 3) + 16) >> 5, 0, 255)
    # DC: per 4x4 quadrant (spec 8.3.4.1)
    out = np.empty((8, 8), dtype=np.int64)
    quads = {
        (0, 0): ("both", slice(0, 4), slice(0, 4)),
        (1, 0): ("top", slice(4, 8), slice(0, 4)),
        (0, 1): ("left", slice(0, 4), slice(4, 8)),
        (1, 1): ("both", slice(4, 8), slice(4, 8)),
    }
    for (qx, qy), (prefer, xs_, ys_) in quads.items():
        t = top[xs_] if top is not None else None
        l_ = left[ys_] if left is not None else None
        if prefer == "both":
            if t is not None and l_ is not None:
                dc = (int(t.sum()) + int(l_.sum()) + 4) >> 3
            elif t is not None:
                dc = (int(t.sum()) + 2) >> 2
            elif l_ is not None:
                dc = (int(l_.sum()) + 2) >> 2
            else:
                dc = 128
        elif prefer == "top":
            if t is not None:
                dc = (int(t.sum()) + 2) >> 2
            elif l_ is not None:
                dc = (int(l_.sum()) + 2) >> 2
            else:
                dc = 128
        else:  # prefer left
            if l_ is not None:
                dc = (int(l_.sum()) + 2) >> 2
            elif t is not None:
                dc = (int(t.sum()) + 2) >> 2
            else:
                dc = 128
        out[ys_, xs_] = dc
    return out


# ------------------------------------------------------------ NAL layer


def _nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return bytes([(ref_idc << 5) | nal_type]) + rbsp_escape(rbsp)


def write_sps(width: int, height: int) -> bytes:
    if width % 16 or height % 16:
        raise NotImplementedError("AVC encode: dimensions must be MB-aligned")
    bw = BitWriter()
    bw.u(66, 8)   # profile_idc: Baseline
    bw.u(0, 8)    # constraint flags + reserved
    bw.u(30, 8)   # level 3.0
    bw.ue(0)      # sps_id
    bw.ue(0)      # log2_max_frame_num_minus4
    bw.ue(2)      # pic_order_cnt_type 2
    bw.ue(0)      # max_num_ref_frames
    bw.u(0, 1)    # gaps_in_frame_num_value_allowed
    bw.ue(width // 16 - 1)
    bw.ue(height // 16 - 1)
    bw.u(1, 1)    # frame_mbs_only
    bw.u(0, 1)    # direct_8x8_inference
    bw.u(0, 1)    # frame_cropping
    bw.u(0, 1)    # vui_parameters_present
    bw.rbsp_trailing()
    return _nal(7, bw.getvalue())


def write_pps(qp: int) -> bytes:
    bw = BitWriter()
    bw.ue(0)      # pps_id
    bw.ue(0)      # sps_id
    bw.u(0, 1)    # entropy_coding_mode: CAVLC
    bw.u(0, 1)    # bottom_field_pic_order_in_frame_present
    bw.ue(0)      # num_slice_groups_minus1
    bw.ue(0)      # num_ref_idx_l0_default_active_minus1
    bw.ue(0)      # num_ref_idx_l1_default_active_minus1
    bw.u(0, 1)    # weighted_pred
    bw.u(0, 2)    # weighted_bipred_idc
    bw.se(qp - 26)  # pic_init_qp_minus26
    bw.se(0)      # pic_init_qs_minus26
    bw.se(0)      # chroma_qp_index_offset
    bw.u(1, 1)    # deblocking_filter_control_present
    bw.u(0, 1)    # constrained_intra_pred
    bw.u(0, 1)    # redundant_pic_cnt_present
    bw.rbsp_trailing()
    return _nal(8, bw.getvalue())


def parse_sps(rbsp: bytes) -> dict:
    br = BitReader(rbsp)
    profile = br.u(8)
    br.u(8)
    level = br.u(8)
    sps = {"profile": profile, "level": level, "id": br.ue()}
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma = br.ue()
        if chroma != 1:
            raise NotImplementedError(f"AVC: chroma_format_idc {chroma}")
        if br.ue() or br.ue():  # bit depths
            raise NotImplementedError("AVC: high bit depth")
        br.u(1)  # qpprime_y_zero_transform_bypass
        if br.u(1):
            raise NotImplementedError("AVC: seq scaling matrices")
    sps["log2_max_frame_num"] = br.ue() + 4
    poc_type = br.ue()
    sps["poc_type"] = poc_type
    if poc_type == 0:
        sps["log2_max_poc_lsb"] = br.ue() + 4
    elif poc_type == 1:
        raise NotImplementedError("AVC: pic_order_cnt_type 1")
    sps["max_ref"] = br.ue()
    br.u(1)
    w_mbs = br.ue() + 1
    h_mbs = br.ue() + 1
    if not br.u(1):
        raise NotImplementedError("AVC: interlaced (frame_mbs_only=0)")
    br.u(1)  # direct_8x8
    crop = [0, 0, 0, 0]
    if br.u(1):
        crop = [br.ue(), br.ue(), br.ue(), br.ue()]
    sps["width"] = w_mbs * 16 - 2 * (crop[0] + crop[1])
    sps["height"] = h_mbs * 16 - 2 * (crop[2] + crop[3])
    sps["w_mbs"], sps["h_mbs"] = w_mbs, h_mbs
    sps["crop"] = crop
    return sps


def parse_pps(rbsp: bytes) -> dict:
    br = BitReader(rbsp)
    pps = {"id": br.ue(), "sps_id": br.ue()}
    if br.u(1):
        raise NotImplementedError("AVC: CABAC entropy coding")
    pps["bottom_field_poc"] = br.u(1)
    if br.ue() != 0:
        raise NotImplementedError("AVC: slice groups (FMO)")
    br.ue()
    br.ue()
    br.u(1)
    br.u(2)
    pps["init_qp"] = br.se() + 26
    br.se()
    pps["chroma_qp_offset"] = br.se()
    pps["deblock_control"] = br.u(1)
    pps["constrained_intra"] = br.u(1)
    pps["redundant_pic"] = br.u(1)
    return pps


# ------------------------------------------------------- slice + MB layer


def _zz_scan(m: np.ndarray) -> list[int]:
    flat = m.reshape(-1)
    return [int(flat[p]) for p in _ZIGZAG4]


def _zz_unscan(vals: list[int]) -> np.ndarray:
    m = np.zeros(16, dtype=np.int64)
    for k, p in enumerate(_ZIGZAG4):
        m[p] = vals[k]
    return m.reshape(4, 4)


class _NcGrids:
    """TotalCoeff bookkeeping for nC derivation (spec 9.2.1)."""

    def __init__(self, w_mbs: int, h_mbs: int) -> None:
        self.luma = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int64)
        self.chroma = [
            np.full((h_mbs * 2, w_mbs * 2), -1, dtype=np.int64) for _ in range(2)
        ]

    @staticmethod
    def _nc(grid: np.ndarray, bx: int, by: int) -> int:
        na = int(grid[by, bx - 1]) if bx > 0 else -1
        nb = int(grid[by - 1, bx]) if by > 0 else -1
        na = None if na < 0 else na
        nb = None if nb < 0 else nb
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    def luma_nc(self, bx: int, by: int) -> int:
        return self._nc(self.luma, bx, by)

    def chroma_nc(self, comp: int, cx: int, cy: int) -> int:
        return self._nc(self.chroma[comp], cx, cy)


def _mb_pred_luma(recon, mbx, mby, mode):
    x0, y0 = mbx * 16, mby * 16
    top = recon[y0 - 1, x0 : x0 + 16].astype(np.int64) if mby > 0 else None
    left = recon[y0 : y0 + 16, x0 - 1].astype(np.int64) if mbx > 0 else None
    tl = int(recon[y0 - 1, x0 - 1]) if (mbx > 0 and mby > 0) else None
    if mode == 3:
        return _pred16_plane(top, left, tl)
    return _pred16(mode, top, left)


def _mb_pred_chroma(recon_c, mbx, mby, mode):
    x0, y0 = mbx * 8, mby * 8
    top = recon_c[y0 - 1, x0 : x0 + 8].astype(np.int64) if mby > 0 else None
    left = recon_c[y0 : y0 + 8, x0 - 1].astype(np.int64) if mbx > 0 else None
    tl = int(recon_c[y0 - 1, x0 - 1]) if (mbx > 0 and mby > 0) else None
    return _pred_chroma(mode, top, left, tl)


def _luma_modes_available(mbx, mby):
    modes = [2]
    if mby > 0:
        modes.append(0)
    if mbx > 0:
        modes.append(1)
    if mbx > 0 and mby > 0:
        modes.append(3)
    return modes


def _chroma_modes_available(mbx, mby):
    modes = [0]
    if mbx > 0:
        modes.append(1)
    if mby > 0:
        modes.append(2)
    if mbx > 0 and mby > 0:
        modes.append(3)
    return modes


def _quant_mb_chroma(src_cb, src_cr, pred_cb, pred_cr, qpc):
    """Forward chroma transform/quant for one MB -> (zc_dc, zc_ac,
    cbp_chroma). Shared by the I_16x16 and I_4x4 encoder branches."""
    zc_dc, zc_ac, any_dc, any_ac = [], [], False, False
    for src_c, pred_c in ((src_cb, pred_cb), (src_cr, pred_cr)):
        res_c = src_c - pred_c
        wbs = [fwd4x4(res_c[by_ : by_ + 4, bx : bx + 4])
               for by_ in (0, 4) for bx in (0, 4)]
        dc2 = np.array(
            [[wbs[0][0, 0], wbs[1][0, 0]], [wbs[2][0, 0], wbs[3][0, 0]]],
            dtype=np.int64,
        )
        zdc = quant_chroma_dc(fwd_chroma_dc(dc2), qpc)
        zacs = [quant4x4(wb, qpc) for wb in wbs]
        for z in zacs:
            z[0, 0] = 0
        zc_dc.append(zdc)
        zc_ac.append(zacs)
        any_dc = any_dc or bool(np.any(zdc))
        any_ac = any_ac or any(np.any(z) for z in zacs)
    return zc_dc, zc_ac, (2 if any_ac else (1 if any_dc else 0))


def _emit_and_recon_mb_chroma(
    bw, nc, rcb, rcr, mbx, mby, pred_cb, pred_cr, zc_dc, zc_ac, cbp_chroma, qpc
):
    """CAVLC-emit chroma residuals + in-loop reconstruct (shared by
    both encoder branches; mirrors _decode_mb_chroma exactly)."""
    if cbp_chroma:
        for comp in range(2):
            vals = [int(v) for v in zc_dc[comp].reshape(-1)]
            encode_residual_block(bw, vals, -1, 4)
    for comp in range(2):
        for k, (by_, bx) in enumerate(((0, 0), (0, 4), (4, 0), (4, 4))):
            cx = mbx * 2 + bx // 4
            cy = mby * 2 + by_ // 4
            if cbp_chroma == 2:
                coeffs = _zz_scan(zc_ac[comp][k])[1:]
                total = encode_residual_block(
                    bw, coeffs, nc.chroma_nc(comp, cx, cy), 15
                )
                nc.chroma[comp][cy, cx] = total
            else:
                nc.chroma[comp][cy, cx] = 0
    for comp, (rc, pred_c) in enumerate(((rcb, pred_cb), (rcr, pred_cr))):
        dcc = (
            dequant_chroma_dc(zc_dc[comp], qpc)
            if cbp_chroma
            else np.zeros((2, 2), dtype=np.int64)
        )
        for k, (by_, bx) in enumerate(((0, 0), (0, 4), (4, 0), (4, 4))):
            coefs = (
                dequant4x4_ac(zc_ac[comp][k], qpc)
                if cbp_chroma == 2
                else np.zeros((4, 4), dtype=np.int64)
            )
            coefs[0, 0] = dcc[by_ // 4, bx // 4]
            rc[
                mby * 8 + by_ : mby * 8 + by_ + 4,
                mbx * 8 + bx : mbx * 8 + bx + 4,
            ] = _recon_block(pred_c[by_ : by_ + 4, bx : bx + 4], coefs)


def encode_iframe(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    qp: int = 26,
    mode: str = "auto",
) -> list[bytes]:
    """Encode one 4:2:0 frame as [SPS, PPS, IDR-slice] NAL units.

    ``mode='auto'`` emits I_16x16 macroblocks (SAD-best available
    prediction per MB, exercising V/H/DC/Plane paths); ``mode='i4x4'``
    emits I_4x4 macroblocks (per-4x4-block SAD-best of the nine modes,
    predicted-mode signaling, Table 9-4 CBP); ``mode='pcm'`` emits
    I_PCM for a lossless fixture. The encoder
    runs the decoder's reconstruction in-loop, so its returned recon
    (``encode_iframe.last_recon``) is bit-exact what decode returns."""
    h, w = y.shape
    if w % 16 or h % 16 or cb.shape != (h // 2, w // 2) or cr.shape != cb.shape:
        raise ValueError("AVC encode: need MB-aligned 4:2:0 planes")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")
    w_mbs, h_mbs = w // 16, h // 16
    qpc = chroma_qp(qp)
    ry = np.zeros((h, w), dtype=np.int64)
    rcb = np.zeros((h // 2, w // 2), dtype=np.int64)
    rcr = np.zeros((h // 2, w // 2), dtype=np.int64)
    nc = _NcGrids(w_mbs, h_mbs)
    i4modes = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int64)

    bw = BitWriter()
    # slice header (IDR, I slice)
    bw.ue(0)      # first_mb_in_slice
    bw.ue(7)      # slice_type: I (all slices in pic)
    bw.ue(0)      # pps_id
    bw.u(0, 4)    # frame_num (log2_max_frame_num = 4)
    bw.ue(0)      # idr_pic_id
    bw.u(0, 1)    # no_output_of_prior_pics
    bw.u(0, 1)    # long_term_reference
    bw.se(0)      # slice_qp_delta (qp comes from PPS)
    bw.ue(1)      # disable_deblocking_filter_idc = 1 (off)

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            x0, y0 = mbx * 16, mby * 16
            src_y = y[y0 : y0 + 16, x0 : x0 + 16].astype(np.int64)
            src_cb = cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8].astype(np.int64)
            src_cr = cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8].astype(np.int64)
            if mode == "pcm":
                bw.ue(25)  # I_PCM
                bw.align_zero()
                for v in src_y.reshape(-1).tolist():
                    bw.u(int(v), 8)
                for v in src_cb.reshape(-1).tolist():
                    bw.u(int(v), 8)
                for v in src_cr.reshape(-1).tolist():
                    bw.u(int(v), 8)
                ry[y0 : y0 + 16, x0 : x0 + 16] = src_y
                rcb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = src_cb
                rcr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = src_cr
                nc.luma[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
                for comp in range(2):
                    nc.chroma[comp][mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
                continue

            if mode == "i4x4":
                # I_4x4: per-block SAD-best legal mode, reconstructing
                # as we go (later blocks predict from earlier recon)
                best = None
                for m in _chroma_modes_available(mbx, mby):
                    pb = _mb_pred_chroma(rcb, mbx, mby, m)
                    pr_ = _mb_pred_chroma(rcr, mbx, mby, m)
                    sad = int(np.abs(src_cb - pb).sum() + np.abs(src_cr - pr_).sum())
                    if best is None or sad < best[0]:
                        best = (sad, m, pb, pr_)
                _, cmode, pred_cb, pred_cr = best
                zc_dc, zc_ac, cbp_chroma = _quant_mb_chroma(
                    src_cb, src_cr, pred_cb, pred_cr, qpc
                )
                blk_modes, blk_z, sig_bits = [], [], []
                for bi in range(16):
                    bx, by_ = _BLK_XY[bi]
                    x4 = mbx * 4 + bx // 4
                    y4 = mby * 4 + by_ // 4
                    top, left, corner = _i4_refs(ry, x4, y4, w_mbs * 4, w_mbs)
                    src_b = src_y[by_ : by_ + 4, bx : bx + 4]
                    best = None
                    for m in _i4_legal_modes(top, left):
                        prb = _pred4(m, top, left, corner)
                        sad = int(np.abs(src_b - prb).sum())
                        if best is None or sad < best[0]:
                            best = (sad, m, prb)
                    _, m, prb = best
                    ma = int(i4modes[y4, x4 - 1]) if x4 > 0 else -1
                    mb_ = int(i4modes[y4 - 1, x4]) if y4 > 0 else -1
                    predicted = min(2 if ma < 0 else ma, 2 if mb_ < 0 else mb_)
                    if m == predicted:
                        sig_bits.append((1, 0))
                    else:
                        sig_bits.append((0, m if m < predicted else m - 1))
                    i4modes[y4, x4] = m
                    z = quant4x4(fwd4x4(src_b - prb), qp)
                    blk_modes.append(m)
                    blk_z.append(z)
                    # in-loop recon; an all-zero 8x8 later gets its
                    # residual skipped, but zero coeffs recon the same
                    ry[
                        y0 + by_ : y0 + by_ + 4, x0 + bx : x0 + bx + 4
                    ] = _recon_block(prb, dequant4x4_ac(z, qp))
                cbp_luma_bits = 0
                for b8 in range(4):
                    if any(np.any(blk_z[b8 * 4 + k]) for k in range(4)):
                        cbp_luma_bits |= 1 << b8
                cbp = cbp_luma_bits | (cbp_chroma << 4)
                bw.ue(0)  # mb_type I_4x4
                for flag, rem in sig_bits:
                    bw.u(flag, 1)
                    if not flag:
                        bw.u(rem, 3)
                bw.ue(cmode)
                bw.ue(_CBP_INTRA_INV[cbp])
                if cbp:
                    bw.se(0)  # mb_qp_delta
                for bi in range(16):
                    bx4 = mbx * 4 + _BLK_XY[bi][0] // 4
                    by4 = mby * 4 + _BLK_XY[bi][1] // 4
                    if cbp_luma_bits & (1 << (bi >> 2)):
                        total = encode_residual_block(
                            bw, _zz_scan(blk_z[bi]), nc.luma_nc(bx4, by4), 16
                        )
                        nc.luma[by4, bx4] = total
                    else:
                        nc.luma[by4, bx4] = 0
                _emit_and_recon_mb_chroma(
                    bw, nc, rcb, rcr, mbx, mby, pred_cb, pred_cr,
                    zc_dc, zc_ac, cbp_chroma, qpc,
                )
                continue

            # --- choose luma pred mode
            best = None
            for m in _luma_modes_available(mbx, mby):
                p = _mb_pred_luma(ry, mbx, mby, m)
                sad = int(np.abs(src_y - p).sum())
                if best is None or sad < best[0]:
                    best = (sad, m, p)
            _, lmode, pred_y = best
            best = None
            for m in _chroma_modes_available(mbx, mby):
                pb = _mb_pred_chroma(rcb, mbx, mby, m)
                pr = _mb_pred_chroma(rcr, mbx, mby, m)
                sad = int(np.abs(src_cb - pb).sum() + np.abs(src_cr - pr).sum())
                if best is None or sad < best[0]:
                    best = (sad, m, pb, pr)
            _, cmode, pred_cb, pred_cr = best

            res = src_y - pred_y
            # forward transform all 16 blocks
            wblocks = []
            for bi in range(16):
                bx, by = _BLK_XY[bi]
                wblocks.append(fwd4x4(res[by : by + 4, bx : bx + 4]))
            dc_mat = np.array(
                [[wblocks[_blk_at(bx, by_)][0, 0] for bx in range(4)]
                 for by_ in range(4)], dtype=np.int64,
            )
            z_dc = quant_luma_dc(fwd_hadamard4(dc_mat), qp)
            z_ac = [quant4x4(wb, qp) for wb in wblocks]
            for z in z_ac:
                z[0, 0] = 0
            cbp_luma = 15 if any(np.any(z) for z in z_ac) else 0

            zc_dc, zc_ac, cbp_chroma = _quant_mb_chroma(
                src_cb, src_cr, pred_cb, pred_cr, qpc
            )

            mb_type = 1 + lmode + 4 * cbp_chroma + 12 * (1 if cbp_luma else 0)
            bw.ue(mb_type)
            bw.ue(cmode)
            bw.se(0)  # mb_qp_delta

            # luma DC residual
            dc_nc = nc.luma_nc(mbx * 4, mby * 4)
            encode_residual_block(bw, _zz_scan(z_dc), dc_nc, 16)
            # luma AC residuals
            for bi in range(16):
                bx4 = mbx * 4 + _BLK_XY[bi][0] // 4
                by4 = mby * 4 + _BLK_XY[bi][1] // 4
                if cbp_luma:
                    coeffs = _zz_scan(z_ac[bi])[1:]
                    total = encode_residual_block(
                        bw, coeffs, nc.luma_nc(bx4, by4), 15
                    )
                    nc.luma[by4, bx4] = total
                else:
                    nc.luma[by4, bx4] = 0
            # --- in-loop luma reconstruction (must equal the decoder's)
            dcp = dequant_luma_dc(z_dc, qp)
            for bi in range(16):
                bx, by_ = _BLK_XY[bi]
                coefs = dequant4x4_ac(z_ac[bi], qp) if cbp_luma else np.zeros(
                    (4, 4), dtype=np.int64
                )
                coefs[0, 0] = dcp[by_ // 4, bx // 4]
                ry[y0 + by_ : y0 + by_ + 4, x0 + bx : x0 + bx + 4] = _recon_block(
                    pred_y[by_ : by_ + 4, bx : bx + 4], coefs
                )
            _emit_and_recon_mb_chroma(
                bw, nc, rcb, rcr, mbx, mby, pred_cb, pred_cr,
                zc_dc, zc_ac, cbp_chroma, qpc,
            )

    bw.rbsp_trailing()
    encode_iframe.last_recon = (
        ry.astype(np.uint8), rcb.astype(np.uint8), rcr.astype(np.uint8)
    )
    return [write_sps(w, h), write_pps(qp), _nal(5, bw.getvalue())]


def _blk_at(bx: int, by: int) -> int:
    """Inverse of _BLK_XY on 4x4-block coordinates (0..3, 0..3)."""
    for i, (x, y_) in enumerate(_BLK_XY):
        if x == bx * 4 and y_ == by * 4:
            return i
    raise AssertionError


def decode_iframe(nals: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode [.., SPS, PPS, IDR slice ..] NAL units → (Y, Cb, Cr)
    uint8 planes (4:2:0). Honest gates raise on every tool outside the
    implemented baseline-I subset."""
    sps = pps = None
    slice_rbsp = None
    for nal in nals:
        ntype = nal[0] & 0x1F
        rbsp = rbsp_unescape(nal[1:])
        if ntype == 7:
            sps = parse_sps(rbsp)
        elif ntype == 8:
            pps = parse_pps(rbsp)
        elif ntype in (5, 1):
            if ntype == 1:
                raise NotImplementedError("AVC: non-IDR slice (P/B)")
            slice_rbsp = rbsp
    if sps is None or pps is None or slice_rbsp is None:
        raise ValueError("AVC: need SPS, PPS and an IDR slice")

    br = BitReader(slice_rbsp)
    if br.ue() != 0:
        raise NotImplementedError("AVC: multi-slice pictures")
    slice_type = br.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError(f"AVC: slice_type {slice_type} (only I)")
    if br.ue() != pps["id"]:
        raise ValueError("AVC: slice references unknown PPS")
    br.u(sps["log2_max_frame_num"])  # frame_num
    br.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        br.u(sps.get("log2_max_poc_lsb", 4))
    br.u(1)  # no_output_of_prior_pics
    br.u(1)  # long_term_reference
    qp = pps["init_qp"] + br.se()
    if pps["deblock_control"]:
        if br.ue() != 1:
            raise NotImplementedError("AVC: in-loop deblocking not implemented")
    else:
        raise NotImplementedError("AVC: in-loop deblocking not implemented")

    w_mbs, h_mbs = sps["w_mbs"], sps["h_mbs"]
    w, h = w_mbs * 16, h_mbs * 16
    ry = np.zeros((h, w), dtype=np.int64)
    rcb = np.zeros((h // 2, w // 2), dtype=np.int64)
    rcr = np.zeros((h // 2, w // 2), dtype=np.int64)
    nc = _NcGrids(w_mbs, h_mbs)
    i4modes = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int64)

    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            x0, y0 = mbx * 16, mby * 16
            mb_type = br.ue()
            if mb_type > 25:
                raise ValueError(f"AVC: invalid I mb_type {mb_type}")
            if mb_type == 25:  # I_PCM
                br.byte_align()
                blk = np.array([br.u(8) for _ in range(256)], dtype=np.int64)
                ry[y0 : y0 + 16, x0 : x0 + 16] = blk.reshape(16, 16)
                for rc in (rcb, rcr):
                    blk = np.array([br.u(8) for _ in range(64)], dtype=np.int64)
                    rc[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = blk.reshape(8, 8)
                nc.luma[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
                for comp in range(2):
                    nc.chroma[comp][mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
                continue
            if mb_type == 0:  # I_4x4 (I_NxN with CAVLC => no 8x8 flag)
                # mb_pred(): 16 x (prev_flag [+ rem_mode])
                sig: list[tuple[int, int]] = []
                for _ in range(16):
                    if br.u(1):
                        sig.append((1, 0))
                    else:
                        sig.append((0, br.u(3)))
                cmode = br.ue()
                cbp = _CBP_INTRA[br.ue()]
                cbp_luma_bits, cbp_chroma = cbp & 15, cbp >> 4
                if cbp:
                    qp = (qp + br.se() + 52) % 52
                qpc = chroma_qp(qp, pps["chroma_qp_offset"])
                for bi in range(16):
                    bx, by_ = _BLK_XY[bi]
                    x4 = mbx * 4 + bx // 4
                    y4 = mby * 4 + by_ // 4
                    ma = int(i4modes[y4, x4 - 1]) if x4 > 0 else -1
                    mb_ = int(i4modes[y4 - 1, x4]) if y4 > 0 else -1
                    predicted = min(2 if ma < 0 else ma, 2 if mb_ < 0 else mb_)
                    flag, rem = sig[bi]
                    if flag:
                        m = predicted
                    else:
                        m = rem if rem < predicted else rem + 1
                    i4modes[y4, x4] = m
                    top, left, corner = _i4_refs(ry, x4, y4, w_mbs * 4, w_mbs)
                    pr = _pred4(m, top, left, corner)
                    if cbp_luma_bits & (1 << (bi >> 2)):
                        vals = decode_residual_block(br, nc.luma_nc(x4, y4), 16)
                        nc.luma[y4, x4] = sum(1 for v in vals if v)
                        coefs = dequant4x4_ac(_zz_unscan(vals), qp)
                    else:
                        nc.luma[y4, x4] = 0
                        coefs = np.zeros((4, 4), dtype=np.int64)
                    ry[
                        y0 + by_ : y0 + by_ + 4, x0 + bx : x0 + bx + 4
                    ] = _recon_block(pr, coefs)
                _decode_mb_chroma(
                    br, nc, rcb, rcr, mbx, mby, cmode, cbp_chroma, qpc
                )
                continue
            lmode = (mb_type - 1) % 4
            cbp_chroma = ((mb_type - 1) // 4) % 3
            cbp_luma = 15 if mb_type - 1 >= 12 else 0
            cmode = br.ue()
            qp = (qp + br.se() + 52) % 52
            qpc = chroma_qp(qp, pps["chroma_qp_offset"])

            pred_y = _mb_pred_luma(ry, mbx, mby, lmode)
            # luma DC
            dc_vals = decode_residual_block(br, nc.luma_nc(mbx * 4, mby * 4), 16)
            z_dc = _zz_unscan(dc_vals)
            dcp = dequant_luma_dc(z_dc, qp)
            # luma AC
            z_ac = []
            for bi in range(16):
                bx4 = mbx * 4 + _BLK_XY[bi][0] // 4
                by4 = mby * 4 + _BLK_XY[bi][1] // 4
                if cbp_luma:
                    vals = decode_residual_block(br, nc.luma_nc(bx4, by4), 15)
                    nz = sum(1 for v in vals if v)
                    nc.luma[by4, bx4] = nz
                    z_ac.append(_zz_unscan([0] + vals))
                else:
                    nc.luma[by4, bx4] = 0
                    z_ac.append(np.zeros((4, 4), dtype=np.int64))
            for bi in range(16):
                bx, by_ = _BLK_XY[bi]
                coefs = dequant4x4_ac(z_ac[bi], qp) if cbp_luma else np.zeros(
                    (4, 4), dtype=np.int64
                )
                coefs[0, 0] = dcp[by_ // 4, bx // 4]
                ry[y0 + by_ : y0 + by_ + 4, x0 + bx : x0 + bx + 4] = _recon_block(
                    pred_y[by_ : by_ + 4, bx : bx + 4], coefs
                )
            _decode_mb_chroma(br, nc, rcb, rcr, mbx, mby, cmode, cbp_chroma, qpc)

    return ry.astype(np.uint8), rcb.astype(np.uint8), rcr.astype(np.uint8)


def _decode_mb_chroma(br, nc, rcb, rcr, mbx, mby, cmode, cbp_chroma, qpc):
    """Shared chroma residual decode + reconstruction for one MB
    (identical for I_4x4 and I_16x16 macroblocks)."""
    zc_dc = []
    if cbp_chroma:
        for comp in range(2):
            vals = decode_residual_block(br, -1, 4)
            zc_dc.append(np.array(vals, dtype=np.int64).reshape(2, 2))
    else:
        zc_dc = [np.zeros((2, 2), dtype=np.int64)] * 2
    preds = [
        _mb_pred_chroma(rcb, mbx, mby, cmode),
        _mb_pred_chroma(rcr, mbx, mby, cmode),
    ]
    zc_ac = [[], []]
    for comp in range(2):
        for k, (by_, bx) in enumerate(((0, 0), (0, 4), (4, 0), (4, 4))):
            cx = mbx * 2 + bx // 4
            cy = mby * 2 + by_ // 4
            if cbp_chroma == 2:
                vals = decode_residual_block(br, nc.chroma_nc(comp, cx, cy), 15)
                nc.chroma[comp][cy, cx] = sum(1 for v in vals if v)
                zc_ac[comp].append(_zz_unscan([0] + vals))
            else:
                nc.chroma[comp][cy, cx] = 0
                zc_ac[comp].append(np.zeros((4, 4), dtype=np.int64))
    for comp, rc in enumerate((rcb, rcr)):
        dcc = (
            dequant_chroma_dc(zc_dc[comp], qpc)
            if cbp_chroma
            else np.zeros((2, 2), dtype=np.int64)
        )
        for k, (by_, bx) in enumerate(((0, 0), (0, 4), (4, 0), (4, 4))):
            coefs = (
                dequant4x4_ac(zc_ac[comp][k], qpc)
                if cbp_chroma == 2
                else np.zeros((4, 4), dtype=np.int64)
            )
            coefs[0, 0] = dcc[by_ // 4, bx // 4]
            rc[
                mby * 8 + by_ : mby * 8 + by_ + 4,
                mbx * 8 + bx : mbx * 8 + bx + 4,
            ] = _recon_block(preds[comp][by_ : by_ + 4, bx : bx + 4], coefs)


# ------------------------------------------------- stream-level helpers


def to_annexb(nals: list[bytes]) -> bytes:
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def from_annexb(data: bytes) -> list[bytes]:
    nals = []
    i = 0
    n = len(data)
    while i < n:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        j += 3
        k = data.find(b"\x00\x00\x01", j)
        end = k if k >= 0 else n
        while end > j and data[end - 1] == 0:
            end -= 1
        nals.append(data[j:end])
        i = end if k >= 0 else n
    return nals


def to_avcc_sample(nals: list[bytes]) -> bytes:
    """Length-prefixed NAL units — the MP4 (avcC) sample payload form."""
    return b"".join(struct.pack(">I", len(n)) + n for n in nals)


def from_avcc_sample(data: bytes, length_size: int = 4) -> list[bytes]:
    nals = []
    i = 0
    while i + length_size <= len(data):
        ln = int.from_bytes(data[i : i + length_size], "big")
        i += length_size
        nals.append(data[i : i + ln])
        i += ln
    return nals


def build_avcc(sps_nal: bytes, pps_nal: bytes) -> bytes:
    """The avcC (AVCDecoderConfigurationRecord) box payload for stsd."""
    return (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps_nal))
        + sps_nal
        + bytes([1])
        + struct.pack(">H", len(pps_nal))
        + pps_nal
    )


def parse_avcc(avcc: bytes) -> tuple[list[bytes], list[bytes], int]:
    """avcC payload → (sps_nals, pps_nals, nal_length_size)."""
    if not avcc or avcc[0] != 1:
        raise ValueError("not an avcC record")
    length_size = (avcc[4] & 3) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps_list, pps_list = [], []
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", avcc, pos)[0]
        sps_list.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = avcc[pos]
    pos += 1
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", avcc, pos)[0]
        pps_list.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    return sps_list, pps_list, length_size


# ---------------------------------------------------------- I_4x4 layer

# Table 9-4: exp-golomb codeNum -> coded_block_pattern for Intra_4x4
_CBP_INTRA = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}

# Intra_4x4 prediction modes (spec 8.3.1.2.x)
I4_V, I4_H, I4_DC, I4_DDL, I4_DDR, I4_VR, I4_HD, I4_VL, I4_HU = range(9)


def _blk_order(x4: int, y4: int, w_mbs: int) -> int:
    """Decode-order index of the 4x4 luma block at absolute block
    coordinates — MB raster order x the in-MB Z order."""
    mb = (y4 // 4) * w_mbs + (x4 // 4)
    bx, by = (x4 % 4) * 4, (y4 % 4) * 4
    for i, (x, y_) in enumerate(_BLK_XY):
        if x == bx and y_ == by:
            return mb * 16 + i
    raise AssertionError


def _i4_refs(recon, x4, y4, w4, w_mbs):
    """Reference samples for one 4x4 block: (top[8] | None, left[4] |
    None, corner | None) with the spec's top-right substitution."""
    px, py = x4 * 4, y4 * 4
    top = left = corner = None
    if y4 > 0:
        t = recon[py - 1, px : px + 4].astype(np.int64)
        tr_ok = (
            x4 + 1 < w4
            and _blk_order(x4 + 1, y4 - 1, w_mbs) < _blk_order(x4, y4, w_mbs)
        )
        if tr_ok:
            tr = recon[py - 1, px + 4 : px + 8].astype(np.int64)
        else:
            tr = np.full(4, t[3], dtype=np.int64)
        top = np.concatenate([t, tr])
    if x4 > 0:
        left = recon[py : py + 4, px - 1].astype(np.int64)
    if x4 > 0 and y4 > 0:
        corner = int(recon[py - 1, px - 1])
    return top, left, corner


def _i4_legal_modes(top, left) -> list[int]:
    modes = [I4_DC]
    if top is not None:
        modes += [I4_V, I4_DDL, I4_VL]
    if left is not None:
        modes += [I4_H, I4_HU]
    if top is not None and left is not None:
        modes += [I4_DDR, I4_VR, I4_HD]
    return modes


def _pred4(mode: int, top, left, corner) -> np.ndarray:
    p = np.empty((4, 4), dtype=np.int64)
    if mode == I4_V:
        return np.tile(top[:4], (4, 1))
    if mode == I4_H:
        return np.tile(left[:, None], (1, 4))
    if mode == I4_DC:
        if top is not None and left is not None:
            dc = (int(top[:4].sum()) + int(left.sum()) + 4) >> 3
        elif top is not None:
            dc = (int(top[:4].sum()) + 2) >> 2
        elif left is not None:
            dc = (int(left.sum()) + 2) >> 2
        else:
            dc = 128
        return np.full((4, 4), dc, dtype=np.int64)
    t, l_, c = top, left, corner
    if mode == I4_DDL:
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    p[y, x] = (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2
        return p
    if mode == I4_DDR:
        for y in range(4):
            for x in range(4):
                if x > y:
                    a = c if x - y - 2 < 0 else t[x - y - 2]
                    b = c if x - y - 1 < 0 else t[x - y - 1]
                    p[y, x] = (a + 2 * b + t[x - y] + 2) >> 2
                elif x < y:
                    a = c if y - x - 2 < 0 else l_[y - x - 2]
                    b = c if y - x - 1 < 0 else l_[y - x - 1]
                    p[y, x] = (a + 2 * b + l_[y - x] + 2) >> 2
                else:
                    p[y, x] = (t[0] + 2 * c + l_[0] + 2) >> 2
        return p
    if mode == I4_VR:
        def ref_t(i):  # p[i, -1] with i == -1 -> corner
            return c if i < 0 else t[i]
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (ref_t(x - (y >> 1) - 1) + ref_t(x - (y >> 1)) + 1) >> 1
                elif z >= 0:
                    p[y, x] = (
                        ref_t(x - (y >> 1) - 2)
                        + 2 * ref_t(x - (y >> 1) - 1)
                        + ref_t(x - (y >> 1))
                        + 2
                    ) >> 2
                elif z == -1:
                    p[y, x] = (l_[0] + 2 * c + t[0] + 2) >> 2
                else:
                    p[y, x] = (
                        l_[y - 2 * x - 1] + 2 * l_[y - 2 * x - 2]
                        + (c if y - 2 * x - 3 < 0 else l_[y - 2 * x - 3]) + 2
                    ) >> 2
        return p
    if mode == I4_HD:
        def ref_l(i):
            return c if i < 0 else l_[i]
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (ref_l(y - (x >> 1) - 1) + ref_l(y - (x >> 1)) + 1) >> 1
                elif z >= 0:
                    p[y, x] = (
                        ref_l(y - (x >> 1) - 2)
                        + 2 * ref_l(y - (x >> 1) - 1)
                        + ref_l(y - (x >> 1))
                        + 2
                    ) >> 2
                elif z == -1:
                    p[y, x] = (l_[0] + 2 * c + t[0] + 2) >> 2
                else:
                    p[y, x] = (
                        t[x - 2 * y - 1] + 2 * t[x - 2 * y - 2]
                        + (c if x - 2 * y - 3 < 0 else t[x - 2 * y - 3]) + 2
                    ) >> 2
        return p
    if mode == I4_VL:
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    p[y, x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
        return p
    if mode == I4_HU:
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z == 5:
                    p[y, x] = (l_[2] + 3 * l_[3] + 2) >> 2
                elif z > 5:
                    p[y, x] = l_[3]
                elif z % 2 == 0:
                    p[y, x] = (l_[y + (x >> 1)] + l_[y + (x >> 1) + 1] + 1) >> 1
                else:
                    p[y, x] = (
                        l_[y + (x >> 1)] + 2 * l_[y + (x >> 1) + 1]
                        + l_[y + (x >> 1) + 2] + 2
                    ) >> 2
        return p
    raise ValueError(f"AVC: invalid Intra_4x4 pred mode {mode}")
