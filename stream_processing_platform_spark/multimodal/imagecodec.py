"""Dependency-free media codecs for the multimodal pipeline.

Real decoders for the formats that need no external libraries: binary
PPM/PGM (netpbm P6/P5), uncompressed 24/32-bit BMP, and PCM WAV. These
make ``decoder="image"`` / ``decoder="audio"`` in ``codecs.py`` operate
on ACTUAL pixels/samples; JPEG/PNG/MP4 still require codec libraries
absent from this container and raise a clear error at sniff time.

Everything is numpy-vectorized per payload: decode → H×W×3 uint8 (or
1-D float32 samples), nearest-neighbor resize by index sampling, and
feature extraction as a normalized grayscale grid / RMS energy
envelope. Per-payload cost is linear in pixels/samples; the Spark side
(Arrow batches via mapInPandas) is unchanged from the fake decoder.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- images


def encode_ppm(arr: np.ndarray) -> bytes:
    """H×W×3 uint8 → binary PPM (P6, maxval 255)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected H*W*3 array, got shape {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _ppm_header(b: bytes) -> tuple[list[int], int]:
    """Parse the 3 netpbm header ints (w, h, maxval) after the magic,
    skipping whitespace and ``#`` comments; returns (ints, data_offset)."""
    vals: list[int] = []
    i = 2  # past magic
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        vals.append(int(b[i:j]))
        i = j
    return vals, i + 1  # single whitespace byte separates header from raster


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval ≤ 255 → H×W×3 uint8
    (grayscale is replicated across channels)."""
    magic = b[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    (w, h, maxval), off = _ppm_header(b)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=off)
    img = raster.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24/32-bit BMP → H×W×3 uint8 (RGB order,
    rows flipped from BMP's bottom-up storage)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    header_size = struct.unpack_from("<I", b, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        img = img[::-1]
    return img[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped


def encode_bmp(arr: np.ndarray) -> bytes:
    """H×W×3 uint8 → uncompressed 24-bit bottom-up BMP (test fixture
    generator — the inverse path of :func:`decode_bmp`)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    raster = padded.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster


def decode_image(b: bytes) -> np.ndarray:
    """Sniff the payload magic and decode: netpbm (P5/P6) and
    uncompressed BMP are decoded here; JPEG/PNG need codec libraries
    not present in this container."""
    if b[:2] in (b"P6", b"P5"):
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:3] == b"\xff\xd8\xff" or b[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("JPEG/PNG decode requires PIL/opencv (not in container)")
    raise ValueError(f"unrecognized image payload (magic {b[:4]!r})")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index sampling (pure numpy,
    no interpolation kernels — adequate for thumbnailing/feature grids)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real pixel features: grayscale the image (Rec. 601 luma), resize
    to a ~square grid of ``dim`` cells, normalize to [0, 1)."""
    gray = (
        img[:, :, 0].astype(np.float32) * 0.299
        + img[:, :, 1].astype(np.float32) * 0.587
        + img[:, :, 2].astype(np.float32) * 0.114
    )
    gw = max(1, int(np.sqrt(dim)))
    gh = max(1, (dim + gw - 1) // gw)
    grid = resize_nearest(gray[:, :, None], gw, gh)[:, :, 0]
    return (grid.reshape(-1)[:dim] / 256.0).astype(np.float32)


# ----------------------------------------------------------------- audio


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D float32 samples in [-1, 1] → 16-bit PCM mono WAV."""
    pcm = (np.clip(np.asarray(samples, dtype=np.float32), -1, 1) * 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV (8/16-bit, any channel count) → (sample_rate, float32
    mono samples in [-1, 1]). Walks RIFF chunks, so extra chunks
    (LIST/fact) between fmt and data are fine."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM WAV supported (format={audio_format}, bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return rate, samples


def audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Real sample features: RMS energy envelope over ``dim`` equal
    frames (values in [0, 1] for samples in [-1, 1])."""
    n = len(samples)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.arange(dim + 1) * n // dim
    sq = np.concatenate([[0.0], np.cumsum(samples.astype(np.float64) ** 2)])
    counts = np.maximum(edges[1:] - edges[:-1], 1)
    return np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / counts).astype(np.float32)
