"""Dependency-free media codecs for the multimodal pipeline.

Real decoders for the formats that need no external libraries: binary
PPM/PGM (netpbm P6/P5), uncompressed 24/32-bit BMP, PNG (stdlib-zlib
inflate + spec filters, 8-bit gray/RGB/palette/alpha), and PCM WAV.
These make ``decoder="image"`` / ``decoder="audio"`` in ``codecs.py``
operate on ACTUAL pixels/samples; JPEG/MP4 still require codec
libraries absent from this container and raise a clear error at sniff
time.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(b: bytes):
    pos = 8
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _png_unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (spec §9: None/Sub/Up/
    Average/Paeth). Left-referencing filters are an inherently
    sequential per-byte recurrence, so those rows run as Python loops —
    fine for the thumbnail/feature sizes this pipeline decodes; filter-0
    and Up rows (what most encoders emit for flat images, and all this
    module's encoder emits) stay vectorized."""
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).copy()
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (int(row[i]) + int(row[i - channels])) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(row[i - channels]) if i >= channels else 0
                row[i] = (int(row[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - channels]) if i >= channels else 0
                bb = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = row
    return out


def decode_png(b: bytes) -> np.ndarray:
    """Real PNG decode with only stdlib zlib: critical chunks
    (IHDR/PLTE/IDAT/IEND), 8-bit depth, color types gray(0)/RGB(2)/
    palette(3)/gray+alpha(4)/RGBA(6), filters 0-4, non-interlaced.
    Alpha is dropped and gray replicated → H×W×3 uint8, the same
    contract as the other decoders. 16-bit depth and Adam7 interlace
    raise (rare in training corpora; a documented cut, not a stub)."""
    import zlib

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG: only 8-bit depth supported (got {bit_depth})")
    if interlace != 0:
        raise NotImplementedError("PNG: Adam7 interlace not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG: unknown color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    grid = _png_unfilter(raw, height, width, channels).reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        return palette[grid[:, :, 0]]
    if color_type == 0:
        return np.repeat(grid, 3, axis=2)
    if color_type == 4:
        return np.repeat(grid[:, :, :1], 3, axis=2)
    return grid[:, :, :3]  # RGB / RGBA (alpha dropped)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal RGB PNG writer (color type 2, filter 0 rows, one zlib
    IDAT) — gives the pipeline a compressed-format round-trip fixture
    without any codec library."""
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_image(b: bytes) -> np.ndarray:
    """Sniff the payload magic and decode: netpbm (P5/P6), uncompressed
    BMP, PNG (stdlib-zlib inflate + unfilter), and baseline JPEG (from-
    scratch Huffman + IDCT, :mod:`jpegcodec`) all decode for real;
    progressive/subsampled JPEG raises NotImplementedError there."""
    if b[:2] in (b"P6", b"P5"):
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_MAGIC:
        return decode_png(b)
    if b[:3] == b"\xff\xd8\xff":
        from stream_processing_platform_spark.multimodal.jpegcodec import decode_jpeg

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from stream_processing_platform_spark.multimodal.gifcodec import decode_gif

        return decode_gif(b)[0][0]  # first frame; frame sampling is
        # codecs.sample_video_frames(decoder="image")
    if len(b) >= 12 and b[4:8] == b"ftyp":
        from stream_processing_platform_spark.multimodal import mp4codec
        from stream_processing_platform_spark.multimodal.jpegcodec import decode_jpeg

        f = mp4codec.parse_mp4(b)
        for t in f.video_tracks():
            if t.codec in ("jpeg", "mjpa") and t.n_samples:
                _, _, payload, _ = mp4codec.extract_samples(b, t)[0]
                return decode_jpeg(payload)  # first frame, as with GIF
        codecs_seen = [t.codec for t in f.video_tracks()] or ["<none>"]
        raise NotImplementedError(
            f"MP4 container parsed but no decodable video track "
            f"(codecs {codecs_seen}; AVC/HEVC entropy decode is out of scope)"
        )
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
    """WAV → (sample_rate, float32 mono samples in [-1, 1]).  Handles
    integer PCM (8/16-bit, any channel count) plus the compressed
    formats real crawl WAV carries: G.711 mu-law/A-law (wFormatTag
    7/6) and IMA ADPCM (0x11) via :mod:`g711adpcm` (from-scratch,
    exactly-specified algorithms).  Walks RIFF chunks, so extra chunks
    (LIST/fact) between fmt and data are fine."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_samples = 12, None, None, None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            fact_samples = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if audio_format != 1:
        from stream_processing_platform_spark.multimodal.g711adpcm import (
            decode_wav_compressed,
        )

        return decode_wav_compressed(fmt, data, fact_samples)
    if bits not in (8, 16):
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
