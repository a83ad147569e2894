"""GIF codec — pure Python + numpy, no codec libraries.

Animated GIF is the one moving-image format tractable without ffmpeg,
which makes it the REAL-decode backing for the multimodal frame-sampling
stage (``codecs.sample_video_frames(decoder="image")``): actual palette
pixels per frame instead of the deterministic fake. MP4/H.264 stays
honestly gated — a from-scratch H.264 decoder is out of scope.

Scope: GIF87a/89a, global AND per-frame local color tables, interlaced
images (the 4-pass row shuffle), transparency, frame disposal methods
0/1 (none/keep), 2 (restore background) and 3 (restore previous), and
the full variable-width LZW coding (3-12 bit codes, clear/end codes,
deferred-clear streams). The encoder writes GIF89a with one global
palette (≤256 distinct colors across frames — quantization is a
modelling choice, not a codec concern, so more colors raise), a
graphics-control block per frame, and standard LZW with table resets.

Like :mod:`jpegcodec`, the decoder trusts nothing from the encoder:
palettes, code sizes, and sub-block framing all come from the stream,
so encode→decode round-trips genuinely exercise both directions.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ LZW

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits an initial clear code, grows code width
    from min+1 to 12 bits, resets the table when code 4096 would be
    needed. Bit packing is LSB-first (the GIF convention)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for sym in indices.tolist():
        cur = prefix + bytes([sym])
        if cur in table:
            prefix = cur
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cur] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([sym])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW data truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        if prev is not None and len(table) - 1 == (1 << width) - 1 and width < 12:
            width += 1
        out += entry
        prev = entry
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns (data,
    position after the 0x00 terminator)."""
    chunks = []
    while True:
        n = b[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(b[pos:pos + n])
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


# ---------------------------------------------------------------- encode

def encode_gif(
    frames: list[np.ndarray], delays_ms: list[int] | None = None
) -> bytes:
    """GIF89a bytes for a list of (H, W, 3) uint8 frames sharing one
    ≤256-color palette (more distinct colors raise — quantize first).
    ``delays_ms`` defaults to 100 ms per frame; GIF stores centiseconds."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    delays = delays_ms if delays_ms is not None else [100] * len(frames)
    if len(delays) != len(frames):
        # loud, like the shape/palette validations: a silent zip
        # truncation here would drop trailing frames from the output
        raise ValueError(
            f"delays_ms has {len(delays)} entries for {len(frames)} frames"
        )
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stack, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF palette overflow: {len(palette)} distinct colors > 256")
    # palette size must be a power of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF0 | (bits - 1), 0, 0)
    out += pal.tobytes()
    # Netscape loop extension (loop forever) — standard for animations
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    per_frame = np.split(inverse.astype(np.uint8), len(frames))
    min_code = max(2, bits)
    for idx, (frame_ix, delay) in enumerate(zip(per_frame, delays)):
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0, max(0, delay // 10), 0, 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(frame_ix, min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------- decode

def decode_gif(b: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode GIF bytes → (frames as (H, W, 3) uint8, delays in ms).
    Frames are fully composed (disposal methods applied), so frame k is
    what a viewer shows at step k."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad magic)")
    w, h, flags, bg_index, _ = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg_index < len(global_pal):
        canvas[:] = global_pal[bg_index]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 10
    prev_canvas = canvas.copy()
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            data, pos = _sub_blocks(b, pos)
            if label == 0xF9 and len(data) >= 4:  # graphics control
                packed, delay_cs = data[0], struct.unpack("<H", data[1:3])[0]
                disposal = (packed >> 2) & 0x7
                transparent = data[3] if packed & 0x1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x} at {pos - 1}")
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", b[pos:pos + 9])
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image without any color table")
        min_code = b[pos]
        pos += 1
        data, pos = _sub_blocks(b, pos)
        indices = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            indices = _deinterlace(indices)
        prev_canvas = canvas.copy()
        region = canvas[fy:fy + fh, fx:fx + fw]
        pixels = pal[np.clip(indices, 0, len(pal) - 1)]
        if transparent is not None:
            mask = indices != transparent
            region[mask] = pixels[mask]
        else:
            region[:] = pixels
        frames.append(canvas.copy())
        delays.append(delay_cs * 10)
        if disposal == 2:  # restore background in the frame's region
            canvas[fy:fy + fh, fx:fx + fw] = background[fy:fy + fh, fx:fx + fw]
        elif disposal == 3:  # restore previous canvas
            canvas = prev_canvas.copy()
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return frames, delays
