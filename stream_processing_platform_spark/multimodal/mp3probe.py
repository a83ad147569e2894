"""MP3 (MPEG-1/2/2.5 Layer III) frame-stream probing — the audio
METADATA stage of crawl curation: frame-chain validation, ID3v2
skipping, Xing/Info VBR-header detection, duration/bitrate statistics,
all from the exactly-published header structure (ISO/IEC 11172-3 §2.4 /
13818-3). No codec library; no PCM.

PCM decode is honestly gated (:func:`decode_mp3`): the Layer III
Huffman CODE tables (11172-3 Annex B.7), the synthesis-filterbank
window coefficients (Annex B table 3-B.3) and the scalefactor-band
partitions are spec DATA, not algorithms — they cannot be derived and
are not available in this environment, and shipping invented tables
would produce a decoder that round-trips against its own encoder while
silently mis-decoding every real stream. The requantize/IMDCT/alias
machinery without its tables is not a decoder, so the gate sits at the
decode entry point with this exact reason. Everything metadata-side —
the part a 100 TB curation pass actually runs before deciding what to
ship to a transcode fleet — is real and oracle-checked.

Reference parity note: the reference platform has no audio surface at
all (SURVEY §2.8's scalar set is string/time functions); this module is
north-star LLM-pipeline capability beside WAV/G.711/ADPCM/FLAC decode
(multimodal/g711adpcm.py, flaccodec.py).
"""

from __future__ import annotations

from dataclasses import dataclass

# Header tables (exact, public): bitrate kbps by (version-group, index).
# Index 0 = "free format", index 15 = invalid — both rejected here.
_BITRATES_V1_L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
_BITRATES_V2_L3 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None
)
# Sample rates by version: MPEG1, MPEG2, MPEG2.5 (version bits 3, 2, 0).
_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}
# Layer III samples per frame / slot factor: MPEG1 1152 (factor 144),
# MPEG2/2.5 576 (factor 72).
_SAMPLES = {3: 1152, 2: 576, 0: 576}
_SLOT_FACTOR = {3: 144, 2: 72, 0: 72}
# Side-info bytes (after the 4-byte header, no CRC): needed to locate a
# Xing/Info tag, which sits immediately after the side info.
_SIDE_INFO = {  # (version==MPEG1, mono) -> bytes
    (True, True): 17,
    (True, False): 32,
    (False, True): 9,
    (False, False): 17,
}


@dataclass(frozen=True)
class Mp3Frame:
    offset: int
    version: int  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    bitrate_kbps: int
    sample_rate: int
    padding: int
    mono: bool
    size: int


def _parse_header(b: bytes, pos: int) -> Mp3Frame | None:
    """Parse a 4-byte Layer III frame header at ``pos``; None if it is
    not a valid Layer III header."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:  # 11-bit sync
        return None
    version = (h >> 19) & 0x3
    if version == 1:  # reserved
        return None
    layer = (h >> 17) & 0x3
    if layer != 1:  # Layer III encodes as 0b01
        return None
    bidx = (h >> 12) & 0xF
    table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
    bitrate = table[bidx]
    if bitrate is None:  # free-format / invalid
        return None
    ridx = (h >> 10) & 0x3
    if ridx == 3:
        return None
    rate = _RATES[version][ridx]
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    size = _SLOT_FACTOR[version] * bitrate * 1000 // rate + padding
    return Mp3Frame(pos, version, bitrate, rate, padding, mode == 3, size)


def id3v2_size(b: bytes) -> int:
    """Bytes occupied by a leading ID3v2 container (0 if absent):
    10-byte header + syncsafe 28-bit size (+10 for a footer flag)."""
    if len(b) < 10 or b[:3] != b"ID3":
        return 0
    if b[5] & 0x10:  # footer present
        extra = 20
    else:
        extra = 10
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    return extra + size


# ID3v2 text-frame encodings (informal standard id3v2.3.0 §3.3 /
# id3v2.4.0-structure §4): encoding byte 0 = ISO-8859-1, 1 = UTF-16
# with BOM, 2 = UTF-16BE (v2.4), 3 = UTF-8 (v2.4).
_ID3_TEXT_ENC = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def id3v2_text_frames(b: bytes) -> dict[str, str]:
    """Extract the text frames of a leading ID3v2.3/2.4 container as
    ``{frame_id: text}`` — the metadata a curation pass actually wants
    (TIT2 title, TPE1 artist, TALB album, ...). Pure published
    structure: 10-byte tag header with syncsafe size, frames of
    4-byte id + 4-byte size (plain big-endian in v2.3, syncsafe in
    v2.4) + 2 flag bytes; a ``T***`` frame body is one encoding byte
    plus text, null-terminated optionally. Unknown/binary frames are
    skipped by size; zero padding ends the walk; malformed frames end
    the walk rather than throw (engine-wide never-throw policy).
    ID3v2.2 (3-byte frame ids) is not parsed — its container is still
    skipped correctly by :func:`id3v2_size`."""
    out: dict[str, str] = {}
    if len(b) < 10 or b[:3] != b"ID3":
        return out
    ver = b[3]
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    pos = 10
    end = min(len(b), 10 + size)
    if b[5] & 0x40 and pos + 4 <= end:  # extended header: skip by size
        raw = b[pos : pos + 4]
        if ver >= 4:  # syncsafe, counts itself
            pos += (raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7) | raw[3]
        else:  # v2.3: size EXCLUDES the 4 size bytes
            pos += int.from_bytes(raw, "big") + 4
    while pos + 10 <= end:
        fid = b[pos : pos + 4]
        if fid[0] == 0:  # zero padding region
            break
        if not all(0x30 <= c <= 0x39 or 0x41 <= c <= 0x5A for c in fid):
            break  # not a valid frame id: stop rather than misparse
        raw = b[pos + 4 : pos + 8]
        if ver >= 4:
            fsz = (raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7) | raw[3]
        else:
            fsz = int.from_bytes(raw, "big")
        if fsz <= 0 or pos + 10 + fsz > end:
            break
        # format-flags byte (second flag byte): a frame whose content is
        # transformed on the wire is NOT raw text — skip it like an
        # unknown binary frame instead of decoding garbage (r13 ADVICE).
        # v2.3: bit7 compression, bit6 encryption, bit5 grouping (a
        # group-id byte prepends the body); v2.4: bit6 grouping, bit3
        # compression, bit2 encryption, bit1 unsync, bit0 data-length.
        fmt_flags = b[pos + 9]
        transformed = (
            fmt_flags & 0x4F if ver >= 4 else fmt_flags & 0xE0
        )
        if fid[0:1] == b"T" and not transformed:
            body = b[pos + 10 : pos + 10 + fsz]
            codec = _ID3_TEXT_ENC.get(body[0])
            if codec is not None:
                text = body[1:].decode(codec, "replace")
                out[fid.decode("ascii")] = text.split("\x00", 1)[0]
        pos += 10 + fsz
    return out


def parse_mp3(b: bytes, max_resync: int = 4096) -> dict:
    """Walk the frame chain of an MP3 payload and return stream-level
    metadata. A candidate sync is accepted only if the NEXT frame
    header (at the computed frame length) also parses — the standard
    false-sync defence. Returns a dict with n_frames, duration_ms,
    sample_rate, mono, bitrate min/max/avg (kbps), is_cbr, id3_bytes,
    has_xing, xing_frames (-1 when absent), and the ID3v2 text-frame
    trio title/artist/album (TIT2/TPE1/TALB, '' when absent — r13).

    Documented choice: ``bitrate_avg`` averages over ALL stream frames
    including a Xing/Info tag frame (the tag frame IS a physical frame
    with a real header bitrate), while ``duration_ms`` excludes it (it
    carries no audio). VBR tools conventionally exclude the tag frame
    from both; this probe's convention is replayed identically by its
    oracle either way.
    """
    start = id3v2_size(b)
    tags = id3v2_text_frames(b)
    id3_text = {
        "title": tags.get("TIT2", ""),
        "artist": tags.get("TPE1", ""),
        "album": tags.get("TALB", ""),
    }
    # resync scan: tolerate junk between ID3 and the first frame
    first = None
    for pos in range(start, min(len(b), start + max_resync)):
        f = _parse_header(b, pos)
        if f is None:
            continue
        nxt = _parse_header(b, pos + f.size)
        if nxt is not None or pos + f.size == len(b):
            first = f
            break
    if first is None:
        return {
            "n_frames": 0, "duration_ms": 0, "sample_rate": 0, "mono": True,
            "bitrate_min": 0, "bitrate_max": 0, "bitrate_avg": 0,
            "is_cbr": False, "id3_bytes": start, "has_xing": False,
            "xing_frames": -1, **id3_text,
        }

    # Xing/Info tag: first frame, right after the side info. When the
    # protection bit (header bit 16) is 0 a 2-byte CRC sits between the
    # header and the side info (ISO 11172-3 §2.4.1.4) and shifts the
    # tag by 2 (r12 ADVICE).
    crc_bytes = 2 if (int.from_bytes(b[first.offset:first.offset + 4], "big") >> 16) & 0x1 == 0 else 0
    si = _SIDE_INFO[(first.version == 3, first.mono)]
    tag_at = first.offset + 4 + crc_bytes + si
    has_xing = b[tag_at : tag_at + 4] in (b"Xing", b"Info")
    xing_frames = -1
    if has_xing:
        flags = int.from_bytes(b[tag_at + 4 : tag_at + 8], "big")
        if flags & 0x1:  # FRAMES field present
            xing_frames = int.from_bytes(b[tag_at + 8 : tag_at + 12], "big")

    n = 0
    total_kbps = 0
    bmin, bmax = 1 << 30, 0
    pos = first.offset
    f: Mp3Frame | None = first
    while f is not None:
        if f.offset + f.size > len(b):
            break  # body-truncated final frame: not a complete frame
        n += 1
        total_kbps += f.bitrate_kbps
        bmin = min(bmin, f.bitrate_kbps)
        bmax = max(bmax, f.bitrate_kbps)
        pos += f.size
        f = _parse_header(b, pos)

    samples = _SAMPLES[first.version]
    audio_frames = n - 1 if has_xing else n  # the Xing frame is silent
    duration_ms = audio_frames * samples * 1000 // first.sample_rate
    return {
        "n_frames": n,
        "duration_ms": duration_ms,
        "sample_rate": first.sample_rate,
        "mono": first.mono,
        "bitrate_min": bmin,
        "bitrate_max": bmax,
        "bitrate_avg": total_kbps // n,
        "is_cbr": bmin == bmax,
        "id3_bytes": start,
        "has_xing": has_xing,
        "xing_frames": xing_frames,
        **id3_text,
    }


def decode_mp3(b: bytes):  # pragma: no cover - the gate IS the behavior
    """Layer III PCM decode — honestly gated, see the module docstring."""
    raise NotImplementedError(
        "MP3 Layer III PCM decode requires the ISO/IEC 11172-3 Annex B "
        "Huffman code tables, synthesis-window coefficients and "
        "scalefactor-band partitions — spec DATA this environment does "
        "not provide; shipping invented tables would mis-decode every "
        "real stream. Frame/metadata probing (parse_mp3) is implemented."
    )


# ------------------------------------------------------ fixture builder
#
# Deterministic VALID frame chains for the probe's oracle: headers are
# real (the prober recomputes sizes from them); frame BODIES are an
# opaque deterministic byte pattern — a prober never reads them, which
# is exactly what makes this fixture honest for a metadata operator.


def _frame(version: int, bidx: int, ridx: int, padding: int, mono: bool,
           body_seed: int) -> bytes:
    h = (
        (0x7FF << 21)
        | (version << 19)
        | (1 << 17)  # Layer III
        | (1 << 16)  # protection bit = 1: NO CRC follows (r12 ADVICE —
        #              a 0 here declares a 2-byte CRC the fixture never
        #              wrote, making synthetic frames spec-invalid)
        | (bidx << 12)
        | (ridx << 10)
        | (padding << 9)
        | ((3 if mono else 0) << 6)
    )
    table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
    size = _SLOT_FACTOR[version] * table[bidx] * 1000 // _RATES[version][ridx] + padding
    body = bytes((body_seed * 31 + i * 7) % 256 for i in range(size - 4))
    return h.to_bytes(4, "big") + body


def _id3_text_frame(fid: bytes, text: str, enc: int) -> bytes:
    """One ID3v2.3 text frame: 4-byte id + plain-BE size + 2 flag
    bytes + encoding byte + encoded text."""
    if enc == 1:
        body = b"\x01" + text.encode("utf-16")  # BOM included
    else:
        body = b"\x00" + text.encode("latin-1")
    return fid + len(body).to_bytes(4, "big") + b"\x00\x00" + body


def synth_mp3_payload(d: int) -> bytes:
    """Deterministic MP3 stream for one doc id — pure function of
    ``d % 24``: version cycles MPEG1/MPEG2 (d%2), bitrate index cycles
    3 classes (d%3), ID3v2 present iff d%2==0, Xing VBR header iff
    d%4==0 (with a real FRAMES field), mono iff d%3!=0, frame count
    3 + d%4, alternating padding bits. Even classes carry REAL ID3v2.3
    text frames (r13): TIT2/TPE1/TALB, UTF-16 encoding when d%8==0 and
    latin-1 otherwise, a binary PRIV frame prepended when d%6==0 (the
    skip-unknown-frames path), trailing zero padding, except d%24==22
    which keeps the pre-r13 opaque tag soup (the skip-by-size path —
    a tag with no parseable frames must still probe cleanly). Shared
    by the Spark probe query and the sequential-replay oracle
    generator."""
    d = d % 24
    version = 3 if d % 2 == 0 else 2
    ridx = 0
    mono = d % 3 != 0
    n_frames = 3 + d % 4
    out = bytearray()
    if d % 2 == 0:
        if d == 22:
            # opaque tag soup: no parseable frames, skipped by size
            tag = bytes((d * 13 + i) % 256 for i in range(30 + d % 5))
        else:
            enc = 1 if d % 8 == 0 else 0
            title = f"Tïtle №{d}" if enc == 1 else f"Title {d}"
            frames = bytearray()
            if d % 6 == 0:
                # unknown binary frame: must be skipped by size
                priv = bytes((d * 7 + i) % 256 for i in range(9))
                frames += b"PRIV" + len(priv).to_bytes(4, "big") + b"\x00\x00" + priv
            frames += _id3_text_frame(b"TIT2", title, enc)
            frames += _id3_text_frame(b"TPE1", f"Artist {d % 6}", enc)
            frames += _id3_text_frame(b"TALB", f"Album {d % 3}", enc)
            tag = bytes(frames) + b"\x00" * (d % 5)  # zero padding
        sz = len(tag)
        out += b"ID3\x03\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + tag
    frames = []
    if d % 4 == 0:
        # Xing frame first: header + side info + 'Xing' + flags + frames
        si = _SIDE_INFO[(version == 3, mono)]
        xing_body = bytearray(b"\x00" * si)
        xing_body += b"Xing" + (0x1).to_bytes(4, "big") + n_frames.to_bytes(4, "big")
        f0 = _frame(version, 9, ridx, 0, mono, d)
        frames.append(f0[:4] + bytes(xing_body) + f0[4 + len(xing_body):])
        # VBR body frames: bitrate index cycles per frame
        for i in range(n_frames):
            frames.append(_frame(version, 5 + (i + d) % 3, ridx, i % 2, mono, d + i))
    else:
        bidx = 7 + d % 3
        for i in range(n_frames):
            frames.append(_frame(version, bidx, ridx, i % 2, mono, d + i))
    out += b"".join(frames)
    return bytes(out)
