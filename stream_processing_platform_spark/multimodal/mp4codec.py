"""From-scratch ISO-BMFF (MP4, ISO/IEC 14496-12) container codec.

Real crawl corpora carry video as MP4. The CONTAINER layer — box
structure, track tables, the sample timeline, keyframe positions, and
the raw sample payloads — is pure structured parsing, and that is what
a 100 TB media-pipeline needs for frame SAMPLING: locate the samples to
keep, slice their bytes, hand the payload to whichever decoder applies.
This module implements both directions with no dependencies:

- :func:`parse_mp4` walks the box tree and materializes every ``trak``'s
  sample tables: ``stsd`` (codec fourcc + dimensions), ``stts`` (decode
  deltas -> per-sample timestamps), ``stss`` (sync/keyframe numbers;
  absent means all-sync), ``stsc`` x ``stco``/``co64`` x ``stsz`` (the
  chunk map -> absolute byte offset + size per sample).
- :func:`extract_samples` slices each sample's bytes out of ``mdat``
  using those tables — for Motion-JPEG tracks (``jpeg``/``mjpa``) the
  payloads are complete JFIF images our :mod:`jpegcodec` decodes to
  pixels; for AVC (``avc1``) the payloads are length-prefixed NAL units
  that :mod:`avccodec` (r10) entropy-decodes for baseline IDR+P GOPs
  (CAVLC, quarter-pel motion compensation) — B slices and sub-16x16
  partitions remain honestly gated; ``sync_only`` sampling stays the
  keyframe tier.
- :func:`encode_mp4` is a minimal single-track muxer (ftyp + mdat +
  moov with the full stbl table set) so round-trip tests are
  self-contained: our JPEG encoder makes frames, the muxer wraps them,
  the parser + jpegcodec get the pixels back.

Layout notes (all integers big-endian, per the spec):
- every box is ``[size:u32][type:4cc][payload]``; ``size==1`` switches
  to a u64 largesize, ``size==0`` means "to end of file".
- "full boxes" prepend ``[version:u8][flags:u24]`` to the payload.

The reference repo has no media-container code (it is a stream engine);
this module belongs to the LLM-pipeline multimodal surface
(SURVEY.md §7.6), same tier as jpegcodec/gifcodec.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterator

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
    b"udta", b"mvex", b"moof", b"traf",
}


def parse_boxes(data: bytes, start: int = 0, end: int | None = None) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(type, payload_start, payload_end)`` for each box in
    ``data[start:end]``. Handles u64 largesize and size-0 (to end)."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"box {btype!r} size {size} overruns container")
        yield btype, pos + head, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes) -> tuple[int, int] | None:
    """Payload span of the first box at ``path`` under [start, end)."""
    for btype, ps, pe in parse_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find(data, ps, pe, *path[1:])
    return None


def _find_all(data: bytes, start: int, end: int, btype: bytes) -> list[tuple[int, int]]:
    return [(ps, pe) for t, ps, pe in parse_boxes(data, start, end) if t == btype]


@dataclass(frozen=True)
class VideoTrack:
    codec: str  # stsd sample-entry fourcc, e.g. 'jpeg', 'avc1'
    handler: str  # hdlr type, e.g. 'vide', 'soun'
    width: int
    height: int
    timescale: int  # mdhd units per second
    sizes: list[int]  # stsz, bytes per sample
    offsets: list[int]  # absolute file offset per sample (stsc x stco)
    times: list[int]  # decode timestamp per sample, timescale units
    sync: list[bool]  # stss keyframe flags (all True when absent)
    duration: int  # mdhd duration, timescale units
    avcc: bytes | None = None  # avcC decoder-config payload (avc1 tracks)

    @property
    def n_samples(self) -> int:
        return len(self.sizes)

    def times_ms(self) -> list[int]:
        return [t * 1000 // self.timescale for t in self.times]

    def duration_ms(self) -> int:
        if self.duration:
            return self.duration * 1000 // self.timescale
        if not self.times:
            return 0
        # mdhd had no duration: last decode time + a repeat of the last
        # delta is the best fencepost estimate available
        last_delta = (
            self.times[-1] - self.times[-2] if len(self.times) > 1 else self.times[-1] or 1
        )
        return (self.times[-1] + last_delta) * 1000 // self.timescale


@dataclass(frozen=True)
class Mp4File:
    brand: str
    tracks: list[VideoTrack]

    def video_tracks(self) -> list[VideoTrack]:
        return [t for t in self.tracks if t.handler == "vide"]


def _u32s(data: bytes, pos: int, n: int) -> list[int]:
    return list(struct.unpack_from(f">{n}I", data, pos))


def _parse_track(data: bytes, ts_: int, te: int) -> VideoTrack | None:
    mdia = _find(data, ts_, te, b"mdia")
    if mdia is None:
        return None
    mdhd = _find(data, *mdia, b"mdhd")
    hdlr = _find(data, *mdia, b"hdlr")
    stbl = _find(data, *mdia, b"minf", b"stbl")
    if mdhd is None or stbl is None:
        return None
    version = data[mdhd[0]]
    if version:
        timescale, duration = struct.unpack_from(">IQ", data, mdhd[0] + 20)
    else:
        timescale, duration = struct.unpack_from(">II", data, mdhd[0] + 12)
    handler = data[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1") if hdlr else "????"

    stsd = _find(data, *stbl, b"stsd")
    codec, width, height, avcc = "????", 0, 0, None
    if stsd is not None:
        n_entries = struct.unpack_from(">I", data, stsd[0] + 4)[0]
        if n_entries >= 1:
            ep = stsd[0] + 8  # first sample entry: [size][fourcc]...
            codec = data[ep + 4 : ep + 8].decode("latin1")
            if handler == "vide" and stsd[1] - ep >= 36:
                # VisualSampleEntry: 8 header + 6 reserved + 2 dri +
                # 2+2 predefined/reserved + 12 predefined, then w/h
                width, height = struct.unpack_from(">HH", data, ep + 32)
            if codec == "avc1":
                # avcC follows the 86-byte fixed VisualSampleEntry
                entry_end = ep + struct.unpack_from(">I", data, ep)[0]
                q = ep + 86
                while q + 8 <= min(entry_end, stsd[1]):
                    bsize = struct.unpack_from(">I", data, q)[0]
                    if data[q + 4 : q + 8] == b"avcC":
                        avcc = data[q + 8 : q + bsize]
                        break
                    q += max(8, bsize)
    # stts -> per-sample decode times
    times: list[int] = []
    stts = _find(data, *stbl, b"stts")
    if stts is not None:
        n = struct.unpack_from(">I", data, stts[0] + 4)[0]
        t = 0
        for i in range(n):
            cnt, delta = struct.unpack_from(">II", data, stts[0] + 8 + 8 * i)
            for _ in range(cnt):
                times.append(t)
                t += delta
    # stsz -> sizes
    sizes: list[int] = []
    stsz = _find(data, *stbl, b"stsz")
    if stsz is not None:
        fixed, cnt = struct.unpack_from(">II", data, stsz[0] + 4)
        sizes = [fixed] * cnt if fixed else _u32s(data, stsz[0] + 12, cnt)
    # stsc x stco/co64 -> absolute offsets
    offsets: list[int] = []
    stsc = _find(data, *stbl, b"stsc")
    stco = _find(data, *stbl, b"stco")
    co64 = _find(data, *stbl, b"co64")
    if stsc is not None and (stco is not None or co64 is not None):
        if stco is not None:
            n_chunks = struct.unpack_from(">I", data, stco[0] + 4)[0]
            chunk_offs = _u32s(data, stco[0] + 8, n_chunks)
        else:
            n_chunks = struct.unpack_from(">I", data, co64[0] + 4)[0]
            chunk_offs = list(struct.unpack_from(f">{n_chunks}Q", data, co64[0] + 8))
        n_sc = struct.unpack_from(">I", data, stsc[0] + 4)[0]
        runs = [struct.unpack_from(">III", data, stsc[0] + 8 + 12 * i) for i in range(n_sc)]
        # expand samples-per-chunk runs (first_chunk is 1-based)
        spc_by_chunk: list[int] = []
        for i, (first, spc, _sdi) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            spc_by_chunk.extend([spc] * (last - first + 1))
        si = 0
        for ci, coff in enumerate(chunk_offs):
            pos = coff
            for _ in range(spc_by_chunk[ci] if ci < len(spc_by_chunk) else 0):
                if si >= len(sizes):
                    break
                offsets.append(pos)
                pos += sizes[si]
                si += 1
    # stss -> sync flags (absent: every sample is a keyframe)
    sync = [True] * len(sizes)
    stss = _find(data, *stbl, b"stss")
    if stss is not None:
        n = struct.unpack_from(">I", data, stss[0] + 4)[0]
        sync = [False] * len(sizes)
        for num in _u32s(data, stss[0] + 8, n):
            if 1 <= num <= len(sizes):
                sync[num - 1] = True
    n = min(len(sizes), len(offsets), len(times) or len(sizes))
    if not times:
        times = [0] * n
    return VideoTrack(
        codec=codec, handler=handler, width=width, height=height,
        timescale=timescale or 1, duration=duration,
        sizes=sizes[:n], offsets=offsets[:n], times=times[:n], sync=sync[:n],
        avcc=avcc,
    )


def parse_mp4(data: bytes) -> Mp4File:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    brand = data[8:12].decode("latin1")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box (fragmented-only streams unsupported)")
    tracks = []
    for ts_, te in _find_all(data, *moov, b"trak"):
        t = _parse_track(data, ts_, te)
        if t is not None:
            tracks.append(t)
    return Mp4File(brand=brand, tracks=tracks)


def extract_samples(
    data: bytes, track: VideoTrack, sync_only: bool = False
) -> list[tuple[int, int, bytes, bool]]:
    """``(sample_idx, ts_ms, payload, is_sync)`` per sample, sliced from
    ``mdat`` via the chunk map. ``sync_only`` keeps keyframes — the
    standard sampling tier for AVC where only sync samples decode
    standalone."""
    out = []
    ts_ms = track.times_ms()
    for i in range(track.n_samples):
        if sync_only and not track.sync[i]:
            continue
        off, size = track.offsets[i], track.sizes[i]
        if off + size > len(data):
            raise ValueError(f"sample {i} overruns file ({off}+{size} > {len(data)})")
        out.append((i, ts_ms[i], data[off : off + size], track.sync[i]))
    return out


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


# ---------------------------------------------------------------- muxer


def _box(btype: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, *payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags), *payload)


def encode_mp4(
    frames: list[bytes],
    delays_ms: list[int],
    width: int,
    height: int,
    codec: str = "jpeg",
    keyframe_every: int = 1,
    sample_entry_extra: bytes = b"",
) -> bytes:
    """Minimal single-video-track MP4: ftyp + mdat (concatenated sample
    payloads) + moov with full stbl tables. ``codec='jpeg'`` declares
    Motion-JPEG sample entries (each frame a standalone JFIF payload our
    jpegcodec round-trips). ``keyframe_every=k`` marks every k-th sample
    sync in stss (k=1 omits stss: all-sync, the MJPEG truth)."""
    if len(frames) != len(delays_ms):
        raise ValueError(
            f"frames ({len(frames)}) and delays_ms ({len(delays_ms)}) must pair 1:1"
        )
    if not frames:
        raise ValueError("need at least one frame")
    timescale = 1000  # 1 unit = 1 ms
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isom", b"iso2", b"mp41")
    mdat_payload = b"".join(frames)
    # sample offsets are absolute: ftyp + mdat header precede payload
    base = len(ftyp) + 8
    offsets, pos = [], base
    for f in frames:
        offsets.append(pos)
        pos += len(f)
    duration = sum(delays_ms)

    # stts with run-length compression of equal deltas
    runs: list[tuple[int, int]] = []
    for d in delays_ms:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(
        b"stts", 0, 0, struct.pack(">I", len(runs)),
        b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 1), struct.pack(">III", 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0, struct.pack(">II", 0, len(frames)),
        b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(
        b"stco", 0, 0, struct.pack(">I", len(offsets)),
        b"".join(struct.pack(">I", o) for o in offsets),
    )
    sample_entry = _box(
        codec.encode("latin1")[:4].ljust(4, b" "),
        b"\x00" * 6, struct.pack(">H", 1),  # reserved + data_ref_index
        b"\x00" * 16,  # predefined/reserved block
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x00480000, 0x00480000),  # 72 dpi fixed-point
        b"\x00" * 4, struct.pack(">H", 1),  # reserved + frame_count
        b"\x00" * 32,  # compressor name
        struct.pack(">Hh", 24, -1),  # depth, predefined
        sample_entry_extra,  # e.g. the avcC box for avc1 tracks
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), sample_entry)
    stbl_parts = [stsd, stts, stsc, stsz, stco]
    if keyframe_every > 1:
        keys = list(range(1, len(frames) + 1, keyframe_every))
        stbl_parts.append(
            _full(b"stss", 0, 0, struct.pack(">I", len(keys)),
                  b"".join(struct.pack(">I", k) for k in keys))
        )
    stbl = _box(b"stbl", *stbl_parts)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1))
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        _box(b"dinf", dref),
        stbl,
    )
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4, b"vide", b"\x00" * 12, b"video\x00")
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0),  # ctime mtime track_id reserved
        struct.pack(">I", duration), b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),  # layer alt volume reserved
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">IH", 0x00010000, 0x0100), b"\x00" * 10,  # rate volume
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        b"\x00" * 24, struct.pack(">I", 2),  # predefined, next_track_id
    )
    moov = _box(b"moov", mvhd, trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
