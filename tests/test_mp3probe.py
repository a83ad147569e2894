"""MP3 frame-stream prober tests (multimodal/mp3probe.py)."""

from __future__ import annotations

import pytest

from stream_processing_platform_spark.multimodal.mp3probe import (
    decode_mp3,
    id3v2_size,
    parse_mp3,
    synth_mp3_payload,
    _frame,
)


def test_all_residue_classes_probe_consistently():
    for d in range(24):
        m = parse_mp3(synth_mp3_payload(d))
        assert m["n_frames"] >= 3, d
        assert m["sample_rate"] in (44100, 22050), d
        assert m["duration_ms"] > 0, d
        # ID3 present iff even residue; Xing iff divisible by 4
        assert (m["id3_bytes"] > 0) == (d % 2 == 0), d
        assert m["has_xing"] == (d % 4 == 0), d
        if m["has_xing"]:
            # the Xing FRAMES field counts the audio frames we wrote
            assert m["xing_frames"] == 3 + d % 4, d
            assert not m["is_cbr"], d
        else:
            assert m["is_cbr"], d


def test_duration_math():
    # d=2: MPEG1 (1152 samples/frame), 5 CBR frames at 44100 Hz
    m = parse_mp3(synth_mp3_payload(2))
    assert m["n_frames"] == 5
    assert m["duration_ms"] == 5 * 1152 * 1000 // 44100
    # d=1: MPEG2 (576 samples/frame), 4 frames at 22050 Hz
    m = parse_mp3(synth_mp3_payload(1))
    assert m["duration_ms"] == 4 * 576 * 1000 // 22050


def test_garbage_and_truncated_inputs():
    assert parse_mp3(b"")["n_frames"] == 0
    assert parse_mp3(b"\x00" * 100)["n_frames"] == 0
    assert parse_mp3(b"not audio at all")["n_frames"] == 0
    # a truncated stream still reports the complete frames
    full = synth_mp3_payload(1)
    m_full = parse_mp3(full)
    m_cut = parse_mp3(full[: len(full) - 10])
    assert m_cut["n_frames"] == m_full["n_frames"] - 1


def test_false_sync_defence():
    """A lone 0xFFFB byte pair inside junk must not count as a frame:
    a candidate sync is accepted only when the chain continues."""
    junk = b"\x00\x01" + b"\xff\xfb\x90\x00" + b"\x00" * 50  # dangling header
    assert parse_mp3(junk)["n_frames"] == 0
    # but junk BEFORE a real chain is skipped by the resync scan
    real = synth_mp3_payload(1)
    m = parse_mp3(b"\x13\x37" * 8 + real)
    assert m["n_frames"] == parse_mp3(real)["n_frames"]


def test_id3v2_footer_flag():
    body = bytes(20)
    hdr = b"ID3\x04\x00\x10" + bytes([0, 0, 0, 20])  # footer flag set
    assert id3v2_size(hdr + body) == 20 + 20
    hdr = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20])
    assert id3v2_size(hdr + body) == 20 + 10
    assert id3v2_size(b"XX" + bytes(20)) == 0


def test_padding_changes_frame_size_by_one_slot():
    a = _frame(3, 9, 0, 0, True, 0)  # MPEG1 128k 44100
    b = _frame(3, 9, 0, 1, True, 0)
    assert len(a) == 144 * 128000 // 44100
    assert len(b) == len(a) + 1


def test_decode_gate_names_the_missing_spec_data():
    with pytest.raises(NotImplementedError, match="Huffman"):
        decode_mp3(synth_mp3_payload(0))


def test_id3v2_text_frames_extracted():
    """r13: TIT2/TPE1/TALB text frames parse out of even classes —
    latin-1 and UTF-16 encodings, PRIV skipped by size, soup class
    (d=22) and ID3-less odd classes yield the '' sentinel."""
    for d in range(24):
        m = parse_mp3(synth_mp3_payload(d))
        if d % 2 == 1 or d == 22:
            assert m["title"] == m["artist"] == m["album"] == "", d
        elif d % 8 == 0:  # utf-16 classes
            assert m["title"] == f"Tïtle №{d}", d
            assert m["artist"] == f"Artist {d % 6}", d
        else:
            assert m["title"] == f"Title {d}", d
            assert m["album"] == f"Album {d % 3}", d


def test_id3v2_text_frames_v24_syncsafe_and_malformed():
    from stream_processing_platform_spark.multimodal.mp3probe import (
        id3v2_text_frames,
    )

    # v2.4 tag: syncsafe frame size, utf-8 encoding byte
    body = b"\x03" + "smörgås".encode("utf-8")
    frame = b"TIT2" + bytes([0, 0, 0, len(body)]) + b"\x00\x00" + body
    sz = len(frame)
    tag = b"ID3\x04\x00\x00" + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    ) + frame
    assert id3v2_text_frames(tag) == {"TIT2": "smörgås"}
    # malformed (frame size overruns the tag): walk stops, no throw
    bad = tag[:-3]
    assert id3v2_text_frames(bad) == {}
    assert id3v2_text_frames(b"") == {}
    assert id3v2_text_frames(b"ID3\x03\x00\x00\x00\x00\x00\x00") == {}


def test_id3v2_transformed_frames_skipped():
    """r13 ADVICE: T-frames with compression/encryption/unsync format
    flags are wire-transformed — skipped, not decoded as raw text."""
    from stream_processing_platform_spark.multimodal.mp3probe import (
        id3v2_text_frames,
    )

    def tag(ver: int, fmt_flags: int, extra: bytes = b"") -> bytes:
        body = b"\x03" + "plain".encode("utf-8")
        frame = (
            b"TIT2" + bytes([0, 0, 0, len(body)])
            + bytes([0, fmt_flags]) + body + extra
        )
        sz = len(frame)
        return b"ID3" + bytes([ver, 0, 0]) + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + frame

    # clean flags decode; each transform bit suppresses the frame
    assert id3v2_text_frames(tag(4, 0x00)) == {"TIT2": "plain"}
    # v2.4 grouping/compr/encr/unsync/DLI all shift or transform the body
    for bit in (0x40, 0x08, 0x04, 0x02, 0x01):
        assert id3v2_text_frames(tag(4, bit)) == {}, hex(bit)
    assert id3v2_text_frames(tag(3, 0x00)) == {"TIT2": "plain"}
    for bit in (0x80, 0x40, 0x20):  # v2.3 compr/encr/grouping
        assert id3v2_text_frames(tag(3, bit)) == {}, hex(bit)


def test_xing_offset_respects_crc_protection_bit():
    """r12 ADVICE: when the protection bit is 0 a 2-byte CRC sits
    between the header and side info, shifting a Xing tag by 2."""
    from stream_processing_platform_spark.multimodal.mp3probe import (
        _SIDE_INFO,
    )

    base = _frame(3, 9, 0, 0, True, 5)  # MPEG1 mono 128k, no CRC bit set
    h = int.from_bytes(base[:4], "big") & ~(1 << 16)  # declare CRC
    si = _SIDE_INFO[(True, True)]
    xing = b"Xing" + (0x1).to_bytes(4, "big") + (3).to_bytes(4, "big")
    body = b"\xAA\xBB" + b"\x00" * si + xing  # CRC + side info + tag
    frame = h.to_bytes(4, "big") + body + base[4 + len(body):]
    assert len(frame) == len(base)
    tail = b"".join(_frame(3, 9, 0, 0, True, i) for i in range(3))
    m = parse_mp3(frame + tail)
    assert m["has_xing"] and m["xing_frames"] == 3
    # and WITHOUT the CRC bytes the same header must NOT find a tag at
    # the CRC-shifted offset
    frame_no_crc = base[:4] + b"\x00" * si + xing + base[4 + si + len(xing):]
    m2 = parse_mp3(frame_no_crc + tail)
    assert m2["has_xing"]  # sanity: un-protected layout still detects
