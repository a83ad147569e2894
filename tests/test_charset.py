"""Charset sniffing/decoding tests (functions/charset.py)."""

from __future__ import annotations

from stream_processing_platform_spark.functions.charset import (
    decode_payload,
    sniff_charset,
)

SAMPLE = "café Ω résumé"


def test_bom_detection_all_five():
    assert sniff_charset("x".encode("utf-8-sig"))[::2] == ("utf-8", "bom")
    for enc in ("utf-16-le", "utf-16-be", "utf-32-le", "utf-32-be"):
        b = {"utf-16-le": b"\xff\xfe", "utf-16-be": b"\xfe\xff",
             "utf-32-le": b"\xff\xfe\x00\x00", "utf-32-be": b"\x00\x00\xfe\xff"}[enc]
        got = sniff_charset(b + SAMPLE.encode(enc))
        assert got == (enc, len(b), "bom"), enc
        text, e, how = decode_payload(b + SAMPLE.encode(enc))
        assert (text, e, how) == (SAMPLE, enc, "bom")


def test_utf32_bom_beats_utf16_prefix():
    # FF FE 00 00 is UTF-32 LE, not UTF-16 LE followed by NUL
    b = b"\xff\xfe\x00\x00" + "A".encode("utf-32-le")
    assert sniff_charset(b)[0] == "utf-32-le"
    assert decode_payload(b)[0] == "A"


def test_meta_declaration_and_whatwg_alias():
    html = b'<html><head><meta charset="ISO-8859-1"></head><body>caf\xe9</body>'
    text, enc, how = decode_payload(html)
    assert (enc, how) == ("cp1252", "meta")  # latin-1 labels MEAN cp1252
    assert "café" in text
    http_equiv = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=utf-8">'
        b"caf\xc3\xa9"
    )
    assert decode_payload(http_equiv)[1:] == ("utf-8", "meta")


def test_fallback_and_strict_utf8():
    assert decode_payload("plain utf-8 café".encode())[1:] == ("utf-8", "utf-8")
    # invalid utf-8 without any declaration -> cp1252 fallback
    text, enc, how = decode_payload(b"r\xe9sum\xe9")
    assert (enc, how) == ("cp1252", "fallback")
    assert text == "résumé"
    # empty payload
    assert decode_payload(b"") == ("", "utf-8", "utf-8")


def test_never_throws_on_garbage():
    text, enc, how = decode_payload(bytes(range(256)))
    assert isinstance(text, str) and enc == "cp1252"
