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


def test_whatwg_major_encodings_round_trip():
    """r13: every WHATWG major-encoding label decodes its own script
    losslessly via a meta declaration."""
    from stream_processing_platform_spark.functions.charset import (
        decode_payload,
    )

    cases = [
        ("shift_jis", "shift_jis", "日本語テスト"),
        ("sjis", "shift_jis", "日本語"),
        ("windows-31j", "shift_jis", "日本語"),
        ("x-euc-jp", "euc_jp", "日本語テスト"),
        ("euc-kr", "cp949", "한국어 시험"),
        ("korean", "cp949", "한국어"),
        ("gb2312", "gbk", "中文测试"),  # WHATWG: gb2312 means GBK
        ("gbk", "gbk", "中文测试"),
        ("gb18030", "gb18030", "中文测试"),
        ("big5", "big5", "中文測試"),
        ("koi8-r", "koi8_r", "русский текст"),
        ("koi8", "koi8_r", "русский"),
        ("windows-1251", "cp1251", "русский текст"),
        ("iso-8859-5", "iso8859-5", "кириллица"),
        ("cyrillic", "iso8859-5", "кириллица"),
        ("latin2", "iso8859-2", "žluťoučký kůň"),
        ("iso-8859-7", "iso8859-7", "ελληνικά"),
        ("greek", "iso8859-7", "ελληνικά"),
        ("iso-8859-9", "cp1254", "Türkçe sınama"),  # means windows-1254
        ("latin5", "cp1254", "Türkçe"),
        ("iso-8859-15", "iso8859-15", "euro € sign"),
        ("latin9", "iso8859-15", "euro €"),
        ("windows-1255", "cp1255", "עברית"),
        ("windows-1256", "cp1256", "عربي"),
        ("windows-1257", "cp1257", "lietuvių"),
        ("windows-874", "cp874", "ไทย"),
        ("tis-620", "cp874", "ไทย"),
        ("macintosh", "mac_roman", "café résumé"),
    ]
    for label, codec, sample in cases:
        body = f'<meta charset="{label}">{sample} tail'
        text, enc, how = decode_payload(body.encode(codec))
        assert (text, enc, how) == (body, codec, "meta"), label


def test_utf16_meta_label_means_utf8():
    """WHATWG: a meta-declared UTF-16 label decodes as UTF-8 (real
    UTF-16 is caught by the BOM step, which still wins)."""
    from stream_processing_platform_spark.functions.charset import (
        decode_payload,
    )

    body = '<meta charset="utf-16">não utf-16 at all'
    text, enc, how = decode_payload(body.encode("utf-8"))
    assert (text, enc, how) == (body, "utf-8", "meta")
    # BOM still beats the (lying) meta declaration
    text2, enc2, how2 = decode_payload(b"\xff\xfe" + body.encode("utf-16-le"))
    assert (text2, enc2, how2) == (body, "utf-16-le", "bom")
