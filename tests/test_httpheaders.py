"""HTTP response parser tests (functions/httpheaders.py) + the WHATWG
transport-layer charset precedence (functions/charset.py 'header')."""

from __future__ import annotations

from stream_processing_platform_spark.functions.charset import (
    decode_payload,
    sniff_charset,
)
from stream_processing_platform_spark.functions.httpheaders import (
    decode_http_body,
    parse_http_response,
)


def test_status_headers_and_first_occurrence_rule():
    r = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Set-Cookie: a=1\r\nSet-Cookie: b=2\r\nContent-Length: 5\r\n\r\nhello"
    )
    assert (r.status, r.reason) == (200, "OK")
    assert r.charset_label == "utf-8" and r.content_length == 5
    assert r.header("set-cookie") == "a=1"  # FIRST occurrence
    assert len(r.headers) == 4  # duplicates all retained
    assert r.body == b"hello"


def test_lf_only_endings_and_invalid_length():
    r = parse_http_response(
        b"HTTP/1.0 500 Oops\nX: 1\nContent-Length: nan\n\nbody"
    )
    assert r.status == 500 and r.body == b"body"
    assert r.content_length == -1


def test_non_http_payload_never_throws():
    r = parse_http_response(b"\x89PNG\r\n\x1a\n....")
    assert r.status == -1 and r.body.startswith(b"\x89PNG")
    assert parse_http_response(b"").status == -1


def test_quoted_charset_and_alias_rule():
    r = parse_http_response(
        b'HTTP/1.1 200 OK\r\nContent-Type: text/html; charset="ISO-8859-1"\r\n\r\n'
        + "café".encode("cp1252")
    )
    assert r.charset_label == "iso-8859-1"
    text, enc, how, status = decode_http_body(
        b'HTTP/1.1 200 OK\r\nContent-Type: x; charset="ISO-8859-1"\r\n\r\n'
        + "café".encode("cp1252")
    )
    assert (text, enc, how, status) == ("café", "cp1252", "header", 200)


def test_whatwg_precedence_bom_header_meta():
    body_meta = b'<meta charset="koi8-r">' + "текст".encode("koi8_r")
    # header (shift_jis is a lie here, but precedence is what's tested)
    t, e, h = decode_payload(body_meta, transport_label="koi8-r")
    assert (e, h) == ("koi8_r", "header")
    # meta wins when no transport label
    t, e, h = decode_payload(body_meta)
    assert (e, h) == ("koi8_r", "meta")
    # BOM beats the transport label
    t, e, h = decode_payload(b"\xef\xbb\xbfabc", transport_label="shift_jis")
    assert (e, h) == ("utf-8", "bom") and t == "abc"
    # unrecognized label falls through to the in-band steps
    t, e, h = sniff_charset(body_meta, transport_label="x-made-up")
    assert h == "meta"
