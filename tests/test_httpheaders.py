"""HTTP response parser tests (functions/httpheaders.py) + the WHATWG
transport-layer charset precedence (functions/charset.py 'header')."""

from __future__ import annotations

from stream_processing_platform_spark.functions.charset import (
    decode_payload,
    sniff_charset,
)
from stream_processing_platform_spark.functions.httpheaders import (
    dechunk,
    decode_http_body,
    decompress_body,
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


def test_transport_utf16_label_honored():
    # r13 ADVICE #1: a BOM-less UTF-16 body with an honest transport
    # label decodes as UTF-16 — the utf-16-means-utf-8 reinterpretation
    # is meta-only (a UTF-16 document can't carry an ASCII meta tag).
    body = "héllo wörld".encode("utf-16-le")
    t, e, h = decode_payload(body, transport_label="utf-16le")
    assert (t, e, h) == ("héllo wörld", "utf-16-le", "header")
    t, e, h = decode_payload("bë".encode("utf-16-be"), transport_label="UTF-16BE")
    assert (t, e, h) == ("bë", "utf-16-be", "header")
    # the bare utf-16 label means UTF-16LE (WHATWG labels table)
    t, e, h = decode_payload(body, transport_label="utf-16")
    assert (e, h) == ("utf-16-le", "header")
    # the META path keeps the WHATWG utf-16-means-utf-8 rule
    meta = b'<meta charset="utf-16">plain utf-8 text'
    t, e, h = decode_payload(meta)
    assert (e, h) == ("utf-8", "meta")


def test_mixed_lf_crlf_header_terminator():
    # r13 ADVICE #2: LF header lines closed by '\n\r\n' — neither
    # '\r\n\r\n' nor '\n\n' exists, but the regex boundary matches.
    r = parse_http_response(
        b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\r\nthe body"
    )
    assert r.status == 200 and r.body == b"the body"
    assert r.content_type == "text/plain"


def test_dechunk_frames_extensions_and_trailers():
    assert dechunk(b"5\r\nhello\r\n6;ext=v\r\n world\r\n0\r\nX-T: t\r\n\r\n") == b"hello world"
    # tolerant bare-LF chunk endings
    assert dechunk(b"3\nabc\n0\n\n") == b"abc"
    # malformed size line: best-effort partial assembly, never throws
    assert dechunk(b"5\r\nhello\r\nzz\r\ngarbage") == b"hello"
    # truncated final chunk keeps the partial data
    assert dechunk(b"ff\r\nshort") == b"short"
    assert dechunk(b"") == b""
    # missing post-chunk separator: STOP — chunk data must never be
    # reinterpreted as a size line (r14 review: '3\\r\\nabcdef...' used
    # to fabricate b'abc0\\r\\n\\r\\n' by reading 'def' as hex 0xdef)
    assert dechunk(b"3\r\nabcdef\r\n0\r\n\r\n") == b"abc"


def test_decompress_gzip_deflate_and_fallbacks():
    import gzip
    import zlib

    assert decompress_body(gzip.compress(b"abc", mtime=0), "gzip") == b"abc"
    assert decompress_body(zlib.compress(b"abc"), "deflate") == b"abc"
    raw = zlib.compressobj(wbits=-15)
    assert decompress_body(raw.compress(b"abc") + raw.flush(), "deflate") == b"abc"
    # unknown codings and corrupt streams pass through untouched
    assert decompress_body(b"abc", "br") == b"abc"
    assert decompress_body(b"\x00corrupt", "gzip") == b"\x00corrupt"


def test_content_encoding_comma_list():
    # 'gzip, identity' (real servers emit this) must still inflate —
    # decoded_body_bytes tokenizes CE and undoes right-to-left (r14)
    import gzip

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: gzip, identity\r\n\r\n"
        + gzip.compress(b"listed coding body", mtime=0)
    )
    t, e, h, s = decode_http_body(payload)
    assert (t, s) == ("listed coding body", 200)
    # 'identity, gzip' (stacked order) also inflates
    payload2 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: identity, gzip\r\n\r\n"
        + gzip.compress(b"stacked body", mtime=0)
    )
    assert decode_http_body(payload2)[0] == "stacked body"


def test_decode_http_body_transport_layers():
    import gzip

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n"
    )
    z = gzip.compress("chünked gzip ✓".encode("utf-8"), mtime=0)
    mid = len(z) // 2
    chunks = (
        format(mid, "x").encode() + b"\r\n" + z[:mid] + b"\r\n"
        + format(len(z) - mid, "x").encode() + b";e=1\r\n" + z[mid:]
        + b"\r\n0\r\n\r\n"
    )
    t, e, h, s = decode_http_body(payload + chunks)
    assert (t, e, h, s) == ("chünked gzip ✓", "utf-8", "header", 200)
