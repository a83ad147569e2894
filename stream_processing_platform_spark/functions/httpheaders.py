"""HTTP/1.x response parsing — the layer between a WARC ``response``
record's payload bytes and the charset/content pipeline: status line,
header fields, and the TRANSPORT-LAYER charset (the ``charset=``
parameter of ``Content-Type``), which the WHATWG encoding sniff ranks
ABOVE an in-document ``<meta charset>`` (and below a BOM).

Deterministic subset (documented choices):

- status line ``HTTP/<v> <code> <reason>``; a payload that does not
  start with ``HTTP/`` parses as status -1 with the whole payload as
  body (never throws — a crawl sees plenty of non-HTTP bytes);
- header block ends at the first empty line; both CRLF and bare-LF
  line endings are accepted (tolerant-reader rule); obs-fold (RFC 9112
  deprecated line folding) is NOT unfolded — a folded continuation
  line without a colon is skipped;
- header names lowercase for lookup; duplicate names all retained (in
  order) — ``header(name)`` returns the FIRST occurrence, the rule
  consumers apply to singleton fields like Content-Type;
- the charset label is regex-extracted from the Content-Type value,
  optional quotes stripped, lowercased; mapping to a codec goes
  through the shared WHATWG alias table (functions/charset.py).

The reference platform has no HTTP surface; north-star crawl
capability beside WARC/robots/sitemap/charset (SURVEY §2.1 family).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_STATUS_RE = re.compile(rb"^HTTP/\d\.\d[ \t]+(\d{3})[ \t]*([^\r\n]*)")
_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_.:\-]+)\"?", re.I)


@dataclass(frozen=True)
class HttpResponse:
    status: int  # -1 when the payload is not an HTTP response
    reason: str
    headers: tuple[tuple[str, str], ...]  # (lowercase-name, value), in order
    content_type: str  # full Content-Type value, '' when absent
    charset_label: str  # lowercased charset= parameter, '' when absent
    content_length: int  # parsed Content-Length, -1 when absent/invalid
    body: bytes

    def header(self, name: str) -> str:
        name = name.lower()
        for n, v in self.headers:
            if n == name:
                return v
        return ""


def parse_http_response(b: bytes) -> HttpResponse:
    m = _STATUS_RE.match(b)
    if m is None:
        return HttpResponse(-1, "", (), "", "", -1, b)
    status = int(m.group(1))
    reason = m.group(2).decode("latin-1", "replace").strip()
    # header block: up to the first empty line (CRLF or LF endings)
    sep_crlf = b.find(b"\r\n\r\n")
    sep_lf = b.find(b"\n\n")
    if sep_crlf >= 0 and (sep_lf < 0 or sep_crlf <= sep_lf):
        head, body = b[:sep_crlf], b[sep_crlf + 4:]
    elif sep_lf >= 0:
        head, body = b[:sep_lf], b[sep_lf + 2:]
    else:
        head, body = b, b""
    headers: list[tuple[str, str]] = []
    for line in head.split(b"\n")[1:]:  # [0] is the status line
        line = line.rstrip(b"\r")
        if b":" not in line:
            continue  # obs-fold continuations / garbage: skipped
        n, _, v = line.partition(b":")
        headers.append(
            (
                n.decode("latin-1", "replace").strip().lower(),
                v.decode("latin-1", "replace").strip(),
            )
        )
    hmap_first: dict[str, str] = {}
    for n, v in headers:
        hmap_first.setdefault(n, v)
    ctype = hmap_first.get("content-type", "")
    cm = _CHARSET_RE.search(ctype)
    label = cm.group(1).lower() if cm else ""
    try:
        clen = int(hmap_first.get("content-length", ""))
    except ValueError:
        clen = -1
    return HttpResponse(
        status, reason, tuple(headers), ctype, label, clen, body
    )


def decode_http_body(b: bytes) -> tuple[str, str, str, int]:
    """``(text, encoding, how, status)`` for a raw HTTP response
    payload: parse the envelope, then decode the body with the WHATWG
    precedence — BOM > transport-layer charset ('header') > meta >
    strict UTF-8 > cp1252 fallback. Non-HTTP payloads decode whole
    with status -1."""
    from stream_processing_platform_spark.functions.charset import (
        decode_payload,
    )

    r = parse_http_response(b)
    text, enc, how = decode_payload(r.body, transport_label=r.charset_label or None)
    return text, enc, how, r.status
