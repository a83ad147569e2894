"""From-scratch WARC (Web ARChive, ISO 28500) record codec.

WARC is the canonical LLM-pipeline input format — Common Crawl publishes
its crawls as ``.warc.gz`` (raw HTTP captures) and ``.wet.gz`` (plain-text
conversion records), and every large-scale curation stack (CCNet,
RefinedWeb, Dolma) starts by reading them. The reference platform ingests
only CSV/JSON/collection sources (taskmanager/operators/sources.py), so
this module is north-star surface beyond parity, implemented purely from
the public ISO 28500 / WARC 1.1 specification — no warcio or other
library.

Record framing (spec §4):

    WARC/1.0<CRLF>
    Name: value<CRLF>          (named fields, order not significant)
    ...<CRLF>
    <CRLF>                     (end of header block)
    <Content-Length bytes of body>
    <CRLF><CRLF>               (record terminator)

Gzip convention: Common Crawl compresses each record as its OWN gzip
member, concatenated — so a reader can resynchronize at member
boundaries without decompressing the whole file, and a plain
``gzip.open`` (which transparently reads concatenated members) sees the
logical record stream. ``write_warc(..., gzip_members=True)`` follows
that convention exactly; tests assert per-member decompressibility with
a raw ``zlib`` loop.

Everything here streams: ``decode_records`` reads header lines and then
exactly ``Content-Length`` body bytes from a buffered file object, so a
1 GB crawl segment is never materialized — the task working set is one
record.
"""

from __future__ import annotations

import gzip
import io
import uuid
from collections.abc import Iterable, Iterator

CRLF = b"\r\n"
_VERSIONS = (b"WARC/1.0", b"WARC/1.1")

# Canonical header emission order (spec examples' conventional order —
# readers must not care, but deterministic bytes make fixtures and
# round-trip tests exact).
_HEADER_ORDER = (
    "WARC-Type",
    "WARC-Record-ID",
    "WARC-Date",
    "WARC-Target-URI",
    "WARC-Warcinfo-ID",
    "WARC-Refers-To",
    "Content-Type",
)


def record_id_from(seed: str) -> str:
    """Deterministic ``urn:uuid:`` record id — UUIDv5 over the seed, so
    fixture WARCs built from the same rows are byte-identical."""
    return f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, seed)}>"


def encode_record(headers: dict[str, str], body: bytes, version: bytes = b"WARC/1.0") -> bytes:
    """Serialize one WARC record. ``Content-Length`` is computed here
    (never trusted from the caller); header names are emitted in the
    canonical order above, then any extras sorted."""
    if version not in _VERSIONS:
        raise ValueError(f"unsupported WARC version {version!r}")
    hdrs = {k: v for k, v in headers.items() if k != "Content-Length"}
    hdrs["Content-Length"] = str(len(body))
    names = [n for n in _HEADER_ORDER if n in hdrs]
    names += sorted(n for n in hdrs if n not in _HEADER_ORDER)
    out = bytearray(version + CRLF)
    for n in names:
        v = hdrs[n]
        if "\r" in v or "\n" in v:
            raise ValueError(f"header {n!r} value contains CR/LF")
        out += f"{n}: {v}".encode() + CRLF
    out += CRLF + body + CRLF + CRLF
    return bytes(out)


def _open_stream(fileobj: io.BufferedIOBase) -> io.BufferedIOBase:
    """Sniff the gzip magic and wrap if needed. ``gzip.GzipFile`` reads
    concatenated members transparently, which is exactly the
    member-per-record layout."""
    head = fileobj.peek(2)[:2] if hasattr(fileobj, "peek") else b""
    if head == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=fileobj))  # type: ignore[arg-type]
    return fileobj


def decode_records(fileobj: io.BufferedIOBase) -> Iterator[tuple[dict[str, str], bytes]]:
    """Stream ``(headers, body)`` pairs from a plain or gzipped WARC.

    Strict about framing (a corrupt Content-Length would silently
    desynchronize every later record): requires the version line, a
    parseable integer Content-Length, the full body, and the CRLF CRLF
    terminator."""
    f = _open_stream(fileobj)
    while True:
        line = f.readline()
        if not line:
            return
        if line in (CRLF, b"\n"):  # tolerate stray blank lines between records
            continue
        version = line.rstrip(b"\r\n")
        if version not in _VERSIONS:
            raise ValueError(f"bad WARC version line: {line!r}")
        headers: dict[str, str] = {}
        last: str | None = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError("truncated WARC header block")
            if line in (CRLF, b"\n"):
                break
            if line[:1] in (b" ", b"\t") and last is not None:
                # spec §4: long values may fold onto continuation lines
                headers[last] += " " + line.strip().decode("utf-8", "replace")
                continue
            name, _, value = line.rstrip(b"\r\n").partition(b":")
            last = name.decode("ascii").strip()
            headers[last] = value.decode("utf-8", "replace").strip()
        try:
            n = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"missing/bad Content-Length in {headers}") from e
        body = f.read(n)
        if len(body) != n:
            raise ValueError(f"truncated body: wanted {n}, got {len(body)}")
        term = f.read(4)
        if term != CRLF + CRLF:
            raise ValueError(f"bad record terminator {term!r}")
        yield headers, body


def write_warc(
    path: str,
    records: Iterable[tuple[dict[str, str], bytes]],
    gzip_members: bool = False,
) -> int:
    """Write records to ``path``; one gzip member per record when
    ``gzip_members`` (the Common Crawl layout). Returns record count."""
    n = 0
    with open(path, "wb") as fh:
        for headers, body in records:
            raw = encode_record(headers, body)
            if gzip_members:
                # mtime=0: deterministic member bytes (fixture doctrine)
                raw = gzip.compress(raw, mtime=0)
            fh.write(raw)
            n += 1
    return n


def split_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an ``application/http; msgtype=response`` record body into
    (status, headers, entity body). Returns status 0 for bodies that do
    not start with an HTTP status line (resource/conversion records)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return 0, {}, payload
    lines = head.split(CRLF)
    first = lines[0].split(None, 2)
    if len(first) < 2 or not first[0].startswith(b"HTTP/"):
        return 0, {}, payload
    try:
        status = int(first[1])
    except ValueError:
        return 0, {}, payload
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        name, _, value = ln.partition(b":")
        if _:
            headers[name.decode("ascii", "replace").strip()] = value.decode(
                "utf-8", "replace"
            ).strip()
    return status, headers, body
