"""Charset sniffing + byte→text decoding — the step between a crawl
payload (WARC `content` bytes) and every text operator in the engine.
Real crawl bytes arrive with no reliable encoding label; the standard
recipe (what the WHATWG encoding sniff and every production ingester
do, simplified to its deterministic core) is:

1. Byte-order mark: UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE;
2. `<meta charset=...>` / `http-equiv` declaration in the first 1 KiB;
3. strict UTF-8 attempt, falling back to cp1252 (the de-facto meaning
   of mislabeled "latin-1" on the web).

Everything is deterministic (no statistical model), so the Spark query
over it carries a FULL oracle: the fixture encodes known text per
residue class and the oracle reconstructs the expected decode in SQL.

The reference platform has no byte-ingest surface (SURVEY §2.1's CSV/
JSON readers assume text); this is north-star crawl capability beside
the WARC source.
"""

from __future__ import annotations

import re

# checked longest-first: UTF-32 BOMs contain the UTF-16 ones as prefixes
_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?|content\s*=\s*["'][^"']*charset=)"""
    rb"""([a-zA-Z0-9_\-]+)""",
    re.IGNORECASE,
)

# labels a crawl actually carries -> python codec names
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin1": "cp1252",  # the WHATWG rule: latin-1 labels MEAN cp1252
    "latin-1": "cp1252",
    "iso-8859-1": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "utf-8",  # ascii is a utf-8 subset
    "us-ascii": "utf-8",
}


def sniff_charset(b: bytes) -> tuple[str, int, str]:
    """``(encoding, bom_bytes, how)`` for a raw payload, where ``how``
    is 'bom' | 'meta' | 'utf-8' | 'fallback'. Deterministic."""
    for bom, enc in _BOMS:
        if b.startswith(bom):
            return enc, len(bom), "bom"
    m = _META_RE.search(b[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        enc = _ALIASES.get(label)
        if enc is not None:
            return enc, 0, "meta"
    try:
        b.decode("utf-8", "strict")
        return "utf-8", 0, "utf-8"
    except UnicodeDecodeError:
        return "cp1252", 0, "fallback"


def decode_payload(b: bytes) -> tuple[str, str, str]:
    """``(text, encoding, how)``: sniff then decode, BOM stripped,
    undecodable bytes replaced (U+FFFD) so the pipe never throws —
    the engine-wide UDF error policy (SURVEY.md §7 risk 4)."""
    enc, skip, how = sniff_charset(b)
    return b[skip:].decode(enc, "replace"), enc, how
