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

# labels a crawl actually carries -> python codec names, following the
# WHATWG Encoding Standard's labels table (r13: extended from the
# latin/utf-8 subset to the major-encodings set — every target is a
# Python stdlib codec). Deterministic-subset choices, documented:
# - latin-1/iso-8859-1 labels MEAN cp1252 (the WHATWG superset rule);
#   likewise iso-8859-9 labels mean windows-1254 and euc-kr/korean
#   labels mean windows-949 (cp949), per the same table;
# - a meta-declared UTF-16 label decodes as UTF-8 (WHATWG: BOM-less
#   "utf-16" content on the web is almost always mislabeled UTF-8;
#   real UTF-16 is caught by the BOM step before meta). That
#   reinterpretation is specific to IN-DOCUMENT declarations — a
#   document whose bytes ARE BOM-less UTF-16 cannot carry a readable
#   ASCII meta tag, so the label must be lying. A TRANSPORT-layer
#   (Content-Type) utf-16 label has no such contradiction and is
#   honored as the named codec (_TRANSPORT_OVERRIDES below; WHATWG
#   maps the bare "utf-16" label to UTF-16LE) — r13 ADVICE;
# - Shift_JIS maps to Python's shift_jis and Big5 to big5 (WHATWG
#   prescribes the windows-31j / HKSCS supersets; the stdlib base
#   codecs differ only on vendor-extension code points).
_ALIASES = {
    # utf-8 family
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "ascii": "utf-8",  # ascii is a utf-8 subset
    "us-ascii": "utf-8",
    "utf-16": "utf-8",  # WHATWG: UTF-16 meta labels decode as UTF-8
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
    # windows-1252 family (the latin-1-means-cp1252 rule)
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "l1": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "iso_8859-1": "cp1252",
    "windows-1252": "cp1252",
    "x-cp1252": "cp1252",
    "cp1252": "cp1252",
    "cp819": "cp1252",
    "ibm819": "cp1252",
    "csisolatin1": "cp1252",
    # Japanese
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "csshiftjis": "shift_jis",
    "windows-31j": "shift_jis",
    "euc-jp": "euc_jp",
    "x-euc-jp": "euc_jp",
    "cseucpkdfmtjapanese": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    "csiso2022jp": "iso2022_jp",
    # Korean (WHATWG euc-kr == windows-949)
    "euc-kr": "cp949",
    "korean": "cp949",
    "windows-949": "cp949",
    "ks_c_5601-1987": "cp949",
    "ks_c_5601-1989": "cp949",
    "ksc_5601": "cp949",
    "csksc56011987": "cp949",
    "iso-ir-149": "cp949",
    # Chinese
    "gbk": "gbk",
    "gb2312": "gbk",  # WHATWG: gb2312 labels mean GBK
    "gb_2312": "gbk",
    "gb_2312-80": "gbk",
    "chinese": "gbk",
    "csgb2312": "gbk",
    "csiso58gb231280": "gbk",
    "x-gbk": "gbk",
    "iso-ir-58": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "big5-hkscs": "big5",
    "cn-big5": "big5",
    "csbig5": "big5",
    "x-x-big5": "big5",
    # Cyrillic
    "koi8-r": "koi8_r",
    "koi8": "koi8_r",
    "koi": "koi8_r",
    "cskoi8r": "koi8_r",
    "koi8-u": "koi8_u",
    "koi8-ru": "koi8_u",
    "windows-1251": "cp1251",
    "x-cp1251": "cp1251",
    "cp1251": "cp1251",
    "iso-8859-5": "iso8859-5",
    "iso8859-5": "iso8859-5",
    "iso_8859-5": "iso8859-5",
    "cyrillic": "iso8859-5",
    "csisolatincyrillic": "iso8859-5",
    # Central European
    "iso-8859-2": "iso8859-2",
    "iso8859-2": "iso8859-2",
    "iso_8859-2": "iso8859-2",
    "latin2": "iso8859-2",
    "l2": "iso8859-2",
    "csisolatin2": "iso8859-2",
    "windows-1250": "cp1250",
    "x-cp1250": "cp1250",
    "cp1250": "cp1250",
    # Greek
    "iso-8859-7": "iso8859-7",
    "iso8859-7": "iso8859-7",
    "iso_8859-7": "iso8859-7",
    "greek": "iso8859-7",
    "greek8": "iso8859-7",
    "elot_928": "iso8859-7",
    "ecma-118": "iso8859-7",
    "sun_eu_greek": "iso8859-7",
    "csisolatingreek": "iso8859-7",
    "windows-1253": "cp1253",
    "x-cp1253": "cp1253",
    "cp1253": "cp1253",
    # Turkish (WHATWG iso-8859-9 == windows-1254)
    "iso-8859-9": "cp1254",
    "iso8859-9": "cp1254",
    "iso_8859-9": "cp1254",
    "latin5": "cp1254",
    "l5": "cp1254",
    "csisolatin5": "cp1254",
    "windows-1254": "cp1254",
    "x-cp1254": "cp1254",
    "cp1254": "cp1254",
    # latin-9 / euro
    "iso-8859-15": "iso8859-15",
    "iso8859-15": "iso8859-15",
    "iso_8859-15": "iso8859-15",
    "latin9": "iso8859-15",
    "l9": "iso8859-15",
    "csisolatin9": "iso8859-15",
    # Hebrew / Arabic / Baltic / Vietnamese / Thai
    "windows-1255": "cp1255",
    "x-cp1255": "cp1255",
    "cp1255": "cp1255",
    "windows-1256": "cp1256",
    "x-cp1256": "cp1256",
    "cp1256": "cp1256",
    "windows-1257": "cp1257",
    "x-cp1257": "cp1257",
    "cp1257": "cp1257",
    "windows-1258": "cp1258",
    "x-cp1258": "cp1258",
    "cp1258": "cp1258",
    "windows-874": "cp874",
    "dos-874": "cp874",
    "tis-620": "cp874",
    "iso-8859-11": "cp874",
    "iso8859-11": "cp874",
    # mac
    "macintosh": "mac_roman",
    "x-mac-roman": "mac_roman",
    "mac": "mac_roman",
    "csmacintosh": "mac_roman",
}

# Transport-layer ONLY: an out-of-band utf-16 label is honored as the
# named codec (an honest BOM-less UTF-16 body can carry it), unlike a
# meta label, which a BOM-less UTF-16 document could not have made
# ASCII-readable. WHATWG maps the bare "utf-16" label to UTF-16LE.
_TRANSPORT_OVERRIDES = {
    "utf-16": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_charset(
    b: bytes, transport_label: str | None = None
) -> tuple[str, int, str]:
    """``(encoding, bom_bytes, how)`` for a raw payload, where ``how``
    is 'bom' | 'header' | 'meta' | 'utf-8' | 'fallback'. Deterministic.
    ``transport_label`` is an out-of-band charset label (the HTTP
    Content-Type parameter — functions/httpheaders.py); per the WHATWG
    precedence it ranks above an in-document meta declaration and
    below a BOM. An unrecognized label falls through to the in-band
    steps."""
    for bom, enc in _BOMS:
        if b.startswith(bom):
            return enc, len(bom), "bom"
    if transport_label:
        lbl = transport_label.lower()
        enc = _TRANSPORT_OVERRIDES.get(lbl) or _ALIASES.get(lbl)
        if enc is not None:
            return enc, 0, "header"
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


def decode_payload(
    b: bytes, transport_label: str | None = None
) -> tuple[str, str, str]:
    """``(text, encoding, how)``: sniff then decode, BOM stripped,
    undecodable bytes replaced (U+FFFD) so the pipe never throws —
    the engine-wide UDF error policy (SURVEY.md §7 risk 4).
    ``transport_label`` forwards to :func:`sniff_charset` (the HTTP
    Content-Type charset, ranked below a BOM, above meta)."""
    enc, skip, how = sniff_charset(b, transport_label)
    return b[skip:].decode(enc, "replace"), enc, how
