"""Unicode script-mix detection — the langid PREFILTER stage of web
corpus curation (Common Crawl pipelines bucket pages by dominant script
before running a per-language model; mixed-script pages are a spam /
encoding-error signal).

Classification is BLOCK-based over the primary Unicode block of each
major script — an honest approximation (full per-codepoint Script=
property data is a UCD data file, same doctrine as the PSL: the table
below is the snapshot; a deployment can extend SCRIPT_RANGES from
Scripts.txt without touching the algorithm). Characters outside every
range (ASCII digits, punctuation, space, emoji) count toward no script.

Spark side: one Arrow mapInPandas pass; codepoints come from
``numpy.frombuffer(s.encode('utf-32-le'))`` — fully vectorized, no
per-char Python loop (the winnow lesson: per-element math belongs in
numpy, not interpreted HOF lambdas). Bucketing is one ``searchsorted``
over the flattened range bounds per document.

The duckdb oracle counts with its OWN ``unicode()`` per char against
the SAME range table (generated-oracle doctrine for the table, true
cross-engine for the codepoint extraction).

The reference platform has no Unicode surface (SURVEY §2.8); this is
north-star LLM-pipeline capability beside q_lang_id / q_unicode_nfc.
"""

from __future__ import annotations

import numpy as np

# (script, ((lo, hi), ...)) — primary blocks, ordered; the ORDER is the
# dominant-script tie-break (first max wins) on BOTH engines. New
# scripts therefore APPEND (existing dominance outcomes stay stable).
# r13 extends the r12 ten with fifteen more primary blocks (all
# standard public knowledge at block level — no UCD file needed):
# Armenian, Georgian, the nine remaining major Indic blocks, Ethiopic,
# Myanmar, Khmer, Lao.
SCRIPT_RANGES: tuple[tuple[str, tuple[tuple[int, int], ...]], ...] = (
    ("latin", ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F))),
    ("cyrillic", ((0x400, 0x4FF),)),
    ("greek", ((0x370, 0x3FF),)),
    ("arabic", ((0x600, 0x6FF),)),
    ("hebrew", ((0x590, 0x5FF),)),
    ("devanagari", ((0x900, 0x97F),)),
    ("thai", ((0xE00, 0xE7F),)),
    ("hangul", ((0xAC00, 0xD7AF),)),
    ("kana", ((0x3040, 0x30FF),)),
    ("cjk", ((0x4E00, 0x9FFF),)),
    # --- r13 additions (appended: tie-break order preserved) ---
    ("armenian", ((0x530, 0x58F),)),
    ("georgian", ((0x10A0, 0x10FF),)),
    ("bengali", ((0x980, 0x9FF),)),
    ("gurmukhi", ((0xA00, 0xA7F),)),
    ("gujarati", ((0xA80, 0xAFF),)),
    ("oriya", ((0xB00, 0xB7F),)),
    ("tamil", ((0xB80, 0xBFF),)),
    ("telugu", ((0xC00, 0xC7F),)),
    ("kannada", ((0xC80, 0xCFF),)),
    ("malayalam", ((0xD00, 0xD7F),)),
    ("sinhala", ((0xD80, 0xDFF),)),
    ("lao", ((0xE80, 0xEFF),)),
    ("ethiopic", ((0x1200, 0x137F),)),
    ("myanmar", ((0x1000, 0x109F),)),
    ("khmer", ((0x1780, 0x17FF),)),
)

SCRIPT_NAMES = tuple(name for name, _ in SCRIPT_RANGES)

# flattened ascending interval bounds for one searchsorted pass:
# bounds[2i] = lo_i, bounds[2i+1] = hi_i + 1; a codepoint landing at an
# ODD insertion index is inside interval i = (idx - 1) // 2.
_FLAT: list[tuple[int, int, int]] = []  # (lo, hi, script_idx)
for _i, (_n, _ranges) in enumerate(SCRIPT_RANGES):
    for _lo, _hi in _ranges:
        _FLAT.append((_lo, _hi, _i))
_FLAT.sort()
_BOUNDS = np.array([b for lo, hi, _ in _FLAT for b in (lo, hi + 1)], dtype=np.uint32)
_INTERVAL_SCRIPT = np.array([s for _, _, s in _FLAT], dtype=np.int64)


def script_counts(s: str) -> np.ndarray:
    """Per-script codepoint counts for one string (len(SCRIPT_RANGES)
    ints), vectorized: utf-32 view -> one searchsorted -> bincount."""
    if not s:
        return np.zeros(len(SCRIPT_RANGES), dtype=np.int64)
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    idx = np.searchsorted(_BOUNDS, cp, side="right")
    inside = (idx & 1) == 1
    scripts = _INTERVAL_SCRIPT[(idx[inside] - 1) >> 1]
    return np.bincount(scripts, minlength=len(SCRIPT_RANGES)).astype(np.int64)


def dominant_script(counts: np.ndarray) -> str:
    """First-max script name, 'none' when no script character occurs —
    the same tie-break the generated SQL CASE encodes."""
    if counts.max(initial=0) == 0:
        return "none"
    return SCRIPT_NAMES[int(np.argmax(counts))]


def script_mix(df, text_col: str, id_cols: list[str] | None = None):
    """DataFrame operator: ``id_cols + n_<script>... + dominant_script
    + n_scripts`` per row. One Arrow map, zero shuffle — scan-speed at
    100 TB."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ids = id_cols or ["doc_id"]
    src = df.select(*ids, text_col)
    schema = StructType(
        [src.schema[c] for c in ids]
        + [StructField(f"n_{n}", LongType(), False) for n in SCRIPT_NAMES]
        + [
            StructField("dominant_script", StringType(), False),
            StructField("n_scripts", LongType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            mat = np.stack([script_counts(s) for s in pdf[text_col]])
            out = pdf[ids].copy()
            for j, n in enumerate(SCRIPT_NAMES):
                out[f"n_{n}"] = mat[:, j]
            out["dominant_script"] = [dominant_script(r) for r in mat]
            out["n_scripts"] = (mat > 0).sum(axis=1).astype("int64")
            yield out

    return src.mapInPandas(run, schema)


# ------------------------------------------------------- SQL generation


def _range_pred_sql(ranges: tuple[tuple[int, int], ...]) -> str:
    return " OR ".join(f"(x BETWEEN {lo} AND {hi})" for lo, hi in ranges)


def script_counts_sql(raw_expr: str) -> dict[str, str]:
    """duckdb per-script count expressions over the SAME range table.
    Codepoints come from duckdb's own unicode() per char (true
    cross-engine extraction). '.' with the 's' flag so newlines inside
    documents are classified too (they land in no range either way)."""
    cp = f"list_transform(regexp_extract_all({raw_expr}, '(?s).'), c -> unicode(c))"
    return {
        f"n_{name}": (
            f"CAST(len(list_filter({cp}, x -> {_range_pred_sql(ranges)})) AS BIGINT)"
        )
        for name, ranges in SCRIPT_RANGES
    }


def dominant_script_sql() -> str:
    """CASE chain over already-projected n_<script> columns encoding
    first-max-wins, 'none' when all counts are zero — the same order
    and tie-break as :func:`dominant_script`."""
    whens = []
    for i, name in enumerate(SCRIPT_NAMES):
        others = " AND ".join(
            f"n_{name} >= n_{o}" for o in SCRIPT_NAMES if o != name
        )
        whens.append(f"WHEN n_{name} > 0 AND {others} THEN '{name}'")
    return "CASE " + " ".join(whens) + " ELSE 'none' END"
