"""Unicode script-mix operator tests (operators/unicode_scripts.py)."""

from __future__ import annotations

import numpy as np

from stream_processing_platform_spark.operators.unicode_scripts import (
    SCRIPT_NAMES,
    dominant_script,
    script_counts,
)


def test_counts_by_script():
    c = script_counts("abcXYZ Привет 中文 こんにちは ١٢٣")
    d = dict(zip(SCRIPT_NAMES, c))
    assert d["latin"] == 6
    assert d["cyrillic"] == 6
    assert d["cjk"] == 2
    assert d["kana"] == 5
    # Arabic-Indic DIGITS are inside the Arabic block (block-based
    # classification — documented approximation)
    assert d["arabic"] == 3


def test_dominant_and_tiebreak():
    assert dominant_script(script_counts("hello Привет")) in ("latin", "cyrillic")
    # exact tie -> first script in table order wins (latin before cyrillic)
    c = script_counts("abc Где")
    assert c[0] == c[1] == 3
    assert dominant_script(c) == "latin"
    # no script characters at all
    assert dominant_script(script_counts("1234 .,!? \n")) == "none"
    assert dominant_script(script_counts("")) == "none"


def test_astral_plane_and_accents():
    # emoji (astral plane) classify as no script; accented latin counts
    c = script_counts("\U0001F600\U0001F680 café")
    d = dict(zip(SCRIPT_NAMES, c))
    assert d["latin"] == 4  # c a f é (é is 0xE9, in 0xC0-0x24F)
    assert c.sum() == 4


def test_counts_match_naive_loop():
    """The vectorized searchsorted bucketing must equal a per-char
    reference loop over the same range table."""
    from stream_processing_platform_spark.operators.unicode_scripts import (
        SCRIPT_RANGES,
    )

    s = "mixed Ελληνικά text עם עברית and देवनागरी plus ไทย 한국어 仮名かな"
    ref = np.zeros(len(SCRIPT_RANGES), dtype=np.int64)
    for ch in s:
        cp = ord(ch)
        for i, (_, ranges) in enumerate(SCRIPT_RANGES):
            if any(lo <= cp <= hi for lo, hi in ranges):
                ref[i] += 1
                break
    assert (script_counts(s) == ref).all()


def test_fixture_snippets_dominate_their_script():
    """Each non-empty fixture snippet must out-count the 12-char ASCII
    tail it is paired with, so q_script_mix genuinely exercises every
    script class (the r11 degenerate-fixture lesson)."""
    from stream_processing_platform_spark.queries.text import _SCRIPT_SNIPPETS

    expected = (
        "latin", "cyrillic", "greek", "arabic", "hebrew",
        "devanagari", "thai", "hangul", "kana", "cjk",
    )
    for snip, exp in zip(_SCRIPT_SNIPPETS, expected):
        raw = snip + " abcdefghijkl"  # worst-case all-letter tail
        assert dominant_script(script_counts(raw)) == exp, (snip, exp)


def test_r13_extended_script_blocks():
    """Each appended primary block classifies its own fixture snippet
    as dominant (Armenian through Khmer), and the appended order keeps
    the r12 ten stable (tie-break order is APPEND-only)."""
    from stream_processing_platform_spark.operators.unicode_scripts import (
        SCRIPT_NAMES,
        dominant_script,
        script_counts,
    )
    from stream_processing_platform_spark.queries.text import _SCRIPT_SNIPPETS

    assert SCRIPT_NAMES[:10] == (
        "latin", "cyrillic", "greek", "arabic", "hebrew", "devanagari",
        "thai", "hangul", "kana", "cjk",
    )
    assert len(_SCRIPT_SNIPPETS) == len(SCRIPT_NAMES)
    for i, snippet in enumerate(_SCRIPT_SNIPPETS):
        if i == 0:
            assert dominant_script(script_counts(snippet)) == "none"
        else:
            assert dominant_script(script_counts(snippet)) == SCRIPT_NAMES[i], i
    # spot checks on block membership at the edges
    c = script_counts("԰֏ក៿က႟")
    names = dict(zip(SCRIPT_NAMES, c))
    assert names["armenian"] == 2 and names["khmer"] == 2 and names["myanmar"] == 2
