"""Trained language ID (r13; 7 Latin classes since r14): accuracy gate
vs the marker baseline.

The fixture's TRUE language is doc_id % 7 (never shown to training —
weak labels come from the marker lexicon only), so accuracy is
measurable exactly. The trained model must recover the no-marker docs
the lexicon maps to 'und' (~12%) and beat the baseline by a wide
margin; both thresholds hold at every oracle SF.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_lexicons_unique_except_internet():
    """Every fixture word belongs to exactly one language except the
    deliberate 'internet' collision — accidental overlap would blur
    the class boundary the accuracy gate measures."""
    from stream_processing_platform_spark.queries.text import (
        _LID_LANGS,
        _LID_WORDS,
    )
    from stream_processing_platform_spark.functions.text import LANG_MARKERS

    seen: dict[str, str] = {}
    for lang in _LID_LANGS:
        assert _LID_WORDS[lang][:3] == LANG_MARKERS[lang]  # markers lead
        for w in _LID_WORDS[lang]:
            if w == "internet":
                continue
            assert w not in seen, f"{w!r} in both {seen.get(w)} and {lang}"
            seen[w] = lang


def test_trained_beats_marker_baseline(spark):
    from stream_processing_platform_spark.queries.text import (
        _LID_LANGS,
        q_lang_id_trained,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = q_lang_id_trained(spark, sf)
    truth = F.element_at(
        F.array(*[F.lit(c) for c in _LID_LANGS]),
        (F.col("doc_id") % len(_LID_LANGS) + 1).cast("int"),
    )
    agg = out.select(
        (F.col("lang_weak") == truth).cast("int").alias("weak_ok"),
        (F.col("lang_trained") == truth).cast("int").alias("trained_ok"),
        (F.col("lang_weak") == "und").cast("int").alias("und"),
    ).agg(
        F.avg("weak_ok").alias("weak_acc"),
        F.avg("trained_ok").alias("trained_acc"),
        F.sum("und").alias("n_und"),
        F.count("*").alias("n"),
    ).collect()[0]
    # the weak labeler has a real blind spot (docs with no marker word)
    assert agg["n_und"] > 0
    assert agg["weak_acc"] < 0.95
    # the trained model recovers it and clearly beats the baseline
    assert agg["trained_acc"] >= 0.95
    assert agg["trained_acc"] > agg["weak_acc"] + 0.05


def test_ovr_fit_matches_binary_fit(spark):
    """The fused one-vs-rest fit is pinned weight-identical to seven
    independent binary fits (it must be: the oracle replays the
    BINARY trajectory per class)."""
    from stream_processing_platform_spark.operators import classifier as C
    from stream_processing_platform_spark.queries.text import (
        _LID_DIM,
        _LID_LANGS,
        _lid_synth_col,
        _lid_trigrams,
    )
    from stream_processing_platform_spark.functions import text as T
    from stream_processing_platform_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", _lid_synth_col().alias("synth")
    )
    weak = d.select(
        "doc_id",
        "synth",
        T.lang_id(F.col("synth"), langs=_LID_LANGS).alias("lang_weak"),
    )
    feats = C.doc_features(weak, _lid_trigrams(F.col("synth")), _LID_DIM)
    train = (
        feats.join(weak.select("doc_id", "lang_weak"), "doc_id")
        .where(F.col("lang_weak") != "und")
        .persist()
    )
    try:
        ovr = C.logreg_fit_ovr_reproducible(
            train, "lang_weak", _LID_LANGS, _LID_DIM, iters=2, lr_num=1, lr_den=2
        )
        for c in _LID_LANGS:
            t = train.withColumn("y", (F.col("lang_weak") == c).cast("int"))
            solo = C.logreg_fit_reproducible(
                t, "y", _LID_DIM, iters=2, lr_num=1, lr_den=2
            )
            assert solo.weights == ovr[c].weights, c
    finally:
        train.unpersist()
