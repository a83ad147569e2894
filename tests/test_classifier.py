"""Trained quality classifier (operators/classifier.py): learning
actually happens (accuracy gates vs the weak-label rule), training is
partition-invariant (the reproducible-training doctrine), and the
hashed-bucket recipe matches its Python reference.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from stream_processing_platform_spark.functions import text as T
from stream_processing_platform_spark.operators import classifier as C
from stream_processing_platform_spark.queries.text import (
    _CLF_DIM,
    _CLF_ITERS,
    _CLF_LR_DEN,
    _CLF_LR_NUM,
    _clf_label_col,
)


def _fit(spark, sf_dir, repartition=None):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = C.doc_features(d, T.tokens(F.col("text")), _CLF_DIM)
    if repartition is not None:
        feats = feats.repartition(repartition)
    lbl = d.select("doc_id", _clf_label_col().alias("label"))
    train = feats.where(F.col("doc_id") % 5 != 0).join(lbl, "doc_id").persist()
    try:
        model = C.logreg_fit_reproducible(
            train, "label", _CLF_DIM, _CLF_ITERS, _CLF_LR_NUM, _CLF_LR_DEN
        )
    finally:
        train.unpersist()
    return feats, lbl, model


def test_classifier_learns_the_label_rule(spark, sf_dir):
    """Train accuracy must clear 0.85 and the doc_id%5==0 HOLDOUT 0.80
    (measured 0.912 / 0.900 at sf0.001) — far above the ~0.51 majority
    baseline, so the GD trajectory is genuinely learning, not memo-izing
    the prior."""
    feats, lbl, model = _fit(spark, sf_dir)
    scored = C.logreg_score(feats, model).join(lbl, "doc_id")
    acc = scored.groupBy((F.col("doc_id") % 5 == 0).alias("holdout")).agg(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc")
    )
    by = {r["holdout"]: r["acc"] for r in acc.collect()}
    assert by[False] >= 0.85, f"train accuracy {by[False]}"
    assert by[True] >= 0.80, f"holdout accuracy {by[True]}"


def test_classifier_beats_majority_baseline(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pos = d.select(F.avg(_clf_label_col().cast("double")).alias("p")).collect()[0]["p"]
    base = max(pos, 1 - pos)
    feats, lbl, model = _fit(spark, sf_dir)
    scored = C.logreg_score(feats, model).join(lbl, "doc_id")
    acc = scored.select(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("a")
    ).collect()[0]["a"]
    assert acc > base + 0.15


def test_training_is_partition_invariant(spark, sf_dir):
    """Bit-identical weights whatever the input partitioning — the
    exact-integer gradient sums are order-free by construction."""
    _, _, m1 = _fit(spark, sf_dir)
    _, _, m2 = _fit(spark, sf_dir, repartition=7)
    assert m1.weights == m2.weights


def test_bucket_recipe_matches_python_md5(spark):
    toks = ["the", "a", "spark", "stream", "vector"]
    df = spark.createDataFrame([(t,) for t in toks], "tok STRING").select(
        "tok", C.bucket_col(F.col("tok"), _CLF_DIM).alias("b")
    )
    got = {r["tok"]: r["b"] for r in df.collect()}
    for t in toks:
        want = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _CLF_DIM
        assert got[t] == want


def test_empty_training_set_raises(spark, sf_dir):
    import pytest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = C.doc_features(d, T.tokens(F.col("text")), _CLF_DIM).where(F.lit(False))
    feats = feats.withColumn("label", F.lit(1))
    with pytest.raises(ValueError):
        C.logreg_fit_reproducible(feats, "label", _CLF_DIM, 1)


def test_bias_row_present_once_per_doc(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = C.doc_features(d, T.tokens(F.col("text")), _CLF_DIM)
    bad = feats.select(
        F.size(F.filter("pairs", lambda s: s["bucket"] == _CLF_DIM)).alias("nb")
    ).where(F.col("nb") != 1)
    assert bad.count() == 0
