"""Trained-model curation — the r10 additions composed as one pass:
a logistic-regression quality classifier trains on weak stopword-ratio
labels (operators/classifier.py, the CCNet/GPT-3 recipe), gates the
corpus; the survivors are drawn by length-weighted Efraimidis-Spirakis
sampling (operators/mixture.weighted_sample); and the sampled docs get
a token budget from the unigram-LM Viterbi tokenizer
(operators/unigram_tokenizer.py) — filter, sample, tokenize: the
standard training-data assembly line with a TRAINED gate instead of a
rule-only one.

Self-checking: the gate's holdout accuracy must beat the majority
baseline by a wide margin; the weighted sample's mean length must
exceed the survivor mean (length bias is the point); the tokenizer's
compression must be subword-like (>2 chars/token); and the final
budget must equal the per-doc token sum.

Run:  python examples/trained_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.operators import classifier as C
from stream_processing_platform_spark.operators import unigram_tokenizer as U
from stream_processing_platform_spark.operators.mixture import weighted_sample
from stream_processing_platform_spark.queries.text import (
    _CLF_DIM,
    _CLF_ITERS,
    _CLF_LR_DEN,
    _CLF_LR_NUM,
    _clf_label_col,
)
from stream_processing_platform_spark.functions import text as T
from stream_processing_platform_spark.session import get_spark
from stream_processing_platform_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="trained-curation")
    docs = load_table(spark, sf_dir, "documents")

    # 1. train the quality gate on weak labels (doc_id%5!=0 split)
    feats = C.doc_features(docs, T.tokens(F.col("text")), _CLF_DIM)
    lbl = docs.select("doc_id", _clf_label_col().alias("label"))
    train = feats.where(F.col("doc_id") % 5 != 0).join(lbl, "doc_id").persist()
    model = C.logreg_fit_reproducible(
        train, "label", _CLF_DIM, _CLF_ITERS, _CLF_LR_NUM, _CLF_LR_DEN
    )
    train.unpersist()

    scored = C.logreg_score(feats, model).join(lbl, "doc_id")
    holdout = scored.where(F.col("doc_id") % 5 == 0)
    acc = holdout.select(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("a"),
        F.avg(F.col("label").cast("double")).alias("p"),
    ).collect()[0]
    base = max(acc["p"], 1 - acc["p"])
    print(f"gate holdout accuracy {acc['a']:.3f} vs majority {base:.3f}")
    assert acc["a"] > base + 0.1, "trained gate is not beating the baseline"

    # 2. length-weighted sample of the survivors
    kept = scored.where(F.col("pred") == 1).join(
        docs.select("doc_id", "n_chars", "text"), "doc_id"
    )
    kept_mean = kept.select(F.avg("n_chars")).collect()[0][0]
    sample = weighted_sample(kept, "doc_id", "n_chars", k=50)
    samp_mean = sample.select(F.avg("weight")).collect()[0][0]
    print(f"survivor mean chars {kept_mean:.0f}, sampled mean {samp_mean:.0f}")
    assert samp_mean > kept_mean, "weighted sample is not length-biased"

    # 3. tokenize the sampled docs and report the token budget
    vocab = U.induce_vocab(docs, "text", top_k=500)
    seg = U.segment(kept.join(sample.select("doc_id"), "doc_id"), vocab)
    stats = seg.select(
        F.sum("n_tokens").alias("budget"), F.count("*").alias("n")
    ).collect()[0]
    per_doc = seg.select(F.sum("n_tokens")).collect()[0][0]
    assert stats["budget"] == per_doc
    chars = (
        kept.join(sample.select("doc_id"), "doc_id")
        .select(F.sum(F.length(F.lower(F.col("text")))))
        .collect()[0][0]
    )
    print(
        f"sampled {stats['n']} docs -> token budget {stats['budget']} "
        f"({chars / stats['budget']:.2f} chars/token)"
    )
    assert chars / stats["budget"] > 2.0, "tokenizer is not compressing"
    print("trained_curation: OK")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
