"""Unigram-LM tokenizer (operators/unigram_tokenizer.py): the Viterbi
core against hand-computed optima, tie order, vocab induction shape,
and the Spark path against the shared Python core.
"""

from __future__ import annotations

import pytest

from stream_processing_platform_spark.operators import unigram_tokenizer as U


def test_viterbi_prefers_higher_total_score():
    # "abab": pieces a=-3, b=-3, ab=-4 (micro units are just ints here)
    scores = {"a": -3, "b": -3, "ab": -4}
    s, n = U.viterbi_segment_py("abab", scores)
    assert (s, n) == (-8, 2)  # ab|ab beats a|b|a|b (-12, 4)


def test_viterbi_tie_breaks_on_fewer_tokens():
    # two segmentations with EQUAL score: ab|c (=-6) vs a|bc (=-6) vs
    # a|b|c (-9); and abc piece also -6 -> 1 token wins the tie
    scores = {"a": -3, "b": -3, "c": -3, "ab": -3, "bc": -3, "abc": -6}
    s, n = U.viterbi_segment_py("abc", scores)
    assert s == -6
    assert n == 1


def test_viterbi_unreachable_raises():
    with pytest.raises(ValueError):
        U.viterbi_segment_py("ax", {"a": -1})


def test_induced_vocab_covers_all_chars_and_scores_are_negative(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = U.induce_vocab(d, "text", top_k=50)
    chars = {
        c
        for (t,) in d.select("text").collect()
        for c in str(t).lower()
    }
    assert chars <= {g for g in vocab.scores if len(g) == 1}
    assert all(s < 0 for s in vocab.scores.values())
    assert any(len(g) == 4 for g in vocab.scores)


def test_spark_segment_matches_python_core(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    vocab = U.induce_vocab(d, "text", top_k=50)
    got = {
        r["doc_id"]: (r["score_micro"], r["n_tokens"])
        for r in U.segment(d, vocab).collect()
    }
    for r in d.select("doc_id", "text").collect():
        t = str(r["text"]).lower()
        if not t:
            continue
        assert got[r["doc_id"]] == U.viterbi_segment_py(t, vocab.scores)


def test_multi_char_pieces_reduce_token_count(spark, sf_dir):
    """The induced tokenizer must actually compress: mean tokens/doc
    well below chars/doc (subwords are being used)."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = U.induce_vocab(d, "text", top_k=500)
    seg = U.segment(d, vocab)
    ratio = (
        seg.join(d.select("doc_id", F.length(F.lower(F.col("text"))).alias("nc")), "doc_id")
        .select((F.sum("n_tokens") / F.sum("nc")).alias("r"))
        .collect()[0]["r"]
    )
    assert ratio < 0.45  # >2.2 chars per token on this corpus
