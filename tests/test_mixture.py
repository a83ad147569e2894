"""Corpus mixture weighting (operators/mixture.py): integer target
math, admission semantics on a hand-built corpus, and a pure-Python
greedy cross-check of the real-BPE query variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_platform_spark.operators.mixture import (
    corpus_mixture,
    mixture_targets,
)


def test_mixture_targets_integer_shares():
    t = mixture_targets({"a": 1, "b": 2, "c": 3}, 6000)
    assert t == {"a": 1000, "b": 2000, "c": 3000}
    # floor semantics: shares need not exhaust the budget
    t = mixture_targets({"a": 1, "b": 1, "c": 1}, 100)
    assert t == {"a": 33, "b": 33, "c": 33}


def test_corpus_mixture_admission_semantics(spark):
    rows = [
        # (doc_id, source, n): web docs admitted in doc_id order
        (1, "web", 40),
        (2, "web", 40),
        (3, "web", 40),  # cum_before=80 >= target 100? no, 80 < 100 -> admitted whole
        (4, "web", 40),  # cum_before=120 >= 100 -> dropped
        (1, "books", 10),
        (2, "books", 10),
        (9, "junk", 5),  # source not in recipe -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    kept = corpus_mixture(df, {"web": 1, "books": 1}, 200, "n").collect()
    by_src: dict[str, list] = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    # web target 100: docs 1,2,3 admitted (boundary doc whole, 120 tokens)
    assert sorted(r["doc_id"] for r in by_src["web"]) == [1, 2, 3]
    assert sum(r["n"] for r in by_src["web"]) == 120
    # books target 100: everything fits
    assert sorted(r["doc_id"] for r in by_src["books"]) == [1, 2]
    assert "junk" not in by_src
    assert all(r["mix_target"] == 100 for r in kept)


def test_corpus_mixture_hash_order_is_content_stable(spark):
    """With hash_col, admission order follows the hash, not doc_id."""
    rows = [(1, "s", 60, "zz"), (2, "s", 60, "aa"), (3, "s", 60, "mm")]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long, h string")
    kept = corpus_mixture(df, {"s": 1}, 100, "n", hash_col="h").collect()
    # hash order aa(2), mm(3), zz(1); target 100: aa whole, mm straddles -> admitted
    assert sorted(r["doc_id"] for r in kept) == [2, 3]


def test_corpus_mixture_bpe_matches_pure_python_greedy(spark, sf_dir):
    """The rows-only BPE variant, cross-checked: collect the per-doc
    (source, n, h) the query is built on, replay the greedy admission in
    plain Python, and compare per-source aggregates."""
    from stream_processing_platform_spark.functions import bpe
    from stream_processing_platform_spark.functions import text as T
    from stream_processing_platform_spark.queries.text import (
        _MIX_BUDGET,
        _MIX_WEIGHTS,
        q_corpus_mixture_bpe,
    )
    from stream_processing_platform_spark.tables import load_table

    got = {
        r["source"]: (r["n_docs"], r["mix_tokens"], r["mix_target"])
        for r in q_corpus_mixture_bpe(spark, sf_dir).collect()
    }

    count_udf = bpe.token_count_udf(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            count_udf(F.col("text")).cast("long").alias("n"),
            T.fingerprint(F.col("text")).alias("h"),
        )
        .collect()
    )
    targets = mixture_targets(_MIX_WEIGHTS, _MIX_BUDGET)
    expected: dict[str, tuple[int, int, int]] = {}
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        if src not in targets:
            continue
        rs.sort(key=lambda r: (r["h"], r["doc_id"]))
        cum = n_docs = tok = 0
        for r in rs:
            if cum >= targets[src]:
                break
            n_docs, tok, cum = n_docs + 1, tok + r["n"], cum + r["n"]
        if n_docs:
            expected[src] = (n_docs, tok, targets[src])
    assert got == expected


def test_pps_systematic_sample_exact_invariants(spark):
    """Systematic PPS in exact integers: (1) sum(picks) == N exactly
    (the telescoping guarantee); (2) a document heavier than the stride
    gets multiplicity proportional to its weight; (3) zero-weight rows
    never selected; (4) the draw is identical under a different
    bucket_size (the two-phase prefix is an implementation detail, not
    a semantics knob)."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.operators.mixture import (
        pps_systematic_sample,
    )

    rows = [(i, (i * 7) % 13 + 1) for i in range(1, 201)] + [
        (500, 0),      # zero weight: excluded
        (600, 5000),   # whale: ~N * 5000/total picks
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    n = 37
    out = {r.doc_id: r.picks for r in pps_systematic_sample(df, "w", n).collect()}
    assert sum(out.values()) == n
    assert 500 not in out
    total = sum(w for _, w in rows)
    expect_whale = n * 5000 / total
    assert abs(out[600] - expect_whale) <= 1  # within one stride
    out2 = {
        r.doc_id: r.picks
        for r in pps_systematic_sample(df, "w", n, bucket_size=7).collect()
    }
    assert out2 == out


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    """A-ES keys computed by the same formula in pure Python pick the
    same k docs in the same order."""
    import math

    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        REPRO_INIT_MULT_RED,
    )
    from stream_processing_platform_spark.operators.mixture import weighted_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["doc_id"], r["key_nano"])
        for r in weighted_sample(d, "doc_id", "n_chars", k=25).collect()
    ]
    rows = d.select("doc_id", "n_chars").collect()
    ref = []
    for r in rows:
        if r["n_chars"] <= 0:
            continue
        h = ((r["doc_id"] % REPRO_INIT_MOD) * REPRO_INIT_MULT_RED) % REPRO_INIT_MOD
        u = (h + 1) / float(REPRO_INIT_MOD + 1)
        key = math.floor(-math.log(u) / float(r["n_chars"]) * 1e9 + 0.5)
        ref.append((key, r["doc_id"]))
    ref.sort()
    assert got == [(i, k) for k, i in ref[:25]]


def test_weighted_sample_is_length_biased(spark, sf_dir):
    """Across many salts, the mean weight of sampled docs must exceed
    the corpus mean weight — the whole point of A-ES."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.operators.mixture import weighted_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = d.select(F.avg("n_chars")).collect()[0][0]
    means = []
    for salt in range(5):
        s = weighted_sample(d, "doc_id", "n_chars", k=20, salt=salt)
        means.append(s.select(F.avg("weight")).collect()[0][0])
    assert sum(means) / len(means) > corpus_mean * 1.1


def test_temperature_mixture_upweights_tail_sources(spark):
    """alpha=0.5 weights: a source with 100x the tokens of another gets
    only 10x the weight (sqrt), so the tail source's mixture share must
    EXCEED its raw corpus share while the head source's share shrinks."""
    from stream_processing_platform_spark.operators.mixture import (
        temperature_mixture,
    )

    rows = []
    did = 0
    for src, docs in (("head", 400), ("tail", 4)):
        for _ in range(docs):
            rows.append((did, src, 50, f"h{did:06d}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n long, h string")
    budget = 2_000
    kept = temperature_mixture(df, budget, "n", hash_col="h")
    got = {
        r["source"]: r
        for r in kept.groupBy("source")
        .agg(F.sum("n").alias("tok"), F.max("mix_target").alias("tgt"))
        .collect()
    }
    raw_tail_share = 4 / 404
    # sqrt weights: w_head = sqrt(20000)*1000, w_tail = sqrt(200)*1000
    # -> tail target share = 1/11 ~ 9.1%, vs 0.99% raw
    tail_share = got["tail"]["tgt"] / budget
    assert tail_share > 5 * raw_tail_share, (tail_share, raw_tail_share)
    # tail is small enough that its entire corpus is admitted
    assert got["tail"]["tok"] == 4 * 50
    # head admission stops at (not far past) its target: boundary doc whole
    assert got["head"]["tok"] - got["head"]["tgt"] < 50, got["head"]
    # targets telescope to <= budget (integer floor division)
    assert got["head"]["tgt"] + got["tail"]["tgt"] <= budget
