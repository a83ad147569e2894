"""Advanced corpus-dedup toolkit — the round-8 operators, self-checking.

Three duplication classes whole-document dedup misses, plus exact
weighted sampling:

1. SUBSTRING SPANS (operators/dedup.substring_dup_spans — Lee et al.
   2021 character-level dedup): which character ranges of each doc are
   duplicated elsewhere in the corpus. Self-check: a run planted in two
   docs is reported as one merged span in each, covering the run.
2. CONTAINMENT (operators/dedup.containment_pairs): a short doc fully
   quoted inside a long one — Jaccard misses it (tiny union overlap),
   directional containment scores 1.0. Self-check: exactly that.
3. PPS SAMPLING (operators/mixture.pps_systematic_sample): pick ~N docs
   proportional to token weight in exact integer arithmetic — no RNG,
   sum(picks) == N exactly, reproducible everywhere. Self-check: the
   telescoping invariant.

Run:  python examples/corpus_dedup_advanced.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.text import token_count
from stream_processing_platform_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
    substring_dup_spans,
)
from stream_processing_platform_spark.operators.mixture import pps_systematic_sample
from stream_processing_platform_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="corpus-dedup-advanced")

    quote = "the five boxing wizards jump quickly tonight over the fence"
    filler_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(10))
    filler_b = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(10))
    filler_c = " ".join(f"eta{i} theta{i} iota{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler_a + " " + quote + " " + filler_b),
            # doc 3 repeats ITS OWN filler twice: within-doc repetition
            # alone must not flag anything (distinct-doc counting)
            (3, filler_c + " nothing shared here beyond stopwords " + filler_c),
            (4, "entirely unrelated content about completely different things"),
        ],
        "doc_id long, text string",
    )

    # ---- 1. substring spans: the planted run surfaces as ONE span/doc
    spans = substring_dup_spans(docs, "doc_id", "text", min_len=25)
    by_doc = {r.doc_id: (r.span_start, r.span_end) for r in spans.collect()}
    print("substring spans:", by_doc)
    assert set(by_doc) == {1, 2}, by_doc
    s1, e1 = by_doc[1]
    assert e1 - s1 + 1 >= len(quote), "span must cover the planted run"

    # ---- 2. containment catches what Jaccard misses
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).count()
    cont = {
        (r.id_a, r.id_b): (r.cont_a, r.cont_b)
        for r in containment_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    }
    print("jaccard pairs at 0.5:", jac, "| containment pairs:", cont)
    assert jac == 0 and set(cont) == {(1, 2)}
    assert cont[(1, 2)][0] == 1.0  # the short side is fully contained

    # ---- 3. PPS sampling: exact-integer draw, sum(picks) == N
    weighted = docs.select("doc_id", token_count(F.col("text")).cast("long").alias("w"))
    n = 7
    picks = pps_systematic_sample(weighted, "w", n, bucket_size=2)
    rows = picks.collect()
    print("pps picks:", {r.doc_id: r.picks for r in rows})
    assert sum(r.picks for r in rows) == n

    print("OK — spans merged, quote-inclusion caught, PPS draw exact")


if __name__ == "__main__":
    main()
