"""Python UDTF surface (SURVEY §2.11): SQL-callable table functions."""

from __future__ import annotations

from stream_processing_platform_spark.functions.udtfs import register_udtfs


def test_split_passages_lateral_join(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, None)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.* FROM udtf_docs d, LATERAL split_passages(d.text, 2) s"
    ).collect()
    got = {(r.doc_id, r.idx): (r.passage, r.n_words) for r in rows}
    assert got[(1, 0)] == ("a b", 2)
    assert got[(1, 1)] == ("c d", 2)
    assert got[(1, 2)] == ("e", 1)
    assert got[(2, 0)] == ("x y", 2)
    assert (3, 0) not in got  # null text yields no rows
    # word conservation per doc
    assert sum(n for (d, _), (_, n) in got.items() if d == 1) == 5
