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


def test_polymorphic_udtf_schema_follows_keys(spark):
    """extract_fields computes its schema via analyze() from the call
    site's constant keys — two calls, two different schemas."""
    from stream_processing_platform_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    one = spark.sql(
        """SELECT f.* FROM VALUES ('{"a": 1, "b": "x"}') AS t(j),
           LATERAL extract_fields(t.j, 'a') f"""
    )
    assert one.columns == ["a"]
    assert one.collect()[0].a == "1"
    two = spark.sql(
        """SELECT f.* FROM VALUES ('{"a": 1, "b": "x"}'), ('broken') AS t(j),
           LATERAL extract_fields(t.j, 'b', 'missing') f"""
    )
    assert two.columns == ["b", "missing"]
    rows = sorted(two.collect(), key=lambda r: (r.b is None, r.b))
    assert (rows[0].b, rows[0].missing) == ("x", None)
    assert (rows[1].b, rows[1].missing) == (None, None)  # malformed -> nulls


def test_polymorphic_udtf_rejects_non_constant_keys(spark):
    import pytest

    from stream_processing_platform_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    with pytest.raises(Exception, match="constant strings|at least one key"):
        spark.sql(
            "SELECT f.* FROM VALUES ('{}') AS t(j), LATERAL extract_fields(t.j, t.j) f"
        ).collect()


def test_polymorphic_udtf_nulls_non_object_json(spark):
    """Valid JSON that isn't an object ('[1,2]', '"x"', '42') gets the
    same all-null row as malformed JSON — one consistent error policy,
    never an AttributeError out of a SQL call site."""
    from stream_processing_platform_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    got = spark.sql(
        """SELECT t.j, f.* FROM VALUES ('[1,2]'), ('"x"'), ('42'),
           ('{"a": "ok"}'), ('broken') AS t(j),
           LATERAL extract_fields(t.j, 'a') f"""
    ).collect()
    by_payload = {r.j: r.a for r in got}
    assert by_payload == {
        "[1,2]": None, '"x"': None, "42": None, '{"a": "ok"}': "ok", "broken": None
    }
