"""Batch source readers (SURVEY.md §2.1): CSV/JSON ingest replacing the
reference's csv.DictReader / json-array loop (gui/app_gcp.py:244-264),
plus the collection source."""

from __future__ import annotations

import json

from stream_processing_platform_spark.sources import batch as B


def test_read_csv_with_inferred_schema(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("name,elevation_ft,iso_country\nAlpha,120,US\nBravo,3500,DE\n")
    df = B.read_csv(spark, str(p))
    assert set(df.columns) == {"name", "elevation_ft", "iso_country"}
    assert dict(df.dtypes)["elevation_ft"] == "int"
    rows = {r["name"]: r["elevation_ft"] for r in df.collect()}
    assert rows == {"Alpha": 120, "Bravo": 3500}


def test_read_csv_explicit_schema_overrides_inference(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = B.read_csv(spark, str(p), schema="a string, b string")
    assert dict(df.dtypes) == {"a": "string", "b": "string"}


def test_read_json_lines_and_array(spark, tmp_path):
    lines = tmp_path / "events.jsonl"
    lines.write_text("\n".join(json.dumps({"id": i, "v": i * 1.5}) for i in range(3)))
    df = B.read_json(spark, str(lines))
    assert df.count() == 3 and set(df.columns) == {"id", "v"}

    arr = tmp_path / "events_array.json"
    arr.write_text(json.dumps([{"id": 1}, {"id": 2}]))
    df2 = B.read_json(spark, str(arr), multiline=True)
    assert sorted(r["id"] for r in df2.collect()) == [1, 2]


def test_from_collection(spark):
    df = B.from_collection(spark, [("k1", 1), ("k2", 2)], schema=["key", "n"])
    assert df.count() == 2 and df.columns == ["key", "n"]


def test_read_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC round-trip + the columnar contract: a filtered scan shows a
    pushed-down predicate, same as parquet."""
    p = str(tmp_path / "orc")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.orc(p)
    df = B.read_orc(spark, p)
    assert df.count() == 100
    filtered = df.where("id < 10").select("v")
    assert filtered.count() == 10
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), LessThan(id,10)]" in plan


def _malformed_json_dir():
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="spp_badjson_")
    with open(os.path.join(d, "part-0.json"), "w") as fh:
        fh.write('{"id": 1, "v": 10}\n')
        fh.write("THIS IS NOT JSON\n")
        fh.write('{"id": 3, "v": 30}\n')
        fh.write('{"id": "not a number", "v": 40}\n')
    return d


def test_read_json_permissive_quarantines_not_drops(spark):
    """PERMISSIVE (the engine default): malformed lines survive in
    _corrupt_record — the declared upgrade over the reference's silent
    drop (stateless.py:39-45); nothing is lost."""
    from pyspark.sql.types import LongType, StructField, StructType

    from stream_processing_platform_spark.sources.batch import (
        CORRUPT_COL,
        corrupt_records,
        read_json_with_policy,
        valid_records,
    )

    schema = StructType([StructField("id", LongType()), StructField("v", LongType())])
    df = read_json_with_policy(spark, _malformed_json_dir(), schema)
    assert df.count() == 4  # every input line accounted for
    good = valid_records(df)
    assert sorted((r.id, r.v) for r in good.collect()) == [(1, 10), (3, 30)]
    bad = [r[CORRUPT_COL] for r in corrupt_records(df).collect()]
    assert "THIS IS NOT JSON" in bad and any("not a number" in b for b in bad)


def test_read_json_dropmalformed_matches_reference_semantics(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from stream_processing_platform_spark.sources.batch import read_json_with_policy

    schema = StructType([StructField("id", LongType()), StructField("v", LongType())])
    df = read_json_with_policy(spark, _malformed_json_dir(), schema, mode="DROPMALFORMED")
    assert sorted((r.id, r.v) for r in df.collect()) == [(1, 10), (3, 30)]


def test_read_json_failfast_aborts(spark):
    import pytest
    from pyspark.sql.types import LongType, StructField, StructType

    from stream_processing_platform_spark.sources.batch import read_json_with_policy

    schema = StructType([StructField("id", LongType()), StructField("v", LongType())])
    df = read_json_with_policy(spark, _malformed_json_dir(), schema, mode="FAILFAST")
    with pytest.raises(Exception, match="FAILFAST|Malformed|MALFORMED"):
        df.collect()


def test_read_json_unknown_mode_rejected(spark):
    import pytest
    from pyspark.sql.types import StructType

    from stream_processing_platform_spark.sources.batch import read_json_with_policy

    with pytest.raises(ValueError, match="unknown malformed-record mode"):
        read_json_with_policy(spark, "/tmp/x", StructType([]), mode="IGNORE")


def test_parquet_schema_evolution_merge_and_backfill(spark, tmp_path):
    """Data-lake schema evolution: old files written before a column
    existed must stay readable next to new files that have it —
    mergeSchema unions the schemas, the missing column reads as NULL in
    old rows, and the standard backfill (coalesce to a sentinel) makes
    the frame safe for non-null contracts. Also pins the quiet failure
    mode this guards against: WITHOUT mergeSchema, whichever file
    schema Spark samples wins and the new column can silently vanish."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string"
    ).write.parquet(base + "/batch=0")
    spark.createDataFrame(
        [(3, "gamma", "en"), (4, "delta", "fr")],
        "doc_id bigint, text string, lang string",
    ).write.parquet(base + "/batch=1")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"doc_id", "text", "lang", "batch"}
    rows = {
        r.doc_id: r.lang
        for r in merged.select(
            "doc_id", F.coalesce("lang", F.lit("und")).alias("lang")
        ).collect()
    }
    assert rows == {1: "und", 2: "und", 3: "en", 4: "fr"}
