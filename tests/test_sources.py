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
