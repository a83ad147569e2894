"""Entry point C (gui/app_gcp.py:212-410): five-op file processing."""

from __future__ import annotations

from stream_processing_platform_spark.api.file_ops import process_file

CSV = "city,kind,reading\nBerlin,temp,21.5\nOslo,temp,45.0\nLima,humid,30.0\n"


def _csv(tmp_path):
    p = tmp_path / "upload.csv"
    p.write_text(CSV)
    return str(p)


def test_passthrough_and_filter(spark, tmp_path):
    path = _csv(tmp_path)
    assert process_file(spark, path, "passthrough").count() == 3
    hits = process_file(spark, path, "filter", {"column": "city", "value": "OSLO"})
    assert [r.city for r in hits.collect()] == ["Oslo"]


def test_transform_uppercases_strings_and_stamps(spark, tmp_path):
    out = process_file(spark, _csv(tmp_path), "transform").collect()
    assert {r.city for r in out} == {"BERLIN", "OSLO", "LIMA"}
    assert all(r._source == "upload.csv" and r._processed_at for r in out)


def test_aggregate_and_anomaly(spark, tmp_path):
    path = _csv(tmp_path)
    agg = process_file(
        spark, path, "aggregate", {"group_by": "kind", "agg": "avg", "column": "reading"}
    ).collect()
    assert {r.kind: round(r.avg_reading, 2) for r in agg} == {"temp": 33.25, "humid": 30.0}
    an = process_file(spark, path, "anomaly", {"column": "reading", "threshold": 40})
    assert {r.city: r.status for r in an.collect()} == {
        "Berlin": "NORMAL", "Oslo": "ANOMALY", "Lima": "NORMAL"
    }


def test_generators_build_streaming_frames(spark):
    from stream_processing_platform_spark.sources import generators as G

    for fn, cols in [
        (G.iot_sensor_stream, {"ts", "sensor_id", "temperature", "humidity"}),
        (G.ecommerce_event_stream, {"ts", "event_id", "user_id", "event_type", "product_id", "price"}),
        (G.financial_tick_stream, {"ts", "symbol", "price", "volume"}),
    ]:
        df = fn(spark)
        assert df.isStreaming and set(df.columns) == cols
