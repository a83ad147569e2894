"""Synchronous file-processing surface — entry point C of the reference
(POST /api/data/process, gui/app_gcp.py:212-410): parse an uploaded
CSV/JSON file and apply one of five ops — passthrough / filter /
transform / aggregate / anomaly — row-loop interpreter there, DataFrame
plan here (and therefore distributed + optimizer-owned instead of a
single-threaded Python loop capped at 500 rows).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_platform_spark.sources.batch import read_csv, read_json

OPS = ("passthrough", "filter", "transform", "aggregate", "anomaly")


def load_file(spark: SparkSession, path: str) -> DataFrame:
    """CSV or JSON by extension (the reference sniffs the upload's
    filename the same way, gui/app_gcp.py:244-250)."""
    if path.endswith(".json") or path.endswith(".jsonl"):
        return read_json(spark, path, multiline=path.endswith(".json"))
    return read_csv(spark, path)


def process_file(
    spark: SparkSession, path: str, op: str, params: dict[str, Any] | None = None
) -> DataFrame:
    """The five-op dispatch (gui/app_gcp.py:281-389), schema-aware:

    - passthrough: identity
    - filter: keep rows where ``column`` compares against ``value``
      (case-insensitive equality or contains — gui/app_gcp.py:288-291)
    - transform: uppercase all string columns, stamp ``_processed_at`` +
      ``_source`` (gui/app_gcp.py:304-314)
    - aggregate: count/sum/avg of ``column`` grouped by ``group_by``
      (gui/app_gcp.py:316-349)
    - anomaly: label rows ANOMALY/NORMAL against ``threshold`` on
      ``column`` (gui/app_gcp.py:351-367)
    """
    p = params or {}
    df = load_file(spark, path)
    if op == "passthrough":
        return df
    if op == "filter":
        col, value = F.col(p["column"]), str(p.get("value", ""))
        needle = value.lower()
        cond = (F.lower(col.cast("string")) == needle) | F.lower(
            col.cast("string")
        ).contains(needle)
        return df.where(cond)
    if op == "transform":
        string_cols = [c for c, t in df.dtypes if t == "string"]
        out = df.withColumns({c: F.upper(F.col(c)) for c in string_cols})
        return out.withColumns(
            {
                "_processed_at": F.date_format(
                    F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss"
                ),
                "_source": F.lit(p.get("source", path.rsplit("/", 1)[-1])),
            }
        )
    if op == "aggregate":
        fns = {"count": F.count, "sum": F.sum, "avg": F.avg}
        agg_fn = fns[p.get("agg", "count")]
        target = p.get("column", "*")
        return df.groupBy(p["group_by"]).agg(
            agg_fn(target).alias(f"{p.get('agg', 'count')}_{target.replace('*', 'rows')}")
        )
    if op == "anomaly":
        col = F.col(p["column"]).cast("double")
        t = float(p["threshold"])
        return df.withColumns(
            {
                "is_anomaly": (col > F.lit(t)),
                "status": F.when(col > F.lit(t), "ANOMALY").otherwise("NORMAL"),
            }
        )
    raise ValueError(f"unknown op {op!r}; expected one of {OPS}")
