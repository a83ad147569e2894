"""Shared pytest fixtures: one SparkSession per test session, duckdb
oracle connection with the fixture tables pre-registered (mirroring the
driver's harness), and a result-comparison helper that reproduces the
driver's order-insensitive sorted-column comparison.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from stream_processing_platform_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="spp-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def rows_to_multiset(columns, rows):
    """Sorted-column, order-insensitive canonical form (mirrors the
    driver's value-hash comparison)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = tuple(columns[i] for i in order)
    canon = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return names, canon


def assert_matches_oracle(spark_df, duck_con, sql: str):
    """Spark result == duckdb result (sorted columns, unordered rows)."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = duck_con.sql(sql)
    d_rows = d.fetchall()
    d_cols = list(d.columns)

    s_names, s_canon = rows_to_multiset(s_cols, s_rows)
    d_names, d_canon = rows_to_multiset(d_cols, d_rows)

    assert s_names == d_names, f"column mismatch: spark={s_names} duckdb={d_names}"
    assert len(s_canon) == len(d_canon), (
        f"row count mismatch: spark={len(s_canon)} duckdb={len(d_canon)}"
    )
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"value mismatch, first diffs (spark, duckdb): {diffs}")


def pytest_collection_modifyitems(config, items):
    """r15 verify-window tiering: the q_stream_* oracle-parity rows run
    staged micro-batches (10-25 s each, ~3.5 min total) — slow tier,
    like the streaming test files (pytest.ini). Their batch twins and
    the driver's own correctness sample keep covering them in the
    default window."""
    for it in items:
        if it.name.startswith("test_query_matches_oracle[q_stream_"):
            it.add_marker(pytest.mark.slow)
