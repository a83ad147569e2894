"""Oracle result-type whitelist sweep (r8 verdict item #2).

The driver's correctness hash is TYPE-sensitive: in r8 the only red row
(``q_pps_sample``) had equal rows/schema/values but duckdb emitted the
``picks`` column as HUGEINT (int128 — ``sum(BIGINT)`` propagates through
``//``) while Spark emitted BIGINT.  The local sim str()-canonicalized
values, so it said MATCH while the driver said FAIL.

This sweep binds EVERY registered oracle on duckdb (type inference
only — no execution) and asserts each output column's type is in
``DUCK_TYPE_WHITELIST``.  HUGEINT and DECIMAL can never ship again:
wrap offending expressions in ``CAST(... AS BIGINT/DOUBLE)``.

Cross-engine per-column type EQUALITY (Spark schema vs duckdb types) is
asserted by ``scripts/driver_sim.py`` on every sweep, which builds the
Spark DataFrames anyway.
"""

from __future__ import annotations

import duckdb
import pytest

from stream_processing_platform_spark.oracle_types import duck_type_ok
from stream_processing_platform_spark.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_hugeint_canary(duck):
    """The exact r8 failure shape: integer-div over sum(BIGINT) binds to
    HUGEINT on duckdb, and the whitelist rejects it."""
    rel = duck.sql(
        "SELECT sum(CAST(o_orderkey AS BIGINT)) // 2 AS picks FROM orders"
    )
    assert str(rel.types[0]) == "HUGEINT"
    assert not duck_type_ok("HUGEINT")
    assert not duck_type_ok("DECIMAL(18,3)")
    assert not duck_type_ok("HUGEINT[]")


def test_bare_decimal_literal_canary(duck):
    """Bare decimal literals bind to exact DECIMAL (the q_rank_select
    0.95 class) — whitelist rejects them at the output."""
    rel = duck.sql("SELECT 0.95 AS frac")
    assert str(rel.types[0]).startswith("DECIMAL")
    assert not duck_type_ok(str(rel.types[0]))


def test_every_oracle_output_type_whitelisted(duck):
    offenders = []
    for name, entry in sorted(REGISTRY.items()):
        if entry.oracle is None:
            continue
        try:
            rel = duck.sql(entry.oracle)
            pairs = list(zip(list(rel.columns), [str(t) for t in rel.types]))
        except Exception as e:  # bind failure is its own offense
            offenders.append(f"{name}: bind error {e}")
            continue
        for col, dt in pairs:
            if not duck_type_ok(dt):
                offenders.append(f"{name}.{col}: {dt}")
    assert not offenders, (
        "oracle outputs with non-whitelisted duckdb types (CAST them to "
        "BIGINT/DOUBLE at the SELECT): " + "; ".join(offenders)
    )
