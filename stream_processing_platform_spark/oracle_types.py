"""Cross-engine result-type canonicalization for the oracle contract.

The driver's correctness compare hashes TYPED values: a duckdb column
that comes back HUGEINT (int128 — e.g. any arithmetic downstream of
``sum(BIGINT)``) or DECIMAL (any bare decimal literal) hashes
differently from Spark's BIGINT/DOUBLE even when every value is equal.
r8 shipped exactly one such row (``q_pps_sample``: ``//`` over a
HUGEINT sum) because the local sim ``str()``-canonicalized values and
could not see the type. This module is the shared fix:

- ``DUCK_TYPE_WHITELIST``: the only duckdb output types an oracle may
  emit. HUGEINT / DECIMAL / unnamed ROW are banned — wrap in
  ``CAST(... AS BIGINT/DOUBLE)`` at the SELECT.
- ``canon_duck_type`` / ``canon_spark_type``: map both engines onto one
  name space so the sim (scripts/driver_sim.py) and the type-sweep
  pytest (tests/test_oracle_types.py) can assert per-column equality.
"""

from __future__ import annotations

import re

# duckdb type names an oracle result column is allowed to have.  Keep
# this tight: every entry is a type whose value hashing is known to
# agree with the matching Spark type in the driver compare.
DUCK_TYPE_WHITELIST = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "BLOB",
}
# ...plus one level of LIST over any whitelisted element type.
_LIST_RE = re.compile(r"^(.*)\[\]$")


def duck_type_ok(type_str: str) -> bool:
    """True iff a duckdb output type is allowed by the oracle contract."""
    m = _LIST_RE.match(type_str)
    if m:
        return duck_type_ok(m.group(1))
    return type_str in DUCK_TYPE_WHITELIST


def canon_duck_type(type_str: str) -> str:
    """Canonical name for a duckdb output type (e.g. 'BIGINT[]')."""
    m = _LIST_RE.match(type_str)
    if m:
        return canon_duck_type(m.group(1)) + "[]"
    return {
        "TINYINT": "INT",
        "SMALLINT": "INT",
        "INTEGER": "INT",
        "BIGINT": "BIGINT",
        "HUGEINT": "HUGEINT",
        "FLOAT": "FLOAT",
        "DOUBLE": "DOUBLE",
        "VARCHAR": "VARCHAR",
        "BOOLEAN": "BOOLEAN",
        "DATE": "DATE",
        "BLOB": "BINARY",
        "TIMESTAMP": "TIMESTAMP",
        "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    }.get(type_str, type_str)


def canon_spark_type(dt) -> str:
    """Canonical name for a Spark DataType, same name space as duckdb."""
    from pyspark.sql import types as ST

    if isinstance(dt, ST.ArrayType):
        return canon_spark_type(dt.elementType) + "[]"
    if isinstance(dt, (ST.ByteType, ST.ShortType, ST.IntegerType)):
        return "INT"
    if isinstance(dt, ST.LongType):
        return "BIGINT"
    if isinstance(dt, ST.FloatType):
        return "FLOAT"
    if isinstance(dt, ST.DoubleType):
        return "DOUBLE"
    if isinstance(dt, ST.StringType):
        return "VARCHAR"
    if isinstance(dt, ST.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, ST.DateType):
        return "DATE"
    if isinstance(dt, ST.BinaryType):
        return "BINARY"
    if isinstance(dt, (ST.TimestampType, ST.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, ST.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    return dt.simpleString().upper()


# Canonical pairs (spark, duck) that the driver compare is known to
# hash equally even though the names differ: Spark INT columns hash as
# Python ints just like duckdb INTEGER/BIGINT values do.
_COMPATIBLE = {("INT", "BIGINT"), ("BIGINT", "INT")}


def types_agree(spark_canon: str, duck_canon: str) -> bool:
    return spark_canon == duck_canon or (spark_canon, duck_canon) in _COMPATIBLE
