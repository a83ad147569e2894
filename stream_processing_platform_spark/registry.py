"""Named-query registry — the correctness gate's table of contents.

Every operator in SURVEY.md §2 (plus the LLM-pipeline additions) registers
one or more named queries here via the ``@query`` decorator. Each query is
a callable ``(spark, sf_dir) -> DataFrame``; most also carry the
equivalent ANSI SQL that DuckDB runs over the same parquet files. The
driver hash-compares the two result sets (sorted columns, order-
insensitive), so:

- every computed column is ALIASED identically in Spark and SQL;
- double aggregates are rounded (sum/avg of doubles is order-dependent —
  rounding to a few decimals makes both engines agree bit-for-bit);
- timestamps cross the boundary as epoch seconds (BIGINT) or formatted
  strings, never raw timestamp objects (timezone-handling differs);
- ties in any top-k are broken by a deterministic key column.

Queries with no SQL equivalent (LSH candidate generation, stateful
streaming) register with ``oracle=None`` → the driver records a weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str


REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, description: str = ""):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, oracle=oracle, description=description or (fn.__doc__ or "")
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: rq.fn for name, rq in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: rq.oracle for name, rq in REGISTRY.items() if rq.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every query module exactly once so decorators run."""
    global _loaded
    if _loaded:
        return
    # Import order = registry order = the order the driver runs queries in.
    # The flagship LLM-data-pipeline queries (text dedup, similarity) go
    # FIRST so they always land inside the driver's per-round budget; the
    # (slower-to-start) live streaming queries go last.
    from stream_processing_platform_spark.queries import (  # noqa: F401
        text,
        similarity,
        relational,
        streaming_batch,
        streaming_live,
    )

    _loaded = True
