"""Hierarchical (multi-resolution) time rollups — continuous-aggregate
style: minute → hour → day, where every coarser level aggregates the
PREVIOUS level's partials, never the raw table.

Reference parity: the reference's WindowOperator aggregates one fixed
resolution per job (taskmanager/operators/stateful.py:147-262); serving
several zoom levels means re-scanning the stream per level. The
TimescaleDB/Druid pattern this operator implements instead: aggregate
raw data ONCE at the finest grain, then fold partials upward — at
100 TB that's one fact scan plus tiny partial-to-partial shuffles
(each level has |buckets| rows, not |events|), and it is exactly how a
materialized rollup pyramid is maintained incrementally.

Only decomposable aggregates can ride the pyramid: sum/count/min/max
re-aggregate losslessly (avg = sum/count at read time). For distinct
counts, keep a mergeable HLL sketch COLUMN per bucket
(``hll_sketch_agg`` at the finest level, ``hll_union_agg`` upward) —
the Druid/DataSketches pattern; estimates are pinned within rsd by
tests/test_rollup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.cols import as_col_list


def bucket_ms(ts_ms: Column, size_ms: int) -> Column:
    """Floor an epoch-ms column to its bucket start (exact integer ops)."""
    return (ts_ms - (ts_ms % F.lit(size_ms))).cast("long")


def hierarchical_rollup(
    df: DataFrame,
    ts_ms_col: str,
    group_cols: list[str],
    value_col: str,
    level_ms: list[int],
    distinct_col: str | None = None,
) -> list[DataFrame]:
    """Build the rollup pyramid. Returns one DataFrame per level (same
    order as ``level_ms``, which must be ascending and divisible —
    each ``level_ms[i+1]`` a multiple of ``level_ms[i]``).

    Level 0 scans ``df`` once: per (group, bucket) it keeps
    ``cnt / sum_v / min_v / max_v`` (+ an ``hll`` sketch of
    ``distinct_col`` when given). Level i>0 aggregates level i-1's
    rows: counts/sums add, min/max fold, sketches union — no second
    fact scan. ``sum_v`` must be exact under reordering (use integer
    units for money; see CLAUDE.md).
    """
    for a, b in zip(level_ms, level_ms[1:]):
        if b % a != 0:
            raise ValueError(f"level {b} not a multiple of {a}")
    base_aggs = [
        F.count("*").alias("cnt"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]
    if distinct_col is not None:
        base_aggs.append(F.hll_sketch_agg(distinct_col).alias("hll"))
    finest = (
        df.groupBy(*group_cols, bucket_ms(F.col(ts_ms_col), level_ms[0]).alias("bucket"))
        .agg(*base_aggs)
    )
    levels = [finest]
    for size in level_ms[1:]:
        prev = levels[-1]
        up_aggs = [
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        ]
        if distinct_col is not None:
            up_aggs.append(F.hll_union_agg("hll").alias("hll"))
        levels.append(
            prev.groupBy(*group_cols, bucket_ms(F.col("bucket"), size).alias("bucket"))
            .agg(*up_aggs)
        )
    return levels


def aggregate_state(
    df: DataFrame, group_cols: list[str] | str, value_col: str
) -> DataFrame:
    """Per-group MERGEABLE aggregate state: cnt / sum_v / min_v / max_v.

    This is the materialized-view building block: every field is a
    commutative monoid, so states built from disjoint slices of the
    fact table combine with :func:`merge_aggregate_state` into exactly
    the state a full recompute would produce — the delta-refresh
    contract. ``value_col`` must be exact under reordering (integer
    units for money; CLAUDE.md float rules).
    """
    group_cols = as_col_list(group_cols)
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("cnt"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_aggregate_state(
    states: list[DataFrame], group_cols: list[str] | str
) -> DataFrame:
    """Merge aggregate states (union + per-field monoid fold).

    The 100 TB story: refreshing an aggregate after an append-only
    batch costs O(|delta| + |state|), never O(|history|) — the delta's
    state is computed alone and folded in. Counts/sums add, min/max
    fold; one shuffle keyed on the (small) group domain.
    """
    group_cols = as_col_list(group_cols)
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
