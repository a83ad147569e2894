"""Streaming deduplication (SURVEY.md §2.6).

Reference: `deduplication_process_function`
(examples/stateful_deduplication.py:18-49) keeps a per-user seen-set of
event_ids capped at 10k with arbitrary eviction — unbounded-state dedup
with a correctness hole. The Spark-native replacement is watermark-
bounded `dropDuplicates`, which is both correct (no arbitrary eviction)
and scalable (state pruned by event time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame, key_cols: list[str], ts_col: str | None = None, watermark_delay: str = "10 seconds"
) -> DataFrame:
    """Exactly-once-per-key stream: first occurrence wins.

    With ``ts_col``, state is bounded by the watermark (dropDuplicates
    with the event-time column included); without it state grows
    unboundedly (only for tests/small keyspaces).
    """
    if ts_col is not None:
        return df.withWatermark(ts_col, watermark_delay).dropDuplicates([*key_cols, ts_col])
    return df.dropDuplicates(key_cols)


def dedup_stream_within_watermark(
    df: DataFrame, key_cols: list[str], ts_col: str, watermark_delay: str = "10 seconds"
) -> DataFrame:
    """Dedup on the key alone, state expiring per watermark — duplicate
    event_ids arriving within the watermark window are dropped even when
    their timestamps differ (the exact semantics of the reference's
    seen-set, minus the 10k-cap data loss)."""
    return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(key_cols)
