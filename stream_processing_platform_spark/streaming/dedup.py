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

    With ``ts_col``, dedup is still on the key ALONE — state is bounded
    by routing to ``dropDuplicatesWithinWatermark(key_cols)``, which
    drops any later record with a seen key while its state lives (the
    reference's per-key seen-set semantics, minus the 10k-cap data
    loss). Without ``ts_col`` state grows unboundedly (only for
    tests/small keyspaces).

    Note ``dropDuplicates([*keys, ts_col])`` would NOT implement this:
    it dedups per (key, timestamp) pair, so the same key at different
    timestamps passes through — a different operator.
    """
    if ts_col is not None:
        return dedup_stream_within_watermark(df, key_cols, ts_col, watermark_delay)
    return df.dropDuplicates(key_cols)


def dedup_stream_within_watermark(
    df: DataFrame, key_cols: list[str], ts_col: str, watermark_delay: str = "10 seconds"
) -> DataFrame:
    """Dedup on the key alone, state expiring per watermark — duplicate
    event_ids arriving within the watermark window are dropped even when
    their timestamps differ (the exact semantics of the reference's
    seen-set, minus the 10k-cap data loss)."""
    return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(key_cols)
