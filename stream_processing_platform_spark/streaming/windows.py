"""Streaming event-time windows (SURVEY.md §2.4/§2.6).

Reference semantics reproduced declaratively:
- `WindowOperator` reduce mode (stateful.py:147-262): fire once when the
  watermark passes window end, then drop state, no late data →
  ``withWatermark`` + ``window()`` + append output mode. Spark's
  ``window()`` start alignment is identical to the reference's
  ``(ts // size) * size`` (stateful.py:54).
- `AggregateOperator` (stateful.py:265-342): running per-key aggregate
  emitted on every update → update output mode (per-micro-batch
  granularity; the per-record trickle is an artifact of row-at-a-time
  execution, SURVEY §7 risk #1).
- `SessionWindow`: promised by the reference's docs but never
  implemented (docs/api_reference.md:257-262) — ``session_window()``.
- Watermark generation (watermarks.py:60-197): max-event-time minus
  bound → ``withWatermark(col, delay)``.

Every helper returns an un-started streaming DataFrame; pick the sink
and output mode at the edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str = "5 seconds") -> DataFrame:
    """BoundedOutOfOrdernessWatermark (common/watermarks.py:60-85): the
    default 5 s bound mirrors the reference's config default
    (common/config.py:55)."""
    return df.withWatermark(ts_col, delay)


def _flatten_window(df: DataFrame, window_col: str, start_alias: str, end_alias: str) -> DataFrame:
    others = [c for c in df.columns if c != window_col]
    return df.select(
        F.col(f"{window_col}.start").alias(start_alias),
        F.col(f"{window_col}.end").alias(end_alias),
        *others,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    key_cols: list[str],
    aggs: list[Column],
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """TumblingWindow + reduce (fire-at-watermark ≡ append mode)."""
    out = (
        with_watermark(df, ts_col, watermark_delay)
        .groupBy(F.window(ts_col, size).alias("window"), *key_cols)
        .agg(*aggs)
    )
    return _flatten_window(out, "window", "window_start", "window_end")


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    key_cols: list[str],
    aggs: list[Column],
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """SlidingWindow (stateful.py:59-85): overlapping windows, one result
    per (window, key) at watermark."""
    out = (
        with_watermark(df, ts_col, watermark_delay)
        .groupBy(F.window(ts_col, size, slide).alias("window"), *key_cols)
        .agg(*aggs)
    )
    return _flatten_window(out, "window", "window_start", "window_end")


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str | Column,
    key_cols: list[str],
    aggs: list[Column],
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """SessionWindow(gap) — implementing what the reference only
    documented (docs/api_reference.md:257-262).

    ``watermark_delay`` is the ALLOWED-LATENESS knob. The reference
    silently drops any row arriving after its session fired
    (taskmanager/operators/stateful.py:213-242 deletes fired windows);
    Spark expresses the same policy as a watermark contract: a row
    whose event time is below the watermark is dropped, and the
    watermark trails the max seen event time by exactly this delay. So
    delay ≈ 0 reproduces the reference's drop-after-fire semantics
    (sessions also FIRE promptly), while a large delay admits and
    merges late rows at the cost of holding sessions open longer —
    both pinned live in tests/test_streaming.py
    (test_session_window_drops_late_data /
    test_session_window_allowed_lateness_admits_late_row).

    ``gap`` may also be a Column expression (DYNAMIC gap — e.g. a
    per-event-type duration): each event then proposes the interval
    [ts, ts + its own gap) and overlapping proposals merge, so the
    session end is the max of the merged events' individual ends
    (`q_stream_window_session_dynamic` oracle-checks this live)."""
    out = (
        with_watermark(df, ts_col, watermark_delay)
        .groupBy(F.session_window(ts_col, gap).alias("session_window"), *key_cols)
        .agg(*aggs)
    )
    return _flatten_window(out, "session_window", "session_start", "session_end")


def running_agg(df: DataFrame, key_cols: list[str], aggs: list[Column]) -> DataFrame:
    """AggregateOperator: unbounded per-key running aggregate. Use with
    ``outputMode("update")`` — emit granularity is per micro-batch."""
    return df.groupBy(*key_cols).agg(*aggs)
