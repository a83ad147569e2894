"""Stream-stream joins (SURVEY.md §2.5).

Reference `JoinOperator` (stateful.py:345-465): interval equi-join over
per-key time-bounded buffers pruned at ``watermark - bound``. Spark's
stream-stream join with a time-range condition is the exact idiom — state
retention and pruning derive from the watermarks plus the range bound.
Each matched pair is emitted once (the reference's double emission is an
artifact; SURVEY §7 risk #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_alias: str,
    right_alias: str,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark_delay: str = "10 seconds",
    how: str = "inner",
    projection: list[Column] | None = None,
) -> DataFrame:
    """Interval equi-join of two streams.

    ``lower``/``upper`` are interval strings relative to the left
    timestamp, e.g. ``("0 seconds", "5 minutes")`` joins right events in
    [l.ts, l.ts + 5 min] (the click-attribution example,
    examples/stream_join.py:18-35). Symmetric |Δ| ≤ b is
    ``("-b", "b")``. The reference's `join_func` projection becomes the
    post-join ``projection`` select.
    """
    l = left.withWatermark(left_ts, watermark_delay).alias(left_alias)
    r = right.withWatermark(right_ts, watermark_delay).alias(right_alias)
    key_cond = " AND ".join(f"{left_alias}.{k} = {right_alias}.{k}" for k in on)
    range_cond = (
        f"{right_alias}.{right_ts} >= {left_alias}.{left_ts} + interval {lower.lstrip('-') if lower.startswith('-') else lower}"
        if not lower.startswith("-")
        else f"{right_alias}.{right_ts} >= {left_alias}.{left_ts} - interval {lower.lstrip('-')}"
    )
    range_cond += (
        f" AND {right_alias}.{right_ts} <= {left_alias}.{left_ts} + interval {upper}"
    )
    cond = F.expr(f"{key_cond} AND {range_cond}") if on else F.expr(range_cond)
    joined = l.join(r, cond, how)
    return joined.select(*projection) if projection else joined
