"""Event-time window assignment — batch twins of the streaming windows.

Reference semantics (``taskmanager/operators/stateful.py:42-85``):
- TumblingWindow: ``start = (ts // size) * size``, one window per event.
- SlidingWindow: every window of size S, slide P, whose span covers ts;
  starts are aligned to multiples of P (same alignment as Spark's
  ``window()``).
- SessionWindow: documented-but-unimplemented in the reference
  (``docs/api_reference.md:257-262``); we implement it properly — gap-based
  sessionization via gaps-and-islands (lag + cumulative sum), which is the
  batch equivalent of ``session_window()``.

All functions work on epoch-millisecond BIGINT arithmetic so results are
timezone-free and bit-identical to the duckdb oracle. Window assignment is
a narrow operation (no shuffle); only the subsequent groupBy shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_ms(ts: Column) -> Column:
    """Epoch-ms BIGINT from a timestamp column. Parquet timestamps load as
    TIMESTAMP_NTZ in Spark 4; with the session zone pinned to UTC the cast
    is zone-free and matches duckdb's epoch_ms exactly."""
    return F.unix_millis(ts.cast("timestamp"))


def with_epoch_ms(df: DataFrame, ts_col: str, out_col: str = "ts_ms") -> DataFrame:
    """Derive epoch-ms BIGINT from a timestamp column."""
    return df.withColumn(out_col, epoch_ms(F.col(ts_col)))


def tumbling_window_start(ts_ms: Column, size_ms: int) -> Column:
    """``start = (ts // size) * size`` — identical to stateful.py:54."""
    return (F.floor(ts_ms / size_ms) * size_ms).cast("long")


def assign_tumbling(df: DataFrame, ts_ms_col: str, size_ms: int, out_col: str = "window_start") -> DataFrame:
    return df.withColumn(out_col, tumbling_window_start(F.col(ts_ms_col), size_ms))


def assign_sliding(
    df: DataFrame,
    ts_ms_col: str,
    size_ms: int,
    slide_ms: int,
    out_col: str = "window_start",
) -> DataFrame:
    """Explode each row into the size/slide overlapping windows covering it.

    Emits one row per (row, window) pair — exactly SlidingWindow.assign_windows
    (``stateful.py:59-85``). size must be a multiple of slide.
    """
    if size_ms % slide_ms:
        raise ValueError("size_ms must be a multiple of slide_ms")
    n = size_ms // slide_ms
    ts = F.col(ts_ms_col)
    latest = (F.floor(ts / slide_ms) * slide_ms).cast("long")
    k = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_k")
    return (
        df.select("*", k)
        .withColumn(out_col, (latest - F.col("_k") * slide_ms).cast("long"))
        .where(F.col(out_col) > ts - size_ms)
        .drop("_k")
    )


def sessionize(
    df: DataFrame,
    ts_ms_col: str,
    key_cols: list[str],
    gap_ms: int,
    tiebreak_col: str,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (SessionWindow semantics, batch form).

    A new session starts when the gap to the previous event of the same key
    is > gap_ms. ``tiebreak_col`` makes ordering deterministic for equal
    timestamps. Scales as a single per-key sort (one shuffle on key_cols);
    no driver-side state.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_ms_col, tiebreak_col)
    is_new = (
        F.when(F.col(ts_ms_col) - F.lag(ts_ms_col).over(w) > gap_ms, 1)
        .otherwise(F.when(F.lag(ts_ms_col).over(w).isNull(), 1).otherwise(0))
    )
    return df.withColumn(session_col, F.sum(is_new).over(w).cast("long"))
