"""Time-series operators: OHLC resampling and gap-filled interpolation.

The hypertable-style surface a metrics/tick store needs on top of the
tumbling-window batch twin (``operators/windows_batch.py``):

- ``ohlc_bars`` — downsample a point series into bars: open/close via
  ``min(struct(ts, seq, value))`` / ``max(struct(...))`` argmin/argmax
  (map-side combining — never a rank window over the expansion, per the
  profiling rule in CLAUDE.md), high/low/volume as plain aggregates.
  One shuffle keyed on (series, bucket).
- ``gap_fill`` — densify each series onto a regular grid between its
  first and last observed bucket (``sequence()`` explode — no driver
  loop, no cross join against a global calendar), then fill the empty
  buckets by LOCF (last-observation-carried-forward) or linear
  interpolation between the neighbouring observations. The fills are
  window functions with IGNORE NULLS over the series key — one shuffle,
  state bounded per key.

Everything is exact-integer arithmetic end to end (epoch-ms buckets,
money/metric values in integer cents, quotients rounded via
``floor(x + 0.5)``) so the duckdb oracles hash-MATCH bit-for-bit — the
cross-engine float rules from CLAUDE.md.

Scale notes (100 TB): both operators shuffle once on the series key;
grid densification expands to (span/step) rows per key — bounded by the
operator's step parameter, and generated where the key already lives
(sequence+explode after the per-key bounds aggregate), never as a
global calendar broadcast. Skewed keys (one series with a years-long
span) bound their own expansion independently.

The reference engine has no time-series surface (windows only); this is
part of the LLM/analytics extension surface alongside SURVEY.md §7.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.cols import as_col_list
from stream_processing_platform_spark.operators.windows_batch import epoch_ms


def _bucket(ts_ms, every_ms: int):
    return (F.floor(ts_ms / F.lit(every_ms)) * every_ms).cast("long")


def ohlc_bars(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols,
    every_ms: int,
    seq_col: str,
) -> DataFrame:
    """Resample (key, ts, value) points into OHLC bars of ``every_ms``.

    ``seq_col`` breaks ts ties deterministically (any unique id). Values
    are scaled to integer cents before any aggregate, so sums and the
    open/close argmin/argmax are exact cross-engine. Output per (key,
    bucket_ms): open_c/high_c/low_c/close_c/sum_c (BIGINT cents), n.
    """
    keys = as_col_list(key_cols)
    cents = F.round(F.col(value_col) * 100).cast("long")
    ts_ms = epoch_ms(F.col(ts_col))
    pt = F.struct(
        ts_ms.alias("t"), F.col(seq_col).alias("s"), cents.alias("v")
    )
    prepped = df.select(
        *keys, _bucket(ts_ms, every_ms).alias("bucket_ms"), pt.alias("_p"), cents.alias("_c")
    )
    return prepped.groupBy(*[c for c in prepped.columns if c not in ("_p", "_c")]).agg(
        F.min("_p")["v"].alias("open_c"),
        F.max("_c").alias("high_c"),
        F.min("_c").alias("low_c"),
        F.max("_p")["v"].alias("close_c"),
        F.sum("_c").alias("sum_c"),
        F.count("*").alias("n"),
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    every_ms: int,
    method: str = "locf",
) -> DataFrame:
    """Densify each key's series onto an ``every_ms`` grid between its
    first and last observed bucket, and fill empty buckets.

    Observed buckets aggregate to mean value in integer cents
    (``floor(sum(cents)/n + 0.5)`` — exact cross-engine). Fill methods:

    - ``locf``: last observation carried forward. Never null: the grid
      starts at each key's first observed bucket.
    - ``linear``: straight line between the previous and next observed
      buckets, rounded half-up to a cent. Grid endpoints are observed,
      so both neighbours always exist.

    Output: key_col, bucket_ms, cents (BIGINT), observed (0/1 INT).
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown fill method {method!r}")
    cents = F.round(F.col(value_col) * 100).cast("long")
    obs = (
        df.select(
            F.col(key_col), _bucket(epoch_ms(F.col(ts_col)), every_ms).alias("bucket_ms"),
            cents.alias("_c"),
        )
        .groupBy(key_col, "bucket_ms")
        .agg(F.floor(F.sum("_c") / F.count("*") + 0.5).cast("long").alias("_obs"))
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket_ms").alias("_mn"), F.max("bucket_ms").alias("_mx"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.lit(every_ms).cast("long"))
            ).alias("bucket_ms"),
        )
    )
    joined = grid.join(obs, [key_col, "bucket_ms"], "left")
    w_prev = (
        Window.partitionBy(key_col).orderBy("bucket_ms").rowsBetween(Window.unboundedPreceding, 0)
    )
    observed = F.when(F.col("_obs").isNotNull(), 1).otherwise(0).cast("int")
    if method == "locf":
        filled = F.last("_obs", ignorenulls=True).over(w_prev)
        return joined.select(
            key_col, "bucket_ms", filled.alias("cents"), observed.alias("observed")
        )
    w_next = (
        Window.partitionBy(key_col).orderBy("bucket_ms").rowsBetween(0, Window.unboundedFollowing)
    )
    ob = F.when(F.col("_obs").isNotNull(), F.col("bucket_ms"))
    pv = F.last("_obs", ignorenulls=True).over(w_prev)
    pb = F.last(ob, ignorenulls=True).over(w_prev)
    nv = F.first("_obs", ignorenulls=True).over(w_next)
    nb = F.first(ob, ignorenulls=True).over(w_next)
    # Observed rows: pv == nv == the value (pb == nb makes the slope term
    # 0/0 — guard with the observed branch instead of dividing).
    interp = F.when(
        F.col("_obs").isNotNull(), F.col("_obs")
    ).otherwise(
        F.floor(pv + ((nv - pv) * (F.col("bucket_ms") - pb)) / (nb - pb) + 0.5).cast("long")
    )
    return joined.select(
        key_col, "bucket_ms", interp.cast("long").alias("cents"), observed.alias("observed")
    )
