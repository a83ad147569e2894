"""Slowly-changing-dimension type-2 maintenance (batch CDC merge).

Reference parity: none — the reference keeps no dimension history. This
is warehouse-engine surface the LLM-pipeline side also needs (e.g.
tracking document-source metadata or label revisions over time without
losing the previous value).

``scd2_apply(current, updates)`` produces the next snapshot of an SCD2
table: for every key in ``updates`` whose tracked attributes differ
from the key's open row, the open row is closed (``valid_to`` = the
update's effective time, ``is_current`` = 0) and a new open row is
appended; unchanged updates are no-ops; unseen keys are inserted.

Scale shape: ONE left join of the dimension against the (latest-per-
key) update batch — the update side is a CDC batch, typically orders of
magnitude smaller than the dimension, so hint-broadcast it when known
small. Latest-per-key uses the map-side `max(struct(...))` argmax (no
ranking window). History rows (``is_current`` = 0) pass through the
join untouched; at scale, partition the stored table by ``is_current``
(or keep an open/closed split) so the merge scans only open rows.
Everything is deterministic integer/exact arithmetic — the operator is
fully DuckDB-oracle-checkable (q_scd2_customers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END_MS = 253_402_300_800_000  # 9999-01-01: the conventional open horizon


def scd2_init(
    dim: DataFrame, key_cols: list[str], tracked_cols: list[str], valid_from_ms: int = 0
) -> DataFrame:
    """Bootstrap an SCD2 table from a plain dimension snapshot."""
    return dim.select(
        *key_cols,
        *tracked_cols,
        F.lit(valid_from_ms).cast("long").alias("valid_from_ms"),
        F.lit(OPEN_END_MS).cast("long").alias("valid_to_ms"),
        F.lit(1).cast("int").alias("is_current"),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_ms_col: str = "effective_ms",
) -> DataFrame:
    """Next SCD2 snapshot after applying one CDC batch.

    ``updates`` columns: key_cols + tracked_cols + effective_ms_col.
    Multiple updates per key in one batch collapse to the latest
    (greatest effective time, ties broken by the tracked values via the
    struct ordering — deterministic).
    """
    upd_struct = F.struct(
        F.col(effective_ms_col), *[F.col(c) for c in tracked_cols]
    )
    latest = updates.groupBy(*key_cols).agg(F.max(upd_struct).alias("_u"))
    latest = latest.select(
        *key_cols,
        F.col(f"_u.{effective_ms_col}").alias("_eff"),
        *[F.col(f"_u.{c}").alias(f"_new_{c}") for c in tracked_cols],
    )
    j = current.join(latest, key_cols, "left_outer")
    has_upd = F.col("_eff").isNotNull()
    # null-safe comparison: NULL -> value (or back) counts as a change,
    # where a plain != would yield NULL and silently drop the close
    differs = None
    for c in tracked_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"_new_{c}"))
        differs = d if differs is None else (differs | d)
    closes = (F.col("is_current") == 1) & has_upd & differs

    # Existing rows: history passes through; a closing open row gets its
    # valid_to stamped and the flag dropped.
    kept = j.select(
        *key_cols,
        *tracked_cols,
        "valid_from_ms",
        F.when(closes, F.col("_eff")).otherwise(F.col("valid_to_ms")).alias("valid_to_ms"),
        F.when(closes, F.lit(0)).otherwise(F.col("is_current")).cast("int").alias("is_current"),
    )
    # Replacement open rows for changed keys.
    opened = j.where(closes).select(
        *key_cols,
        *[F.col(f"_new_{c}").alias(c) for c in tracked_cols],
        F.col("_eff").alias("valid_from_ms"),
        F.lit(OPEN_END_MS).cast("long").alias("valid_to_ms"),
        F.lit(1).cast("int").alias("is_current"),
    )
    # Brand-new keys: no row at all in the current table.
    inserted = (
        latest.join(current.select(*key_cols).distinct(), key_cols, "left_anti")
        .select(
            *key_cols,
            *[F.col(f"_new_{c}").alias(c) for c in tracked_cols],
            F.col("_eff").alias("valid_from_ms"),
            F.lit(OPEN_END_MS).cast("long").alias("valid_to_ms"),
            F.lit(1).cast("int").alias("is_current"),
        )
    )
    return kept.unionAll(opened).unionAll(inserted)
