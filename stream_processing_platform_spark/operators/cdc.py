"""CDC apply — change-event envelopes → current state.

The read side of the CDC story (the write side is ``operators/scd.py``
SCD2 merge and ``sinks.scd2_sink``): given a stream/batch of
upsert/delete envelopes (the Debezium/Kafka-connect shape: key, op,
after-image, source sequence), materialize the CURRENT state — last
writer wins, a trailing delete removes the key.

Scale shape: one aggregate keyed on the entity key with the argmax as
``max(struct(seq..., op, payload))`` — map-side combining (each task
reduces its slice of a key's history to one candidate before the
shuffle), no window sort over the full history, no per-key state beyond
the single running max. This is exactly how a 100 TB CDC compaction
behaves: cost = one scan + one key-width shuffle of one row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.cols import as_col_list

DELETE_OP = "d"


def apply_cdc(
    changes: DataFrame,
    key_cols,
    seq_cols,
    op_col: str,
    payload_cols,
) -> DataFrame:
    """Collapse a change history to current state.

    ``seq_cols`` orders a key's events (ties must be broken by the last
    element — pass the source LSN / event id). The latest event wins;
    keys whose latest op is ``DELETE_OP`` disappear. Output: key_cols +
    payload_cols + ``last_seq`` (the winning first seq column) +
    ``n_ops`` (history length folded into this key).
    """
    keys = as_col_list(key_cols)
    seqs = as_col_list(seq_cols)
    payloads = as_col_list(payload_cols)
    winner = F.max(
        F.struct(
            *[F.col(s).alias(f"_s{i}") for i, s in enumerate(seqs)],
            F.col(op_col).alias("_op"),
            *[F.col(p).alias(f"_p{i}") for i, p in enumerate(payloads)],
        )
    )
    agg = changes.groupBy(*keys).agg(
        winner.alias("_w"), F.count("*").alias("n_ops")
    )
    return agg.where(F.col("_w._op") != DELETE_OP).select(
        *keys,
        *[F.col(f"_w._p{i}").alias(p) for i, p in enumerate(payloads)],
        F.col("_w._s0").alias("last_seq"),
        "n_ops",
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff — the inverse of :func:`apply_cdc`: given two
    versions of a keyed table, emit the change set that turns ``old``
    into ``new`` (``added`` / ``removed`` / ``changed``; unchanged rows
    are NOT emitted — the diff is the output).

    Shape: one full outer join co-partitioned on the key (both sides
    shuffle once on the same key — no broadcast assumption, snapshots
    are both big), change classification from null-ness of each side's
    key and a null-safe struct comparison of the compare columns. This
    is the table-format "change data feed" primitive computed from
    plain snapshots — what a 100 TB lake runs to reconcile a replica
    or derive an incremental feed after the fact.

    Output: key cols + ``change`` + ``old_<c>``/``new_<c>`` per compare
    column (original values; callers coalesce to sentinels if they
    need never-null output).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if isinstance(compare_cols, str):
        compare_cols = [compare_cols]
    o = old.select(*key_cols, *compare_cols)
    n = new.select(*key_cols, *compare_cols)
    # presence markers, not key null-ness: a legitimately-NULL key
    # column must neither break the match (eqNullSafe) nor masquerade
    # as an absent side
    o2 = o.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n2 = n.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o2.join(n2, cond, "full_outer")
    in_old = F.coalesce(F.col("_in_old"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))
    same = F.struct(*[F.col(f"old_{c}") for c in compare_cols]).eqNullSafe(
        F.struct(*[F.col(f"new_{c}") for c in compare_cols])
    )
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    keys_out = [
        F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k) for k in key_cols
    ]
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *keys_out,
            "change",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
