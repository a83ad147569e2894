"""Data-quality expectations — declarative constraint gates.

The Delta-Live-Tables/Great-Expectations surface a production pipeline
puts in front of every table it publishes: declare row-level
expectations (not-null, range, accepted values, regex…) plus dataset-
level uniqueness, get back a violation report, and optionally enforce
(drop violating rows or fail the batch).

Scale shape: the REPORT is one aggregate pass — every row-level rule
folds to ``sum(when(not pred, 1))`` in a single map-side-combining
aggregate over one scan (uniqueness rides the same pass as
``count - approx/exact distinct``); nothing is ever collected per
violation. ENFORCEMENT is one filter (the conjunction of row-level
predicates) — whole-stage codegen, no second pass. Streaming: the same
predicates drop into a ``foreachBatch`` or a plain ``where`` on the
stream, which is exactly how DLT expectations execute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: list[str] | None = None,
) -> DataFrame:
    """One row per expectation: (rule, n_violations, n_rows, passed).

    ``rules`` maps a rule name to a BOOLEAN Column that is True when
    the row SATISFIES the expectation (null predicate results count as
    violations — a null check never silently passes). ``unique_keys``
    adds a dataset-level ``unique(<keys>)`` rule whose violation count
    is ``n_rows − n_distinct(keys)`` (exact), computed in the same
    single aggregate pass as everything else.
    """
    if not rules and not unique_keys:
        raise ValueError("expectation_report needs at least one rule")
    aggs = [F.count("*").alias("_n")]
    for name, pred in rules.items():
        # coalesce the SUM too: over an empty frame sum() is null, and a
        # quality report must never emit nullable counts (an empty batch
        # vacuously passes)
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)), F.lit(0)
            ).alias(f"_v_{name}")
        )
    if unique_keys:
        aggs.append(F.count_distinct(*[F.col(k) for k in unique_keys]).alias("_dk"))
    row = df.agg(*aggs)
    reports = []
    for name in rules:
        reports.append(
            row.select(
                F.lit(name).alias("rule"),
                F.col(f"_v_{name}").alias("n_violations"),
                F.col("_n").alias("n_rows"),
                (F.col(f"_v_{name}") == 0).alias("passed"),
            )
        )
    if unique_keys:
        reports.append(
            row.select(
                F.lit(f"unique({','.join(unique_keys)})").alias("rule"),
                (F.col("_n") - F.col("_dk")).alias("n_violations"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") == F.col("_dk")).alias("passed"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def enforce_expectations(
    df: DataFrame, rules: dict[str, Column], mode: str = "drop"
) -> DataFrame:
    """Row-level enforcement: ``drop`` keeps only rows satisfying EVERY
    rule (DLT ``expect_or_drop``); ``fail`` raises on the first
    violating batch (DLT ``expect_or_fail``) — checked with one
    aggregate, so the common all-clean case costs one scan. Dataset-
    level uniqueness is report-only (a row can't know about its twin)."""
    if mode not in ("drop", "fail"):
        raise ValueError(f"unknown enforcement mode {mode!r}")
    conj = None
    for pred in rules.values():
        safe = F.coalesce(pred, F.lit(False))
        conj = safe if conj is None else (conj & safe)
    if conj is None:
        return df
    if mode == "drop":
        return df.where(conj)
    n_bad = df.agg(F.sum(F.when(conj, 0).otherwise(1)).alias("_v")).collect()[0]["_v"]
    if n_bad:
        raise ValueError(f"expectation failure: {n_bad} violating rows")
    return df


def streaming_expectations_sink(
    stream: DataFrame,
    rules: dict[str, Column],
    clean_path: str,
    report_path: str,
    checkpoint: str,
    mode: str = "drop",
):
    """DLT-style streaming expectations: every micro-batch is gated by
    ``rules`` — clean rows append to ``clean_path`` (parquet), and a
    per-batch violation report (batch_id, rule, n_violations, n_rows,
    passed) appends to ``report_path``. ``mode='fail'`` stops the query
    on the first violating batch instead of dropping.

    foreachBatch keeps this exactly-once-shaped: the report and the
    clean write happen inside the batch function, so a replayed batch
    re-emits the same report row (idempotent readers dedupe on
    batch_id). Returns the started StreamingQuery.
    """
    from pyspark.sql import functions as F  # noqa: F811 — local for the closure

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        report = expectation_report(batch_df, rules).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        report.write.mode("append").parquet(report_path)
        if mode == "fail":
            bad = report.where(~F.col("passed")).count()
            if bad:
                raise ValueError(f"expectation failure in batch {batch_id}")
            batch_df.write.mode("append").parquet(clean_path)
        else:
            enforce_expectations(batch_df, rules, mode="drop").write.mode(
                "append"
            ).parquet(clean_path)

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def mode_impute(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | str,
    fallback: str = "UNKNOWN",
) -> DataFrame:
    """Categorical repair: fill NULL ``value_col`` with the per-key MODE
    of the observed values (ties broken toward the LARGEST value —
    ``max(struct(count, value))``, deterministic cross-engine); keys
    with no observed value at all fall back to ``fallback``.

    Shape: one (keys…, value) count aggregate (map-side combined), one
    per-key argmax — constant-size state, the ``min(struct)`` doctrine,
    never a ``row_number() = 1`` sort — and one key-partitioned join
    back onto the fact rows. The mode table is one row per key: small
    relative to the facts, so AQE broadcasts it at real scale.

    Output: input columns + ``<value_col>_filled`` + ``was_imputed``.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    observed = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*key_cols, value_col)
        .agg(F.count("*").alias("_cnt"))
    )
    modes = observed.groupBy(*key_cols).agg(
        F.max(F.struct(F.col("_cnt").alias("c"), F.col(value_col).alias("v")))[
            "v"
        ].alias("_mode")
    )
    return (
        df.join(modes, key_cols, "left")
        .withColumn(
            f"{value_col}_filled",
            F.coalesce(F.col(value_col), F.col("_mode"), F.lit(fallback)),
        )
        .withColumn("was_imputed", F.col(value_col).isNull())
        .drop("_mode")
    )
