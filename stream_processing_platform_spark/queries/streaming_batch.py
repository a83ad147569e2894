"""Batch twins of the streaming window operators (SURVEY.md §2.4/2.6).

These run the same event-time window assignment the streaming layer uses
(`streaming/windows.py`) on the bounded `events` table, so the duckdb
oracle can check window semantics exactly: tumbling (`TumblingWindow`,
stateful.py:42-56), sliding (`SlidingWindow`, stateful.py:59-85), session
(documented-only in the reference, docs/api_reference.md:257-262), and
the windowed-reduce emission (WindowOperator, stateful.py:147-262).
Window starts are epoch-ms BIGINT: ``start = (ts // size) * size`` —
bit-identical to both the reference formula and Spark's ``window()``
alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_platform_spark.operators import windows_batch
from stream_processing_platform_spark.registry import query
from stream_processing_platform_spark.tables import load_table

HOUR_MS = 3_600_000
HALF_HOUR_MS = 1_800_000


def _events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows_batch.with_epoch_ms(load_table(spark, sf_dir, "events"), "ts")


@query(
    "q_window_tumbling",
    oracle=f"""
    SELECT CAST(floor(epoch_ms(ts) / {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="Tumbling 1 h event-time window + per-type reduce "
    "(WindowOperator reduce mode, fire-once semantics → final window "
    "results).",
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = windows_batch.assign_tumbling(_events_ms(spark, sf_dir), "ts_ms", HOUR_MS)
    return e.groupBy("window_start", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "q_window_sliding",
    oracle=f"""
    SELECT CAST(CAST(floor(epoch_ms(e.ts) / {HALF_HOUR_MS}) AS BIGINT) * {HALF_HOUR_MS}
                - g.k * {HALF_HOUR_MS} AS BIGINT) AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 2)   AS sum_value
    FROM events e
    CROSS JOIN generate_series(0, 1) AS g(k)
    WHERE CAST(floor(epoch_ms(e.ts) / {HALF_HOUR_MS}) AS BIGINT) * {HALF_HOUR_MS}
          - g.k * {HALF_HOUR_MS} > epoch_ms(e.ts) - {HOUR_MS}
    GROUP BY 1
    """,
    description="Sliding window 1 h size / 30 min slide "
    "(SlidingWindow.assign_windows, stateful.py:59-85): each event lands "
    "in size/slide overlapping windows.",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = windows_batch.assign_sliding(_events_ms(spark, sf_dir), "ts_ms", HOUR_MS, HALF_HOUR_MS)
    return e.groupBy("window_start").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "q_window_session",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                         OR lag(epoch_ms(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC)
    ), sessions AS (
        SELECT user_id, event_id, ts_ms,
               CAST(sum(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts_ms ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT)  AS n_events,
           CAST(min(ts_ms) AS BIGINT) AS session_start_ms,
           CAST(max(ts_ms) AS BIGINT) AS session_end_ms,
           CAST(max(ts_ms) - min(ts_ms) AS BIGINT) AS duration_ms
    FROM sessions
    GROUP BY user_id, session_id
    """,
    description="Session windows, 30 min gap (SessionWindow — documented "
    "but unimplemented in the reference, docs/api_reference.md:257-262; "
    "implemented here via gaps-and-islands; streaming twin uses "
    "session_window()).",
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = windows_batch.sessionize(
        _events_ms(spark, sf_dir), "ts_ms", ["user_id"], HALF_HOUR_MS, tiebreak_col="event_id"
    )
    return e.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


@query(
    "q_window_collect",
    oracle="""
    SELECT CAST(floor(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS window_start,
           user_id,
           CAST(count(*) AS BIGINT) AS n_elems,
           array_to_string(list_sort(list(event_id)), ',') AS elem_ids
    FROM events
    GROUP BY 1, 2
    """,
    description="WindowOperator without reduce_func (stateful.py:226-231): "
    "emit the window's raw element list (collect_list, sorted for "
    "determinism; serialized to CSV because the driver compare only "
    "sorts scalar columns).",
)
def q_window_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = windows_batch.assign_tumbling(_events_ms(spark, sf_dir), "ts_ms", HOUR_MS)
    return e.groupBy("window_start", "user_id").agg(
        F.count("*").alias("n_elems"),
        F.concat_ws(",", F.array_sort(F.collect_list("event_id"))).alias("elem_ids"),
    )


@query(
    "q_hierarchical_rollup",
    oracle=f"""
    SELECT l.level_ms, e.event_type,
           CAST(epoch_ms(e.ts) - epoch_ms(e.ts) % l.level_ms AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(min(round(e.value * 100)) AS BIGINT) AS min_cents,
           CAST(max(round(e.value * 100)) AS BIGINT) AS max_cents
    FROM events e
    CROSS JOIN (VALUES ({HOUR_MS}), ({HOUR_MS} * 6), ({HOUR_MS} * 24)) AS l(level_ms)
    GROUP BY 1, 2, 3
    """,
    description="Hierarchical rollup pyramid (continuous-aggregate "
    "pattern, operators/rollup.py): hour -> 6 h -> day resolutions where "
    "each coarser level aggregates the PREVIOUS level's partials — one "
    "fact scan total, partial-to-partial shuffles of |buckets| rows. The "
    "oracle computes every level DIRECTLY from raw events, so the MATCH "
    "proves sum-of-sums == direct sum at each resolution (exact integer "
    "cents; min/max fold losslessly). The one-scan plan property is "
    "gated in tests/test_rollup.py.",
)
def q_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.operators.rollup import hierarchical_rollup

    e = _events_ms(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    levels = hierarchical_rollup(
        e, "ts_ms", ["event_type"], "cents", [HOUR_MS, HOUR_MS * 6, HOUR_MS * 24]
    )
    out = None
    for size, lvl in zip([HOUR_MS, HOUR_MS * 6, HOUR_MS * 24], levels):
        one = lvl.select(
            F.lit(size).cast("int").alias("level_ms"),
            "event_type",
            "bucket",
            "cnt",
            F.col("sum_v").alias("sum_cents"),
            F.col("min_v").alias("min_cents"),
            F.col("max_v").alias("max_cents"),
        )
        out = one if out is None else out.unionAll(one)
    return out
