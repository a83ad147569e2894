"""Live Structured Streaming queries inside the correctness gate.

Unlike streaming_batch.py (batch *twins* of the window operators), these
run an actual streaming job — file source over the staged events table →
watermarked stateful operator → memory sink, availableNow trigger — and
return the sink table as the result DataFrame. The duckdb oracle then
checks the STREAMING engine's output itself, not a batch re-expression:
the strongest possible parity statement for the reference's runtime
(WindowOperator stateful.py:147-262, AggregateOperator stateful.py:
265-342, dedup examples/stateful_deduplication.py:18-49).

Update output mode + a single availableNow batch means every window/key
emits exactly its final aggregate, which is what the SQL oracle computes.
Each invocation uses a fresh query name + checkpoint (driver may call a
query more than once).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from stream_processing_platform_spark.operators.windows_batch import epoch_ms
from stream_processing_platform_spark.registry import query
from stream_processing_platform_spark.sources.streaming import file_source
from stream_processing_platform_spark.streaming import windows as W

HOUR_MS = 3_600_000


FLUSH_USER = -1


def _events_stream(spark: SparkSession, sf_dir: str, flush_files: int = 0) -> DataFrame:
    """Stream the events table: stage the single parquet file into a
    directory (file source wants one), normalize the nanos-as-long ts.

    ``flush_files`` > 0 stages that many extra single-row files carrying
    a dummy user (FLUSH_USER) with timestamps far past the real data,
    processed one file per micro-batch AFTER the real data. Append-mode
    stateful operators only emit state the watermark has passed, and the
    watermark observed by batch N is the max event time of batch N-1 —
    so two flush batches push the watermark beyond every real session
    and force full emission, deterministically, inside one availableNow
    run. Callers filter FLUSH_USER back out."""
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    static = spark.read.parquet(path)
    stage = tempfile.mkdtemp(prefix="spp_stream_src_")
    os.symlink(path, os.path.join(stage, "events.parquet"))
    is_long_ts = isinstance(static.schema["ts"].dataType, LongType)
    if flush_files:
        import glob
        import shutil

        mx = static.groupBy().agg(F.max("ts").alias("_mx"))
        for i in range(flush_files):
            # one row, FLUSH_USER, ts = max(real ts) + (i+1) days
            day = (i + 1) * 86_400
            if is_long_ts:
                ts_expr = F.col("_mx") + F.lit(day * 1_000_000_000)  # nanos
            else:
                ts_expr = F.timestamp_micros(
                    F.unix_micros(F.col("_mx").cast("timestamp")) + F.lit(day * 1_000_000)
                ).cast(static.schema["ts"].dataType)
            flush = mx.select(
                F.lit(-9_000_000 - i).cast("long").alias("event_id"),
                ts_expr.alias("ts"),
                F.lit(FLUSH_USER).cast("long").alias("user_id"),
                F.lit("flush").alias("event_type"),
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            ).select(*static.columns)
            tmp = tempfile.mkdtemp(prefix="spp_flush_")
            flush.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(stage, f"zz_flush_{i + 1}.parquet"))
    stream = file_source(
        spark, stage, static.schema, max_files_per_trigger=1 if flush_files else None
    )
    if is_long_ts:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(static.schema["ts"].dataType, TimestampNTZType):
        # parquet micros without a UTC flag load as TIMESTAMP_NTZ, which
        # withWatermark rejects; session zone is pinned UTC, so the cast
        # is instant-preserving
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_table(df: DataFrame, mode: str = "update") -> DataFrame:
    spark = df.sparkSession
    name = "live_" + uuid.uuid4().hex[:10]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="spp_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_window_tumbling",
    oracle=f"""
    SELECT CAST(floor(epoch_ms(ts) / {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="LIVE Structured Streaming run of WindowOperator "
    "(stateful.py:147-262): file stream → watermark → 1 h tumbling window "
    "→ memory sink; the streaming engine's own output is oracle-checked.",
)
def q_stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    windowed = W.tumbling_agg(
        _events_stream(spark, sf_dir),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    out = _run_to_table(windowed)
    return out.select(
        epoch_ms(F.col("window_start")).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


@query(
    "q_stream_running_agg",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           sum(round(value * 100)) / 100.0 AS total
    FROM events
    GROUP BY user_id
    """,
    description="LIVE streaming run of AggregateOperator (stateful.py:"
    "265-342): running per-key aggregate in update mode — final emission "
    "per key equals the batch GROUP BY. Accumulates exact integer cents "
    "(order-independent; mergeable across micro-batch state updates) — "
    "round(sum(double)) diverges cross-engine at .005 boundaries.",
)
def q_stream_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = W.running_agg(
        _events_stream(spark, sf_dir),
        ["user_id"],
        [
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0)) / 100.0).alias("total"),
        ],
    )
    return _run_to_table(agg)


@query(
    "q_stream_window_session",
    oracle="""
    WITH ordered AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, value,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                         OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) >= 1800000
                         OR lag(epoch_ms(ts))
                            OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts_ms, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    )
    SELECT user_id,
           CAST(min(ts_ms) AS BIGINT) AS session_start_ms,
           CAST(max(ts_ms) + 1800000 AS BIGINT) AS session_end_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, sid
    """,
    description="LIVE streaming run of SessionWindow (documented-only in "
    "the reference, docs/api_reference.md:257-262): session_window() with "
    "30 min gap per user, APPEND mode (sessions emit only when the "
    "watermark finalizes them — two staged flush batches push the "
    "watermark past every real session). Spark session semantics: window "
    "is [first_ts, last_ts + gap); an event merges iff it lands strictly "
    "inside, so a gap of exactly 30 min starts a NEW session — the "
    "oracle's gaps-and-islands encodes the same >= boundary.",
)
def q_stream_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = W.session_agg(
        _events_stream(spark, sf_dir, flush_files=2),
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    out = _run_to_table(agg, mode="append")
    return out.where(F.col("user_id") != FLUSH_USER).select(
        "user_id",
        epoch_ms(F.col("session_start")).alias("session_start_ms"),
        epoch_ms(F.col("session_end")).alias("session_end_ms"),
        "n_events",
        "sum_value",
    )


@query(
    "q_stream_window_session_dynamic",
    oracle="""
    WITH g AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, value,
               CASE WHEN event_type = 'purchase' THEN 2700000
                    ELSE 1800000 END AS gap
        FROM events
    ), ordered AS (
        SELECT user_id, ts_ms, value, gap,
               CASE WHEN max(ts_ms + gap)
                         OVER (PARTITION BY user_id ORDER BY ts_ms
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         > ts_ms
                    THEN 0 ELSE 1 END AS is_new
        FROM g
    ), sessions AS (
        SELECT user_id, ts_ms, value, gap,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sid
        FROM ordered
    )
    SELECT user_id,
           CAST(min(ts_ms) AS BIGINT) AS session_start_ms,
           CAST(max(ts_ms + gap) AS BIGINT) AS session_end_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, sid
    """,
    description="LIVE streaming SessionWindow with a DYNAMIC per-event "
    "gap (session_window with a Column gap expression: purchases hold "
    "the session open 45 min, everything else 30 min). Each event "
    "proposes [ts, ts + its own gap) and overlapping proposals merge, "
    "so the session end is the max of the merged events' individual "
    "ends — the oracle is the interval-merging gaps-and-islands form "
    "(running max of proposed ends; a row starts a new session iff no "
    "earlier proposal still covers its timestamp). APPEND mode with "
    "two watermark-flush batches, same staging as the fixed-gap form.",
)
def q_stream_window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise(
        "30 minutes"
    )
    agg = W.session_agg(
        _events_stream(spark, sf_dir, flush_files=2),
        "ts",
        gap,
        ["user_id"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    out = _run_to_table(agg, mode="append")
    return out.where(F.col("user_id") != FLUSH_USER).select(
        "user_id",
        epoch_ms(F.col("session_start")).alias("session_start_ms"),
        epoch_ms(F.col("session_end")).alias("session_end_ms"),
        "n_events",
        "sum_value",
    )


@query(
    "q_stream_join_interval",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
           CAST(epoch_ms(b.ts) - epoch_ms(a.ts) AS BIGINT) AS delta_ms
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.event_type = 'purchase'
     AND a.event_type = 'click'
     AND epoch_ms(b.ts) >= epoch_ms(a.ts)
     AND epoch_ms(b.ts) <= epoch_ms(a.ts) + 1800000
    """,
    description="LIVE stream-stream run of JoinOperator (stateful.py:"
    "345-465): two file streams (clicks, purchases) joined on user_id "
    "with a [0, 30 min] time-range condition — per-key time-bounded "
    "buffers pruned by watermark, matched pairs emitted once; equals the "
    "batch twin q_join_interval.",
)
def q_stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.joins import stream_interval_join

    clicks = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = stream_interval_join(
        clicks,
        purchases,
        "c",
        "p",
        on=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower="0 seconds",
        upper="30 minutes",
        projection=[
            F.col("click_id"),
            F.col("purchase_id"),
            F.col("c.user_id").alias("user_id"),
            (epoch_ms(F.col("purchase_ts")) - epoch_ms(F.col("click_ts"))).alias("delta_ms"),
        ],
    )
    return _run_to_table(joined, mode="append")


@query(
    "q_stream_join_left",
    oracle="""
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.click_id,
           CAST(COALESCE(p.purchase_id, -1) AS BIGINT) AS purchase_id,
           c.user_id,
           CAST(COALESCE(epoch_ms(p.purchase_ts) - epoch_ms(c.click_ts), -1)
                AS BIGINT) AS delta_ms
    FROM c LEFT JOIN p
      ON c.user_id = p.user_id
     AND epoch_ms(p.purchase_ts) >= epoch_ms(c.click_ts)
     AND epoch_ms(p.purchase_ts) <= epoch_ms(c.click_ts) + 1800000
    """,
    description="LIVE stream-stream LEFT OUTER interval join (beyond the "
    "reference's inner-only JoinOperator): clicks with no purchase in "
    "[0, 30 min] emit null-extended (sentinel -1) once the watermark "
    "passes their join window. Flush rows ride BOTH streams so every "
    "real click's window provably closes inside one availableNow run — "
    "the full batch LEFT JOIN is the oracle, no trailing-edge carve-out. "
    "State bound: watermark + range condition prune both buffers, same "
    "as the inner variant.",
)
def q_stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.joins import stream_interval_join

    # keep flush rows IN each stream: the watermark column is observed
    # after this filter, and only the flush timestamps push it past the
    # last real click's [ts, ts+30min] window
    clicks = (
        _events_stream(spark, sf_dir, flush_files=2)
        .where(F.col("event_type").isin("click", "flush"))
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        _events_stream(spark, sf_dir, flush_files=2)
        .where(F.col("event_type").isin("purchase", "flush"))
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = stream_interval_join(
        clicks,
        purchases,
        "c",
        "p",
        on=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower="0 seconds",
        upper="30 minutes",
        how="left_outer",
        projection=[
            F.col("click_id"),
            F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
            F.col("c.user_id").alias("user_id"),
            F.coalesce(
                epoch_ms(F.col("purchase_ts")) - epoch_ms(F.col("click_ts")), F.lit(-1)
            ).alias("delta_ms"),
        ],
    )
    out = _run_to_table(joined, mode="append")
    return out.where(F.col("user_id") != FLUSH_USER)


@query(
    "q_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    """,
    description="LIVE streaming run of the dedup pipeline "
    "(examples/stateful_deduplication.py:18-49 semantics): streaming "
    "dropDuplicates on the key columns; key set equals batch DISTINCT.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir).select("user_id", "event_type")
    return _run_to_table(stream.dropDuplicates(["user_id", "event_type"]), mode="append")


HALF_HOUR_MS = 1_800_000


@query(
    "q_stream_window_sliding",
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
    description="LIVE streaming run of SlidingWindow (stateful.py:59-85): "
    "1 h window / 30 min slide over the event stream, update mode — each "
    "event lands in size/slide overlapping windows; final per-window "
    "emission equals the batch assignment the oracle computes.",
)
def q_stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    windowed = W.sliding_agg(
        _events_stream(spark, sf_dir),
        "ts",
        "1 hour",
        "30 minutes",
        [],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    out = _run_to_table(windowed)
    return out.select(
        epoch_ms(F.col("window_start")).alias("window_start"),
        "n",
        "sum_value",
    )


@query(
    "q_stream_keyed_process",
    oracle="""
    SELECT user_id, event_id, round(value, 2) AS value
    FROM (SELECT user_id, event_id, value,
                 max(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts) ASC, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max
          FROM events)
    WHERE prev_max IS NULL OR value > prev_max
    """,
    description="LIVE streaming run of KeyedProcessOperator (stateful.py:"
    "88-144) via applyInPandasWithState: per-user record-breaking-maximum "
    "detector — arbitrary Python state (running max) per key, an event "
    "emits iff it strictly exceeds every earlier value for that user. "
    "Events are processed in (ts, event_id) order, so the SQL oracle is "
    "the running-max window predicate; comparisons are on the raw parquet "
    "doubles, identical in both engines.",
)
def q_stream_keyed_process(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.keyed_process import keyed_process

    def record_max(key, value, state):
        mx = state.get("max")
        if mx is None or value["value"] > mx:
            state["max"] = value["value"]
            return [
                {"user_id": key, "event_id": value["event_id"], "value": value["value"]}
            ]
        return []

    stream = _events_stream(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    out = keyed_process(
        stream,
        ["user_id"],
        record_max,
        "user_id long, event_id long, value double",
        order_by=["ts", "event_id"],
    )
    res = _run_to_table(out, mode="append")
    return res.select("user_id", "event_id", F.round("value", 2).alias("value"))


@query(
    "q_stream_event_sequence",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type, ts,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2,
             lead(event_id, 2)   OVER w AS end_id,
             lead(ts, 2)         OVER w AS end_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC)
    )
    SELECT user_id, event_id AS start_id, end_id,
           CAST(epoch_ms(end_ts) - epoch_ms(ts) AS BIGINT) AS span_ms
    FROM o
    WHERE event_type = 'click' AND t1 = 'view' AND t2 = 'purchase'
    """,
    description="LIVE CEP: the click -> view -> purchase consecutive-"
    "triple detector running as a stateful stream (keyed_process): "
    "per-user state carries the last two events ACROSS micro-batches, a "
    "match emits (start, end, span_ms) the moment the third event "
    "arrives. Same oracle as the batch q_event_sequence — the streaming "
    "state machine and the lead()-window formulation must agree exactly.",
)
def q_stream_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.keyed_process import keyed_process

    def detect(key, value, state):
        prev = state.get("w") or []  # last two (type, id, ms) triples
        cur = (value["event_type"], value["event_id"], value["ms"])
        out = []
        if (
            len(prev) == 2
            and prev[0][0] == "click"
            and prev[1][0] == "view"
            and cur[0] == "purchase"
        ):
            out.append(
                {
                    "user_id": key,
                    "start_id": prev[0][1],
                    "end_id": cur[1],
                    "span_ms": cur[2] - prev[0][2],
                }
            )
        state["w"] = (prev + [cur])[-2:]
        return out

    stream = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    out = keyed_process(
        stream,
        ["user_id"],
        detect,
        "user_id long, start_id long, end_id long, span_ms long",
        order_by=["ts", "event_id"],
    )
    return _run_to_table(out, mode="append")


@query(
    "q_stream_enrich",
    oracle="""
    SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(round(e.value * 100)) / 100.0 AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    description="LIVE stream-static enrichment join — the third "
    "Structured Streaming join family next to stream-stream "
    "(q_stream_join_interval) and batch joins: the events stream "
    "broadcast-joins the static customer dimension per micro-batch "
    "(no watermark needed on the static side, the standard dimension-"
    "enrichment shape), then aggregates per market segment in update "
    "mode. Unmatched users coalesce to a sentinel segment — the "
    "never-nullable-output invariant. Note the static side is "
    "re-evaluated each micro-batch (that is how dimension updates flow "
    "in); at scale, .cache() the dim to pin it, or accept the re-read "
    "as the freshness mechanism.",
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.tables import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    enriched = stream.join(F.broadcast(dim), "user_id", "left").select(
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"), "value"
    )
    agg = enriched.groupBy("segment").agg(
        F.count("*").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100, 0)) / 100.0).alias("sum_value"),
    )
    return _run_to_table(agg)


@query(
    "q_stream_state_v2",
    oracle="""
    SELECT user_id AS key,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(round(value * 100)) AS BIGINT) AS total_cents,
           CAST(min(round(value * 100)) AS BIGINT) AS mn_cents,
           CAST(max(round(value * 100)) AS BIGINT) AS mx_cents
    FROM events
    GROUP BY user_id
    """,
    description="LIVE run of the state-v2 operator surface "
    "(transformWithStateInPandas + RocksDB provider, the modern twin "
    "of the reference's typed state primitives, taskmanager/state/"
    "state_types.py:31-357): per-user running (count, total, min, max) "
    "held in a named ValueState, update output mode — the final "
    "emission per key equals the batch GROUP BY. Values accumulate as "
    "exact integer cents (order-independent across micro-batch folds; "
    "< 2^53 so float-exact), emitted as BIGINT. Runs on the vendored "
    "minipb protobuf shim where the real runtime is absent.",
)
def q_stream_state_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.stateful_v2 import running_stats

    s = _events_stream(spark, sf_dir).withColumn(
        "value_cents", F.round(F.col("value") * 100, 0)
    )
    # running_stats flips the session to the RocksDB provider (required
    # by transformWithState); restore afterwards so sibling streaming
    # queries in the same sweep keep the default HDFS-backed store.
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        stats = running_stats(s, "user_id", "value_cents")
        out = _run_to_table(stats)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select(
        "key",
        "cnt",
        F.col("total").cast("bigint").alias("total_cents"),
        F.col("mn").cast("bigint").alias("mn_cents"),
        F.col("mx").cast("bigint").alias("mx_cents"),
    )


@query(
    "q_stream_state_v2_map",
    oracle="""
    SELECT user_id AS key, event_type AS cat, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
    description="LIVE MapState run (reference MapState, state_types.py:"
    "116-215): per-user map of event_type -> running count held in a "
    "named MapState (getValue/updateValue/iterator through the real "
    "state server), emitted as one (key, cat, n) row per live entry in "
    "update mode — final emission equals the batch GROUP BY.",
)
def q_stream_state_v2_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.stateful_v2 import map_state_counts

    s = _events_stream(spark, sf_dir)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(map_state_counts(s, "user_id", "event_type"))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select("key", "cat", "n")


@query(
    "q_stream_state_v2_list",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id AS key,
           string_agg(event_id, ',' ORDER BY ts_ms ASC, event_id ASC) AS recent
    FROM ranked WHERE rn <= 5
    GROUP BY user_id
    """,
    description="LIVE ListState run (reference ListState, state_types."
    "py:63-112): last-5 events per user by (ts, event_id) in a named "
    "ListState ring buffer (get/put through the real state server), "
    "emitted as the comma-joined id list. The processor orders before "
    "truncating, so the retained window is data-deterministic despite "
    "arbitrary within-batch arrival order.",
)
def q_stream_state_v2_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.stateful_v2 import recent_events

    s = _events_stream(spark, sf_dir).withColumn("ts_ms", epoch_ms(F.col("ts")))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(recent_events(s, "user_id", "ts_ms", "event_id", n=5))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select("key", "recent")


@query(
    "q_stream_state_v2_reduce",
    oracle="""
    SELECT user_id AS key, max(value) AS acc
    FROM events
    GROUP BY user_id
    """,
    description="LIVE ReducingState run (reference ReducingState/"
    "AggregatingState, state_types.py:217-325): a caller-supplied "
    "associative+commutative reduce (max) folds every value into a "
    "ValueState accumulator. max is order-independent and exact on "
    "doubles, so the final emission is bit-identical to the batch "
    "aggregate on both engines — no rounding needed.",
)
def q_stream_state_v2_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.stateful_v2 import reducing_state

    s = _events_stream(spark, sf_dir)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(reducing_state(s, "user_id", max, "value"))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select("key", "acc")


def _stream_avro_oracle() -> str:
    from stream_processing_platform_spark.queries.relational import AVRO_AGG_ORACLE

    return AVRO_AGG_ORACLE


@query(
    "q_stream_avro",
    oracle=_stream_avro_oracle(),
    description="LIVE Avro transport: the events table is staged as "
    "TWO deflate OCF files (written task-parallel through the spp_avro "
    "batch writer, then published into the stream directory under "
    "ordered names), consumed by the spp_avro DataSourceStreamReader "
    "(file-per-partition micro-batch log, checkpointed {index} "
    "offsets), aggregated per event_type in update mode. Shares "
    "q_avro_roundtrip's oracle — the hash-MATCH proves the streaming "
    "decode path is lossless too. The Kafka-shaped ingestion loop "
    "(reference sources.py poll/decode/ack) over the at-rest container "
    "format, end to end in-engine.",
)
def q_stream_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil

    from stream_processing_platform_spark.sources.avro_datasource import (
        register_avro_source,
    )
    from stream_processing_platform_spark.tables import load_table

    register_avro_source(spark)
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        epoch_ms(F.col("ts")).alias("ts_ms"),
        "props",
    )
    stage = tempfile.mkdtemp(prefix="spp_avro_stream_")
    for i, half in enumerate(
        (e.where(F.col("event_id") % 2 == 0), e.where(F.col("event_id") % 2 == 1))
    ):
        tmp = tempfile.mkdtemp(prefix="spp_avro_stage_")
        half.write.format("spp_avro").mode("overwrite").save(tmp)
        for j, part in enumerate(sorted(glob.glob(os.path.join(tmp, "*.avro")))):
            shutil.move(part, os.path.join(stage, f"b{i:04d}_{j:04d}.avro"))
    stream = spark.readStream.format("spp_avro").load(stage)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_c"),
        F.min("ts_ms").alias("mn_ts_ms"),
        F.max("ts_ms").alias("mx_ts_ms"),
    )
    out = _run_to_table(agg, mode="update")
    # keep each key's final emission (multi-trigger safety, same rule
    # as q_stream_cdc_apply)
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("event_type", "n", "sum_c", "mn_ts_ms", "mx_ts_ms")
    )


def _stream_holt_oracle() -> str:
    from stream_processing_platform_spark.queries.timeseries import holt_oracle

    return holt_oracle(key_alias="key")


@query(
    "q_stream_holt",
    oracle=_stream_holt_oracle(),
    description="LIVE streaming Holt linear smoothing (streaming/"
    "stateful_v2.holt_state — the coupled level+trend twin of "
    "q_stream_ewma): two scalars of ValueState per key, each batch "
    "sorted by (ts, event_id) and folded through the standard Holt "
    "recurrences on the RocksDB provider. Shares q_holt's recursive-"
    "CTE oracle; the replay delivers batches in event-time order, so "
    "the arrival-order fold IS the event-order fold and the doubles "
    "are bit-identical.",
)
def q_stream_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.stateful_v2 import holt_state

    s = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.round(F.col("value") * 100, 0).alias("value_cents"),
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(holt_state(s, "user_id", alpha=0.5, beta=0.25))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select("key", "n", "level_c", "trend_c", "forecast_1_c")


def _stream_hw_oracle() -> str:
    from stream_processing_platform_spark.queries.timeseries import (
        holt_winters_oracle,
    )

    return holt_winters_oracle(key_alias="key")


@query(
    "q_stream_holt_winters",
    oracle=_stream_hw_oracle(),
    description="LIVE streaming Holt-Winters additive seasonal "
    "smoothing (streaming/stateful_v2.holt_winters_state — the "
    "seasonal sibling of q_stream_holt): per-key ValueState carries "
    "(level, trend, the m=7 rolling seasonal ARRAY, warm-up buffer, n) "
    "— O(m) state where the batch operator collects the series. Keys "
    "emit only once past the init horizon (n > m), the batch drop "
    "rule, so this run hash-MATCHes the same list-rotating recursive-"
    "CTE oracle as q_holt_winters.",
)
def q_stream_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.queries.timeseries import (
        _HW_A,
        _HW_B,
        _HW_G,
        _HW_M,
    )
    from stream_processing_platform_spark.streaming.stateful_v2 import (
        holt_winters_state,
    )

    s = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.round(F.col("value") * 100, 0).alias("value_cents"),
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(
            holt_winters_state(
                s, "user_id", alpha=_HW_A, beta=_HW_B, gamma=_HW_G, period=_HW_M
            )
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select(
        "key", "n", "level_c", "trend_c", "season_1_c", "forecast_1_c"
    )


def _stream_ewma_oracle() -> str:
    from stream_processing_platform_spark.queries.timeseries import ewma_oracle

    return ewma_oracle(key_alias="key")


@query(
    "q_stream_ewma",
    oracle=_stream_ewma_oracle(),
    description="LIVE streaming EWMA (streaming/stateful_v2.ewma_state "
    "— the stateful twin of operators/timeseries.ewma): per-user "
    "smoothed level held as ONE ValueState scalar, each batch's rows "
    "sorted by (ts, event_id) and folded s := s*0.75 + x*0.25 through "
    "transformWithStateInPandas on the RocksDB provider. Shares the "
    "batch query's list_reduce oracle (generated-oracle doctrine): the "
    "replay delivers batches in event-time order, so the arrival-order "
    "fold IS the event-order fold and the doubles are bit-identical — "
    "an O(1)-state numeric recursion the reference's ValueState "
    "surface (state_types.py:31-61) cannot express without a client "
    "re-reading state per element.",
)
def q_stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.stateful_v2 import ewma_state

    s = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.round(F.col("value") * 100, 0).alias("value_cents"),
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(ewma_state(s, "user_id", alpha=0.25))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select("key", "n", "ewma_c")


@query(
    "q_stream_join_full",
    oracle="""
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase')
    SELECT CAST(COALESCE(c.click_id, -1) AS BIGINT) AS click_id,
           CAST(COALESCE(p.purchase_id, -1) AS BIGINT) AS purchase_id,
           CAST(COALESCE(c.user_id, p.user_id) AS BIGINT) AS user_id,
           CAST(COALESCE(epoch_ms(p.purchase_ts) - epoch_ms(c.click_ts), -1)
                AS BIGINT) AS delta_ms
    FROM c FULL JOIN p
      ON c.user_id = p.user_id
     AND epoch_ms(p.purchase_ts) >= epoch_ms(c.click_ts)
     AND epoch_ms(p.purchase_ts) <= epoch_ms(c.click_ts) + 1800000
    """,
    description="LIVE stream-stream FULL OUTER interval join — completes "
    "the outer-join matrix over the reference's inner-only JoinOperator: "
    "clicks with no purchase in [0, 30 min] AND purchases no click "
    "attributed to both emit null-extended (sentinel -1) once the "
    "watermark closes their window. Flush rows ride both streams so "
    "every real row's buffer provably drains inside one availableNow "
    "run; the full batch FULL JOIN is the oracle, no carve-outs.",
)
def q_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.joins import stream_interval_join

    clicks = (
        _events_stream(spark, sf_dir, flush_files=2)
        .where(F.col("event_type").isin("click", "flush"))
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        _events_stream(spark, sf_dir, flush_files=2)
        .where(F.col("event_type").isin("purchase", "flush"))
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = stream_interval_join(
        clicks,
        purchases,
        "c",
        "p",
        on=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower="0 seconds",
        upper="30 minutes",
        how="full_outer",
        projection=[
            F.coalesce(F.col("click_id"), F.lit(-1)).alias("click_id"),
            F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
            F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
            F.coalesce(
                epoch_ms(F.col("purchase_ts")) - epoch_ms(F.col("click_ts")), F.lit(-1)
            ).alias("delta_ms"),
        ],
    )
    out = _run_to_table(joined, mode="append")
    return out.where(F.col("user_id") != FLUSH_USER)


@query(
    "q_stream_join_semi",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id,
           CAST(epoch_ms(c.ts) AS BIGINT) AS click_ts_ms
    FROM events c
    WHERE c.event_type = 'click'
      AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND epoch_ms(p.ts) >= epoch_ms(c.ts)
          AND epoch_ms(p.ts) <= epoch_ms(c.ts) + 1800000
      )
    """,
    description="LIVE stream-stream LEFT SEMI interval join — the "
    "existence-check member of the join matrix (batch twin q_join_semi): "
    "each click emits AT MOST ONCE, when its first purchase in "
    "[0, 30 min] arrives; clicks with no purchase are dropped at the "
    "watermark without ever emitting. No output duplication however "
    "many purchases match — the buffer marks the click matched instead "
    "of re-emitting, which is the dedup-free attribution shape "
    "(EXISTS, not JOIN-then-DISTINCT). Same watermark + range-condition "
    "state pruning as the inner variant.",
)
def q_stream_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.joins import stream_interval_join

    clicks = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = stream_interval_join(
        clicks,
        purchases,
        "c",
        "p",
        on=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower="0 seconds",
        upper="30 minutes",
        how="left_semi",
        projection=[
            F.col("click_id"),
            F.col("c.user_id").alias("user_id"),
            epoch_ms(F.col("click_ts")).alias("click_ts_ms"),
        ],
    )
    return _run_to_table(joined, mode="append")


@query(
    "q_stream_window_collect",
    oracle=f"""
    SELECT CAST(floor(epoch_ms(ts) / {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS window_start,
           user_id,
           CAST(count(*) AS BIGINT) AS n_elems,
           array_to_string(list_sort(list(event_id)), ',') AS elem_ids
    FROM events
    GROUP BY 1, 2
    """,
    description="LIVE streaming run of WindowOperator WITHOUT a reduce "
    "function (stateful.py:226-231 — emit the window's raw elements): "
    "1 h tumbling window buffering event_ids via collect_list, sorted "
    "for determinism and CSV-serialized (the driver compare sorts only "
    "scalar columns). Completes the no-reduce row with a live form; the "
    "batch twin is q_window_collect.",
)
def q_stream_window_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    windowed = W.tumbling_agg(
        _events_stream(spark, sf_dir),
        "ts",
        "1 hour",
        ["user_id"],
        [
            F.count("*").alias("n_elems"),
            F.concat_ws(",", F.array_sort(F.collect_list("event_id"))).alias("elem_ids"),
        ],
    )
    out = _run_to_table(windowed)
    return out.select(
        epoch_ms(F.col("window_start")).alias("window_start"),
        "user_id",
        "n_elems",
        "elem_ids",
    )


@query(
    "q_stream_ohlc",
    oracle=f"""
    WITH p AS (
      SELECT event_type,
             CAST(floor(epoch_ms(ts) / {HOUR_MS}) * {HOUR_MS} AS BIGINT)
               AS window_start,
             CAST(round(value * 100) AS BIGINT) AS c,
             {{'t': epoch_ms(ts), 's': event_id,
               'v': CAST(round(value * 100) AS BIGINT)}} AS pt
      FROM events
    )
    SELECT window_start, event_type,
           (min(pt)).v AS open_c,
           max(c) AS high_c,
           min(c) AS low_c,
           (max(pt)).v AS close_c,
           CAST(count(*) AS BIGINT) AS n
    FROM p
    GROUP BY window_start, event_type
    """,
    description="LIVE streaming OHLC bars — candlesticks computed by "
    "the streaming engine itself: file stream → watermark → 1 h "
    "tumbling window per event_type with open/close as "
    "min(struct(ts, seq, cents))/max(struct(...)) (argmin/argmax "
    "streaming aggregates — mergeable across micro-batches, exactly "
    "the property a streaming bar builder needs) → memory sink. Same "
    "integer-cents doctrine and same oracle family as the batch twin "
    "q_ohlc_bars.",
)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    prepped = stream.select(
        "ts", "event_type", cents.alias("_c"),
        F.struct(
            epoch_ms(F.col("ts")).alias("t"),
            F.col("event_id").alias("s"),
            cents.alias("v"),
        ).alias("_pt"),
    )
    windowed = W.tumbling_agg(
        prepped,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.min("_pt")["v"].alias("open_c"),
            F.max("_c").alias("high_c"),
            F.min("_c").alias("low_c"),
            F.max("_pt")["v"].alias("close_c"),
            F.count("*").alias("n"),
        ],
    )
    out = _run_to_table(windowed)
    return out.select(
        epoch_ms(F.col("window_start")).alias("window_start"),
        "event_type", "open_c", "high_c", "low_c", "close_c", "n",
    )


DAY_MS = 86_400_000


@query(
    "q_stream_chained_agg",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(floor(epoch_ms(ts) / {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS h,
             event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(floor(h / {DAY_MS}) * {DAY_MS} AS BIGINT) AS day_start,
           event_type,
           CAST(sum(n) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS n_hours
    FROM hourly GROUP BY 1, 2
    """,
    description="CHAINED stateful streaming operators (Spark 4: "
    "multiple stateful ops in one query): hourly tumbling counts per "
    "event_type feed a SECOND tumbling aggregation re-windowed to days "
    "via window_time() — the continuous rollup-pyramid pattern "
    "(operators/rollup.py) running live, both levels inside one "
    "streaming query with one watermark. Flush rows push the watermark "
    "past the final day so every window of BOTH stateful operators "
    "emits in one availableNow run; the oracle recomputes the two-level "
    "fold in batch.",
)
def q_stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _events_stream(spark, sf_dir, flush_files=2)
    hourly = (
        s.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    daily = (
        hourly.groupBy(F.window(F.window_time("w1"), "1 day").alias("w2"), "event_type")
        .agg(F.sum("n").alias("total"), F.count("*").alias("n_hours"))
    )
    out = _run_to_table(daily, mode="append")
    return out.where(F.col("event_type") != "flush").select(
        epoch_ms(F.col("w2.start")).alias("day_start"),
        "event_type", "total", "n_hours",
    )


@query(
    "q_stream_cdc_apply",
    oracle="""
    WITH env AS (
      SELECT user_id,
             epoch_ms(ts) AS seq_ms, event_id,
             CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    win AS (
      SELECT user_id,
             max({'s0': seq_ms, 's1': event_id, 'op': op, 'c': cents}) AS w,
             CAST(count(*) AS BIGINT) AS n_ops
      FROM env GROUP BY user_id
    )
    SELECT user_id, (w).c AS cents, CAST((w).s0 AS BIGINT) AS last_seq, n_ops
    FROM win WHERE (w).op <> 'd'
    """,
    description="LIVE streaming CDC materialization — the upsert view a "
    "streaming warehouse keeps current: change envelopes stream through "
    "a running last-writer-wins aggregate (max(struct(seq, op, "
    "payload)) in update mode — MERGEABLE across micro-batches, which "
    "is exactly why argmax-as-aggregate beats a rank window here), "
    "tombstoned keys filtered on read. Final state equals the batch "
    "q_cdc_apply oracle. The memory-sink read keeps each key's LAST "
    "update (update-mode sinks append per-trigger rows).",
)
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    env = stream.select(
        "user_id",
        epoch_ms(F.col("ts")).alias("seq_ms"),
        "event_id",
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    winner = F.max(
        F.struct(
            F.col("seq_ms").alias("_s0"),
            F.col("event_id").alias("_s1"),
            F.col("op").alias("_op"),
            F.col("cents").alias("_c"),
        )
    )
    agg = env.groupBy("user_id").agg(winner.alias("_w"), F.count("*").alias("n_ops"))
    out = _run_to_table(agg, mode="update")
    # availableNow processes everything in one trigger here, but a
    # resumed/multi-batch run appends one row per key per trigger —
    # keep each key's final (max n_ops) emission for correctness under
    # both shapes
    w = Window.partitionBy("user_id").orderBy(F.col("n_ops").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("_w._op") != "d"))
        .select(
            "user_id",
            F.col("_w._c").alias("cents"),
            F.col("_w._s0").alias("last_seq"),
            "n_ops",
        )
    )


def _gate_stats(df: DataFrame) -> DataFrame:
    """Per-document Gopher-rule stats as a STATELESS projection (works
    identically on a stream or a batch frame — the pytest long-doc gate
    drives the batch form).

    max_tf is a sorted run-length fold — ``array_sort`` then one
    O(n) ``aggregate`` pass tracking (prev, run, best) — NOT the
    ``transform(array_distinct(t), x -> size(filter(t, = x)))`` HOF the
    r9 verdict flagged: Catalyst interprets HOF lambda bodies per
    element, so that shape is O(n²) per document — minutes for one
    10k-token web doc on the LIVE ingest path. The fold is O(n log n),
    stays JVM-side, and produces the identical integer, so the duckdb
    oracle is unchanged."""
    from stream_processing_platform_spark.functions.text import let as _let

    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    # Bind the incremented run ONCE per element via let(): Column exprs
    # are trees, so referencing run(acc, x) in both struct fields would
    # evaluate it twice per token inside the interpreted HOF lambda
    # (r10 advice — the k-times-evaluation cost the let() rule exists
    # to avoid, on the live ingest path).
    max_tf = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: _let(
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            lambda r: F.struct(
                x.alias("prev"),
                r.alias("run"),
                F.greatest(acc["best"], r).alias("best"),
            ),
        ),
        lambda acc: acc["best"],
    )
    return df.select(
        "source",
        F.size(toks).alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        ).alias("n_chars"),
        F.size(F.filter(toks, lambda t: t.isin(*_GATE_STOPS))).alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        max_tf.alias("max_tf"),
    )



_GATE_STOPS = ("the", "a", "and", "of", "to")
_SQL_GATE_STOPS = "(" + ", ".join(f"'{w}'" for w in _GATE_STOPS) + ")"
_SQL_GATE_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


@query(
    "q_stream_gopher_gate",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(len({_SQL_GATE_TOKS}) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform({_SQL_GATE_TOKS},
                  t -> length(t))) AS BIGINT) AS n_chars,
             CAST(len(list_filter({_SQL_GATE_TOKS},
                  t -> t IN {_SQL_GATE_STOPS})) AS BIGINT) AS n_stop,
             CAST(len(list_distinct({_SQL_GATE_TOKS})) AS BIGINT) AS n_unique,
             CAST(list_max(list_transform(list_distinct({_SQL_GATE_TOKS}),
                  t -> len(list_filter({_SQL_GATE_TOKS}, x -> x = t))))
                  AS BIGINT) AS max_tf
      FROM documents
    ),
    flags AS (
      SELECT source, n_words,
             (n_words BETWEEN 30 AND 400)
               AND 3000 * n_words <= 1000 * n_chars
               AND 1000 * n_chars <= 10000 * n_words
               AND n_stop >= 2
               AND max_tf * 5 <= n_words
               AND n_unique * 2 >= n_words AS passed
      FROM s
    )
    SELECT source, passed,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM flags GROUP BY source, passed
    """,
    description="LIVE streaming Gopher quality gate: the documents table "
    "streamed through the file source, every rule computed as PURE "
    "per-row expressions (size/aggregate/filter over the token array; "
    "max_tf as an O(n log n) sort + run-length fold, r10 — no explode, "
    "no per-doc aggregation, so the whole "
    "update-mode (source, passed) aggregate — the admission dashboard a "
    "continuously-fed curation pipeline watches. Same integer-exact "
    "rule arithmetic as q_gopher_rules; single stateful operator, "
    "state = |sources| x 2 rows. The oracle replays the rules with "
    "duckdb list HOFs and the streaming engine's own final emission is "
    "hash-checked.",
)
def q_stream_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "documents.parquet")
    static = spark.read.parquet(path)
    stage = tempfile.mkdtemp(prefix="spp_stream_docs_")
    os.symlink(path, os.path.join(stage, "documents.parquet"))
    stream = file_source(spark, stage, static.schema)

    stats = _gate_stats(stream)
    passed = (
        F.col("n_words").between(30, 400)
        & (3000 * F.col("n_words") <= 1000 * F.col("n_chars"))
        & (1000 * F.col("n_chars") <= 10000 * F.col("n_words"))
        & (F.col("n_stop") >= 2)
        & (F.col("max_tf") * 5 <= F.col("n_words"))
        & (F.col("n_unique") * 2 >= F.col("n_words"))
    )
    agg = (
        stats.withColumn("passed", passed)
        .groupBy("source", "passed")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
        )
    )
    return _run_to_table(agg).select(
        "source", "passed", "n_docs", "total_words"
    )


# --------------------------------------------------------------------------
# LIVE trained-classifier quality gate (r10): train OFFLINE on the
# static table (the reproducible GD of operators/classifier.py), then
# deploy the frozen weight vector as a per-row streaming expression —
# the train-offline / gate-online pattern every production curation
# pipeline runs.  The oracle replays the ENTIRE training trajectory
# (shared CTE generator) and then the gate aggregation.
# --------------------------------------------------------------------------


@query(
    "q_stream_quality_gate",
    oracle=None,  # patched below: training CTE chain + gate aggregate
    description="LIVE streaming quality gate driven by the TRAINED "
    "classifier: q_quality_classifier's reproducible GD runs offline "
    "on the static documents table, the frozen 257-int weight vector "
    "then rides the stream as a literal array — per doc the logit is "
    "a pure HOF fold (sum of w[md5-bucket(token)] + bias, the raw-"
    "count dot product without materializing counts), so the gate is "
    "a stateless map + a (source, pred) update-mode aggregate. State "
    "= |sources| x 2 rows; model never joins, never shuffles. The "
    "oracle replays the whole 15-iteration training trajectory and "
    "the gate aggregation — a LIVE streaming query hash-checked "
    "against a replayed-training oracle.",
)
def q_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.operators.classifier import bucket_col
    from stream_processing_platform_spark.queries.text import (
        _CLF_DIM,
        _clf_train_and_feats,
    )
    from stream_processing_platform_spark.functions import text as T
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    _, _, model = _clf_train_and_feats(spark, sf_dir)

    path = os.path.join(sf_dir, "documents.parquet")
    static = spark.read.parquet(path)
    stage = tempfile.mkdtemp(prefix="spp_stream_docs_")
    os.symlink(path, os.path.join(stage, "documents.parquet"))
    stream = file_source(spark, stage, static.schema)

    w_arr = F.lit(list(model.weights))
    toks = T.tokens(F.col("text"))
    z = F.aggregate(
        toks,
        F.lit(int(model.weights[model.dim])).cast("long"),  # bias (cnt=1)
        lambda acc, t: acc
        + F.element_at(w_arr, (bucket_col(t, _CLF_DIM) + 1).cast("int")),
    )
    agg = (
        stream.where(F.size(toks) > 0)
        .select(
            "source",
            F.when(z >= 0, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("pred"),
        )
        .groupBy("source", "pred")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    return _run_to_table(agg).select("source", "pred", "n_docs")


def _stream_quality_gate_oracle() -> str:
    from stream_processing_platform_spark.operators.classifier import (
        training_ctes_sql,
    )
    from stream_processing_platform_spark.queries.text import (
        _CLF_DIM,
        _CLF_ITERS,
        _CLF_LR_DEN,
        _CLF_LR_NUM,
        _clf_feat_label_ctes,
    )

    feat, lbl = _clf_feat_label_ctes()
    ctes = training_ctes_sql(feat, lbl, _CLF_DIM, _CLF_ITERS, _CLF_LR_NUM, _CLF_LR_DEN)
    ctes.append(
        f"zf AS MATERIALIZED (SELECT f.doc_id, sum(f.cnt * w.w) AS z_num"
        f" FROM feat f JOIN w{_CLF_ITERS} w USING (bucket)"
        f" GROUP BY f.doc_id)"
    )
    return (
        "WITH " + ",\n    ".join(ctes) + """
    SELECT d.source,
           CAST(CASE WHEN z.z_num >= 0 THEN 1 ELSE 0 END AS INTEGER) AS pred,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM zf z JOIN documents d USING (doc_id)
    GROUP BY d.source, pred
    """
    )


_REG_SL = __import__(
    "stream_processing_platform_spark.registry", fromlist=["REGISTRY"]
).REGISTRY
from dataclasses import replace as _dc_replace_sl  # noqa: E402

_REG_SL["q_stream_quality_gate"] = _dc_replace_sl(
    _REG_SL["q_stream_quality_gate"], oracle=_stream_quality_gate_oracle()
)


_CUSUM_TARGET_C = 1000  # fixed reference value (cents): $10.00


@query(
    "q_stream_cusum",
    oracle=f"""
    WITH d AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             1000 * (CAST(round(value * 100) AS BIGINT) - {_CUSUM_TARGET_C}) AS d
      FROM events
    ),
    p AS (SELECT user_id, event_id, ts_ms,
                 sum(d) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                     ROWS UNBOUNDED PRECEDING) AS p
          FROM d),
    s AS (SELECT user_id, event_id,
                 p - least(CAST(0 AS BIGINT),
                           min(p) OVER (PARTITION BY user_id
                               ORDER BY ts_ms, event_id
                               ROWS UNBOUNDED PRECEDING)) AS s
          FROM p)
    SELECT user_id AS key,
           CAST(-((min({{'ns': -s, 'seq': event_id}})).ns) AS BIGINT) AS s_max,
           CAST((min({{'ns': -s, 'seq': event_id}})).seq AS BIGINT) AS at_seq,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY user_id
    """,
    description="LIVE streaming one-sided CUSUM per user against a "
    "fixed $10.00 reference (streaming/stateful_v2.CusumProcessor): "
    "the online Page test — state is FIVE BIGINTs per key (running "
    "sum, running min, max statistic, argmax seq, count), O(1) memory, "
    "and because every quantity is an exact integer the streaming fold "
    "is bit-identical to the batch prefix-sum identity regardless of "
    "batch boundaries. The oracle is the batch window form "
    "(q_cusum_changepoint's identity with the fixed target) — a LIVE "
    "stateful query hash-checked against the closed-form windows.",
)
def q_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.streaming.stateful_v2 import cusum_state

    s = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.round(F.col("value") * 100, 0).alias("value_cents"),
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(cusum_state(s, "user_id", target_cents=_CUSUM_TARGET_C))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select("key", "s_max", "at_seq", "n")


_WRES_K = 10


def _wres_key_sql() -> str:
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        repro_hash_sql,
    )

    h = repro_hash_sql("doc_id")
    u = f"(({h}) + 1) / CAST({REPRO_INIT_MOD + 1} AS DOUBLE)"
    return (
        f"CAST(floor(-ln({u}) / CAST(n_chars AS DOUBLE)"
        f" * 1000000000.0 + 0.5) AS BIGINT)"
    )


@query(
    "q_stream_weighted_sample",
    oracle=None,  # patched below (generated from the same constants)
    description="LIVE per-source streaming weighted reservoir (the "
    "online half of Efraimidis-Spirakis A-ES; streaming/stateful_v2."
    "WeightedReservoirProcessor): the deterministic exponential-race "
    "key is computed as a stateless Spark map, state is ONE k-capped "
    "sorted list per stratum — O(k) memory, and the maintained set is "
    "provably invariant to batch boundaries and arrival order (same "
    "integer merge, any order). The oracle is the batch per-stratum "
    "top-k rank — a LIVE stateful sampler hash-checked against the "
    "closed-form window.",
)
def q_stream_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        repro_hash_col,
    )
    from stream_processing_platform_spark.streaming.stateful_v2 import (
        weighted_reservoir_state,
    )
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "documents.parquet")
    static = spark.read.parquet(path)
    stage = tempfile.mkdtemp(prefix="spp_stream_docs_")
    os.symlink(path, os.path.join(stage, "documents.parquet"))
    stream = file_source(spark, stage, static.schema)

    h = repro_hash_col(F.col("doc_id"))
    u = (h + 1).cast("double") / F.lit(float(REPRO_INIT_MOD + 1))
    key = F.floor(
        -F.ln(u) / F.col("n_chars").cast("double") * F.lit(1000000000.0) + F.lit(0.5)
    ).cast("long")
    mapped = stream.where(F.col("n_chars") > 0).select(
        "source", "doc_id", key.alias("key_nano")
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(weighted_reservoir_state(mapped, "source", k=_WRES_K))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select(F.col("key").alias("source"), "doc_id", "key_nano")


def _stream_weighted_sample_oracle() -> str:
    return f"""
    WITH s AS (
      SELECT source, doc_id, {_wres_key_sql()} AS key_nano
      FROM documents WHERE n_chars > 0
    ),
    r AS (SELECT source, doc_id, key_nano,
                 row_number() OVER (PARTITION BY source
                     ORDER BY key_nano ASC, doc_id ASC) AS rn
          FROM s)
    SELECT source, doc_id, key_nano FROM r WHERE rn <= {_WRES_K}
    """


_REG_SL["q_stream_weighted_sample"] = _dc_replace_sl(
    _REG_SL["q_stream_weighted_sample"], oracle=_stream_weighted_sample_oracle()
)


@query(
    "q_stream_kmv_distinct",
    oracle=None,  # patched below: the BATCH KMV oracle — the streaming
    # sketch must land exactly where the batch operator does
    description="LIVE streaming approximate COUNT(DISTINCT) per "
    "event_type via the KMV sketch (streaming/stateful_v2."
    "KmvDistinctProcessor, r11): the deterministic Knuth hash is a "
    "stateless Spark map, state is ONE sorted k-capped array of "
    "distinct hashes per key — O(k) memory forever, and min-k of a "
    "set union is a semilattice merge, so the estimate is provably "
    "invariant to batch boundaries and arrival order. The oracle is "
    "the batch kmv_distinct SQL over the same table: a LIVE stateful "
    "sketch hash-checked against its closed-form batch twin (the "
    "q_stream_weighted_sample doctrine).",
)
def q_stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.operators.clustering import (
        REPRO_INIT_MOD,
        repro_hash_col,
    )
    from stream_processing_platform_spark.queries.relational import (
        _KMV_K,
        _KMV_SALT,
    )
    from stream_processing_platform_spark.streaming.stateful_v2 import (
        kmv_distinct_state,
    )
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    static = spark.read.parquet(path)
    stage = tempfile.mkdtemp(prefix="spp_stream_events_")
    os.symlink(path, os.path.join(stage, "events.parquet"))
    stream = file_source(spark, stage, static.schema)

    mapped = stream.where(F.col("user_id").isNotNull()).select(
        "event_type",
        repro_hash_col(F.col("user_id"), salt=_KMV_SALT).alias("h"),
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        out = _run_to_table(
            kmv_distinct_state(
                mapped, "event_type", k=_KMV_K, mod=REPRO_INIT_MOD
            )
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return out.select(
        F.col("key").alias("event_type"), "approx_distinct", "kth_hash"
    )


def _stream_kmv_oracle() -> str:
    from stream_processing_platform_spark.operators.sketches import kmv_distinct_sql
    from stream_processing_platform_spark.queries.relational import (
        _KMV_K,
        _KMV_SALT,
    )

    return kmv_distinct_sql("events", ["event_type"], "user_id", k=_KMV_K, salt=_KMV_SALT)


_REG_SL["q_stream_kmv_distinct"] = _dc_replace_sl(
    _REG_SL["q_stream_kmv_distinct"], oracle=_stream_kmv_oracle()
)


@query(
    "q_stream_warc",
    oracle=None,  # patched below: recomputed straight from documents
    description="LIVE streaming WARC ingestion (r11): the spp_warc "
    "Python DataSource's STREAM reader consumes the member-gzipped "
    "archive directory as an archive-per-micro-batch log (the same "
    "files-are-the-log model as spp_avro/Spark's file source), "
    "response records are pruned post-scan, the HTTP entity is split "
    "and boilerplate-stripped with the shared regexp chain — the "
    "continuous-crawl shape: archives land, text comes out. The "
    "oracle rebuilds the expected rows straight from documents "
    "(content_length reconstructed arithmetically), so a hash-MATCH "
    "proves the streaming decode path lossless end to end.",
)
def q_stream_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.functions.html import strip_html
    from stream_processing_platform_spark.queries.web import _write_warc_docs
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    out = _write_warc_docs(spark, sf_dir)
    stream = spark.readStream.format("spp_warc").load(out)
    resp = stream.where(F.col("warc_type") == "response")
    body = F.decode(F.col("payload"), "UTF-8")
    html = F.substring_index(body, "\r\n\r\n", -1)
    parsed = resp.select(
        F.regexp_extract(F.col("target_uri"), r"/(\d+)$", 1).cast("long").alias("doc_id"),
        F.regexp_extract(body, r"^HTTP/1\.1 (\d+) ", 1).cast("int").alias("status"),
        F.length(strip_html(html)).cast("long").alias("extracted_len"),
        F.col("content_length"),
    )
    return _run_to_table(parsed, mode="append")


def _stream_warc_oracle() -> str:
    from stream_processing_platform_spark.functions.html import strip_html_sql
    from stream_processing_platform_spark.queries.web import (
        _HTTP_BASE_LEN,
        _html_sql,
    )

    return f"""
    WITH x AS (SELECT doc_id, {_html_sql()} AS html FROM documents),
    y AS (SELECT doc_id,
                 CAST(length({strip_html_sql("html")}) AS BIGINT)
                   AS extracted_len,
                 CAST(strlen(html) AS BIGINT) AS hl
          FROM x)
    SELECT doc_id, CAST(200 AS INTEGER) AS status, extracted_len,
           CAST({_HTTP_BASE_LEN} + length(CAST(hl AS VARCHAR)) + hl AS BIGINT)
             AS content_length
    FROM y
    """


_REG_SL["q_stream_warc"] = _dc_replace_sl(
    _REG_SL["q_stream_warc"], oracle=_stream_warc_oracle()
)


@query(
    "q_stream_wds",
    oracle=None,  # patched below: the q_wds_roundtrip oracle — the
    # streamed samples must be exactly the batch read's
    description="LIVE streaming WebDataset ingestion (r11): spp_wds's "
    "STREAM reader consumes the shard directory as a shard-per-micro-"
    "batch log and every sample field re-derives from the tar members "
    "exactly as in the batch round trip — the training-ingest shape "
    "(shards land, samples stream out), hash-checked against the same "
    "documents-derived oracle as q_wds_roundtrip.",
)
def q_stream_wds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.queries.web import _write_wds_docs
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    out = _write_wds_docs(spark, sf_dir)
    back = spark.readStream.format("spp_wds").load(out)
    js = F.decode(F.col("files")["json"], "UTF-8")
    parsed = back.select(
        F.col("key").cast("long").alias("doc_id"),
        F.regexp_extract(js, r'"source":"([^"]*)"', 1).alias("source"),
        F.decode(F.col("files")["cls"], "UTF-8").alias("lang"),
        F.col("n_files"),
        F.col("total_bytes"),
        F.octet_length(F.decode(F.col("files")["txt"], "UTF-8")).cast("long").alias("text_len"),
        F.regexp_extract(js, r'"n_chars":(\d+)', 1).cast("long").alias("json_n_chars"),
    )
    return _run_to_table(parsed, mode="append")


def _stream_wds_oracle() -> str:
    from stream_processing_platform_spark.queries.web import _wds_json_sql

    return f"""
    SELECT doc_id, source, lang,
           CAST(3 AS INTEGER) AS n_files,
           CAST(strlen(text) + strlen(lang) + strlen({_wds_json_sql()})
                AS BIGINT) AS total_bytes,
           CAST(strlen(text) AS BIGINT) AS text_len,
           CAST(n_chars AS BIGINT) AS json_n_chars
    FROM documents
    """


_REG_SL["q_stream_wds"] = _dc_replace_sl(
    _REG_SL["q_stream_wds"], oracle=_stream_wds_oracle()
)


@query(
    "q_stream_url_dedup",
    oracle=None,  # patched below: distinct canonical keys from documents
    description="LIVE streaming URL-level dedup (r11): raw URL variants "
    "stream in, canonicalize (the r11 canonical_url expression riding "
    "the stream as pure JVM columns) and dropDuplicates on the "
    "canonical key — state is one entry per DISTINCT canonical URL, "
    "never per raw spelling, which is the point of canonicalizing "
    "before the dedup boundary. State bound (r12): corpus-wide URL "
    "dedup is GLOBAL by design — no watermark prunes it — so the 100 TB "
    "sizing argument is explicit: ~60 B per canonical-URL key in the "
    "RocksDB state store ⇒ ≈600 GB total state per 10^10 distinct URLs, "
    "spread over the shuffle partitions (~600 MB/executor at 1000 "
    "executors), well inside RocksDB's on-disk design envelope. "
    "Continuous-crawl deployments that only need politeness-window "
    "semantics use the bounded companion dedup_stream_within_watermark "
    "(streaming/dedup.py:37 — dropDuplicatesWithinWatermark on the "
    "canonical key, state expiring with the watermark; drop/expiry "
    "behavior pinned by tests/test_streaming.py::"
    "test_url_dedup_within_watermark_bounds_state). Emits the "
    "canonical-key set (the surviving representative is arrival-order "
    "dependent and is NOT emitted — the deterministic contract is the "
    "key set itself); oracle = SELECT DISTINCT canonical over the same "
    "fixture.",
)
def q_stream_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stream_processing_platform_spark.operators.webcur import canonical_url
    from stream_processing_platform_spark.queries.web import _messy_url_col
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "documents.parquet")
    static = spark.read.parquet(path)
    stage = tempfile.mkdtemp(prefix="spp_stream_docs_")
    os.symlink(path, os.path.join(stage, "documents.parquet"))
    stream = file_source(spark, stage, static.schema)

    canon = stream.select(
        canonical_url(_messy_url_col()).alias("canonical_url")
    ).dropDuplicates(["canonical_url"])
    return _run_to_table(canon, mode="append")


def _stream_url_dedup_oracle() -> str:
    from stream_processing_platform_spark.operators.webcur import canonical_url_sql
    from stream_processing_platform_spark.queries.web import _messy_url_sql

    return f"""
    SELECT DISTINCT {canonical_url_sql(_messy_url_sql())} AS canonical_url
    FROM documents
    """


_REG_SL["q_stream_url_dedup"] = _dc_replace_sl(
    _REG_SL["q_stream_url_dedup"], oracle=_stream_url_dedup_oracle()
)


# ----------------------- streaming crawl charset ingest (r13)


def _stream_charset_oracle() -> str:
    from stream_processing_platform_spark.queries.web import _WCS_CLASSES

    text_whens, enc_whens, how_whens = [], [], []
    for i, (label, codec, snip, _xfer) in enumerate(_WCS_CLASSES):
        # the transport transform (chunked/gzip/deflate) is lossless —
        # it never changes the decoded text or the charset decision
        text_whens.append(f"WHEN {i} THEN '{snip}' || text")
        enc = "utf-8" if codec == "bom" else codec
        how = "bom" if codec == "bom" else ("header" if label else "utf-8")
        enc_whens.append(f"WHEN {i} THEN '{enc}'")
        how_whens.append(f"WHEN {i} THEN '{how}'")
    n = len(_WCS_CLASSES)
    return f"""
    SELECT doc_id, CAST(200 AS BIGINT) AS status,
           CASE doc_id % {n} {' '.join(enc_whens)} END AS encoding,
           CASE doc_id % {n} {' '.join(how_whens)} END AS how,
           CASE doc_id % {n} {' '.join(text_whens)} END AS text_out,
           CAST(length(CASE doc_id % {n} {' '.join(text_whens)} END)
                AS BIGINT) AS n_chars
    FROM documents
    """


@query(
    "q_stream_charset_ingest",
    oracle=None,  # patched below: generated from the shared class table
    description="LIVE streaming crawl ingest with transport-layer "
    "charset decode (r13; transport legs r14): the spp_warc STREAM "
    "reader consumes a response archive whose HTTP envelopes declare "
    "VARIED charsets AND transport codings (utf-8 / shift_jis / "
    "quoted ISO-8859-1 / euc-kr / absent / BOM-led / chunked / gzip / "
    "deflate / BOM-less UTF-16LE with a utf-16le label, per "
    "doc_id % 10), and each micro-batch parses the HTTP envelope, "
    "undoes the transport layers (chunked de-framing, zlib "
    "inflation), and decodes the body with the full WHATWG "
    "precedence (functions/httpheaders.py + charset.py: BOM > header "
    "> meta > strict UTF-8 > cp1252) in one Arrow map — the "
    "continuous-crawl shape: archives land, correctly-decoded text "
    "streams out. The oracle reconstructs every decoded string "
    "directly from documents (the decode is a lossless round-trip), "
    "so a hash-MATCH proves the streamed bytes, the envelope parse "
    "and the charset decision all survived end to end.",
)
def q_stream_charset_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from stream_processing_platform_spark.queries.web import _write_warc_charset
    from stream_processing_platform_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    out = _write_warc_charset(spark, sf_dir)
    stream = spark.readStream.format("spp_warc").load(out).where(
        F.col("warc_type") == "response"
    )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("status", LongType(), False),
            StructField("encoding", StringType(), False),
            StructField("how", StringType(), False),
            StructField("text_out", StringType(), False),
            StructField("n_chars", LongType(), False),
        ]
    )

    def run(batches):
        from stream_processing_platform_spark.functions.httpheaders import (
            decode_http_body,
        )

        for pdf in batches:
            decoded = [decode_http_body(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": [
                        int(u.rsplit("/", 1)[1]) for u in pdf["target_uri"]
                    ],
                    "status": [d[3] for d in decoded],
                    "encoding": [d[1] for d in decoded],
                    "how": [d[2] for d in decoded],
                    "text_out": [d[0] for d in decoded],
                    "n_chars": [len(d[0]) for d in decoded],
                }
            )

    parsed = stream.select("target_uri", "payload").mapInPandas(run, schema)
    return _run_to_table(parsed, mode="append")


_REG_SL["q_stream_charset_ingest"] = _dc_replace_sl(
    _REG_SL["q_stream_charset_ingest"], oracle=_stream_charset_oracle()
)
