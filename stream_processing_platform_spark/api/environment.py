"""StreamExecutionEnvironment / DataStream fluent facade.

Mirrors the reference's user API (`jobmanager/job_graph.py:265-501`,
`docs/api_reference.md:153-343`): env.add_source → DataStream →
map/filter/flat_map/key_by/window/reduce/add_sink. Underneath everything
compiles to DataFrame operations, so Catalyst owns the plan — the
JobGraph/JobVertex/JobEdge IR of the reference dissolves into the logical
plan, and edge types map as: FORWARD → narrow op, SHUFFLE → groupBy/join
exchange, REBALANCE → repartition(n), BROADCAST → broadcast hint
(SURVEY §1.4, §2.7).

The facade accepts native Column expressions (preferred — JVM codegen)
and, as the escape hatch, Python callables via Arrow-vectorized
mapInPandas with an explicit output schema (schema-on-definition replaces
the reference's schema-free pickled records).

Works identically over batch and streaming DataFrames; streaming sinks
return a StreamingQuery handle (the reference's job-control surface maps
to StreamingQuery/spark.streams — SURVEY §3.4).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from stream_processing_platform_spark.session import get_spark


class StreamExecutionEnvironment:
    """Entry point — builds DataStreams from sources
    (job_graph.py:265-330 twin)."""

    def __init__(self, job_name: str = "spp-job", spark: SparkSession | None = None):
        self.job_name = job_name
        self.spark = spark or get_spark(app_name=job_name)

    # -- sources (§2.1) ----------------------------------------------------
    def from_collection(self, data: list, schema=None) -> "DataStream":
        """CollectionSourceOperator (sources.py:201-261)."""
        return DataStream(self.spark.createDataFrame(data, schema=schema), self)

    def from_parquet(self, path: str) -> "DataStream":
        return DataStream(self.spark.read.parquet(path), self)

    def from_csv(self, path: str, header: bool = True, schema=None) -> "DataStream":
        reader = self.spark.read.option("header", header)
        reader = reader.schema(schema) if schema else reader.option("inferSchema", "true")
        return DataStream(reader.csv(path), self)

    def from_file_stream(self, path: str, schema: StructType, fmt: str = "parquet") -> "DataStream":
        from stream_processing_platform_spark.sources.streaming import file_source

        return DataStream(file_source(self.spark, path, schema, fmt), self)

    def from_rate(self, rows_per_second: int = 1000) -> "DataStream":
        from stream_processing_platform_spark.sources.streaming import rate_source

        return DataStream(rate_source(self.spark, rows_per_second), self)

    def from_kafka(self, topic: str, bootstrap_servers: str, value_schema=None) -> "DataStream":
        from stream_processing_platform_spark.sources.streaming import kafka_source

        return DataStream(kafka_source(self.spark, topic, bootstrap_servers, value_schema=value_schema), self)

    def add_source(self, df: DataFrame) -> "DataStream":
        return DataStream(df, self)


class DataStream:
    """Fluent transformation surface (job_graph.py:333-420 twin)."""

    def __init__(self, df: DataFrame, env: StreamExecutionEnvironment):
        self.df = df
        self.env = env

    # -- stateless ops (§2.3) ---------------------------------------------
    def map(self, exprs: Mapping[str, Column]) -> "DataStream":
        """MapOperator with native column expressions (stateless.py:14-45)."""
        return DataStream(self.df.withColumns(dict(exprs)), self.env)

    def select(self, *cols) -> "DataStream":
        return DataStream(self.df.select(*cols), self.env)

    def map_pandas(
        self, fn: Callable[[Iterable], Iterable], schema: StructType | str
    ) -> "DataStream":
        """Arbitrary-Python map — Arrow-batched mapInPandas, the vectorized
        replacement for the reference's row-at-a-time map_func."""
        return DataStream(self.df.mapInPandas(fn, schema), self.env)

    def filter(self, predicate: Column) -> "DataStream":
        """FilterOperator (stateless.py:48-79)."""
        return DataStream(self.df.where(predicate), self.env)

    def flat_map(self, out_col: str, array_expr: Column) -> "DataStream":
        """FlatMapOperator (stateless.py:82-116): explode an array expr."""
        return DataStream(self.df.select("*", F.explode(array_expr).alias(out_col)), self.env)

    def union(self, other: "DataStream") -> "DataStream":
        return DataStream(self.df.unionByName(other.df), self.env)

    def rebalance(self, num_partitions: int) -> "DataStream":
        """REBALANCE edge (job_graph.py:11-17)."""
        return DataStream(self.df.repartition(num_partitions), self.env)

    def with_watermark(self, ts_col: str, delay: str = "5 seconds") -> "DataStream":
        return DataStream(self.df.withWatermark(ts_col, delay), self.env)

    # -- keying (§2.3 KeyByOperator — SHUFFLE edge) ------------------------
    def key_by(self, *key_cols: str) -> "KeyedStream":
        return KeyedStream(self.df, self.env, list(key_cols))

    # -- joins (§2.5) ------------------------------------------------------
    def interval_join(
        self,
        other: "DataStream",
        on: list[str],
        left_ts_ms: str,
        right_ts_ms: str,
        lower_ms: int,
        upper_ms: int,
        how: str = "inner",
    ) -> "DataStream":
        from stream_processing_platform_spark.operators.joins import interval_join

        return DataStream(
            interval_join(self.df, other.df, on, left_ts_ms, right_ts_ms, lower_ms, upper_ms, how),
            self.env,
        )

    def join(self, other: "DataStream", on, how: str = "inner") -> "DataStream":
        return DataStream(self.df.join(other.df, on, how), self.env)

    def broadcast_join(self, dim: "DataStream", on, how: str = "inner") -> "DataStream":
        """BROADCAST edge (job_graph.py:11-17)."""
        return DataStream(self.df.join(F.broadcast(dim.df), on, how), self.env)

    # -- sinks (§2.2) ------------------------------------------------------
    def add_sink(self, kind: str = "memory", **kw):
        """Batch: collect/show/parquet. Streaming: memory/console/parquet/
        kafka — returns the StreamingQuery (job control: .stop(),
        .lastProgress — the reference's REST surface, SURVEY §3.4)."""
        from stream_processing_platform_spark import sinks

        if not self.df.isStreaming:
            if kind == "memory":
                return self.df.collect()
            if kind == "console":
                self.df.show(truncate=False)
                return None
            if kind == "parquet":
                self.df.write.mode(kw.get("mode", "overwrite")).parquet(kw["path"])
                return None
            raise ValueError(f"unknown batch sink {kind!r}")
        if kind == "memory":
            return sinks.memory_sink(self.df, kw["name"], kw.get("output_mode", "append"))
        if kind == "console":
            return sinks.console_sink(self.df, kw.get("output_mode", "append"))
        if kind == "parquet":
            return sinks.parquet_sink(
                self.df, kw["path"], kw["checkpoint_dir"], kw.get("output_mode", "append")
            )
        if kind == "kafka":
            return sinks.kafka_sink(
                self.df, kw["topic"], kw["bootstrap_servers"], kw["checkpoint_dir"]
            )
        raise ValueError(f"unknown streaming sink {kind!r}")

    def collect(self):
        return self.df.collect()


class KeyedStream:
    """Post-key_by surface (job_graph.py:423-470 twin)."""

    def __init__(self, df: DataFrame, env: StreamExecutionEnvironment, key_cols: list[str]):
        self.df = df
        self.env = env
        self.key_cols = key_cols

    def window(self, ts_col: str, size: str, slide: str | None = None) -> "WindowedStream":
        return WindowedStream(self, ts_col, size=size, slide=slide)

    def session_window(self, ts_col: str, gap: str) -> "WindowedStream":
        return WindowedStream(self, ts_col, gap=gap)

    def aggregate(self, agg_func: str, value_col: str) -> DataStream:
        """AggregateOperator (stateful.py:265-342): running per-key
        sum/count/avg/min/max; streaming callers use update output mode."""
        fns = {"sum": F.sum, "count": F.count, "avg": F.avg, "min": F.min, "max": F.max}
        if agg_func not in fns:
            raise ValueError(f"agg_func must be one of {sorted(fns)}")
        agg = fns[agg_func](value_col).alias(agg_func)
        return DataStream(self.df.groupBy(*self.key_cols).agg(agg), self.env)

    def reduce(self, agg: Column, ts_col: str = "ts") -> DataStream:
        """KeyedStream.reduce sugar (job_graph.py:450-457): reduce over a
        fixed 1-second tumbling window."""
        return self.window(ts_col, "1 second").agg(agg)

    def process(
        self,
        process_func: Callable[[Any, dict, dict], Iterable[dict]],
        output_schema: StructType | str,
        order_by: str | None = None,
        output_mode: str = "append",
    ) -> DataStream:
        """KeyedProcessOperator (stateful.py:88-144) — arbitrary per-key
        stateful UDF on applyInPandasWithState (streaming only)."""
        from stream_processing_platform_spark.streaming.keyed_process import keyed_process

        return DataStream(
            keyed_process(
                self.df, self.key_cols, process_func, output_schema, order_by, output_mode
            ),
            self.env,
        )

    def dedup(self, ts_col: str | None = None, watermark_delay: str = "10 seconds") -> DataStream:
        from stream_processing_platform_spark.streaming.dedup import dedup_stream

        if self.df.isStreaming:
            return DataStream(
                dedup_stream(self.df, self.key_cols, ts_col, watermark_delay), self.env
            )
        from stream_processing_platform_spark.operators.dedup import dedup_keep_first

        order = [F.col(ts_col).asc()] if ts_col else [F.col(self.key_cols[0]).asc()]
        return DataStream(dedup_keep_first(self.df, self.key_cols, order), self.env)


class WindowedStream:
    """Windowed surface (job_graph.py:473-501 twin)."""

    def __init__(
        self,
        keyed: KeyedStream,
        ts_col: str,
        size: str | None = None,
        slide: str | None = None,
        gap: str | None = None,
        watermark_delay: str = "5 seconds",
    ):
        self.keyed = keyed
        self.ts_col = ts_col
        self.size = size
        self.slide = slide
        self.gap = gap
        self.watermark_delay = watermark_delay

    def agg(self, *aggs: Column) -> DataStream:
        from stream_processing_platform_spark.streaming import windows as W

        df, keys = self.keyed.df, self.keyed.key_cols
        if self.gap is not None:
            out = W.session_agg(df, self.ts_col, self.gap, keys, list(aggs), self.watermark_delay)
        elif self.slide is not None:
            out = W.sliding_agg(
                df, self.ts_col, self.size, self.slide, keys, list(aggs), self.watermark_delay
            )
        else:
            out = W.tumbling_agg(df, self.ts_col, self.size, keys, list(aggs), self.watermark_delay)
        return DataStream(out, self.keyed.env)

    def reduce(self, agg: Column) -> DataStream:
        """WindowOperator reduce mode (stateful.py:147-262)."""
        return self.agg(agg)

    def collect_elements(self, value_col: str) -> DataStream:
        """WindowOperator without reduce_func (stateful.py:226-231): emit
        the window's element list."""
        return self.agg(F.collect_list(value_col).alias("elements"))
