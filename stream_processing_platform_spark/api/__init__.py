"""Fluent API facade mirroring the reference's user surface."""

from stream_processing_platform_spark.api.environment import (  # noqa: F401
    DataStream,
    KeyedStream,
    StreamExecutionEnvironment,
    WindowedStream,
)
