"""State-v2 operators (Spark 4 ``transformWithStateInPandas``).

The DIRECT answer to the reference's state primitives
(`taskmanager/state/`: ValueState/ListState dicts pickled into RocksDB
on checkpoint): typed, named state handles (``getValueState`` /
``getListState`` / ``getMapState``), per-state TTL, and event/processing
-time timers, persisted in the RocksDB state store provider that
``transformWithState`` requires. Where ``keyed_process``
(applyInPandasWithState) reproduces the reference's schema-free
state-dict CONTRACT, this module uses the modern engine surface the
reference's RocksDB backend was reaching for.

Scale: state is partitioned by key in the executor-local RocksDB
instances (changelog-checkpointed to the checkpoint location) — no
driver state, no full-store rewrite per batch, per-key TTL eviction
handled by the store itself.

CONTAINER GATE: executing a transformWithState query requires the
Python ``protobuf`` package (the state-server wire protocol), which is
not installed here — plan construction and the operator contract are
tested (`tests/test_stateful_v2.py`), runtime execution is skipped via
``requires_state_v2_runtime()``. On a normal cluster image (protobuf
ships with pyspark[connect]) the operator runs as-is;
``keyed_process`` (applyInPandasWithState) remains the container-
executable stateful path and covers the same reference semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def requires_state_v2_runtime() -> bool:
    """True when the Python protobuf package needed by the
    transformWithState state server is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_rocksdb_state_store(spark) -> None:
    """transformWithState requires the RocksDB provider; set it on the
    session (takes effect for queries started afterwards)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, total, min, max) in a typed ValueState —
    the canonical state-primitive demo: one named handle, updated per
    batch, emitted per update (update output mode).

    ``ttl_ms`` > 0 turns on per-state TTL: a key idle longer than the
    TTL restarts its stats from zero — the reference's state-eviction
    knob, handled by the store, not user code.
    """

    def __init__(self, value_col: str = "value", ttl_ms: int | None = None):
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState(
            "stats", "cnt long, total double, mn double, mx double", self._ttl_ms
        )

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        prev = self._stats.get() if self._stats.exists() else None
        cnt, total, mn, mx = prev if prev is not None else (0, 0.0, None, None)
        for pdf in rows:
            vs = pdf[self._value_col]
            if len(vs) == 0:
                continue
            cnt += int(len(vs))
            total += float(vs.sum())
            bmn, bmx = float(vs.min()), float(vs.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        self._stats.update((cnt, total, mn, mx))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "cnt": [cnt],
                "total": [total],
                "mn": [mn],
                "mx": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_stats(
    df: DataFrame,
    key_col: str,
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running stats via transformWithState. Output columns:
    (key, cnt, total, mn, mx); use update output mode — the last emitted
    row per key is the final state.

    Spark only allows state TTL under ``TimeMode.ProcessingTime`` (it
    raises STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL
    otherwise), so requesting ``ttl_ms`` switches the time mode."""
    ensure_rocksdb_state_store(df.sparkSession)
    return (
        df.groupBy(key_col)
        .transformWithStateInPandas(
            RunningStatsProcessor(value_col, ttl_ms),
            outputStructType="key long, cnt long, total double, mn double, mx double",
            outputMode="Update",
            timeMode="ProcessingTime" if ttl_ms is not None else "None",
        )
    )
