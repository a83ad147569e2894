"""KeyedProcessOperator shim — arbitrary per-key stateful processing.

Reference (`taskmanager/operators/stateful.py:88-144`): the user supplies
``process_func(key, value, state) -> [outputs]`` where ``state`` is a
per-key dict persisted across records (pickled into RocksDB on
checkpoint). This shim reproduces that contract on
``applyInPandasWithState``: records arrive Arrow-batched per key, the
state dict round-trips through a JSON-string state schema, and outputs
are emitted as rows of a declared schema (schema-on-definition replaces
the reference's schema-free records, SURVEY §1.4).

Scale: state lives in the Structured Streaming state store (RocksDB
provider available via
``spark.sql.streaming.stateStore.providerClass``), partitioned by key —
no driver-side state, no per-key Python object graph outside the
executor processing its partition.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

ProcessFunc = Callable[[Any, dict[str, Any], dict[str, Any]], Iterable[dict[str, Any]]]

_STATE_SCHEMA = StructType([StructField("state_json", StringType())])


def keyed_process(
    df: DataFrame,
    key_cols: list[str],
    process_func: ProcessFunc,
    output_schema: StructType | str,
    order_by: str | list[str] | None = None,
    output_mode: str = "append",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Run ``process_func(key, value_dict, state_dict) -> [out_dict]``
    per record with persistent per-key state.

    ``order_by`` sorts records within each micro-batch (the reference
    processed in arrival order; event-time order is usually what you
    want). The key is passed through as in the reference (single value
    for one key column, tuple otherwise).
    """

    def handle(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        state_dict: dict[str, Any] = (
            json.loads(state.get[0]) if state.exists and state.get[0] else {}
        )
        user_key = key[0] if len(key) == 1 else key
        out_rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            if order_by is not None:
                pdf = pdf.sort_values(order_by)
            for rec in pdf.to_dict("records"):
                out_rows.extend(process_func(user_key, rec, state_dict) or [])
        state.update((json.dumps(state_dict),))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return df.groupBy(*key_cols).applyInPandasWithState(
        handle, output_schema, _STATE_SCHEMA, output_mode, timeout
    )


def dedup_process_function(max_ids: int | None = None) -> ProcessFunc:
    """The reference's dedup example rebuilt on keyed_process
    (examples/stateful_deduplication.py:18-49): per-key seen-set of
    event_ids; ``max_ids=None`` removes the reference's lossy 10k cap
    (prefer watermark-bounded streaming/dedup.py in production)."""

    def fn(key, value, state):
        seen = state.setdefault("seen", [])
        event_id = value["event_id"]
        if event_id in seen:
            return []
        seen.append(event_id)
        if max_ids is not None and len(seen) > max_ids:
            del seen[: len(seen) - max_ids]
        return [value]

    return fn
