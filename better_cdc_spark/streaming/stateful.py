"""Arbitrary stateful processing — transformWithState and its fallback.

Two generations of Spark's custom-stateful-operator API implement the
reference's per-key accumulation pattern (transaction assembly, R5,
engine.go:124-220 keyed by xid; here keyed by user for oracle checking):

- ``applyInPandasWithState`` (Spark 3.x, always available) — one callback,
  one GroupState per key. This backs the registered q85 query.
- ``transformWithStateInPandas`` (Spark 4 StatefulProcessor) — typed state
  variables (value/list/map state), timers, TTL, and initial-state support,
  running on the RocksDB state store. Its Python side speaks a protobuf
  protocol to the JVM state server, so it needs the ``google.protobuf``
  package. Where that package is absent (this container), the SAME
  StatefulProcessor instance runs on the **shim engine**: a compatibility
  layer that hosts StatefulProcessor.init/handleInputRows/close on
  applyInPandasWithState, backing its ValueState with the legacy
  GroupState (single value-state variable, no timers/TTL — exactly the
  subset the processor uses). The operator therefore registers and runs
  everywhere; HAS_TRANSFORM_WITH_STATE only selects which engine executes
  it.

Both paths produce the identical (user_id, n_events, sum_value) stream, so
whichever is available hash-checks against the same batch-SQL oracle.
State is held in integer cents: exact accumulation, byte-stable across
replays (double summation would drift with batch boundaries).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_DDL = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = StructType([StructField("n", LongType()), StructField("cents", LongType())])


def _probe_transform_with_state() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state-server
    wire protocol; probe the exact import its runner performs."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


HAS_TRANSFORM_WITH_STATE = _probe_transform_with_state()


def _make_processor():
    """Build the StatefulProcessor class lazily: the base class imports
    cleanly everywhere, but instances are only usable when protobuf is
    present, so construction stays behind the capability gate."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserAggProcessor(StatefulProcessor):
        """Per-key running (count, exact-cents sum) with ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(round(pdf["value"].sum() * 100))
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    return UserAggProcessor()


class _ShimValueState:
    """ValueState facade over an applyInPandasWithState GroupState.

    Mirrors pyspark.sql.streaming.value_state_client semantics for the
    subset StatefulProcessors here use: exists/get/update/clear on a
    tuple-shaped value.
    """

    def __init__(self, group_state: GroupState) -> None:
        self._gs = group_state

    def exists(self) -> bool:
        return self._gs.exists

    def get(self):
        return self._gs.get

    def update(self, value) -> None:
        self._gs.update(tuple(value))

    def clear(self) -> None:
        self._gs.remove()


class _ShimHandle:
    """StatefulProcessorHandle facade for the shim engine.

    Supports exactly one value-state variable (the declared schema is
    carried by the host's stateStructType instead); timers and TTL raise,
    matching the documented shim subset.
    """

    def __init__(self, group_state: GroupState) -> None:
        self._gs = group_state

    def getValueState(self, name: str, schema, ttl_duration_ms: int | None = None):
        if ttl_duration_ms is not None:
            raise NotImplementedError("shim engine does not support state TTL")
        return _ShimValueState(self._gs)

    def getListState(self, *a, **k):
        raise NotImplementedError("shim engine supports ValueState only")

    def getMapState(self, *a, **k):
        raise NotImplementedError("shim engine supports ValueState only")

    def registerTimer(self, *a, **k):
        raise NotImplementedError("shim engine does not support timers")


def _shim_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Host one StatefulProcessor group-invocation on the legacy engine."""
    proc = _make_processor()
    proc.init(_ShimHandle(state))
    yield from proc.handleInputRows(key, pdfs, None)
    proc.close()


def stateful_user_agg(stream: DataFrame, engine: str = "auto") -> DataFrame:
    """Per-user running aggregate as a custom stateful streaming operator.

    engine: "tws" forces transformWithStateInPandas, "legacy" forces
    applyInPandasWithState, "shim" runs the StatefulProcessor class on the
    legacy engine, "auto" picks tws when the container can run it and the
    shim otherwise — the Spark-4 StatefulProcessor code path executes
    everywhere.
    """
    if engine == "auto":
        engine = "tws" if HAS_TRANSFORM_WITH_STATE else "shim"
    if engine == "shim":
        return stream.groupBy("user_id").applyInPandasWithState(
            _shim_update,
            outputStructType=OUTPUT_DDL,
            stateStructType="n bigint, cents bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    grouped = stream.groupBy("user_id")
    if engine == "tws":
        spark = stream.sparkSession
        # transformWithState only runs on the RocksDB state store.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        return grouped.transformWithStateInPandas(
            statefulProcessor=_make_processor(),
            outputStructType=OUTPUT_DDL,
            outputMode="Update",
            timeMode="None",
        )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(pdf["value"].sum() * 100))
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 100.0]}
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=OUTPUT_DDL,
        stateStructType="n bigint, cents bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
