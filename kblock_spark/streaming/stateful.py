"""Custom stateful streaming operator via applyInPandasWithState.

The engine's example of arbitrary per-key state the built-in windowed
aggregations can't express: a RUNNING per-key profile maintained
across micro-batches (cumulative event count + value sum + the last
event time seen), emitted once per batch per updated key. This is the
state shape a crawl-ingest deduper or per-host politeness tracker
needs at 10¹²-event scale — state lives in the state store, keyed and
partitioned by the grouping key, never on the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, total double, last_ts timestamp"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_total double, last_ts timestamp"
)


def _update_profile(key, pdfs, state: GroupState):
    n, total, last_ts = (
        state.get if state.exists else (0, 0.0, None)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        mx = pdf["ts"].max()
        if last_ts is None or (mx is not None and mx > last_ts):
            last_ts = mx
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_total": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value, …) → one updated profile row
    per user per micro-batch. Output mode must be 'update'."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
