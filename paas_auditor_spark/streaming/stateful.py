"""Custom stateful streaming operator via applyInPandasWithState.

The engine's template for operators Spark's built-ins can't express:
arbitrary per-key state evolved batch-by-batch with timeout-driven
emission.  The concrete operator here is **streaming sessionization** —
per-user session tracking with a gap timeout — chosen because it is the
stateful generalization of the batch ``q_sessionization`` query (lag +
gap > threshold), so the two modes are cross-checkable.

Scale notes: state is one small tuple per active user key, partitioned by
the grouping key across executors; the processing-time timeout closes idle
sessions so state is bounded by *active* users, not all-time users.  Data
moves through Arrow record batches (vectorized), never row-at-a-time
Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, n_sessions long, last_seen timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "n_sessions long, last_seen double, n_events long"


def track_sessions(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: float = 1800.0,
    use_timeout: bool = False,
) -> Iterator[pd.DataFrame]:
    """Per-user session counter: a new session starts when the gap since
    the previous event exceeds ``gap_s`` (same rule as the batch
    sessionization query).  Emits the running totals for the key after
    every batch it appears in.
    """
    if state.hasTimedOut:
        # idle key: emit final totals and drop the state
        n_sessions, last_seen, n_events = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "last_seen": [pd.Timestamp(last_seen, unit="s")],
                "n_events": [n_events],
            }
        )
        return

    n_sessions, last_seen, n_events = (
        state.get if state.exists else (0, None, 0)
    )
    ts_all = pd.concat([pdf["ts"] for pdf in batches]).sort_values()
    epochs = ts_all.astype("int64") / 1e9
    for t in epochs:
        if last_seen is None or (t - last_seen) > gap_s:
            n_sessions += 1
        last_seen = t
        n_events += 1
    state.update((n_sessions, last_seen, n_events))
    if use_timeout:
        state.setTimeoutDuration(int(gap_s * 1000))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "last_seen": [pd.Timestamp(last_seen, unit="s")],
            "n_events": [n_events],
        }
    )


def sessionize_stream(
    events_df, gap_s: float = 1800.0, use_timeout: bool = False
):
    """Wire ``track_sessions`` onto a streaming events DataFrame.

    Output mode must be ``update``; each micro-batch emits refreshed
    session totals for the users it touched.  With ``use_timeout=True``
    idle keys additionally emit a final row and evict their state when the
    processing-time timeout fires — the production setting for bounded
    state; note a timeout-armed query never fully quiesces (the engine
    keeps scheduling batches to fire timers), so tests that drain with
    ``processAllAvailable`` use the default.
    """
    from functools import partial

    return events_df.groupBy("user_id").applyInPandasWithState(
        partial(track_sessions, gap_s=gap_s, use_timeout=use_timeout),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


__all__ = [
    "SESSION_OUTPUT_SCHEMA",
    "SESSION_STATE_SCHEMA",
    "sessionize_stream",
    "track_sessions",
]
