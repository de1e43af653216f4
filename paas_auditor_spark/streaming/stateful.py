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


HH_OUTPUT_SCHEMA = "shard int, item string, cnt_lb long"
HH_STATE_SCHEMA = "items array<string>, counts array<long>"


def track_heavy_hitters(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    capacity: int = 256,
) -> Iterator[pd.DataFrame]:
    """Streaming Misra-Gries per shard: the shard's summary (≤ capacity
    items) lives in group state and folds each micro-batch in with the
    same generalized-decrement step as the batch operator
    (operators/heavyhitters.py::fold_counts) — so stream and batch modes
    are cross-checkable.  Emits the shard's refreshed summary after every
    batch it appears in."""
    from paas_auditor_spark.operators.heavyhitters import fold_counts

    items, counts = state.get if state.exists else ([], [])
    summary = dict(zip(items, counts))
    for pdf in batches:
        fold_counts(summary, pdf["item"], capacity)
    state.update((list(summary.keys()), list(summary.values())))
    yield pd.DataFrame(
        {
            "shard": [key[0]] * len(summary),
            "item": list(summary.keys()),
            "cnt_lb": list(summary.values()),
        }
    )


def heavy_hitters_stream(items_df, n_shards: int = 8, capacity: int = 256):
    """Bounded-state frequent items over an unbounded stream.

    Terms shard by hash so state parallelizes across executors while
    staying capped at ``n_shards × capacity`` entries TOTAL — a streaming
    word-count's state, by contrast, grows with the vocabulary without
    bound.  Update mode: each micro-batch RE-EMITS the shard's CUMULATIVE
    summary, so the downstream merge must take the LATEST emission per
    (shard, item) — upsert semantics — and only then combine across
    shards; summing across a shard's successive emissions would
    double-count.  (Summing per item is correct only for the batch
    operator's per-partition partials, which are disjoint slices of one
    pass.)
    """
    from functools import partial as _partial

    from pyspark.sql import functions as F

    sharded = items_df.withColumn(
        "shard", F.pmod(F.hash("item"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _partial(track_heavy_hitters, capacity=capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = "k string, t double, x double, ewma double"
EWMA_STATE_SCHEMA = "t double, e double"


def track_ewma(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    alpha: float = 0.3,
) -> Iterator[pd.DataFrame]:
    """Streaming per-key EWMA: the sequential smoother
    s_t = α·x_t + (1−α)·s_{t−1} folded batch-by-batch, the stateful
    twin of the batch ``operators/timeseries.py:ewma`` fold — state is
    ONE (last_t, ewma) pair per key, so an unbounded series smooths in
    O(1) memory instead of re-folding history every refresh.

    Ordering contract: rows fold in ``t`` order within each batch, and
    a row at or before the key's last folded ``t`` is DROPPED (the
    late-data discipline — an EWMA folded out of order is a different,
    wrong series; upstream watermarking bounds how much can be late).
    The multiply-add is the same expression the batch fold and the
    recursive-CTE oracle use, so in-order stream == batch, exactly —
    test-pinned."""
    last_t, e = state.get if state.exists else (None, None)
    pdf = pd.concat(list(batches)).sort_values("t")
    out_t: list[float] = []
    out_x: list[float] = []
    out_e: list[float] = []
    for t, x in zip(pdf["t"], pdf["x"]):
        if last_t is not None and t <= last_t:
            continue  # late or replayed row: dropped, state untouched
        e = float(x) if e is None else alpha * float(x) + (1 - alpha) * e
        last_t = float(t)
        out_t.append(last_t)
        out_x.append(float(x))
        out_e.append(e)
    if out_t:
        state.update((last_t, e))
    yield pd.DataFrame(
        {
            "k": [key[0]] * len(out_t),
            "t": out_t,
            "x": out_x,
            "ewma": out_e,
        }
    )


def ewma_stream(series_df, alpha: float = 0.3):
    """Wire ``track_ewma`` onto a streaming (k, t, x) DataFrame.
    Append-style emission in update mode: each batch emits only the
    rows it folded (already-final values — EWMA never revises the
    past), so the downstream union of emissions IS the smoothed
    series."""
    from functools import partial as _partial

    return series_df.groupBy("k").applyInPandasWithState(
        _partial(track_ewma, alpha=alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = "k string, t double, x double, cusum double"
CUSUM_STATE_SCHEMA = "t double, s double"


def track_cusum(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    mu: float,
    slack: float,
) -> Iterator[pd.DataFrame]:
    """Streaming one-sided CUSUM: the stateful twin of
    ``operators/timeseries.py:cusum`` with FIXED in-control (μ, k) —
    streaming monitoring knows its control limits up front (from a
    training window), unlike the batch query which estimates them
    in-plan.  State is one (last_t, s) pair per key; ordering contract
    identical to ``track_ewma`` (fold in t order, drop late rows), and
    the clamped recursion is the same expression the batch fold and
    recursive-CTE oracle use, so in-order stream == batch with the
    same (μ, k) — test-pinned."""
    last_t, s = state.get if state.exists else (None, 0.0)
    pdf = pd.concat(list(batches)).sort_values("t")
    out_t: list[float] = []
    out_x: list[float] = []
    out_s: list[float] = []
    for t, x in zip(pdf["t"], pdf["x"]):
        if last_t is not None and t <= last_t:
            continue
        s = max(0.0, s + (float(x) - mu - slack))
        last_t = float(t)
        out_t.append(last_t)
        out_x.append(float(x))
        out_s.append(s)
    if out_t:
        state.update((last_t, s))
    yield pd.DataFrame(
        {
            "k": [key[0]] * len(out_t),
            "t": out_t,
            "x": out_x,
            "cusum": out_s,
        }
    )


def cusum_stream(series_df, mu: float, slack: float):
    """Wire ``track_cusum`` onto a streaming (k, t, x) DataFrame —
    update mode, emissions are final (CUSUM never revises the past)."""
    from functools import partial as _partial

    return series_df.groupBy("k").applyInPandasWithState(
        _partial(track_cusum, mu=mu, slack=slack),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOTALS_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double"
)


try:  # Spark 4 arbitrary-state API; absent on older PySpark
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor as _StatefulProcessorBase,
    )
except ImportError:  # pragma: no cover
    _StatefulProcessorBase = object


class RunningTotalsProcessor(_StatefulProcessorBase):
    """Per-key running (count, sum) with TTL-bounded ValueState — the
    Spark 4 ``transformWithStateInPandas`` arbitrary-state API (typed
    state handles + per-state TTL), complementing the
    ``applyInPandasWithState`` Misra-Gries operator above which uses the
    older whole-state-tuple API.

    This is the per-key form of the reference informer's running
    counters (SURVEY §2 A4): each micro-batch folds its rows into the
    key's ValueState and emits the updated cumulative row (update-mode
    upsert semantics downstream, exactly like heavy_hitters_stream).

    Scale shape: state is one (bigint, double) pair per ACTIVE key —
    ``ttl_ms`` evicts idle keys so state is bounded by the active-key
    working set, not the all-time key cardinality; that TTL is the
    difference between a counter that survives 100 TB of keys and one
    that grows without bound.  Requires the RocksDB state store
    provider (transformWithState's backing store; set
    ``spark.sql.streaming.stateStore.providerClass``).

    Sandbox note: the transformWithState state-server protocol needs
    ``google.protobuf``, absent from this container — the end-to-end
    streaming test self-upgrades via ``pytest.importorskip`` when
    protobuf appears (same pattern as the PIL image decode); the fold
    logic itself is pinned by a fake-handle unit test either way.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._totals = handle.getValueState(
            "totals", "n bigint, total double", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        if self._totals.exists():
            prev_n, prev_total = self._totals.get()
        else:
            prev_n, prev_total = 0, 0.0
        n += int(prev_n)
        total += float(prev_total)
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals(
    events_df, ttl_ms: int | None = None
):
    """Streaming per-user cumulative (count, value-sum) via
    ``transformWithStateInPandas`` (see ``RunningTotalsProcessor``)."""
    return events_df.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


__all__ = [
    "CUSUM_OUTPUT_SCHEMA",
    "CUSUM_STATE_SCHEMA",
    "EWMA_OUTPUT_SCHEMA",
    "EWMA_STATE_SCHEMA",
    "HH_OUTPUT_SCHEMA",
    "HH_STATE_SCHEMA",
    "cusum_stream",
    "ewma_stream",
    "track_cusum",
    "track_ewma",
    "SESSION_OUTPUT_SCHEMA",
    "SESSION_STATE_SCHEMA",
    "TOTALS_OUTPUT_SCHEMA",
    "RunningTotalsProcessor",
    "heavy_hitters_stream",
    "running_user_totals",
    "sessionize_stream",
    "track_heavy_hitters",
    "track_sessions",
]
