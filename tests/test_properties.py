"""Property-based checks (hypothesis) for the incremental-pipeline
invariants — the randomized analog of the reference's randomEventPages
fixtures (cf_audit_event_fetcher_test.go:269-310), but with asserted
properties instead of example assertions.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from paas_auditor_spark.operators.cursor import unshipped_events
from paas_auditor_spark.operators.ingest import idempotent_append

BASE = dt.datetime(2024, 3, 1)

# (guid index, seconds offset) — duplicates across and within batches allowed
event_batch = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 3600)),
    min_size=0,
    max_size=25,
)

SCHEMA = "guid string, created_at timestamp, payload string"


def _df(spark, batch):
    rows = [
        (f"g-{g}", BASE + dt.timedelta(seconds=s), f"p-{g}-{s}")
        for g, s in batch
    ]
    return spark.createDataFrame(rows, SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(b1=event_batch, b2=event_batch)
def test_idempotent_append_never_duplicates_keys(spark, b1, b2):
    """However batches overlap (within or across), the target ends with
    exactly one row per distinct guid and append order never loses keys."""
    target = _df(spark, [])
    for batch in (b1, b2, b1):  # replay b1 entirely (at-least-once input)
        target = idempotent_append(target, _df(spark, batch))
    got = target.select("guid").collect()
    want_keys = {f"g-{g}" for g, _ in b1 + b2}
    assert len(got) == len(want_keys)
    assert {r["guid"] for r in got} == want_keys


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=event_batch, cursor_s=st.integers(0, 3600), cap=st.integers(1, 10))
def test_unshipped_respects_cursor_order_and_cap(spark, batch, cursor_s, cap):
    events = _df(spark, batch).dropDuplicates(["guid"])
    cursor_ts = BASE + dt.timedelta(seconds=cursor_s)
    shipped_id = "g-5"
    out = unshipped_events(
        events, cursor_ts, shipped_id, batch_cap=cap,
        ts_col="created_at", id_col="guid",
    ).collect()
    # bounded batch
    assert len(out) <= cap
    # P6: nothing before the cursor; P7: the cursor guid itself is excluded
    assert all(r["created_at"] >= cursor_ts for r in out)
    assert all(r["guid"] != shipped_id for r in out)
    # O4: chronological ship order
    times = [r["created_at"] for r in out]
    assert times == sorted(times)
