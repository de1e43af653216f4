"""SCD-2 dimension maintenance: close-and-reopen on change, pass-through
on no-op, insert on new key, idempotent under replay."""

from __future__ import annotations

import datetime as dt

from paas_auditor_spark.operators.scd import MAX_TS, scd2_apply

DIM_SCHEMA = (
    "k string, color string, size long, valid_from timestamp,"
    " valid_to timestamp"
)
UPD_SCHEMA = "k string, color string, size long, effective_ts timestamp"

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)
TMAX = dt.datetime.fromisoformat(MAX_TS)


def _snapshot(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_scd2_close_reopen_noop_insert(spark):
    dim = spark.createDataFrame(
        [
            ("a", "red", 1, T0, TMAX),
            ("b", "blue", 2, T0, TMAX),
            # pre-existing history row for a: must pass through untouched
            ("a", "pink", 1, dt.datetime(2023, 1, 1), T0),
        ],
        DIM_SCHEMA,
    )
    updates = spark.createDataFrame(
        [
            ("a", "green", 1, T1),  # attr change → close + reopen
            ("b", "blue", 2, T1),  # identical attrs → no-op
            ("c", "black", 3, T1),  # new key → insert current
        ],
        UPD_SCHEMA,
    )
    out = scd2_apply(dim, updates, "k", ["color", "size"])
    assert _snapshot(out) == sorted(
        [
            ("a", "pink", 1, dt.datetime(2023, 1, 1), T0),
            ("a", "red", 1, T0, T1),
            ("a", "green", 1, T1, TMAX),
            ("b", "blue", 2, T0, TMAX),
            ("c", "black", 3, T1, TMAX),
        ],
        key=repr,
    )
    # replaying the SAME batch is a no-op (every update now matches its
    # current row) — at-least-once batch delivery is safe
    again = scd2_apply(out, updates, "k", ["color", "size"])
    assert _snapshot(again) == _snapshot(out)


def test_scd2_null_attr_changes_tracked(spark):
    dim = spark.createDataFrame([("a", None, 1, T0, TMAX)], DIM_SCHEMA)
    updates = spark.createDataFrame([("a", "red", 1, T1)], UPD_SCHEMA)
    out = scd2_apply(dim, updates, "k", ["color", "size"])
    # NULL→value is a real change (null-safe struct comparison)
    assert _snapshot(out) == sorted(
        [("a", None, 1, T0, T1), ("a", "red", 1, T1, TMAX)], key=repr
    )
