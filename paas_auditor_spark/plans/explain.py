"""Physical-plan inspection helpers.

The engine's scale posture is enforced by asserting plan shape, not hoping:
filters push to the scan, small dims broadcast, top-k runs as
TakeOrderedAndProject, Python stays out of the hot path.  Tests use these
to fail when a refactor silently degrades a plan (e.g. a lost broadcast
becoming a sort-merge join, or a pushed filter detaching from the scan).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_plan_contains(df: DataFrame, *needles: str) -> str:
    plan = physical_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    return plan


def assert_plan_lacks(df: DataFrame, *needles: str) -> str:
    plan = physical_plan(df)
    for needle in needles:
        assert needle not in plan, f"unexpected {needle!r} in plan:\n{plan}"
    return plan
