"""Distributed global order statistics (operators/rank.py): equality
with the single-partition window form it replaces, and the plan shape
that makes it scale — no partition-less WindowExec anywhere."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from paas_auditor_spark.operators.rank import with_global_order_stats


def _data(spark, n=1000, seed_mod=37):
    # deterministic, collision-rich weights so rank tie-breaks matter
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % seed_mod).alias("x"),
        ((F.col("id") * 2654435761) % 1000).alias("wt"),
    )


def _assert_no_global_window(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, "expected at least one window in the plan"
    for first_arg in specs:
        assert first_arg == "_pid", (
            f"partition-less window (first spec arg {first_arg!r}):\n"
            + plan[:2000]
        )


def test_rank_and_prefix_equal_window_form(spark):
    df = _data(spark)
    got = with_global_order_stats(
        df, [F.desc("x"), "k"], weight="wt",
        rank_col="r", prefix_col="cum", num_partitions=7,
    )
    w = Window.orderBy(F.desc("x"), "k")
    want = df.select(
        "k",
        F.row_number().over(w).alias("r"),
        F.sum("wt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    gm = {r["k"]: (r["r"], r["cum"]) for r in got.collect()}
    wm = {r["k"]: (r["r"], r["cum"]) for r in want.collect()}
    assert gm == wm
    _assert_no_global_window(got)


def test_rank_default_weight_counts_rows(spark):
    df = _data(spark, n=100)
    got = with_global_order_stats(
        df, ["x", "k"], rank_col="r", prefix_col="cum", num_partitions=5
    ).collect()
    for r in got:
        assert r["cum"] == r["r"]  # unit weights: prefix sum == rank
    assert sorted(r["r"] for r in got) == list(range(1, 101))


def test_rank_empty_input(spark):
    df = _data(spark).where(F.lit(False))
    assert (
        with_global_order_stats(df, ["x", "k"], num_partitions=4).count()
        == 0
    )


@pytest.mark.parametrize(
    "qname",
    [
        "activity_gini",
        "traffic_pareto",
        "negative_samples",
        "value_percentiles_exact",
    ],
)
def test_flagged_headline_windows_are_partitioned(spark, sf_dir, qname):
    """The r6 verdict's scale-killer finding: these three carried a
    global (single-partition) window over a users/vocab-sized relation.
    Every window in their plans must now be partitioned."""
    from paas_auditor_spark.queries import REGISTRY

    _assert_no_global_window(REGISTRY[qname].fn(spark, sf_dir))


def test_rank_refuses_reserved_column_collision(spark):
    """ADVICE r7: an input already carrying one of the four internal
    working columns (_pid/_wt/_rank_off/_w_off) was silently overwritten
    and then dropped from the output — the operator must refuse loudly."""
    import pytest

    df = spark.range(5).select(
        F.col("id"), F.lit(1).alias("_pid")
    )
    with pytest.raises(ValueError, match="reserved working columns"):
        with_global_order_stats(df, ["id"])
