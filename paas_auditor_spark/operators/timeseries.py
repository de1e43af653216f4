"""Sequential time-series operators expressed as in-plan folds.

EWMA (exponentially weighted moving average) is the canonical
sequentially-dependent smoother: ``s_t = α·x_t + (1−α)·s_{t−1}``.  A
window frame cannot express it without the exploding ``(1−α)^{−i}``
re-weighting trick, and a driver loop would serialize the keys — so the
engine folds each key's ordered series INSIDE the plan with the
``aggregate`` higher-order function over a ``sort_array(collect_list)``
base (the chat_assembly / bpe fold convention).

Scale contract: one shuffle on the key column; the per-key aggregation
buffer holds that key's series, which for time-BUCKETED series (daily /
hourly rollups — the intended inputs) is calendar-bounded (365 rows per
key-year), not data-volume-bounded.  Feed this operator rollup outputs,
not raw events — the same bounded-group discipline documented on
chat_assembly (queries.py) applies.

The fold's arithmetic order (one multiply-add per step, oldest first)
is deterministic and engine-portable, so an exact oracle can replay it
with a recursive CTE stepping ``rn → rn+1`` (see ORACLE_EWMA_DAILY in
queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cusum", "ewma"]


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    alpha: float,
) -> DataFrame:
    """Per-key EWMA over the series ordered by ``order_col``.

    Initialization: ``s_1 = x_1`` (the standard convention — no bias
    correction), then ``s_t = α·x_t + (1−α)·s_{t−1}``.  Returns one row
    per input row: (key_col, order_col, value_col, ewma double), ewma
    unrounded — callers round for cross-engine comparison.

    NULL values propagate NULL ewma from their position onward (a gap
    in a rollup series should be repaired upstream, e.g. daily_gapfill,
    not silently smoothed over); NULL order keys are rejected upstream
    by the groupBy-collect (they would sort indeterminately).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    a = F.lit(float(alpha))
    series = df.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
        ).alias("_s")
    )
    out_t = (
        "array<struct<o:"
        + df.schema[order_col].dataType.simpleString()
        + ",v:"
        + df.schema[value_col].dataType.simpleString()
        + ",e:double>>"
    )
    folded = series.select(
        key_col,
        F.aggregate(
            "_s",
            F.array().cast(out_t),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.struct(
                        x[order_col].alias("o"),
                        x[value_col].alias("v"),
                        F.when(
                            F.size(acc) == 0, x[value_col].cast("double")
                        )
                        .otherwise(
                            a * x[value_col]
                            + (F.lit(1.0) - a)
                            * F.element_at(acc, -1)["e"]
                        )
                        .alias("e"),
                    )
                ),
            ),
        ).alias("_f"),
    )
    return folded.select(
        key_col, F.explode("_f").alias("_x")
    ).select(
        key_col,
        F.col("_x.o").alias(order_col),
        F.col("_x.v").alias(value_col),
        F.col("_x.e").alias("ewma"),
    )


def cusum(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    mu_col: str,
    slack_col: str,
) -> DataFrame:
    """One-sided upper CUSUM (Page 1954): S_1 = max(0, x_1 − μ − k),
    S_t = max(0, S_{t−1} + x_t − μ − k) — the sequential statistic that
    detects SUSTAINED level shifts a spike detector (ewma_anomaly)
    misses, because small persistent exceedances accumulate instead of
    being absorbed by the smoother.  μ (``mu_col``) and the slack k
    (``slack_col``) are caller-provided columns, constant per key —
    typically in-control mean and 0.5σ joined on before the fold.

    Same in-plan fold machinery and contracts as ``ewma``: one shuffle
    on the key, per-key buffer bounded by the (calendar-bounded) series
    length, deterministic multiply-add order so a recursive CTE can
    replay it exactly.  Returns (key, order, value, cusum double),
    cusum unrounded.

    NULL edge (differs from ewma's poison-the-tail): a NULL value /
    mu / slack makes the increment NULL, and ``greatest`` skips NULLs,
    so the statistic RESETS to 0 at that point and resumes — feed this
    operator gap-repaired series (daily_gapfill) when that reset is
    not the intent; the behavior is test-pinned either way."""
    series = df.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col),
                    F.col(value_col),
                    F.col(mu_col),
                    F.col(slack_col),
                )
            )
        ).alias("_s")
    )
    out_t = (
        "array<struct<o:"
        + df.schema[order_col].dataType.simpleString()
        + ",v:"
        + df.schema[value_col].dataType.simpleString()
        + ",s:double>>"
    )
    step = lambda acc, x: F.concat(  # noqa: E731
        acc,
        F.array(
            F.struct(
                x[order_col].alias("o"),
                x[value_col].alias("v"),
                F.greatest(
                    F.lit(0.0),
                    F.when(
                        F.size(acc) == 0, F.lit(0.0)
                    ).otherwise(F.element_at(acc, -1)["s"])
                    + (x[value_col] - x[mu_col] - x[slack_col]),
                ).alias("s"),
            )
        ),
    )
    folded = series.select(
        key_col, F.aggregate("_s", F.array().cast(out_t), step).alias("_f")
    )
    return folded.select(key_col, F.explode("_f").alias("_x")).select(
        key_col,
        F.col("_x.o").alias(order_col),
        F.col("_x.v").alias(value_col),
        F.col("_x.s").alias("cusum"),
    )
