"""As-of (backward temporal) join — an operator Spark lacks natively.

For each left row (key, t) find the most recent right row with the same key
and right_time <= t.  Implemented as a composition of built-in ops (the
preferred strategy per the build rules): union both sides into one keyed
stream, sort within the key by time, and carry the latest right value
forward with a running max over a window — ONE shuffle on the key, no
range-explosion, no per-row lookups.

Scale notes: this is the textbook distributed as-of shape — cost is a
single hash partition by key + an in-partition sort, the same as any
windowed aggregation, so it survives 100 TB as long as keys are not
pathologically skewed (salt hot keys, or pre-bucket both tables by key to
skip the shuffle entirely).  The applyInPandas/merge_asof alternative
moves data through Arrow for no semantic gain — only use it when the
match rule (nearest, tolerance) exceeds what the running-max expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left_df: DataFrame,
    right_df: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
    right_tiebreak: str | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Left rows + the as-of matched right values (NULL when no match).

    Tie rule: a right row at exactly left_time matches (inclusive).  Among
    right rows sharing (key, right_time), the one with the greatest
    ``right_tiebreak`` wins — making results deterministic.

    ``tolerance_s`` bounds match staleness (pandas ``merge_asof``'s
    ``tolerance``): a carried match older than ``left_time −
    tolerance_s`` is nulled out AFTER the window pass (the left row is
    kept), so the tolerance adds zero shuffle — one conditional
    projection over the already-carried struct.
    """
    if not right_value_cols:
        raise ValueError(
            "right_value_cols must name ≥1 column (the matched timestamp "
            f"is always emitted as asof_{right_time})"
        )
    if right_time in right_value_cols:
        raise ValueError(
            f"right_time {right_time!r} is emitted automatically as "
            f"asof_{right_time} — listing it in right_value_cols would "
            "produce two identically-named output columns"
        )
    tiebreak = right_tiebreak or right_value_cols[0]
    lcols = [c for c in left_df.columns]
    left_part = left_df.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
    )
    struct_cols = [F.col(right_time).alias("__rt")] + [
        F.col(c).alias(f"__v_{c}") for c in [tiebreak] + [
            c for c in right_value_cols if c != tiebreak
        ]
    ]
    right_part = right_df.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(*struct_cols).alias("__rv"),
    )
    for c in lcols:
        right_part = right_part.withColumn(c, F.lit(None).cast(left_df.schema[c].dataType))
    left_part = left_part.withColumn("__rv", F.lit(None).cast(right_part.schema["__rv"].dataType))

    unioned = left_part.unionByName(right_part.select(*left_part.columns))
    # right rows (__tag=0) sort before left rows at the same time → inclusive
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # struct max is lexicographic (time, tiebreak, ...) → deterministic winner
    carried = unioned.withColumn("__asof", F.max("__rv").over(w))
    if tolerance_s is not None:
        carried = carried.withColumn(
            "__asof",
            F.when(
                F.col("__asof.__rt")
                >= F.col("__t") - F.expr(f"INTERVAL {int(tolerance_s)} SECOND"),
                F.col("__asof"),
            ),
        )
    out = carried.filter(F.col("__tag") == 1).select(
        *lcols,
        F.col("__asof.__rt").alias(f"asof_{right_time}"),
        *[
            F.col(f"__asof.__v_{c}").alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return out


__all__ = ["asof_join_backward"]
