"""Interval (range-containment) join via time-bin equi-join.

Beyond reference parity (the reference has no joins at all — SURVEY.md
§2.3); this is the training-pipeline/time-series operator Spark lacks as a
built-in: join events to the intervals that contain them.

Scale design: the naive formulation — ``events JOIN intervals ON ts
BETWEEN start AND end`` — is a theta join, which Spark can only execute as
BroadcastNestedLoopJoin (O(|events| × |intervals|) comparisons, driver-OOM
once intervals stop fitting in a broadcast).  Binning restores equi-join
mechanics: every event hashes to its fixed-width time bin; every interval
explodes to the bins it overlaps; the (bin) equi-join + exact range filter
finds exactly the containment pairs with ordinary shuffle-hash-join cost.
A pair can only meet in the event's own bin, so no dedup is needed.  Bin
width trades explode factor (long intervals → many bins) against join
selectivity (wide bins → more false candidates filtered after the join);
pick it near the median interval length.

The same shape handles interval-interval overlap joins (explode both
sides, dedup on the pair) — documented here, implemented for the
containment case the queries need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    events_df: DataFrame,
    intervals_df: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """All (event, interval) pairs with start ≤ ts ≤ end (inclusive).

    Returns the events columns + the intervals columns.  Column names must
    not collide (pre-alias interval columns).
    """
    ev = events_df.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_width_s)
    )
    iv = intervals_df.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_width_s),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_width_s),
            )
        ),
    )
    joined = ev.join(iv, "__bin", how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def asof_join(
    left_df: DataFrame,
    right_df: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    tie_break: str,
    tolerance_s: int | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Backward (inclusive) as-of join: attach to every left row the
    LATEST right row with ``right_ts`` ≤ ``left_ts`` per key — the
    time-series join Spark lacks as a built-in (pandas ``merge_asof``,
    DuckDB ``ASOF JOIN``, kdb ``aj``).

    Semantics: among right candidates the greatest ``right_ts`` wins;
    equal-``right_ts`` ties break by the greatest ``tie_break`` value, so
    the result is fully deterministic (DuckDB's ASOF leaves same-ts ties
    unspecified — callers comparing engines should dedup or accept this
    tie rule).  With ``tolerance_s``, matches older than ``left_ts −
    tolerance_s`` are nulled out (left row kept).

    Scale shape — the sort-merge as-of, not a pair join: both sides union
    into one relation tagged with a side marker, ONE shuffle+sort on
    (key, ts, side, tie) orders every right row immediately before the
    left rows it could serve, and a running ``last(right_struct,
    ignorenulls)`` over rows-unbounded-preceding carries the newest right
    row forward.  Cost is |L|+|R| shuffled once — no |L|×|R| candidate
    pairs (the LEFT JOIN + row_number formulation the oracle uses is
    exactly the quadratic shape this avoids).  Right columns travel as
    ONE struct so a NULL in a right VALUE column is carried faithfully
    instead of ``last(ignorenulls)`` skipping past the matched row.
    """
    rcols = [
        c
        for c in right_df.columns
        if c not in key_cols and c != right_ts and c != tie_break
    ]
    lpayload = [
        c for c in left_df.columns if c not in key_cols and c != left_ts
    ]
    rstruct = F.struct(
        F.col(right_ts).cast("timestamp").alias("_rts"),
        F.col(tie_break).cast("long").alias("_rtie"),
        *[F.col(c) for c in rcols],
    )
    null_rstruct = F.lit(None).cast(
        "struct<_rts:timestamp,_rtie:long,"
        + ",".join(
            f"{c}:{right_df.schema[c].dataType.simpleString()}" for c in rcols
        )
        + ">"
        if rcols
        else "struct<_rts:timestamp,_rtie:long>"
    )
    tagged_l = left_df.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        null_rstruct.alias("_r"),
        *[F.col(c) for c in lpayload],
    )
    tagged_r = right_df.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_break).cast("long").alias("_tie"),
        rstruct.alias("_r"),
        *[F.lit(None).cast(left_df.schema[c].dataType).alias(c) for c in lpayload],
    )
    # right rows (side 0) sort BEFORE left rows at equal ts → inclusive
    # backward match; among same-ts right rows the max tie_break is the
    # last carried
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    out = (
        tagged_l.unionByName(tagged_r)
        .withColumn("_m", carried)
        .filter(F.col("_side") == 1)
    )
    if tolerance_s is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m")["_rts"]
                >= F.col("_ts") - F.expr(f"INTERVAL {tolerance_s} SECOND"),
                F.col("_m"),
            ),
        )
    return out.select(
        *key_cols,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lpayload],
        F.col("_m")["_rts"].alias(f"{right_prefix}{right_ts}"),
        F.col("_m")["_rtie"].alias(f"{right_prefix}{tie_break}"),
        *[F.col("_m")[c].alias(f"{right_prefix}{c}") for c in rcols],
    )


__all__ = ["asof_join", "interval_join"]
