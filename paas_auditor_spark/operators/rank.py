"""Distributed global order statistics — rank / percent_rank / prefix
sums WITHOUT a single-partition window.

A plain ``row_number().over(Window.orderBy(...))`` funnels the whole
relation through ONE partition (Spark warns ``WindowExec: No Partition
Defined``) — fine at 10⁵ rows, the canonical scale-killer at 10⁸⁺: one
executor core sorts everything while the rest idle.  The reference has
no such operator (its ORDER BYs are top-k or per-key), but several
engine analytics (Gini/Pareto concentration audits, the word2vec
negative-sampling alias table) need a TOTAL-order statistic over an
unbounded relation.

This module computes them with the ``export_ordered`` pattern
(sources/partitioned.py): ``repartitionByRange`` gives every partition
a contiguous, disjoint key range; a per-partition window (parallel —
partitioned by ``spark_partition_id()``) ranks locally; a ≤P-row
driver-side cumulative count/weight table (P = shuffle partitions, a
CLUSTER constant, never data-sized — the 1-row-cursor collect
convention) broadcasts back as each partition's offset.  Global rank =
local rank + offset; global prefix sum likewise.  Two users-relation
shuffles (range + pid), zero single-partition stages.

Requires ``order_by`` to be a total order (include a unique tiebreak
key) — same contract as any deterministic rank.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["with_global_order_stats"]


def with_global_order_stats(
    df: DataFrame,
    order_by: Sequence[Column | str],
    weight: Column | str | None = None,
    rank_col: str = "rank",
    prefix_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` (1-based global row_number under ``order_by``)
    and, when ``prefix_col`` is set, the INCLUSIVE global running sum of
    ``weight`` in that order.  ``order_by`` accepts plain names or
    sort-direction Columns (``F.desc("x")``).

    The input is localCheckpoint'd after the range shuffle so the two
    consumers (the bounded per-partition totals collect and the final
    ranked plan) share one materialization and one pid assignment.
    """
    spark = df.sparkSession
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wt = (
        F.lit(1).cast("long")
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight)
    )
    base = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_wt", wt)
        .localCheckpoint(eager=False)
    )
    # ≤ num_partitions rows: bounded by cluster config, not data size
    totals = (
        base.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_wt").alias("_w"))
        .collect()
    )
    offsets, cum_n, cum_w = [], 0, 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], cum_n, cum_w))
        cum_n += r["_n"]
        cum_w += r["_w"] or 0
    off = spark.createDataFrame(
        offsets or [(0, 0, 0)], "_pid int, _rank_off long, _w_off long"
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = base.join(F.broadcast(off), "_pid").withColumn(
        rank_col, F.row_number().over(w) + F.col("_rank_off")
    )
    if prefix_col is not None:
        out = out.withColumn(
            prefix_col,
            F.sum("_wt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            + F.col("_w_off"),
        )
    return out.drop("_pid", "_wt", "_rank_off", "_w_off")
