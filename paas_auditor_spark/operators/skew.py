"""Skew-handling join: explicit key salting.

AQE's skew-join split (enabled in session.py) handles sort-merge skew at
runtime; this module is the *planned* alternative for the worst case the
optimizer can't fix — a broadcast-ineligible dimension joined on a key
where a handful of values dominate (the classic hot-key join at 100 TB).

Mechanics: the big (skewed) side sprays each row into one of ``n_salts``
sub-keys; the small side is replicated once per salt.  The join key becomes
(key, salt), so a hot key's rows land on ``n_salts`` reducers instead of
one.  Join results are identical to the unsalted join for inner/left joins
(every sprayed row still meets every matching small-side row exactly once,
via its own salt replica).
"""

from __future__ import annotations

import dataclasses
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big_df: DataFrame,
    small_df: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big_df`` (skewed on ``on``) with ``small_df``, salted.

    The spray is ``xxhash64(all big-side columns) mod n_salts`` —
    deterministic per row content (safe under task retry) and uniform.
    The replicated small side is ``n_salts ×`` its row count; keep it for
    genuinely small-but-not-broadcastable sides.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    big = big_df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big_df.columns]), F.lit(n_salts)),
    )
    salts = (
        big_df.sparkSession.range(n_salts)
        .select(F.col("id").cast("long").alias(SALT_COL))
    )
    small = small_df.crossJoin(salts)
    joined = big.join(small, on=[on, SALT_COL], how=how)
    return joined.drop(SALT_COL)


def skew_stats(df: DataFrame, on: str) -> dict:
    """The q_skew_audit diagnostic reduced to its decision inputs: total
    rows, distinct keys, heaviest key's count, and skew_factor
    (max / mean key count).  One map-side-combined count per key + a
    1-row reduction — at 100 TB this is the same single shuffle the join
    itself would pay, amortized as the pre-join audit pass.  The collect
    fetches exactly one 3-column row (bounded by construction)."""
    row = (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").alias("total"),
            F.count(F.lit(1)).alias("nkeys"),
            F.max("n").alias("mx"),
        )
        .collect()[0]
    )
    total = int(row["total"] or 0)
    nkeys = int(row["nkeys"] or 0)
    mx = int(row["mx"] or 0)
    mean = total / nkeys if nkeys else 0.0
    return {
        "total": total,
        "nkeys": nkeys,
        "max": mx,
        "skew_factor": (mx / mean) if mean else 0.0,
    }


@dataclasses.dataclass(frozen=True)
class SkewJoinPlan:
    """auto_skew_join's result: the joined DataFrame plus WHICH physical
    strategy the audit picked and the stats that picked it — the
    observability half of the audit→decision pair."""

    df: DataFrame
    strategy: str  # "broadcast" | "plain" | "salted"
    stats: dict


def auto_skew_join(
    big_df: DataFrame,
    small_df: DataFrame,
    on: str,
    how: str = "inner",
    skew_threshold: float = 4.0,
    broadcast_rows: int = 500_000,
    max_salts: int = 32,
) -> SkewJoinPlan:
    """Skew-aware join selection: wire the skew audit to the join the
    way a planner would, instead of leaving the diagnosis unread
    (q_skew_audit measures; this consumes).

    Decision ladder, cheapest first:
    1. small side fits a broadcast (row count ≤ ``broadcast_rows``) →
       broadcast-hash join: no shuffle of the big side at all, skew
       irrelevant (a hot key costs its scan partition only).
    2. big side's ``skew_factor`` (max/mean key count, from
       ``skew_stats``) ≤ ``skew_threshold`` → plain shuffle join; AQE's
       runtime skew splitting (enabled in session.py) absorbs mild
       imbalance without paying salting's small-side replication.
    3. otherwise → ``salted_join`` with n_salts ≈ ceil(skew_factor)
       capped at ``max_salts``: the hot key's reducer is split into
       roughly mean-sized slices, which is exactly the imbalance the
       factor measured.

    The audit costs one count per side (the small-side count is a
    metadata-cheap scan; the big-side key histogram is the join's own
    shuffle shape paid once up front).  Join RESULTS are identical
    across all three arms (inner/left, pinned by tests), so callers can
    treat this as a drop-in join."""
    if how not in ("inner", "left"):
        raise ValueError("auto_skew_join preserves semantics for inner/left only")
    n_small = small_df.count()
    if n_small <= broadcast_rows:
        return SkewJoinPlan(
            big_df.join(F.broadcast(small_df), on=on, how=how),
            "broadcast",
            {"n_small": n_small},
        )
    stats = skew_stats(big_df, on)
    stats["n_small"] = n_small
    if stats["skew_factor"] <= skew_threshold:
        return SkewJoinPlan(big_df.join(small_df, on=on, how=how), "plain", stats)
    n_salts = max(2, min(max_salts, math.ceil(stats["skew_factor"])))
    stats["n_salts"] = n_salts
    return SkewJoinPlan(
        salted_join(big_df, small_df, on=on, n_salts=n_salts, how=how),
        "salted",
        stats,
    )


__all__ = [
    "SALT_COL",
    "SkewJoinPlan",
    "auto_skew_join",
    "salted_join",
    "skew_stats",
]
