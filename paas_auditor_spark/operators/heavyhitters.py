"""Misra-Gries heavy hitters: bounded-memory frequent-items summaries.

An exact ``groupBy(item).count()`` over a 100 TB token stream shuffles
the FULL vocabulary (web-scale corpora: billions of distinct tokens /
URLs / shingles).  The Misra-Gries summary caps executor memory at
``capacity`` entries per partition and ships only those to the merge —
shuffle volume is ``capacity × partitions`` rows regardless of input
size, with the classic guarantee:

- every item with true frequency > n/capacity survives, and
- each reported count is a lower bound short by at most n/capacity.

The per-partition summary is the batched MG variant: fold each Arrow
batch's ``value_counts`` into the running summary; on overflow subtract
the (capacity+1)-th largest count from everything and drop the
non-positive entries (the standard generalized-decrement step).  Merged
summaries add counts per item (sums of lower bounds stay lower bounds,
errors stay additive), so the merge is one small ``groupBy(item).sum``.

With ``capacity`` ≥ the true distinct count no decrement ever fires and
the result is EXACT — which is how the registered query is oracle-checked
while the operator's value is the bounded-memory path at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_counts(summary: dict, series: pd.Series, capacity: int) -> dict:
    """Fold one batch's value_counts into a running MG summary in place;
    on overflow apply the generalized decrement (subtract the
    (capacity+1)-th largest count, drop non-positive)."""
    for item, c in series.value_counts().items():
        summary[item] = summary.get(item, 0) + int(c)
    if len(summary) > capacity:
        cuts = sorted(summary.values(), reverse=True)
        thresh = cuts[capacity]
        for item in [i for i, c in summary.items() if c <= thresh]:
            del summary[item]
        for item in summary:
            summary[item] -= thresh
    return summary


def misra_gries_summary(
    df: DataFrame, item_col: str, capacity: int = 4096
) -> DataFrame:
    """Merged MG summary: (item, cnt_lb) with ≤ capacity rows surviving
    per input partition before the merge.  The ``item`` output column
    keeps the INPUT column's type (string terms, bigint ids/URLs, ...) —
    the Arrow schema is derived from ``df.schema``, not hardcoded."""
    item_type = df.schema[item_col].dataType.simpleString()

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            fold_counts(summary, pdf[item_col], capacity)
        yield pd.DataFrame(
            {"item": list(summary.keys()), "cnt_lb": list(summary.values())}
        )

    partials = df.select(F.col(item_col).alias(item_col)).mapInPandas(
        partial, schema=f"item {item_type}, cnt_lb long"
    )
    return partials.groupBy("item").agg(F.sum("cnt_lb").alias("cnt_lb"))


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 20, capacity: int = 4096
) -> DataFrame:
    """Top-k items by merged lower-bound count (deterministic tiebreak on
    the item)."""
    return (
        misra_gries_summary(df, item_col, capacity)
        .orderBy(F.col("cnt_lb").desc(), "item")
        .limit(k)
    )


def cms_table(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) in relational
    form: ``depth`` independent hash rows of ``width`` counters each,
    materialized as a (d, bucket, cnt) table of ≤ depth×width rows.

    The complement to Misra-Gries: MG answers "which items are
    frequent", CMS answers point frequency queries for ANY item with
    estimate ≥ truth and overestimate ≤ 2n/width with probability
    1 − 2^−depth.  The build is ONE pass: each input row explodes into
    its ``depth`` (d, bucket) cells (a narrow ×depth map, no re-scan per
    hash row) and one map-side-combined groupBy reduces to the
    ≤ depth×width counter table.  Buckets are md5-derived
    (engine-portable — the sketch CONTENT is deterministic, so two
    engines build bit-identical sketches and an exact oracle can check
    them); the result is mergeable across shards/days by summing
    counters, and the sketch itself broadcasts anywhere (depth×width
    rows, independent of vocabulary).

    NULL items are dropped, mirroring bloom_words' SQL set semantics:
    without the filter, the null-propagating concat yields a NULL
    bucket, accumulating (d, NULL) rows no probe can ever join.
    """
    return (
        df.where(F.col(item_col).isNotNull())
        .select(
            F.col(item_col).alias("_item"),
            F.explode(
                F.array(*[F.lit(d) for d in range(depth)])
            ).alias("d"),
        )
        .select("d", _cms_bucket(F.col("_item"), width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cms_bucket(item: "F.Column", width: int) -> "F.Column":
    """md5(item || '#' || d) → bucket; identical string input to the
    per-d literal form ('#0', '#1', …) so the oracle SQL matches."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(item, F.lit("#"), F.col("d").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_estimates(
    df: DataFrame,
    items_df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``items_df[item_col]`` from the CMS
    of ``df[item_col]``: estimate = min over the depth rows of the
    counter each hash maps the item to.  The probe side derives the same
    md5 buckets and joins the broadcast sketch — O(items × depth) work
    regardless of stream size.  NULL query items are excluded (their
    frequency in a NULL-dropping sketch is undefined, and reporting 0
    for them would be a silent lie)."""
    sketch = cms_table(df, item_col, depth, width)
    probe = items_df.where(F.col(item_col).isNotNull()).select(
        item_col,
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    ).select(
        item_col, "d", _cms_bucket(F.col(item_col), width).alias("bucket")
    )
    # LEFT join + coalesce(0): an item hashing to a bucket no stream
    # element touched has counter 0 — an inner join would drop it from
    # the output (or min() over only the non-empty counters would
    # overestimate past the CMS bound)
    return (
        probe.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("long")
            .alias("cms_estimate")
        )
    )


def cms_join_size(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """AMS-style equi-join cardinality estimate from two CMS sketches
    (Cormode & Muthukrishnan 2005 §4.2, "inner product queries"): for
    each depth row d, F_d = Σ_bucket cntL(d,b)·cntR(d,b); the estimate
    is min_d F_d.  Colliding keys only ADD positive cross terms, so the
    estimate is always ≥ the true join size, with overshoot ≤
    n_L·n_R/width per depth row w.h.p. — the optimizer's cardinality
    probe when even counting keys (operators/stats.py:join_size_stats,
    the exact form) is too expensive or the inputs only exist as
    PERSISTED per-shard sketches: cms_table relations are mergeable by
    summing counters, so this estimate runs over yesterday's saved
    sketches without touching raw data.  The product join itself
    touches ≤ depth×width rows regardless of input size.

    Returns one row: (est_join_rows bigint).  NULL keys are excluded by
    the sketch build, matching equi-join semantics.
    """
    right_col = left_col if right_col is None else right_col
    a = cms_table(left, left_col, depth, width)
    b = cms_table(right, right_col, depth, width)
    per_d = (
        a.alias("a")
        .join(b.alias("b"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("fd"))
    )
    return per_d.agg(F.min("fd").cast("long").alias("est_join_rows"))
