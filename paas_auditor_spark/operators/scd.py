"""Slowly-changing-dimension (type 2) maintenance — versioned dimension
history as a pure DataFrame transform.

The reference keeps no dimension history (its store is an append-only
event log), but a warehouse built on this engine needs the standard SCD-2
pattern for the entities those events describe (orgs, spaces, apps):
every attribute change closes the current version row and opens a new
one, so any event can be joined to the attribute values that were true
AT ITS TIMESTAMP (the as-of join in `queries.py::q_asof_join` is the
read-side counterpart).

Shape: one full-outer-free pass — updates join the CURRENT slice on the
business key (broadcast when the update batch is small, the common case);
changed/new/unchanged/closed rows are derived from that single join and
unioned.  No window over the whole dimension, no per-key iteration; at
100 TB the dimension shuffles once on the business key.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# current-row sentinel: far-future but inside pandas' ns-timestamp range
# (max 2262-04-11), so Arrow/pandas interchange of dimension frames works
MAX_TS = "2200-01-01 00:00:00"
# the sentinel INSTANT, fixed in UTC: building the column from epoch
# seconds (timestamp_seconds) makes writes and the current-vs-history
# comparison independent of the session timezone — a string cast would
# move the sentinel with the session, so a dimension persisted under one
# tz and folded under another would classify every open row as history
_MAX_TS_EPOCH = int(
    dt.datetime.fromisoformat(MAX_TS)
    .replace(tzinfo=dt.timezone.utc)
    .timestamp()
)


def sentinel_ts():
    """The session-tz-independent current-row sentinel column."""
    return F.timestamp_seconds(F.lit(_MAX_TS_EPOCH))


_sentinel = sentinel_ts


def scd2_apply(
    dim_df: DataFrame,
    updates_df: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Fold one update batch into an SCD-2 dimension table.

    ``dim_df``: (key, attrs..., valid_from, valid_to) with the current
    version carrying ``valid_to = MAX_TS`` (closed-interval sentinel, so
    the column stays non-null and range predicates stay pushable).
    ``updates_df``: (key, attrs..., effective_ts) — at most one update
    per key per batch (enforce upstream with dropDuplicates).

    Returns the new dimension content:
    - history rows pass through untouched,
    - current rows whose attrs differ from their update are CLOSED at the
      update's effective time,
    - those updates (and brand-new keys) become the new current rows,
    - current rows without a differing update pass through.
    """
    upd = F.broadcast(
        updates_df.select(
            F.col(key_col).alias("_u_key"),
            F.col(effective_col).alias("_u_ts"),
            *[F.col(c).alias(f"_u_{c}") for c in attr_cols],
        )
    )
    history = dim_df.filter(F.col(valid_to) != _sentinel())
    current = dim_df.filter(F.col(valid_to) == _sentinel())

    joined = current.join(
        upd, current[key_col] == upd["_u_key"], "left"
    )
    changed = F.col("_u_key").isNotNull() & ~(
        F.struct(*[F.col(c) for c in attr_cols]).eqNullSafe(
            F.struct(*[F.col(f"_u_{c}") for c in attr_cols])
        )
    )
    dim_cols = [key_col, *attr_cols, valid_from, valid_to]

    untouched = joined.filter(~changed).select(*dim_cols)
    closed = joined.filter(changed).select(
        key_col,
        *attr_cols,
        valid_from,
        F.col("_u_ts").cast("timestamp").alias(valid_to),
    )
    reopened = joined.filter(changed).select(
        key_col,
        *[F.col(f"_u_{c}").alias(c) for c in attr_cols],
        F.col("_u_ts").cast("timestamp").alias(valid_from),
        _sentinel().alias(valid_to),
    )
    # NO broadcast hint on the dimension side: a left_anti can only
    # broadcast its right side, and that is the FULL current slice —
    # at dimension scale that is a driver OOM.  The planner reuses the
    # same business-key shuffle instead.
    fresh = (
        updates_df.join(
            current.select(F.col(key_col).alias("_c_key")),
            updates_df[key_col] == F.col("_c_key"),
            "left_anti",
        ).select(
            key_col,
            *attr_cols,
            F.col(effective_col).cast("timestamp").alias(valid_from),
            _sentinel().alias(valid_to),
        )
    )
    return history.select(*dim_cols).unionByName(untouched).unionByName(
        closed
    ).unionByName(reopened).unionByName(fresh)


__all__ = ["MAX_TS", "scd2_apply", "sentinel_ts"]
