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


__all__ = ["SALT_COL", "salted_join"]
