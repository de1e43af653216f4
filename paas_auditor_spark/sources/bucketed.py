"""Bucketed tables: co-located joins without a shuffle.

The reference's Postgres leans on B-tree indexes for its access paths
(create_cf_audit_events.sql:19-24).  The Spark-scale analog for *join*
access paths is bucketing: both sides hash-partitioned into the same
number of buckets on the join key at WRITE time, so every later join on
that key lines buckets up file-to-file and runs with **no Exchange at
all** — the single biggest shuffle eliminator for repeated fact-to-fact
joins (lineitem ⋈ orders at 100 TB moves terabytes through every shuffle
it avoids).

Rules of thumb encoded here:
- bucket count is chosen once per table family and shared by join
  partners (mismatched counts reintroduce a shuffle on one side);
- ``sortBy`` the bucket key so sort-merge joins can skip most of the
  per-task sort;
- bucketed tables must go through ``saveAsTable`` (the bucket metadata
  lives in the catalog, not in parquet footers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key.

    With matching bucket specs the physical plan contains no Exchange —
    asserted in tests/test_plans.py, because a silently degraded bucket
    spec (e.g. a writer dropping ``bucketBy``) re-adds a full shuffle of
    both sides without changing results.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


__all__ = ["bucketed_join", "write_bucketed"]
