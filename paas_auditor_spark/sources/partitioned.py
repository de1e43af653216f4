"""Date-partitioned bronze layout — the 100 TB storage design.

The reference's secondary indexes (create_cf_audit_events.sql:19-24) name
the access paths: time-range scans and per-org/space/type filters.  Spark
has no indexes; the equivalent layout decision is **partition by event
date**, so the cursor range filter (P6) and the ingest-dedup overlap scan
(W1/T3) become partition pruning instead of full scans.  At 100 TB the
events table is thousands of date partitions and every incremental
operation touches only the watermark's trailing edge.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "event_date"


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "created_at",
    mode: str = "append",
) -> None:
    """Append rows under ``path/event_date=YYYY-MM-DD/`` directories."""
    df.withColumn(PARTITION_COL, F.to_date(F.col(ts_col))).write.partitionBy(
        PARTITION_COL
    ).mode(mode).parquet(path)


def read_since(
    spark: SparkSession,
    path: str,
    since: dt.datetime,
    ts_col: str = "created_at",
) -> DataFrame:
    """Cursor-window read: the ``event_date`` predicate prunes partitions
    (visible as PartitionFilters in the scan), the ``ts_col`` predicate is
    pushed into the remaining files' row groups."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col(PARTITION_COL) >= F.lit(since.date()))
        & (F.col(ts_col) >= F.lit(since))
    ).drop(PARTITION_COL)


__all__ = ["PARTITION_COL", "read_since", "write_partitioned"]
