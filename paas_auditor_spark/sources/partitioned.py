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
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "event_date"


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "created_at",
    mode: str = "append",
    ingest_batch_id: int | None = None,
) -> None:
    """Append rows under ``path/event_date=YYYY-MM-DD/`` directories.

    ``ingest_batch_id`` persists the ingest ordering key (the reference's
    ``id SERIAL`` analog, SURVEY §1.2): sorting by
    (ingest_batch_id, ts_col, key) reproduces insertion order exactly as
    store.go:142-143 sorts on ``id``.
    """
    if ingest_batch_id is not None:
        from paas_auditor_spark.operators.sequence import stamp_ingest_batch

        df = stamp_ingest_batch(df, ingest_batch_id)
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


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_value: str,
    target_files: int = 1,
) -> int:
    """Rewrite one date partition into ``target_files`` files (small-file
    compaction).  Streaming ingest appends a file per micro-batch, so a
    partition accumulates thousands of KB-sized files whose per-file open
    cost eventually dominates scans; compaction is the standing maintenance
    job that keeps file count O(partition_size / target_file_size).

    Only *closed* partitions (older than the ingest watermark) should be
    compacted — the rewrite is read-then-overwrite and must not race the
    appender.  The swap goes through a sibling temp directory and an atomic
    rename, so a concurrent reader sees either the old or the new file set,
    never a partial one.  (Table formats with a transaction log — Delta,
    Iceberg — replace this file choreography with OPTIMIZE/rewrite_data_files;
    call sites keep the same shape.)

    Returns the number of rows in the compacted partition.
    """
    return _rewrite_partition(
        spark,
        path,
        partition_value,
        lambda df: df.coalesce(target_files),
        "._compacting",
    )


def _rewrite_partition(
    spark: SparkSession,
    path: str,
    partition_value: str,
    transform,
    tmp_suffix: str,
) -> int:
    """Shared read → transform → write-temp → double-rename → cleanup
    choreography for partition-scoped rewrites (compaction, targeted
    deletion).  A concurrent reader sees the old or the new file set,
    never a partial one; any future change to the swap (rename window,
    temp-dir naming vs partition discovery) lands in ONE place.

    Returns the row count of the rewritten partition.
    """
    import os
    import shutil

    part_dir = os.path.join(path, f"{PARTITION_COL}={partition_value}")
    tmp_dir = part_dir + tmp_suffix
    df = transform(spark.read.parquet(part_dir))
    df.write.mode("overwrite").parquet(tmp_dir)
    n = spark.read.parquet(tmp_dir).count()
    old_dir = part_dir + "._old"
    os.rename(part_dir, old_dir)
    os.rename(tmp_dir, part_dir)
    shutil.rmtree(old_dir)
    return n


def delete_keys_from_partition(
    spark: SparkSession,
    path: str,
    partition_value: str,
    key_col: str,
    keys: Sequence[str],
) -> int:
    """Targeted deletion (right-to-erasure / bad-record purge): rewrite
    ONE date partition without the rows whose ``key_col`` is in ``keys``.

    The 100 TB shape of "DELETE FROM events WHERE guid IN (...)": the
    date partition bounds the rewrite to the files that can contain the
    keys — the other 99.99% of the lake is untouched (verified by the
    test on file contents).  The key list is a deletion manifest
    (typically ≤ thousands of keys) and rides along as an IN-list /
    broadcast; the rewrite reuses ``compact_partition``'s
    temp-dir + atomic-rename choreography so concurrent readers see the
    old or the new file set, never a partial one.  Table formats with a
    log (Delta/Iceberg) replace the choreography with a DELETE
    transaction; call sites keep the shape.

    Returns the number of rows deleted.
    """
    import os

    part_dir = os.path.join(path, f"{PARTITION_COL}={partition_value}")
    before = spark.read.parquet(part_dir).count()
    # NOT IN is three-valued: a NULL key makes `~isin(...)` NULL, which
    # filter() drops — silently purging every null-key row.  Keep them
    # explicitly: only listed keys are deleted.
    after = _rewrite_partition(
        spark,
        path,
        partition_value,
        lambda df: df.filter(
            ~F.col(key_col).isin(list(keys)) | F.col(key_col).isNull()
        ),
        "._deleting",
    )
    return before - after


def export_ordered(
    df: DataFrame,
    path: str,
    order_col: str,
    num_partitions: int = 8,
) -> None:
    """O1's global sort, scale-correct: ``repartitionByRange`` samples the
    key distribution and assigns contiguous, disjoint key ranges to
    partitions; ``sortWithinPartitions`` orders inside each.  The result is
    a totally ordered export across numbered part-files — WITHOUT the
    single-partition merge a plain ``orderBy`` write would funnel through
    (a global Sort exchange still ends in one ordered stream per partition,
    but downstream consumers of one big sorted file don't parallelize).
    File k's rows all precede file k+1's; each file is internally sorted.
    """
    (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Multi-column clustered layout (Z-order-lite): range-partition on
    the leading cluster key, then sort every file by the full key tuple.

    Parquet stores per-row-group min/max statistics; a scan with a
    predicate on the cluster columns skips row groups whose stat range
    misses the predicate.  On randomly laid-out data every row group
    spans nearly the full value domain and nothing skips — clustering is
    what makes the footer statistics selective.  This is the table-format
    OPTIMIZE ZORDER analog expressed with plain Spark primitives; at
    100 TB it is the difference between touching one file and all of
    them for a point-range query on the cluster key.
    """
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def row_group_stats(path: str, column: str) -> list[tuple]:
    """Per-row-group (min, max) of ``column`` across all files — metadata
    only, no data read.  The observability half of ``write_clustered``:
    tight, near-disjoint ranges mean the layout supports skipping."""
    import os

    import pyarrow.parquet as pq

    out: list[tuple] = []
    for root, _dirs, files in os.walk(path):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fname)).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics:
                        out.append(
                            (col.statistics.min, col.statistics.max)
                        )
    return out


def list_partitions(path: str) -> list[str]:
    """Partition values present under ``path`` (directory listing, no scan)."""
    import os

    if not os.path.isdir(path):
        return []
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        # skip in-flight compaction temp/backup dirs (suffixed `._...`)
        if d.startswith(f"{PARTITION_COL}=") and "._" not in d
    )


__all__ = [
    "PARTITION_COL",
    "compact_partition",
    "delete_keys_from_partition",
    "export_ordered",
    "list_partitions",
    "read_since",
    "row_group_stats",
    "write_clustered",
    "write_partitioned",
]
