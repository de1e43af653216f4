"""CSV event source with schema enforcement and malformed-row quarantine.

Flat-file interchange (S5 widened to CSV exports): audit events arrive as
CSV from spreadsheet exports, other stores' COPY output, or legacy ETL.
Spark's native CSV reader does the heavy lifting — schema projection,
type coercion, PERMISSIVE recovery — and the ``columnNameOfCorruptRecord``
channel preserves every unparseable line so the quarantine policy matches
the JSONL replay source and the P8 validity gate: a load that drops rows
must say which.

Scale shape: CSV splits by file/block like text; parsing is JVM-side
per partition (no Python).  Schema enforcement happens AT THE SCAN
(``mode=PERMISSIVE`` + typed StructType), so downstream operators never
see stringly-typed columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
        # populated only for rows the parser rejects
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_events_csv(
    spark: SparkSession,
    path: str,
    with_quarantine: bool = False,
    header: bool = True,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Typed CSV scan; optionally also return the quarantined raw lines.

    PERMISSIVE mode nulls the typed columns and fills ``_corrupt`` with
    the raw line when a row cannot be parsed to the schema — good rows
    flow on, rejects stay addressable."""
    raw = (
        spark.read.schema(EVENTS_CSV_SCHEMA)
        .option("header", header)
        # RFC 4180 doubled-quote escaping (Spark defaults to backslash)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    if not with_quarantine:
        return raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    # Spark refuses queries that reference ONLY the corrupt-record column
    # of a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    # documented workaround is materializing the parsed frame first.
    # localCheckpoint keeps it off the shared cache; quarantine reads are
    # bounded/operational, not the 100 TB hot path.
    raw = raw.localCheckpoint(eager=False)
    good = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = raw.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, bad


__all__ = ["EVENTS_CSV_SCHEMA", "read_events_csv"]
