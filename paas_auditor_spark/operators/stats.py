"""Dataset statistics operators (the reference's informer surface).

- A1 latest event time with epoch default (reference store.go:289-308)
- A2 approximate row count from catalog statistics (store.go:310-329 —
  ``pg_class.reltuples``): re-expressed as a parquet-footer metadata count,
  which reads zero data pages (the honest Spark analog of a stats lookup).
- A3 exact count + max (RUNBOOK.md:59 ops query).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paas_auditor_spark.operators.cursor import EPOCH_TS


def latest_event_time(
    df: DataFrame, ts_col: str = "created_at"
) -> dt.datetime:
    """MAX(event time), epoch when the table is empty (A1).  Collected
    as a JVM-rendered wall-clock string (functions/timecross.py) so the
    result is process-tz-independent."""
    from paas_auditor_spark.functions.timecross import parse_wall, ts_string

    row = df.agg(ts_string(F.max(ts_col)).alias("mx")).first()
    mx = parse_wall(row["mx"])
    return mx if mx is not None else EPOCH_TS


def approx_count(parquet_path: str) -> int:
    """Metadata-only row count from parquet footers (A2).

    Like ``pg_class.reltuples`` this touches statistics, not data:
    pyarrow sums ``num_rows`` from file footers without reading pages.
    """
    import pyarrow.dataset as ds

    dataset = ds.dataset(parquet_path, format="parquet")
    return sum(f.metadata.num_rows for f in dataset.get_fragments())


def count_and_max(df: DataFrame, ts_col: str = "created_at") -> DataFrame:
    """SELECT COUNT(*), MAX(created_at) — the documented ops query (A3)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_events"), F.max(ts_col).alias("max_ts")
    )


__all__ = ["approx_count", "count_and_max", "latest_event_time"]
