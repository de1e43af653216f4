"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's shipper CTE,
pkg/db/store.go:191-225) at sf0.001.  ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the north-star extras;
the driver compares each against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from paas_auditor_spark.queries import (
    oracle_queries,
    q_unshipped_events,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_unshipped_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each hash-checkable query."""
    return oracle_queries()
