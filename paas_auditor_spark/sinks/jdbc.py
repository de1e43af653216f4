"""JDBC sink family: the reference's Postgres write path at Spark scale.

Reference parity targets (SURVEY.md §2.6):
- W1 idempotent batch insert — row-by-row ``INSERT … ON CONFLICT DO
  NOTHING`` keyed on guid, one transaction per fetched page
  (store.go:73-100, conflict clause :92).
- W2 keyed single-row cursor upsert — ``INSERT … ON CONFLICT DO UPDATE``
  (store.go:262-287).

Spark's built-in JDBC writer is append-only — ON CONFLICT is not
expressible through ``df.write.jdbc`` — so this module provides the two
scale-correct strategies:

1. **Stage-and-merge** (`idempotent_append_jdbc`): dedupe the batch on the
   key, left-anti join against the destination's key set (read back with
   the key range pushed down into the remote query so only the overlap
   window's keys travel), then a parallel partitioned append.
   Effectively-once under a single logical writer — which the reference
   also assumes (one collector process).
2. **Per-partition statement execution** (`execute_partitionwise`): the
   strict ON CONFLICT parity path.  Each executor partition opens one
   DB-API connection from an injectable factory, plays its rows through
   ``executemany`` in bounded batches, and commits once per partition —
   the Spark analog of the reference's transaction-per-page.  With an
   ON CONFLICT statement this is idempotent under retries of a partition
   task, which is exactly Spark's task-retry contract.

I/O is injectable throughout so the logic is testable without a live
Postgres; the statement path is exercised against DuckDB (DB-API
compatible, supports ON CONFLICT) in tests.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dbapi_factory(module_name: str, *args, **kwargs) -> Callable[[], object]:
    """Picklable DB-API connection factory.

    Native ``connect`` callables (psycopg2, duckdb) often can't be pickled
    into executor tasks; this closure carries only the module *name* and
    plain args, and resolves the driver on the executor at call time.
    """

    def _connect() -> object:
        import importlib

        return importlib.import_module(module_name).connect(*args, **kwargs)

    return _connect


@dataclass(frozen=True)
class JdbcTarget:
    """Connection descriptor for a JDBC destination table."""

    url: str
    table: str
    options: Mapping[str, str] = field(default_factory=dict)  # user/password/driver

    def apply(self, rw):
        rw = rw.option("url", self.url)
        for k, v in self.options.items():
            rw = rw.option(k, v)
        return rw


_SQL_IDENT = re.compile(
    r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*\Z"
)


def _ident(name: str) -> str:
    """Validate a config-sourced SQL identifier before interpolation —
    the dbtable subquery below is string-built, so reject anything that
    could escape it (quotes, spaces, comments)."""
    if not name or not _SQL_IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def read_keys_jdbc(
    spark: SparkSession,
    target: JdbcTarget,
    key_col: str,
    ts_col: str | None = None,
    ts_floor=None,
) -> DataFrame:
    """Key projection of the destination, with the overlap window pushed
    down into the remote query (a ``dbtable`` subquery, so the database —
    not Spark — filters; the wire carries keys only).

    Identifiers are validated (no quoting characters can pass) and the
    time floor is rendered through an explicit ISO formatter — config
    values cannot break out of the generated subquery.
    """
    predicate = ""
    if ts_col and ts_floor is not None:
        if hasattr(ts_floor, "isoformat"):
            floor_str = ts_floor.isoformat(sep=" ")
        else:
            floor_str = str(ts_floor)
            if "'" in floor_str or "\\" in floor_str:
                raise ValueError(f"invalid time floor literal: {floor_str!r}")
        predicate = f" WHERE {_ident(ts_col)} >= '{floor_str}'"
    subq = (
        f"(SELECT {_ident(key_col)} FROM {_ident(target.table)}{predicate})"
        " AS existing_keys"
    )
    return target.apply(spark.read.format("jdbc")).option("dbtable", subq).load()


def write_append_jdbc(
    df: DataFrame,
    target: JdbcTarget,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """Plain parallel append: one JDBC connection per partition, rows
    grouped into ``batchsize`` inserts.  ``num_partitions`` caps the
    connection count — at 1000 executors an uncapped append is a
    1000-connection stampede on the database."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    (
        target.apply(df.write.format("jdbc"))
        .option("dbtable", target.table)
        .option("batchsize", str(batch_size))
        .mode("append")
        .save()
    )


def idempotent_append_jdbc(
    batch_df: DataFrame,
    key_col: str,
    ts_col: str,
    read_existing: Callable[[], DataFrame],
    write: Callable[[DataFrame], None],
    broadcast_existing: bool = True,
) -> DataFrame:
    """W1 semantics on an append-only JDBC writer: stage-and-merge.

    In-batch ``dropDuplicates(key)`` + left-anti join against the
    destination keys (``read_existing`` should push the batch's time floor
    down — see ``read_keys_jdbc``) then append via ``write``.  Returns the
    fresh rows that were written (for observability).

    The existing-keys side is bounded by the overlap window (the reference
    re-reads at most 5 s of history — T2), so it stays broadcastable at any
    destination size; pass ``broadcast_existing=False`` if a huge backfill
    makes the window wide.
    """
    deduped = batch_df.dropDuplicates([key_col])
    existing = read_existing().select(key_col)
    if broadcast_existing:
        existing = F.broadcast(existing)
    fresh = deduped.join(existing, on=key_col, how="left_anti")
    # localCheckpoint: `write` consumes fresh and the caller may count it;
    # without it the anti-join would re-run per action
    fresh = fresh.localCheckpoint(eager=False)
    write(fresh)
    return fresh


def execute_partitionwise(
    df: DataFrame,
    statement: str,
    conn_factory: Callable[[], object],
    columns: list[str] | None = None,
    batch_size: int = 500,
    max_partitions: int | None = None,
) -> None:
    """Run a DML statement for every row, partition-wise, through DB-API.

    One connection + one transaction per partition (the reference commits
    one transaction per page — store.go:73-100); rows flow through
    ``executemany`` in ``batch_size`` groups.  With an idempotent statement
    (ON CONFLICT …) a retried task replays harmlessly — matching Spark's
    at-least-once task execution to effectively-once rows, exactly the
    reference's T3 semantics.

    ``conn_factory`` must be picklable (top-level function / partial): it
    runs inside executor workers.
    """
    if columns is None:
        columns = df.columns
    if max_partitions is not None:
        df = df.coalesce(max_partitions)
    projected = df.select(*columns)

    def run(rows) -> None:
        conn = conn_factory()
        try:
            cur = conn.cursor()
            buf: list[tuple] = []
            for row in rows:
                buf.append(tuple(row))
                if len(buf) >= batch_size:
                    cur.executemany(statement, buf)
                    buf = []
            if buf:
                cur.executemany(statement, buf)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    projected.foreachPartition(run)


def upsert_cursor_jdbc(
    spark: SparkSession,
    name: str,
    updated_at,
    shipped_id: str,
    statement: str,
    conn_factory: Callable[[], object],
) -> None:
    """W2: single-row keyed cursor upsert through the statement path.

    The cursor is one row — no partitioning question; the single-partition
    dataframe keeps the commit on an executor (same code path as bulk),
    with the ON CONFLICT DO UPDATE statement giving last-writer-wins
    atomicity on the database side (store.go:271-279).
    """
    row_df = spark.createDataFrame(
        [(name, updated_at, shipped_id)], ["name", "updated_at", "shipped_id"]
    ).coalesce(1)
    execute_partitionwise(row_df, statement, conn_factory)


__all__ = [
    "JdbcTarget",
    "dbapi_factory",
    "execute_partitionwise",
    "idempotent_append_jdbc",
    "read_keys_jdbc",
    "upsert_cursor_jdbc",
    "write_append_jdbc",
]
