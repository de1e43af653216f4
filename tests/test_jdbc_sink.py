"""JDBC sink tests: W1/W2 semantics with injected I/O and a real DB-API
destination (DuckDB — supports ON CONFLICT like the reference's Postgres)."""

from __future__ import annotations

import duckdb

from paas_auditor_spark.sinks import jdbc


def test_idempotent_append_jdbc_stage_and_merge(spark, tmp_path):
    target_dir = str(tmp_path / "dest")
    batch1 = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-02", "b"), (2, "2024-01-02", "b")],
        ["guid", "created_at", "payload"],
    )

    def read_existing():
        try:
            return spark.read.parquet(target_dir)
        except Exception:
            return spark.createDataFrame([], batch1.schema)

    def write(df):
        df.write.mode("append").parquet(target_dir)

    fresh1 = jdbc.idempotent_append_jdbc(
        batch1, "guid", "created_at", read_existing, write
    )
    assert fresh1.count() == 2  # in-batch dup collapsed

    # overlap re-read: one old guid, one new — only the new row lands
    batch2 = spark.createDataFrame(
        [(2, "2024-01-02", "b"), (3, "2024-01-03", "c")],
        ["guid", "created_at", "payload"],
    )
    fresh2 = jdbc.idempotent_append_jdbc(
        batch2, "guid", "created_at", read_existing, write
    )
    assert [r["guid"] for r in fresh2.collect()] == [3]
    final = spark.read.parquet(target_dir)
    assert sorted(r["guid"] for r in final.collect()) == [1, 2, 3]


def test_execute_partitionwise_on_conflict_duckdb(spark, tmp_path):
    db = str(tmp_path / "dest.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE events (guid BIGINT PRIMARY KEY, payload VARCHAR)"
    )
    con.close()

    rows = [(i, f"p{i}") for i in range(50)] + [(7, "dup"), (9, "dup")]
    df = spark.createDataFrame(rows, ["guid", "payload"]).coalesce(1)
    stmt = "INSERT INTO events VALUES (?, ?) ON CONFLICT DO NOTHING"
    factory = jdbc.dbapi_factory("duckdb", db)
    jdbc.execute_partitionwise(df, stmt, factory, batch_size=8, max_partitions=1)
    # replay the whole batch (task-retry / overlap re-read analog)
    jdbc.execute_partitionwise(df, stmt, factory, batch_size=8, max_partitions=1)

    con = duckdb.connect(db)
    n, = con.execute("SELECT count(*) FROM events").fetchone()
    first7, = con.execute("SELECT payload FROM events WHERE guid = 7").fetchone()
    con.close()
    assert n == 50  # ON CONFLICT swallowed in-batch dups and the full replay
    assert first7 == "p7"  # first insert wins, conflicting rows ignored


def test_upsert_cursor_jdbc_last_writer_wins(spark, tmp_path):
    db = str(tmp_path / "cursors.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE shipper_cursors ("
        " name VARCHAR PRIMARY KEY, updated_at VARCHAR, shipped_id VARCHAR)"
    )
    con.close()
    stmt = (
        "INSERT INTO shipper_cursors VALUES (?, ?, ?) "
        "ON CONFLICT (name) DO UPDATE SET "
        "updated_at = excluded.updated_at, shipped_id = excluded.shipped_id"
    )
    factory = jdbc.dbapi_factory("duckdb", db)
    jdbc.upsert_cursor_jdbc(spark, "splunk", "2024-01-01T00:00:00Z", "g1", stmt, factory)
    jdbc.upsert_cursor_jdbc(spark, "splunk", "2024-01-02T00:00:00Z", "g2", stmt, factory)

    con = duckdb.connect(db)
    got = con.execute("SELECT * FROM shipper_cursors").fetchall()
    con.close()
    assert got == [("splunk", "2024-01-02T00:00:00Z", "g2")]
