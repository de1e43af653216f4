"""Structured Streaming ingest: micro-batch file source → dedup → bronze
(T1/T3/T5/T7 semantics through the real streaming engine)."""

from __future__ import annotations

import datetime as dt
import uuid

from paas_auditor_spark.schemas import CF_AUDIT_EVENT
from paas_auditor_spark.streaming.pipeline import stream_to_bronze

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _rows(ids):
    return [
        (
            str(uuid.UUID(int=i)),
            BASE + dt.timedelta(seconds=i),
            "audit.app.create",
            f"actor-{i}", "user", f"an-{i}", f"u-{i}",
            f"actee-{i}", "app", f"aen-{i}",
            None, None, "{}",
        )
        for i in ids
    ]


def test_stream_to_bronze_dedups_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    # two source files with overlapping guids; maxFilesPerTrigger=1 forces
    # two separate micro-batches, so the dedup must work across batches
    spark.createDataFrame(_rows([0, 1, 2]), schema=CF_AUDIT_EVENT).coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(_rows([2, 3, 4]), schema=CF_AUDIT_EVENT).coalesce(
        1
    ).write.mode("append").parquet(src)

    q = stream_to_bronze(
        spark, src, bronze, ckpt, CF_AUDIT_EVENT, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # graceful shutdown (T7)

    out = spark.read.parquet(bronze)
    assert out.count() == 5
    assert out.select("guid").distinct().count() == 5
