"""Splunk HEC as a NATIVE Spark sink (Python DataSource API, Spark 4):

    df.write.format("splunk_hec").option("url", …).option("token", …).save()
    df.writeStream.format("splunk_hec")…start()

The reference ships events to Splunk HEC with a driver-side loop — one
POST per event, retry/backoff, ≤8192 events per 15 s tick
(cf_audit_events_to_splunk_shipper.go:52-225) ≈ 546 events/s ceiling.
This sink is the scale form of the same contract: executors POST
per-partition NDJSON batches concurrently, so throughput is
partitions × batch-rate instead of one serial loop, with the same
HEC envelope ({"event": …, "sourcetype": …, "source": …},
shipper.go:187-192) and the same retry envelope (3 retries, backoff
100 ms → 2 s ×2 + jitter, shipper.go:62-86).

Delivery is at-least-once, exactly like the reference: a failed task or
replayed micro-batch re-POSTs its rows (HEC consumers dedup on the
event's guid field downstream).  Ordering is preserved WITHIN a
partition; for the reference's global oldest-first ship order (O4),
feed this sink from ``repartitionByRange`` output or a
single-partition cursor batch — the streaming shipper pipeline
(streaming/ship.py) remains the strictly-ordered stop-on-failure path,
this sink is the parallel-throughput path.

Register per-session: ``spark.dataSource.register(SplunkHecDataSource)``.

Options: ``url`` (HEC collector endpoint), ``token`` (sent as
``Authorization: Splunk <token>``; accepts the reference's
``SPLUNK_API_KEY`` value), ``sourcetype`` (default ``cf-audit-event``),
``source`` (default ``spark``), ``batch_size`` (events per POST,
default 100), ``max_retries`` (default 3), ``retry_base_s`` (default
0.1 — set 0 in tests), ``timeout_s`` (default 2, shipper.go:62).
"""

from __future__ import annotations

import dataclasses
import json
import random
import time
import urllib.error
import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclasses.dataclass
class HecCommit(WriterCommitMessage):
    events: int = 0
    posts: int = 0


def _post_batch(url: str, token: str, payload: bytes, opts: dict) -> None:
    """POST one NDJSON batch with the reference's retry envelope."""
    max_retries = int(opts.get("max_retries", 3))
    base = float(opts.get("retry_base_s", 0.1))
    cap = 2.0
    timeout = float(opts.get("timeout_s", 2.0))
    delay = base
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            req = urllib.request.Request(
                url,
                data=payload,
                method="POST",
                headers={
                    "Authorization": f"Splunk {token}",
                    "Content-Type": "application/json",
                },
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
            return
        except urllib.error.HTTPError as exc:
            # 4xx is permanent (bad token 401/403, malformed batch 400):
            # fail fast with the status instead of burning the full
            # backoff budget per partition per batch; 429 and 5xx retry
            if exc.code < 500 and exc.code != 429:
                raise RuntimeError(
                    f"HEC POST rejected with HTTP {exc.code}: {exc.reason}"
                ) from exc
            last = exc
        except (urllib.error.URLError, OSError) as exc:
            last = exc
        if attempt == max_retries:
            break
        # backoff 100ms → 2s ×2 + jitter (shipper.go:62-86) for EVERY
        # retryable path — 429/5xx as well as connection errors, so
        # parallel partitions don't hammer a rate-limited collector;
        # base 0 (tests) sleeps not at all
        if delay:
            time.sleep(delay + random.uniform(0, delay * 0.5))
        delay = min(delay * 2, cap) if delay else 0.0
    raise RuntimeError(f"HEC POST failed after {max_retries} retries: {last}")


def _write_rows(rows, options: dict) -> HecCommit:
    url = options["url"]
    token = options.get("token", "")
    sourcetype = options.get("sourcetype", "cf-audit-event")
    source = options.get("source", "spark")
    batch_size = int(options.get("batch_size", 100))

    buf: list[str] = []
    events = posts = 0

    def flush() -> None:
        nonlocal posts
        if buf:
            _post_batch(url, token, "\n".join(buf).encode(), options)
            posts += 1
            buf.clear()

    for row in rows:
        envelope = {
            "event": row.asDict(recursive=True),
            "sourcetype": sourcetype,
            "source": source,
        }
        buf.append(json.dumps(envelope, default=str))
        events += 1
        if len(buf) >= batch_size:
            flush()
    flush()
    return HecCommit(events=events, posts=posts)


class HecBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.options = dict(options)

    def write(self, rows) -> HecCommit:
        return _write_rows(rows, self.options)


class HecStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.options = dict(options)

    def write(self, rows) -> HecCommit:
        return _write_rows(rows, self.options)

    def commit(self, messages, batch_id) -> None:
        # per-micro-batch bookkeeping only; delivery already happened in
        # write() (at-least-once — a replayed batch re-POSTs)
        return None

    def abort(self, messages, batch_id) -> None:
        return None


class SplunkHecDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "splunk_hec"

    def writer(self, schema, overwrite):
        return HecBatchWriter(self.options)

    def streamWriter(self, schema, overwrite):  # noqa: N802
        return HecStreamWriter(self.options)


__all__ = ["HecBatchWriter", "HecStreamWriter", "SplunkHecDataSource"]
