"""Service runner: the reference's process wiring (main.go:24-135) as a
composable object.

main.go wires: config → DB init → three independent loops (collector 2m,
shipper 15s, informer 15s) → HTTP server with /metrics + /health →
SIGINT/SIGTERM graceful shutdown → collector error exits the process,
shipper error logs and continues.  ``Service`` reproduces that contract on
the Spark engine:

- warehouse init (W5, sources.bootstrap.init_warehouse)
- collector tick: watermark fetch → validate → delta-append to the bronze
  parquet table (only fresh rows are written — never a rewrite of history)
- shipper tick: cursor query → ordered ship with retries → cursor table
  swap (atomic temp-dir rename, the parquet stand-in for W2's upsert)
- informer tick: metadata count + latest-timestamp gauges
- /metrics (Prometheus text) and /health endpoints on a ThreadingHTTPServer
- error policies per loop (T8): collector raises out of ``run_loops`` —
  the process-exit analog; shipper/informer log and continue
"""

from __future__ import annotations

import http.server
import os
import threading
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from paas_auditor_spark.config import EngineConfig
from paas_auditor_spark.operators.ingest import (
    ingest_watermark,
    validate_events,
)
from paas_auditor_spark.sources.bootstrap import (
    CURSORS_TABLE,
    EVENTS_TABLE,
    init_warehouse,
)
from paas_auditor_spark.sources.paginated_http import (
    Transport,
    fetch_event_pages,
    pages_to_dataframe,
)
from paas_auditor_spark.streaming.metrics import MetricsRegistry
from paas_auditor_spark.streaming.pipeline import informer_tick, scheduler_loop
from paas_auditor_spark.streaming.ship import Sender, ship_unshipped

SHIPPER_NAME = "cf-audit-events-to-splunk"


@dataclass
class TickCounts:
    collected: int = 0
    shipped: int = 0


class Service:
    """One engine process: warehouse + three ticks + metrics."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        transport: Transport,
        sender: Sender,
        cfg: EngineConfig | None = None,
        base_url: str = "http://cc.internal",
    ) -> None:
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.transport = transport
        self.sender = sender
        self.base_url = base_url
        self.metrics = MetricsRegistry()
        self.paths = init_warehouse(spark, warehouse_dir)  # W5
        self.totals = TickCounts()
        self._stop = threading.Event()

    # -- ticks ------------------------------------------------------------

    def _events(self):
        return self.spark.read.parquet(self.paths[EVENTS_TABLE])

    def collector_tick(self) -> int:
        """Fetch since watermark, validate, append ONLY the fresh delta."""
        target = self._events()
        watermark = ingest_watermark(
            target, ts_col="created_at", overlap_s=self.cfg.watermark_overlap_s
        )
        pages = list(
            fetch_event_pages(
                self.transport,
                self.base_url,
                watermark,
                self.cfg.page_size,
                self.cfg.pagination_wait_s,
            )
        )
        batch = pages_to_dataframe(self.spark, pages)
        valid, _quarantine = validate_events(batch, ts_col="created_at")
        # same dedup shape as idempotent_append (in-batch dropDuplicates +
        # watermark-bounded anti-join), but keeping only the fresh side so
        # the write is a delta append, never a history rewrite
        deduped = valid.dropDuplicates(["guid"])
        overlap_keys = (
            target.filter(F.col("created_at") >= F.lit(watermark))
            .select("guid")
            .distinct()
        )
        fresh = deduped.join(
            F.broadcast(overlap_keys), "guid", "left_anti"
        ).localCheckpoint(eager=False)  # count + write = two actions
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(self.paths[EVENTS_TABLE])
        self.metrics.inc(
            "cf_audit_event_collector_events_collected_total", float(n)
        )
        self.totals.collected += n
        return n

    def shipper_tick(self) -> int:
        cursors = self.spark.read.parquet(self.paths[CURSORS_TABLE])
        res = ship_unshipped(
            self._events(),
            cursors,
            SHIPPER_NAME,
            self.sender,
            deploy_env=self.cfg.deploy_env,
            batch_cap=self.cfg.ship_batch_cap,
            metrics=self.metrics,
        )
        if res.shipped:
            # W2 on parquet: write the upserted cursor table to a sibling
            # temp dir and atomically swap (same choreography as
            # sources.partitioned.compact_partition)
            path = self.paths[CURSORS_TABLE]
            tmp = path + "._upsert"
            res.cursors_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            old = path + "._old"
            os.rename(path, old)
            os.rename(tmp, path)
            import shutil

            shutil.rmtree(old)
        self.totals.shipped += res.shipped
        return res.shipped

    def informer_tick(self) -> None:
        informer_tick(
            self._events(), self.metrics, parquet_path=self.paths[EVENTS_TABLE]
        )

    # -- loops / service --------------------------------------------------

    def stop(self) -> None:  # T7
        self._stop.set()

    def run_loops(self, max_ticks: int | None = None) -> None:
        """Drive all three loops round-robin in tick order (deterministic
        single-threaded form — tests and batch backfills; a deployment
        runs each loop in its own thread at its own cadence with the same
        tick callables)."""
        ticks = 0
        while not self._stop.is_set():
            self.collector_tick()  # on_error=raise → propagate (fail fast)
            for tick in (self.shipper_tick, self.informer_tick):
                try:
                    tick()
                except Exception:  # noqa: BLE001 — shipper policy: continue
                    pass
            ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                break

    def run_threaded(self) -> list[threading.Thread]:
        """Reference deployment shape: three daemon loops on their own
        cadences (T1), stopped via ``stop()`` (T7)."""
        specs = [
            (self.collector_tick, self.cfg.collector_schedule_s, "raise"),
            (self.shipper_tick, self.cfg.shipper_schedule_s, "continue"),
            (self.informer_tick, self.cfg.informer_schedule_s, "continue"),
        ]
        threads = []
        for tick, interval, policy in specs:
            loop = scheduler_loop(
                tick, interval, self._stop.is_set, on_error=policy
            )
            t = threading.Thread(
                target=lambda lp=loop: [None for _ in lp], daemon=True
            )
            t.start()
            threads.append(t)
        return threads

    def serve_metrics(self, port: int = 0) -> http.server.ThreadingHTTPServer:
        """/metrics + /health endpoints (reference main.go:75-86).  Returns
        the bound server (``server.server_address[1]`` is the port; pass
        port=0 for an ephemeral one).  Caller shuts it down."""
        registry = self.metrics

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
                if self.path == "/health":
                    body = b"OK"
                elif self.path == "/metrics":
                    body = registry.render_text().encode()
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr
                pass

        server = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server


__all__ = ["SHIPPER_NAME", "Service", "TickCounts"]
