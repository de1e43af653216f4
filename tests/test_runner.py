"""Service-runner end-to-end: the reference main.go contract — warehouse
init, collect→ship→inform ticks, cursor persistence, /metrics + /health."""

from __future__ import annotations

import datetime as dt
import json
import urllib.request
import uuid

from paas_auditor_spark.runner import SHIPPER_NAME, Service
from paas_auditor_spark.config import EngineConfig
from paas_auditor_spark.sources.bootstrap import CURSORS_TABLE

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _resource(i: int) -> dict:
    return {
        "metadata": {
            "guid": str(uuid.UUID(int=i)),
            "url": f"/v2/events/{i}",
            "created_at": (BASE + dt.timedelta(seconds=i)).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            ),
            "updated_at": None,
        },
        "entity": {
            "type": "audit.app.create",
            "actor": f"actor-{i}",
            "actor_type": "user",
            "actor_name": f"an-{i}",
            "actor_username": f"u-{i}",
            "actee": f"actee-{i}",
            "actee_type": "app",
            "actee_name": f"aen-{i}",
            "timestamp": (BASE + dt.timedelta(seconds=i)).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            ),
            "metadata": {"request": f"r{i}"},
            "organization_guid": "",
            "space_guid": "",
        },
    }


class PageServer:
    """Canned single-page transport; re-pointable between ticks."""

    def __init__(self, ids):
        self.ids = list(ids)

    def __call__(self, url: str) -> dict:
        return {
            "total_results": len(self.ids),
            "total_pages": 1,
            "next_url": None,
            "resources": [_resource(i) for i in self.ids],
        }


def test_service_end_to_end(spark, tmp_path):
    transport = PageServer([0, 1, 2])
    sent: list[str] = []
    cfg = EngineConfig()
    cfg.pagination_wait_s = 0.0
    svc = Service(
        spark,
        warehouse_dir=str(tmp_path / "wh"),
        transport=transport,
        sender=sent.append,
        cfg=cfg,
    )

    # tick 1: 3 events collected, all shipped, cursor persisted
    svc.run_loops(max_ticks=1)
    assert svc.totals.collected == 3
    assert svc.totals.shipped == 3
    cursors = spark.read.parquet(svc.paths[CURSORS_TABLE]).collect()
    assert len(cursors) == 1 and cursors[0]["name"] == SHIPPER_NAME
    assert cursors[0]["shipped_id"] == str(uuid.UUID(int=2))

    # tick 2: overlap re-fetch (0..2 again) + 2 new events → only the new
    # ones land and ship; shipped payloads stay unique
    transport.ids = [1, 2, 3, 4]
    svc.run_loops(max_ticks=1)
    assert svc.totals.collected == 5
    assert svc.totals.shipped == 5
    events = spark.read.parquet(svc.paths["cf_audit_events"])
    assert events.count() == 5
    assert events.select("guid").distinct().count() == 5
    guids = [json.loads(p)["event"]["guid"] for p in sent]
    assert len(guids) == len(set(guids)) == 5

    # metrics + health endpoints (main.go:75-86)
    server = svc.serve_metrics(port=0)
    try:
        port = server.server_address[1]
        health = urllib.request.urlopen(f"http://127.0.0.1:{port}/health")
        assert health.read() == b"OK"
        metrics = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics"
        ).read().decode()
        assert "cf_audit_event_collector_events_collected_total 5" in metrics
        assert "informer_cf_audit_events_total 5" in metrics
    finally:
        server.shutdown()


def test_service_shipper_failure_keeps_collector_alive(spark, tmp_path):
    """T8: a failing sink must not stop collection; the cursor stays put
    and the next healthy tick re-ships (at-least-once)."""
    transport = PageServer([0, 1])
    calls = {"n": 0}

    def flaky(payload: str) -> None:
        calls["n"] += 1
        raise RuntimeError("sink down")

    cfg = EngineConfig()
    cfg.pagination_wait_s = 0.0
    svc = Service(
        spark,
        warehouse_dir=str(tmp_path / "wh2"),
        transport=transport,
        sender=flaky,
        cfg=cfg,
    )
    svc.run_loops(max_ticks=1)
    assert svc.totals.collected == 2
    assert svc.totals.shipped == 0  # sink down, nothing committed

    sent: list[str] = []
    svc.sender = sent.append
    svc.run_loops(max_ticks=1)
    assert svc.totals.shipped == 2  # re-shipped after recovery
