"""``python -m paas_auditor_spark`` — run the service against a real
Cloud Foundry API + Splunk HEC, configured via the reference's env vars
(main_config.go:15-108: CF_API_ADDRESS, SPLUNK_HEC_ENDPOINT_URL,
SPLUNK_HEC_AUTH_TOKEN, *_SCHEDULE, FETCHER_PAGINATION_WAIT_TIME).

Network transports are urllib-based (stdlib only); every piece is the same
injectable used by the test fakes.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import urllib.request

from paas_auditor_spark.config import EngineConfig
from paas_auditor_spark.runner import Service
from paas_auditor_spark.session import get_spark


def _http_transport(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return json.load(resp)


def _splunk_sender(endpoint: str, token: str):
    def send(payload: str) -> None:
        req = urllib.request.Request(
            endpoint,
            data=payload.encode(),
            headers={"Authorization": f"Splunk {token}"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=2) as resp:  # noqa: S310
            if not 200 <= resp.status < 300:  # 2xx = success (shipper.go:214)
                raise RuntimeError(f"splunk status {resp.status}")

    return send


def main() -> int:
    cfg = EngineConfig()
    spark = get_spark(app_name="paas-auditor-spark")
    service = Service(
        spark,
        warehouse_dir=os.environ.get("ENGINE_WAREHOUSE", "./warehouse"),
        transport=_http_transport,
        sender=_splunk_sender(
            os.environ.get("SPLUNK_HEC_ENDPOINT_URL", ""),
            os.environ.get("SPLUNK_HEC_AUTH_TOKEN", ""),
        ),
        cfg=cfg,
        base_url=os.environ.get("CF_API_ADDRESS", "http://cc.internal"),
    )
    server = service.serve_metrics(int(os.environ.get("PORT", "8080")))
    for sig in (signal.SIGINT, signal.SIGTERM):  # T7 graceful shutdown
        signal.signal(sig, lambda *_: service.stop())
    threads = service.run_threaded()
    try:
        for t in threads:
            t.join()
    finally:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
