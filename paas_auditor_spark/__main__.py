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


def _bearer_transport(token: str):
    """Static-token transport (reference CF_TOKEN mode, client.go:343-344)."""

    def get(url: str) -> dict:
        req = urllib.request.Request(
            url, headers={"Authorization": f"bearer {token}"}
        )
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            return json.load(resp)

    return get


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


def resolve_transport(environ, base_url: str):
    """CF auth — the reference's go-cfclient mode switch (client.go:342-352):
    static CF_TOKEN first, then CF_CLIENT_ID client-credentials, then
    CF_USERNAME/CF_PASSWORD password grant (main_config.go:42-47); with no
    creds at all, unauthenticated (the test/synthetic path)."""
    client_id = environ.get("CF_CLIENT_ID", "")
    client_secret = environ.get("CF_CLIENT_SECRET", "")
    username = environ.get("CF_USERNAME", "")
    password = environ.get("CF_PASSWORD", "")
    if environ.get("CF_TOKEN"):
        return _bearer_transport(environ["CF_TOKEN"])
    if client_id and client_secret:
        from paas_auditor_spark.sources.paginated_http import (
            discover_token_url,
            uaa_transport,
        )

        return uaa_transport(
            environ.get("CF_TOKEN_URL") or discover_token_url(base_url),
            client_id,
            client_secret,
        )
    if username:
        from paas_auditor_spark.sources.paginated_http import (
            discover_token_url,
            uaa_transport,
        )

        # go-cfclient runs the password grant as the public "cf" client
        # with an empty secret (client.go:155-165)
        return uaa_transport(
            environ.get("CF_TOKEN_URL") or discover_token_url(base_url),
            "cf",
            "",
            username=username,
            password=password,
        )
    return _http_transport


def resolve_sender(environ):
    """Shipper creds gate (reference main.go:110-121): runs only with full
    Splunk creds.  ``SPLUNK_API_KEY`` is the reference's env name
    (main_config.go:61); ``SPLUNK_HEC_AUTH_TOKEN`` the engine's historical
    alias."""
    splunk_url = environ.get("SPLUNK_HEC_ENDPOINT_URL", "")
    splunk_key = environ.get("SPLUNK_API_KEY") or environ.get(
        "SPLUNK_HEC_AUTH_TOKEN", ""
    )
    if splunk_url and splunk_key:
        return _splunk_sender(splunk_url, splunk_key)
    return None


def main() -> int:
    cfg = EngineConfig()
    spark = get_spark(app_name="paas-auditor-spark")
    base_url = os.environ.get("CF_API_ADDRESS", "http://cc.example.invalid")
    transport = resolve_transport(os.environ, base_url)
    sender = resolve_sender(os.environ)

    # persistence backend: parquet warehouse by default; ENGINE_STORE=jdbc
    # selects the reference-shaped relational store over DATABASE_URL
    # (main_config.go:39; DB-API driver: psycopg2 for postgres:// URLs,
    # duckdb for file paths — both behind import-try)
    store = None
    if os.environ.get("ENGINE_STORE", "").lower() == "jdbc":
        from paas_auditor_spark.sinks.jdbc import dbapi_factory
        from paas_auditor_spark.stores import DbApiStore

        db_url = os.environ.get("DATABASE_URL", "postgres://localhost:5432/")
        if db_url.startswith(("postgres://", "postgresql://")):
            factory = dbapi_factory("psycopg2", db_url)
            store = DbApiStore(spark, factory, paramstyle="pyformat")
        else:
            # a DuckDB FILE is single-writer: the partition-wise insert
            # path must not open concurrent connections (store contract)
            factory = dbapi_factory("duckdb", db_url)
            store = DbApiStore(
                spark, factory, paramstyle="qmark", write_partitions=1
            )

    service = Service(
        spark,
        warehouse_dir=os.environ.get("ENGINE_WAREHOUSE", "./warehouse"),
        transport=transport,
        sender=sender,
        cfg=cfg,
        base_url=base_url,
        store=store,
    )
    # reference default listen port 9299 (main_config.go:63)
    server = service.serve_metrics(int(os.environ.get("PORT", "9299")))
    for sig in (signal.SIGINT, signal.SIGTERM):  # T7 graceful shutdown
        signal.signal(sig, lambda *_: service.stop())

    # ENGINE_MODE=streaming replaces the scheduled collector loop with the
    # fully native Structured Streaming pipeline (readStream cf_events →
    # store; streaming/pipeline.py::stream_api_to_store): offsets
    # checkpoint the watermark, the store's idempotence absorbs overlap
    # re-reads.  Shipper + informer loops run unchanged beside it.
    collector_query = None
    if os.environ.get("ENGINE_MODE", "").lower() == "streaming":
        from paas_auditor_spark.streaming.pipeline import stream_api_to_store

        # auth flows to the native source: UAA client-credentials (the
        # reader acquires + refreshes its own bearer token) or a static
        # CF_TOKEN — NOT the loop-mode transport, which is unused here.
        client_id = os.environ.get("CF_CLIENT_ID", "")
        client_secret = os.environ.get("CF_CLIENT_SECRET", "")
        source_auth: dict = {}
        if client_id and client_secret:
            from paas_auditor_spark.sources.paginated_http import (
                discover_token_url,
            )

            source_auth = {
                "client_id": client_id,
                "client_secret": client_secret,
                "token_url": os.environ.get("CF_TOKEN_URL")
                or discover_token_url(base_url),
            }
        elif os.environ.get("CF_TOKEN"):
            source_auth = {"token": os.environ["CF_TOKEN"]}

        collector_query = stream_api_to_store(
            spark,
            base_url,
            service.store,
            os.environ.get("ENGINE_CHECKPOINT", "./checkpoint/collector"),
            trigger_processing_time=os.environ.get(
                "COLLECTOR_TRIGGER", "120 seconds"
            ),
            metrics=service.metrics,
            extra_options=source_auth or None,
        )
        # streaming mode is the one that runs foreachBatch collectors, so
        # the maintenance loop rides along (no-op until a dataset is
        # registered via service.register_collector_dataset)
        threads = service.run_threaded(
            loops=("shipper", "informer", "maintenance")
        )
    else:
        threads = service.run_threaded()
    try:
        for t in threads:
            t.join()
    finally:
        if collector_query is not None:
            collector_query.stop()
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
