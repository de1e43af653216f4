"""Rate-limited paginated HTTP event source.

Re-expresses the reference fetcher (pkg/fetchers/cf_audit_event_fetcher.go:16-84):
GET /v2/events with ``q=timestamp>{watermark}`` (S2 source-side pushdown),
``results-per-page=100`` (S3), follow ``next_url`` until exhausted, sleep
between pages (rate limit), decode the envelope (S4) per page.

The transport is injectable (any ``url -> dict`` callable) so tests drive
the pager with canned pages exactly like the reference's httpmock suite
(cf_audit_event_fetcher_test.go:202-236); a requests-backed transport is
provided behind an import-try for real deployments.

Scale notes: pagination is inherently sequential (next_url chaining), so
the pager runs driver-side and hands page batches to Spark — the same
boundary the reference draws with its fetch goroutine + channel.  Spark
parallelism starts at normalization; with multiple source shards (one
cursor per org/space), run one pager per shard in parallel.
"""

from __future__ import annotations

import datetime as dt
import json
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from paas_auditor_spark.operators.ingest import normalize_envelope

Transport = Callable[[str], dict]

TIME_FORMAT = "%Y-%m-%dT%H:%M:%SZ"  # reference cf_audit_event_fetcher.go:26


def build_events_url(
    base_url: str, since: dt.datetime, page_size: int = 100
) -> str:
    """First-page URL with the watermark pushed down as a source predicate
    (reference cf_audit_event_fetcher.go:25-31)."""
    q = f"timestamp>{since.strftime(TIME_FORMAT)}"
    return f"{base_url}/v2/events?q={q}&results-per-page={page_size}"


def fetch_event_pages(
    transport: Transport,
    base_url: str,
    since: dt.datetime,
    page_size: int = 100,
    wait_s: float = 0.2,
    sleep: Callable[[float], None] = time.sleep,
) -> Iterator[dict]:
    """Yield decoded envelope pages, following next_url, pacing requests
    (reference cf_audit_event_fetcher.go:33-57)."""
    url: str | None = build_events_url(base_url, since, page_size)
    first = True
    while url:
        if not first:
            sleep(wait_s)
        first = False
        page = transport(url)
        yield page
        nxt = page.get("next_url")
        url = f"{base_url}{nxt}" if nxt else None


def pages_to_dataframe(spark: SparkSession, pages: list[dict]) -> DataFrame:
    """Page envelopes → flat event DataFrame via the JVM-side normalizer."""
    raw = spark.createDataFrame(
        [(json.dumps(p),) for p in pages], schema="payload string"
    )
    return normalize_envelope(raw)


def requests_transport(token: str | None = None, timeout_s: float = 30.0) -> Transport:
    """Real-HTTP transport, gated behind an import-try (requests may be
    absent; tests inject fakes)."""
    import requests  # noqa: PLC0415

    session = requests.Session()
    if token:
        session.headers["Authorization"] = f"bearer {token}"

    def get(url: str) -> dict:
        resp = session.get(url, timeout=timeout_s)
        if resp.status_code != 200:
            raise RuntimeError(f"non-200 from events API: {resp.status_code}")
        return resp.json()

    return get


__all__ = [
    "TIME_FORMAT",
    "Transport",
    "build_events_url",
    "fetch_event_pages",
    "pages_to_dataframe",
    "requests_transport",
]
