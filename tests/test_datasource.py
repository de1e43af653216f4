"""Native cf_events Spark DataSource (Python DataSource API): partitioned
page fetch on executors, created_at predicate pushed into the API query,
auth header, envelope flattening parity."""

from __future__ import annotations

import datetime as dt
import http.server
import json
import threading
import urllib.parse
import uuid

import pytest

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _resource(i: int, sec: float | None = None) -> dict:
    guid = str(uuid.UUID(int=i))
    created = (
        BASE + dt.timedelta(seconds=i if sec is None else sec)
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    return {
        "metadata": {"guid": guid, "url": f"/v2/events/{guid}",
                     "created_at": created},
        "entity": {
            "type": "audit.app.create",
            "actor": f"actor-{i}", "actor_type": "user",
            "actor_name": f"an-{i}", "actor_username": f"u-{i}",
            "actee": f"ae-{i}", "actee_type": "app",
            "actee_name": f"aen-{i}",
            "organization_guid": "" if i % 2 == 0 else f"org-{i}",
            "space_guid": f"sp-{i}",
            "metadata": {"request": f"r{i}"},
        },
    }


class PagedEventsServer:
    """Serves /v2/events with page= pagination; records every query."""

    def __init__(self, n_events: int, page_size_cap: int = 10) -> None:
        self.n_events = n_events
        self.cap = page_size_cap
        self.queries: list[dict] = []
        self.fail_next = 0  # serve this many failures before recovering
        self.fail_code = 500  # status for those failures
        self.extra: list[tuple] = []  # (guid_int, sec_offset) late arrivals
        self.include_invalid = False  # add one resource w/o created_at
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if outer.fail_next > 0:
                    outer.fail_next -= 1
                    self.send_response(outer.fail_code)
                    self.end_headers()
                    return
                parsed = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(parsed.query)
                outer.queries.append(
                    {**{k: v[0] for k, v in qs.items()},
                     "auth": self.headers.get("Authorization")}
                )
                page = int(qs.get("page", ["1"])[0])
                per = min(int(qs.get("results-per-page", ["10"])[0]), outer.cap)
                # honor the pushed-down time predicate like the CF API
                pairs = [(i, float(i)) for i in range(outer.n_events)]
                pairs += [(i, float(s_)) for i, s_ in outer.extra]
                if "q" in qs and qs["q"][0].startswith("timestamp>"):
                    floor = dt.datetime.strptime(
                        qs["q"][0].removeprefix("timestamp>"),
                        "%Y-%m-%dT%H:%M:%SZ",
                    )
                    pairs = [
                        p for p in pairs
                        if BASE + dt.timedelta(seconds=p[1]) > floor
                    ]
                total_pages = max(1, -(-len(pairs) // per))
                chunk = pairs[(page - 1) * per : page * per]
                resources = [_resource(i, s_) for i, s_ in chunk]
                if outer.include_invalid and page == 1:
                    resources.append(
                        {"metadata": {"guid": "no-ts"}, "entity": {}}
                    )
                body = json.dumps(
                    {
                        "total_results": len(pairs),
                        "total_pages": total_pages,
                        "next_url": None,
                        "resources": resources,
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # noqa: N802
                pass

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def close(self) -> None:
        self.httpd.shutdown()


@pytest.fixture()
def registered(spark):
    from paas_auditor_spark.sources.datasource import CfEventsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CfEventsDataSource)
    yield spark
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_datasource_partitioned_fetch_and_flatten(registered):
    spark = registered
    server = PagedEventsServer(n_events=25, page_size_cap=10)
    try:
        df = (
            spark.read.format("cf_events")
            .option("base_url", server.url)
            .option("page_size", 10)
            .option("pages_per_partition", 1)
            .option("token", "tok-123")
            .load()
        )
        rows = {r["guid"]: r for r in df.collect()}
    finally:
        server.close()
    assert len(rows) == 25
    r0 = rows[str(uuid.UUID(int=0))]
    assert r0["created_at"] == BASE
    assert r0["organization_guid"] is None  # '' -> NULL (P3)
    assert r0["space_guid"] == "sp-0"
    assert json.loads(r0["metadata"]) == {"request": "r0"}
    # bearer token on every request; 3 pages -> 3 single-page partitions,
    # and the planning probe's page-1 payload rides into partition 1 so
    # page 1 is requested exactly ONCE
    assert all(q["auth"] == "Bearer tok-123" for q in server.queries)
    pages_seen = sorted(int(q.get("page", "1")) for q in server.queries)
    assert pages_seen == [1, 2, 3]


def test_datasource_pushes_time_predicate_to_api(registered):
    spark = registered
    server = PagedEventsServer(n_events=30, page_size_cap=10)
    try:
        df = (
            spark.read.format("cf_events")
            .option("base_url", server.url)
            .option("page_size", 10)
            .load()
            .filter(F.col("created_at") > F.lit(BASE + dt.timedelta(seconds=19)))
        )
        got = sorted(r["guid"] for r in df.collect())
    finally:
        server.close()
    # S2: the API saw q=timestamp>… on every fetch, so only the watermark
    # window was transferred — and Spark re-verified the boundary.
    assert all(
        q.get("q", "").startswith("timestamp>") for q in server.queries
    )
    assert got == sorted(str(uuid.UUID(int=i)) for i in range(20, 30))


def test_datasource_streaming_watermark_offsets(registered, tmp_path):
    """spark.readStream.format("cf_events"): micro-batches advance the
    watermark offset (max_seen − 5 s overlap), new server-side events
    arrive in the next trigger, and the overlap re-read duplicates are
    bounded to the window (at-least-once by design, T2/T3)."""
    spark = registered
    server = PagedEventsServer(n_events=8, page_size_cap=10)
    try:
        q = (
            spark.readStream.format("cf_events")
            .option("base_url", server.url)
            .option("page_size", 10)
            .load()
            .writeStream.format("memory")
            .queryName("cf_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            first = spark.sql("SELECT guid FROM cf_stream").count()
            assert first == 8
            server.n_events = 12  # new events appear at the API
            q.processAllAvailable()
            out = spark.sql("SELECT guid FROM cf_stream")
            total, distinct = out.count(), out.distinct().count()
        finally:
            q.stop()
    finally:
        server.close()
    assert distinct == 12
    # overlap re-read duplicates stay bounded to the 5s window
    assert total >= 12 and total <= 12 + 6


def test_datasource_retries_transient_errors(registered):
    """5xx responses retry with backoff (W3 envelope); the read succeeds
    once the server recovers."""
    spark = registered
    server = PagedEventsServer(n_events=5, page_size_cap=10)
    server.fail_next = 2  # first two requests 500
    try:
        df = (
            spark.read.format("cf_events")
            .option("base_url", server.url)
            .option("page_size", 10)
            .option("retry_backoff_s", 0.01)
            .load()
        )
        assert df.count() == 5
    finally:
        server.close()


def test_native_api_to_store_pipeline(registered, tmp_path):
    """North-star fully native: readStream cf_events (watermark offsets)
    → dedup → DuckDB store via ON CONFLICT. New API events land exactly
    once in the database across triggers despite the overlap re-read."""
    import duckdb

    from paas_auditor_spark.sinks.jdbc import dbapi_factory
    from paas_auditor_spark.stores import DbApiStore
    from paas_auditor_spark.streaming.metrics import MetricsRegistry
    from paas_auditor_spark.streaming.pipeline import stream_api_to_store

    spark = registered
    server = PagedEventsServer(n_events=6, page_size_cap=10)
    db = str(tmp_path / "native.duckdb")
    store = DbApiStore(spark, dbapi_factory("duckdb", db), write_partitions=1)
    metrics = MetricsRegistry()
    try:
        q = stream_api_to_store(
            spark, server.url, store, str(tmp_path / "ckpt"),
            page_size=10, metrics=metrics,
        )
        try:
            q.processAllAvailable()
            server.n_events = 9
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        server.close()
    con = duckdb.connect(db)
    n, nd = con.execute(
        "SELECT count(*), count(DISTINCT guid) FROM cf_audit_events"
    ).fetchone()
    con.close()
    # the DB absorbed the overlap re-read: exactly one row per event
    assert (n, nd) == (9, 9)
    assert metrics.get("cf_audit_event_collector_events_collected_total") == 9


def test_datasource_gte_pushdown_keeps_boundary_row(registered):
    """A >= filter must NOT be narrowed to the API's strict timestamp> at
    the same instant — the source backs the floor off 1s and Spark trims
    the over-fetch, so the boundary-timestamp event survives."""
    spark = registered
    server = PagedEventsServer(n_events=30, page_size_cap=10)
    try:
        df = (
            spark.read.format("cf_events")
            .option("base_url", server.url)
            .option("page_size", 10)
            .load()
            .filter(
                F.col("created_at") >= F.lit(BASE + dt.timedelta(seconds=20))
            )
        )
        got = sorted(r["guid"] for r in df.collect())
    finally:
        server.close()
    # event 20 sits exactly on the boundary and must be included
    assert got == sorted(str(uuid.UUID(int=i)) for i in range(20, 30))


def test_datasource_streaming_late_arrival_not_starved(registered, tmp_path):
    """A late event landing INSIDE the overlap window (max_seen does not
    advance) must still be emitted on the next trigger — the offset
    advances via the window row count.  A resource without created_at is
    dropped, not a crash."""
    spark = registered
    server = PagedEventsServer(n_events=8, page_size_cap=10)
    server.include_invalid = True
    try:
        q = (
            spark.readStream.format("cf_events")
            .option("base_url", server.url)
            .option("page_size", 10)
            .load()
            .writeStream.format("memory")
            .queryName("cf_late")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            assert spark.sql(
                "SELECT DISTINCT guid FROM cf_late"
            ).count() == 8
            # late arrival: ts=5s < max_seen=7s, inside the 5s overlap
            # window (since=2s) — no newer event exists to advance max
            server.extra = [(100, 5)]
            q.processAllAvailable()
            out = spark.sql("SELECT DISTINCT guid FROM cf_late")
            assert out.count() == 9
            got = {r["guid"] for r in out.collect()}
        finally:
            q.stop()
    finally:
        server.close()
    assert str(uuid.UUID(int=100)) in got


class UaaEventsServer:
    """UAA token endpoint + /v2/events in one server; tokens expire after
    ``token_uses`` requests, forcing the 401-refresh path."""

    def __init__(self, n_events: int, token_uses: int = 2) -> None:
        self.n_events = n_events
        self.token_uses = token_uses
        self.issued = 0
        self.uses: dict[str, int] = {}
        self.token_posts = 0
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _json(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802 — UAA token endpoint
                outer.token_posts += 1
                outer.issued += 1
                tok = f"tok-{outer.issued}"
                outer.uses[tok] = 0
                self._json(200, {"access_token": tok, "token_type": "bearer"})

            def do_GET(self):  # noqa: N802
                auth = (self.headers.get("Authorization") or "")
                tok = auth.removeprefix("Bearer ")
                if tok not in outer.uses:
                    self._json(401, {"error": "invalid_token"})
                    return
                outer.uses[tok] += 1
                if outer.uses[tok] > outer.token_uses:
                    self._json(401, {"error": "token_expired"})
                    return
                parsed = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(parsed.query)
                page = int(qs.get("page", ["1"])[0])
                per = int(qs.get("results-per-page", ["10"])[0])
                ids = list(range(outer.n_events))
                total_pages = max(1, -(-len(ids) // per))
                chunk = ids[(page - 1) * per : page * per]
                self._json(200, {
                    "total_results": len(ids),
                    "total_pages": total_pages,
                    "next_url": None,
                    "resources": [_resource(i) for i in chunk],
                })

            def log_message(self, *a):  # noqa: N802
                pass

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def close(self):
        self.httpd.shutdown()


def test_datasource_uaa_acquires_and_refreshes_token(registered):
    """client-credentials options: the reader fetches a bearer token
    before the first request and transparently refreshes when the API
    starts returning 401 (expiry) — S1 auth parity for the native
    source."""
    spark = registered
    # 5 pages of 10 events; tokens die after 2 uses → ≥2 token grants
    server = UaaEventsServer(n_events=50, token_uses=2)
    try:
        df = (
            spark.read.format("cf_events")
            .option("base_url", server.url)
            .option("page_size", 10)
            .option("pages_per_partition", 10)  # single partition: serial uses
            .option("token_url", server.url + "/oauth/token")
            .option("client_id", "paas-auditor")
            .option("client_secret", "s3cret")
            .load()
        )
        assert df.count() == 50
    finally:
        server.close()
    assert server.token_posts >= 2  # initial grant + at least one refresh


def test_parse_created_tolerates_variants():
    """Non-canonical timestamps become rows with NULL created_at (to be
    quarantined downstream), never a task-killing ValueError."""
    import datetime as dt

    from paas_auditor_spark.sources.datasource import _parse_created

    assert _parse_created("2026-01-01T00:00:00Z") == dt.datetime(2026, 1, 1)
    assert _parse_created("2026-01-01T00:00:00.123Z") == dt.datetime(
        2026, 1, 1, 0, 0, 0, 123000
    )
    # numeric offset normalizes to UTC wall clock
    assert _parse_created("2026-01-01T05:30:00+05:30") == dt.datetime(
        2026, 1, 1
    )
    assert _parse_created("not-a-time") is None
    assert _parse_created("") is None
    assert _parse_created(None) is None


def test_rate_limit_429_retries_then_succeeds(registered):
    """A 429 backs off and retries like a 5xx — one rate-limit response
    must not abort the scan (the parallel fetch is the thing being
    rate-limited)."""
    server = PagedEventsServer(n_events=5, page_size_cap=10)
    server.fail_next = 2
    server.fail_code = 429
    try:
        df = (
            registered.read.format("cf_events")
            .option("base_url", server.url)
            .option("retry_backoff_s", "0")
            .load()
        )
        assert df.count() == 5
    finally:
        server.close()
