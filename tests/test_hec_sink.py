"""Native splunk_hec sink tests: batch + streaming writes against a live
HTTP server (the test_datasource.py convention), envelope parity with the
reference shipper, and the retry/backoff contract."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from paas_auditor_spark.sinks.hec import SplunkHecDataSource


class HecServer:
    """Captures HEC POSTs; optionally fails the first ``fail_first``
    requests with 503 (retry-path exercise)."""

    def __init__(self, fail_first: int = 0):
        self.bodies: list[bytes] = []
        self.auths: list[str] = []
        self.fail_first = fail_first
        self.fail_code = 503
        self.requests = 0
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                outer.requests += 1
                length = int(self.headers["Content-Length"])
                body = self.rfile.read(length)
                if outer.requests <= outer.fail_first:
                    self.send_response(outer.fail_code)
                    self.end_headers()
                    return
                outer.bodies.append(body)
                outer.auths.append(self.headers.get("Authorization", ""))
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b'{"text":"Success","code":0}')

            def log_message(self, *args):
                pass

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}/services/collector"
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def events(self) -> list[dict]:
        out = []
        for body in self.bodies:
            for line in body.decode().splitlines():
                out.append(json.loads(line))
        return out

    def close(self):
        self.httpd.shutdown()


@pytest.fixture
def registered(spark):
    spark.dataSource.register(SplunkHecDataSource)
    return spark


def test_batch_write_batches_and_envelopes(registered):
    server = HecServer()
    try:
        df = registered.createDataFrame(
            [(i, f"type-{i}") for i in range(10)],
            "guid long, event_type string",
        ).coalesce(1)
        (
            df.write.format("splunk_hec")
            .option("url", server.url)
            .option("token", "tok-123")
            .option("batch_size", "4")
            .option("source", "test")
            .mode("append")
            .save()
        )
        # 10 events in one partition at batch_size 4 → 3 POSTs
        assert len(server.bodies) == 3
        assert all(a == "Splunk tok-123" for a in server.auths)
        evs = server.events()
        assert len(evs) == 10
        assert {e["event"]["guid"] for e in evs} == set(range(10))
        # reference HEC envelope shape (shipper.go:187-192)
        assert evs[0]["sourcetype"] == "cf-audit-event"
        assert evs[0]["source"] == "test"
    finally:
        server.close()


def test_retry_recovers_from_transient_503(registered):
    server = HecServer(fail_first=2)
    try:
        df = registered.createDataFrame([(1,)], "guid long").coalesce(1)
        (
            df.write.format("splunk_hec")
            .option("url", server.url)
            .option("token", "t")
            .option("retry_base_s", "0")
            .mode("append")
            .save()
        )
        assert server.requests == 3  # 2 failures + 1 success
        assert len(server.events()) == 1
    finally:
        server.close()


def test_retries_exhausted_fails_the_write(registered):
    server = HecServer(fail_first=99)
    try:
        df = registered.createDataFrame([(1,)], "guid long").coalesce(1)
        with pytest.raises(Exception, match="HEC POST failed|aborted"):
            (
                df.write.format("splunk_hec")
                .option("url", server.url)
                .option("token", "t")
                .option("retry_base_s", "0")
                .option("max_retries", "2")
                .mode("append")
                .save()
            )
        assert server.requests >= 3  # initial + 2 retries (per attempt)
    finally:
        server.close()


def test_stream_write_ships_each_microbatch(registered, tmp_path):
    import datetime as dt

    server = HecServer()
    src = str(tmp_path / "src")
    B = dt.datetime(2024, 3, 1, 12, 0, 0)
    registered.createDataFrame(
        [(i, B) for i in range(6)], "guid long, created_at timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    try:
        q = (
            registered.readStream.schema("guid long, created_at timestamp")
            .parquet(src)
            .writeStream.format("splunk_hec")
            .option("url", server.url)
            .option("token", "t")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        evs = server.events()
        assert {e["event"]["guid"] for e in evs} == set(range(6))
        # timestamps serialize through default=str, stable and readable
        assert "2024-03-01" in evs[0]["event"]["created_at"]
    finally:
        server.close()


def test_http_status_retries_back_off(monkeypatch):
    """429/5xx retries must sleep with the doubling envelope, same as
    connection errors — parallel partitions must not hammer a
    rate-limited collector (the r5 advice finding: backoff previously
    lived only in the URLError branch)."""
    import urllib.error

    from paas_auditor_spark.sinks import hec

    sleeps: list[float] = []
    monkeypatch.setattr(hec.time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.setattr(hec.random, "uniform", lambda a, b: 0.0)

    def always_503(req, timeout):
        raise urllib.error.HTTPError(req.full_url, 503, "busy", {}, None)

    monkeypatch.setattr(hec.urllib.request, "urlopen", always_503)
    with pytest.raises(RuntimeError, match="failed after 3 retries"):
        hec._post_batch("http://x/", "t", b"{}", {"retry_base_s": "0.1"})
    # 3 retries → 3 sleeps, doubling 0.1 → 0.2 → 0.4 (jitter zeroed)
    assert sleeps == pytest.approx([0.1, 0.2, 0.4])


def test_permanent_4xx_fails_fast_without_retries(registered):
    """A 401 (bad token) is permanent: one request, no backoff burn, and
    the error names the status."""
    server = HecServer(fail_first=99)
    server.fail_code = 401
    try:
        df = registered.createDataFrame([(1,)], "guid long").coalesce(1)
        with pytest.raises(Exception, match="HTTP 401"):
            (
                df.write.format("splunk_hec")
                .option("url", server.url)
                .option("token", "bad")
                .option("retry_base_s", "0")
                .mode("append")
                .save()
            )
        assert server.requests == 1  # no retries on a permanent status
    finally:
        server.close()
