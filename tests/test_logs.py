"""Structured JSON logging — lager parity (main_config.go:100-108)."""

from __future__ import annotations

import io
import json

from paas_auditor_spark.logs import DEBUG, ERROR, INFO, JsonLogger, level_from_env


def _lines(buf: io.StringIO) -> list[dict]:
    return [json.loads(ln) for ln in buf.getvalue().splitlines()]


def test_wire_format_and_sessions():
    buf = io.StringIO()
    log = JsonLogger(level=INFO, sink=buf)
    log.session("collector").info("collected", {"events": 3})
    log.session("shipper").session("retry").error("post.failed", ValueError("boom"))
    recs = _lines(buf)
    assert [r["message"] for r in recs] == [
        "paas-auditor.collector.collected",
        "paas-auditor.shipper.retry.post.failed",
    ]
    assert recs[0]["log_level"] == INFO and recs[0]["data"] == {"events": 3}
    assert recs[1]["log_level"] == ERROR and recs[1]["data"]["error"] == "boom"
    assert all(r["source"] == "paas-auditor" for r in recs)
    assert all(float(r["timestamp"]) > 0 for r in recs)


def test_level_gate_and_env_switch(monkeypatch):
    buf = io.StringIO()
    JsonLogger(level=INFO, sink=buf).debug("hidden")
    assert buf.getvalue() == ""
    buf = io.StringIO()
    JsonLogger(level=DEBUG, sink=buf).debug("shown")
    assert _lines(buf)[0]["message"] == "paas-auditor.shown"
    # main_config.go:101-104: only the "debug" switch exists
    monkeypatch.setenv("LOG_LEVEL", "debug")
    assert level_from_env() == DEBUG
    monkeypatch.setenv("LOG_LEVEL", "warn")
    assert level_from_env() == INFO
    monkeypatch.delenv("LOG_LEVEL")
    assert level_from_env() == INFO
