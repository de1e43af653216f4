"""Structured JSON logging — lager parity (reference main_config.go:100-108).

The reference builds one ``lager.Logger`` named ``paas-auditor`` writing
JSON lines to stdout at INFO, or DEBUG when ``LOG_LEVEL=debug``
(main_config.go:99-108), and hands each loop a *session* of it
(``logger.Session("collector")`` etc. — main.go:59,66,71), so every line
carries ``paas-auditor.<component>.<action>`` provenance.  This module
reproduces that contract with stdlib ``json`` only:

- one JSON object per line: ``{"timestamp", "source", "message",
  "log_level", "data"}`` — lager's wire format (lager/writer_sink.go),
  with numeric levels DEBUG=0, INFO=1, ERROR=2, FATAL=3,
- ``session(name)`` returns a child whose ``message`` is prefixed
  ``source.name1.name2...`` exactly like lager sessions,
- ``error(action, err)`` folds the error string into ``data["error"]``
  (lager's Error method behavior),
- level gate from ``LOG_LEVEL`` (only the ``debug`` switch exists in the
  reference; anything else means INFO).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from typing import Any, TextIO

DEBUG, INFO, ERROR, FATAL = 0, 1, 2, 3


def level_from_env(environ=None) -> int:
    """main_config.go:101-104: ``LOG_LEVEL=debug`` lowers to DEBUG, any
    other value (or unset) is INFO."""
    env = os.environ if environ is None else environ
    return DEBUG if env.get("LOG_LEVEL", "").lower() == "debug" else INFO


class JsonLogger:
    """Minimal lager-shaped component/session logger."""

    def __init__(
        self,
        source: str = "paas-auditor",
        level: int | None = None,
        sink: TextIO | None = None,
        _session: tuple[str, ...] = (),
        _lock: threading.Lock | None = None,
    ) -> None:
        self.source = source
        self.level = level_from_env() if level is None else level
        self.sink = sink if sink is not None else sys.stdout
        self._session = _session
        # one lock per root logger, shared by sessions: JSON lines from
        # concurrent loop threads must not interleave mid-line
        self._lock = _lock or threading.Lock()

    def session(self, name: str) -> JsonLogger:
        return JsonLogger(
            self.source,
            self.level,
            self.sink,
            (*self._session, name),
            self._lock,
        )

    # -- emit --------------------------------------------------------------

    def _emit(self, level: int, action: str, data: dict[str, Any] | None) -> None:
        if level < self.level:
            return
        record = {
            "timestamp": f"{time.time():.9f}",
            "source": self.source,
            "message": ".".join((self.source, *self._session, action)),
            "log_level": level,
            "data": data or {},
        }
        line = json.dumps(record, separators=(",", ":"), default=str)
        with self._lock:
            self.sink.write(line + "\n")
            self.sink.flush()

    def debug(self, action: str, data: dict[str, Any] | None = None) -> None:
        self._emit(DEBUG, action, data)

    def info(self, action: str, data: dict[str, Any] | None = None) -> None:
        self._emit(INFO, action, data)

    def error(
        self,
        action: str,
        err: BaseException | str | None = None,
        data: dict[str, Any] | None = None,
    ) -> None:
        payload = dict(data or {})
        if err is not None:
            payload["error"] = str(err)
        self._emit(ERROR, action, payload)


__all__ = ["DEBUG", "ERROR", "FATAL", "INFO", "JsonLogger", "level_from_env"]
