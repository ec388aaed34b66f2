"""Error monitoring + usage diagnostics (reference: monitor/monitor.go:26
Sentry error monitor; diagnostics.go:29 diagnosticsCollector with version
check-in against diagnostics.pilosa.com).

No Sentry SDK nor egress exists in this environment, so both are
transport-pluggable:

- ErrorMonitor collects captured exceptions/messages into a bounded
  in-process ring (always available — surfaced at /internal/errors and in
  metrics) and POSTs each event to `dsn` when one is configured
  (FEATUREBASE_TPU_SENTRY_DSN; JSON body, fire-and-forget) — the Sentry
  role without the proprietary envelope.
- DiagnosticsCollector assembles the same anonymous payload the
  reference ships (version, uptime, schema/shape counts, platform) and
  checks the version endpoint when FEATUREBASE_TPU_DIAGNOSTICS_URL is
  set; otherwise it only exposes the payload locally
  (/internal/diagnostics) — opted out by default like
  PILOSA_REPORTING_DISABLED.
"""
from __future__ import annotations

import json
import os
import platform
import threading
import time
import traceback
import urllib.request
from collections import deque
from typing import Any, Dict, List, Optional

LEVEL_PANIC, LEVEL_ERROR, LEVEL_WARN, LEVEL_INFO, LEVEL_DEBUG = range(5)
_LEVEL_NAMES = ["panic", "error", "warn", "info", "debug"]


class ErrorMonitor:
    """Bounded in-process error event ring + optional remote sink
    (reference: monitor.CaptureException/CaptureMessage)."""

    def __init__(self, version: str = "", dsn: Optional[str] = None,
                 ring: int = 200):
        self.version = version
        self.dsn = dsn if dsn is not None else \
            os.environ.get("FEATUREBASE_TPU_SENTRY_DSN") or None
        self.events: deque = deque(maxlen=ring)
        self._lock = threading.Lock()

    def capture_exception(self, exc: BaseException,
                          level: int = LEVEL_ERROR, **context):
        self._record({
            "kind": "exception",
            "level": _LEVEL_NAMES[min(level, LEVEL_DEBUG)],
            "type": type(exc).__name__,
            "message": str(exc),
            "stack": traceback.format_exception(type(exc), exc,
                                                exc.__traceback__),
            "context": context,
        })

    def capture_message(self, message: str, level: int = LEVEL_INFO,
                        **context):
        self._record({"kind": "message",
                      "level": _LEVEL_NAMES[min(level, LEVEL_DEBUG)],
                      "message": message, "context": context})

    def _record(self, event: Dict[str, Any]):
        event["ts"] = time.time()
        event["release"] = self.version
        with self._lock:
            self.events.append(event)
        if self.dsn:
            # fire-and-forget: monitoring must never block or fail a query
            threading.Thread(target=self._post, args=(event,),
                             daemon=True).start()

    def _post(self, event: Dict[str, Any]):
        try:
            req = urllib.request.Request(
                self.dsn, data=json.dumps(event).encode(),
                headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=5).read()
        except Exception:  # noqa: BLE001 — best effort by design
            pass

    def recent(self, n: int = 50) -> List[dict]:
        with self._lock:
            return list(self.events)[-n:]


class DiagnosticsCollector:
    """Anonymous usage payload + version check-in (reference:
    diagnostics.go:29; verchk.go).  Remote reporting only happens when a
    URL is explicitly configured."""

    def __init__(self, api, version: str = "",
                 url: Optional[str] = None):
        self.api = api
        self.version = version
        self.url = url if url is not None else \
            os.environ.get("FEATUREBASE_TPU_DIAGNOSTICS_URL") or None
        self.start = time.time()
        self.last_version_check: Optional[dict] = None

    def payload(self) -> dict:
        h = self.api.holder
        num_fields = sum(len(list(i.public_fields()))
                         for i in h.indexes.values())
        shards = sum(len(i.available_shards())
                     for i in h.indexes.values())
        out = {
            "version": self.version,
            "uptime_s": int(time.time() - self.start),
            "numIndexes": len(h.indexes),
            "numFields": num_fields,
            "numShards": shards,
            "OS": platform.system(),
            "arch": platform.machine(),
            "pyVersion": platform.python_version(),
            "numNodes": len(self.api.cluster.nodes)
            if self.api.cluster is not None else 1,
        }
        try:
            import jax
            out["backend"] = jax.default_backend()
            out["numDevices"] = len(jax.devices())
        except Exception:  # noqa: BLE001
            pass
        return out

    def check_version(self) -> Optional[dict]:
        """POST the payload; the endpoint answers with the latest release
        (reference: versionResponse{Version, Message})."""
        if not self.url:
            return None
        try:
            req = urllib.request.Request(
                self.url, data=json.dumps(self.payload()).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=10) as resp:
                self.last_version_check = json.loads(resp.read() or b"{}")
        except Exception:  # noqa: BLE001 — diagnostics are best effort
            return None
        return self.last_version_check
