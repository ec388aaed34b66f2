"""Write-ahead log for mutations.

The durability role of the reference's RBF WAL (reference: rbf/db.go:163
openWAL, 264 checkpoint — every write Tx appends WAL pages, checkpoint folds
them into the main file) and of DAX's Writelogger (reference:
dax/writelogger/writelogger.go:22 append-only per-resource logs replayed on
shard load).  Here: one JSONL log per holder; every logical mutation is an
entry; recovery = load last snapshot + replay the log; snapshot() truncates.

Entries are logical ops (not page images) so the log is compact and
replayable through the public API:
  {"op": "set", "i": index, "f": field, "r": row, "c": col, "ts": ...}
  {"op": "clear"|"setval"|"clearval"|"clearrow"|"store"|"delete_cols"...}
  {"op": "import", ...base64 roaring payloads...}
  {"op": "schema", ...}
"""
from __future__ import annotations

import base64
import json
import os
import threading
from typing import Callable, Optional


class WAL:
    def __init__(self, path: str, fsync: bool = False):
        self.path = path
        self.fsync = fsync
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh = open(path, "ab")

    def append(self, entry: dict):
        data = (json.dumps(entry, separators=(",", ":")) + "\n").encode()
        with self._lock:
            self._fh.write(data)
            self._fh.flush()
            if self.fsync:
                os.fsync(self._fh.fileno())

    def truncate(self):
        """Called after a successful snapshot (reference rbf checkpoint /
        DAX snapshot+log-truncate, dax/storage/storage.go:19)."""
        with self._lock:
            self._fh.close()
            self._fh = open(self.path, "wb")

    def close(self):
        with self._lock:
            self._fh.close()

    def replay(self, apply: Callable[[dict], None]):
        """Re-apply every entry (crash recovery)."""
        if not os.path.exists(self.path):
            return 0
        n = 0
        with open(self.path, "rb") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    entry = json.loads(line)
                except json.JSONDecodeError:
                    break  # torn tail write — stop at last good entry
                apply(entry)
                n += 1
        return n


def encode_bytes(b: bytes) -> str:
    return base64.b64encode(b).decode()


def decode_bytes(s: str) -> bytes:
    return base64.b64decode(s)
