"""DAX durable storage: writelogger + snapshotter + resource manager.

Mirrors the reference's disaggregated storage services (reference:
dax/writelogger/writelogger.go:22,46 — append-only per (bucket, key,
version) log files, fsync'd; dax/snapshotter/snapshotter.go:24,44 —
versioned snapshot blobs; dax/storage/storage.go:19 ResourceManager —
pairs them, snapshot = write new version + truncate log).

Both are filesystem-backed; in a cloud deployment the directory is a
shared/durable volume (the reference points them at object storage).
Computers use them as libraries over that shared mount — the service
boundary of the reference collapses to a path, which is the idiomatic
single-cluster TPU deployment.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Callable, Dict, List, Optional, Tuple


def _safe(name: str) -> str:
    return name.replace("/", "__")


class Writelogger:
    """Append-only versioned logs (reference: writelogger.go:22)."""

    def __init__(self, directory: str):
        self.dir = directory
        self._lock = threading.Lock()
        os.makedirs(directory, exist_ok=True)

    def _path(self, bucket: str, key: str, version: int) -> str:
        d = os.path.join(self.dir, _safe(bucket), _safe(key))
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{version}.log")

    def append(self, bucket: str, key: str, version: int, entry: dict):
        data = json.dumps(entry, separators=(",", ":")) + "\n"
        with self._lock:
            with open(self._path(bucket, key, version), "a") as fh:
                fh.write(data)
                fh.flush()
                os.fsync(fh.fileno())

    def read(self, bucket: str, key: str, version: int) -> List[dict]:
        path = self._path(bucket, key, version)
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        break  # torn tail write: stop at corruption
        return out

    def versions(self, bucket: str, key: str) -> List[int]:
        d = os.path.join(self.dir, _safe(bucket), _safe(key))
        if not os.path.isdir(d):
            return []
        return sorted(int(f[:-4]) for f in os.listdir(d)
                      if f.endswith(".log"))

    def delete_before(self, bucket: str, key: str, version: int):
        for v in self.versions(bucket, key):
            if v < version:
                os.unlink(self._path(bucket, key, v))


class Snapshotter:
    """Versioned snapshot blobs (reference: snapshotter.go:24)."""

    def __init__(self, directory: str):
        self.dir = directory
        self._lock = threading.Lock()
        os.makedirs(directory, exist_ok=True)

    def _path(self, bucket: str, key: str, version: int) -> str:
        d = os.path.join(self.dir, _safe(bucket), _safe(key))
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{version}.snap")

    def write(self, bucket: str, key: str, version: int, data: bytes):
        path = self._path(bucket, key, version)
        tmp = path + ".tmp"
        with self._lock:
            with open(tmp, "wb") as fh:
                fh.write(data)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, path)

    def read(self, bucket: str, key: str,
             version: int) -> Optional[bytes]:
        path = self._path(bucket, key, version)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as fh:
            return fh.read()

    def latest_version(self, bucket: str, key: str) -> Optional[int]:
        d = os.path.join(self.dir, _safe(bucket), _safe(key))
        if not os.path.isdir(d):
            return None
        vs = [int(f[:-5]) for f in os.listdir(d) if f.endswith(".snap")]
        return max(vs) if vs else None


class ResourceManager:
    """One durable resource = snapshot + live log at a version (reference:
    dax/storage/storage.go:19).

    Writes append to log version V; snapshot() writes snapshot V+1 from the
    caller's serializer, bumps the live log to V+1, and deletes old logs.
    Load = read latest snapshot version V, apply, then replay log V.
    """

    def __init__(self, wl: Writelogger, snap: Snapshotter):
        self.wl = wl
        self.snap = snap
        self._lock = threading.Lock()
        self._versions: Dict[Tuple[str, str], int] = {}

    def _version(self, bucket: str, key: str) -> int:
        k = (bucket, key)
        v = self._versions.get(k)
        if v is None:
            sv = self.snap.latest_version(bucket, key)
            lv = self.wl.versions(bucket, key)
            v = max([sv if sv is not None else 0] + lv)
            self._versions[k] = v
        return v

    def append(self, bucket: str, key: str, entry: dict):
        with self._lock:
            v = self._version(bucket, key)
        self.wl.append(bucket, key, v, entry)

    def load(self, bucket: str, key: str,
             apply_snapshot: Callable[[bytes], None],
             apply_entry: Callable[[dict], None]) -> bool:
        """Restore a resource: latest snapshot then log replay (reference:
        api_directive.go:559 loadShard).  Returns True if anything loaded."""
        with self._lock:
            v = self._version(bucket, key)
        found = False
        sv = self.snap.latest_version(bucket, key)
        if sv is not None:
            data = self.snap.read(bucket, key, sv)
            if data:
                apply_snapshot(data)
                found = True
        for lv in self.wl.versions(bucket, key):
            if sv is not None and lv < sv:
                continue
            for entry in self.wl.read(bucket, key, lv):
                apply_entry(entry)
                found = True
        return found

    def snapshot(self, bucket: str, key: str, serialize: Callable[[], bytes]):
        """Cut a snapshot and truncate the log (reference: snapshot = write
        new version + truncate log, storage.go:19)."""
        with self._lock:
            v = self._version(bucket, key)
            nv = v + 1
            self._versions[(bucket, key)] = nv
        self.snap.write(bucket, key, nv, serialize())
        self.wl.delete_before(bucket, key, nv)
