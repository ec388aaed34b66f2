"""DAX Computer: a data node driven by controller directives.

Mirrors the reference computer (reference: api_directive.go:19
ApplyDirective — diffs old/new directive, loads/unloads shards from
Writelogger+Snapshotter, :559 loadShard; computers log every write to the
Writelogger before ack, dax/computer/).  The computer holds no private
durable state: everything lives in the shared writelogger/snapshotter
directories, so any computer can take over any shard.
"""
from __future__ import annotations

import base64
import json
import threading
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from featurebase_tpu.cluster.client import InternalClient
from featurebase_tpu.cluster.wire import decode_query, encode_query
from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.dax.storage import ResourceManager
from featurebase_tpu.dax.translate import install_remote_translation
from featurebase_tpu.server.api import API


def _shard_key(shard: int) -> str:
    return f"shard/{shard}"


class DaxComputerAPI(API):
    """API in compute mode (reference: OptServerIsComputeNode
    server.go:456)."""

    def __init__(self, worker_id: str, controller_uri: str,
                 resources: ResourceManager, **kw):
        super().__init__(**kw)
        self.worker_id = worker_id
        self.controller_uri = controller_uri.rstrip("/")
        self.resources = resources
        self.owned: Set[Tuple[str, int]] = set()
        self.dirty: Set[Tuple[str, int]] = set()
        self.directive_version = -1
        self._dax_lock = threading.RLock()
        self.dax_client = InternalClient(timeout=15.0)

    # -- write logging (reference: computers append to the Writelogger before
    # ack, dax/computer/interfaces.go WritelogService) ------------------------

    def _log(self, entry: dict):
        super()._log(entry)  # local WAL if configured (usually not)
        if self._replaying or getattr(self, "_dax_replaying", False):
            return
        op = entry.get("op")
        if op in ("create_index", "delete_index", "create_field",
                  "delete_field", "create_view", "delete_view", "keys"):
            return  # schema/translation are controller state
        index = entry.get("i") or entry.get("name", "")
        for shard, sub in self._split_entry(index, entry):
            self.resources.append(index, _shard_key(shard), sub)
            self.dirty.add((index, shard))

    def _split_entry(self, index: str, entry: dict):
        """Split a write entry by shard so each shard resource's log replays
        independently."""
        op = entry["op"]
        if op == "roaring":
            yield entry["shard"], entry
            return
        if op in ("bits", "vals"):
            cols = np.asarray(entry["cols"], dtype=np.int64)
            shards = cols // SHARD_WIDTH
            for s in np.unique(shards):
                sel = shards == s
                sub = dict(entry)
                sub["cols"] = [int(c) for c in cols[sel]]
                if op == "bits":
                    sub["rows"] = [entry["rows"][i]
                                   for i in np.nonzero(sel)[0]]
                    if entry.get("ts"):
                        sub["ts"] = [entry["ts"][i]
                                     for i in np.nonzero(sel)[0]]
                else:
                    sub["values"] = [entry["values"][i]
                                     for i in np.nonzero(sel)[0]]
                yield int(s), sub
            return
        if op == "pql_ast":
            cols = set()
            multi = False
            for call in decode_query(entry["q"]).calls:
                col = call.args.get("_col")
                if col is not None and not isinstance(col, str):
                    cols.add(int(col) // SHARD_WIDTH)
                else:
                    multi = True
            targets = cols if not multi else \
                {s for (i, s) in self.owned if i == index}
            for s in targets:
                yield s, entry
            return

    # -- directives (reference: api_directive.go:19 ApplyDirective) --------------

    def apply_directive(self, d: dict):
        with self._dax_lock:
            if d.get("version", 0) < self.directive_version:
                return
            self.directive_version = d.get("version", 0)
            # schema first (additive + removals)
            schema = d.get("schema") or []
            self.holder.apply_schema(schema)
            want_idx = {s["name"] for s in schema}
            for name in list(self.holder.indexes):
                if name not in want_idx:
                    self.holder.delete_index(name)
            for s in schema:
                idx = self.holder.index(s["name"])
                want_fields = {f["name"] for f in s.get("fields", [])}
                for fname in list(idx.fields):
                    if fname not in want_fields and fname != "_exists":
                        idx.delete_field(fname)
            self.holder.sql_views = dict(d.get("views") or {})
            install_remote_translation(self, self.controller_uri,
                                       self.dax_client)
            # shard diff
            want: Set[Tuple[str, int]] = set()
            for table, shards in (d.get("shards") or {}).items():
                for s in shards:
                    want.add((table, int(s)))
            for table, shard in sorted(want - self.owned):
                self._load_shard(table, shard)
            for table, shard in sorted(self.owned - want):
                self._unload_shard(table, shard)
            self.owned = want

    def _load_shard(self, table: str, shard: int):
        """Snapshot + writelog replay (reference: api_directive.go:559
        loadShard)."""
        idx = self.holder.index(table)
        if idx is None:
            return
        self._dax_replaying = True
        try:
            self.resources.load(
                table, _shard_key(shard),
                lambda blob: self._apply_shard_snapshot(table, shard, blob),
                lambda entry: self._replay_entry(table, shard, entry))
        finally:
            self._dax_replaying = False

    def _unload_shard(self, table: str, shard: int):
        idx = self.holder.index(table)
        if idx is None:
            return
        for f in idx.fields.values():
            for v in f.views.values():
                v.fragments.pop(shard, None)

    # -- shard snapshot blobs ---------------------------------------------------

    def _shard_snapshot_blob(self, table: str, shard: int) -> bytes:
        """All fragments of one shard as {field/view: b64 roaring}."""
        from featurebase_tpu.ingest.roaring_import import export_roaring
        idx = self.holder.index(table)
        views: Dict[str, str] = {}
        for fname, f in idx.fields.items():
            for vname in f.views:
                data = export_roaring(idx, fname, shard, view=vname)
                if data:
                    views[f"{fname}/{vname}"] = \
                        base64.b64encode(data).decode("ascii")
        return json.dumps(views).encode()

    def _apply_shard_snapshot(self, table: str, shard: int, blob: bytes):
        from featurebase_tpu.ingest.roaring_import import import_roaring_shard
        idx = self.holder.index(table)
        views = {spec: {"data": base64.b64decode(b64), "replace": True}
                 for spec, b64 in json.loads(blob).items()}
        import_roaring_shard(idx, shard, views, suppress_existence=True)

    def _replay_entry(self, table: str, shard: int, entry: dict):
        """Apply one logged write restricted to this shard."""
        from featurebase_tpu.storage.wal import decode_bytes
        op = entry["op"]
        if op == "bits":
            self.import_bits(table, entry["f"], entry["rows"], entry["cols"],
                             timestamps=entry.get("ts"),
                             clear=entry.get("clear", False), forwarded=True)
        elif op == "vals":
            self.import_values(table, entry["f"], entry["cols"],
                               entry["values"],
                               clear=entry.get("clear", False),
                               forwarded=True)
        elif op == "roaring":
            from featurebase_tpu.ingest.roaring_import import import_roaring
            idx = self.holder.index(table)
            import_roaring(idx, entry["f"], entry["shard"],
                           decode_bytes(entry["data"]),
                           view=entry.get("view", "standard"),
                           clear=entry.get("clear", False))
        elif op == "pql_ast":
            self.executor.execute_remote(table, decode_query(entry["q"]),
                                         [shard])

    # -- snapshot loop target (reference: snapping turtle requests) ---------------

    def snapshot_dirty(self):
        with self._dax_lock:
            dirty = sorted(self.dirty)
            self.dirty.clear()
        for table, shard in dirty:
            if (table, shard) not in self.owned:
                continue
            self.resources.snapshot(
                table, _shard_key(shard),
                lambda t=table, s=shard: self._shard_snapshot_blob(t, s))

    # -- HTTP surface -------------------------------------------------------------

    def extra_route(self, h, method: str, path: str, query: dict) -> bool:
        if path == "/dax/directive" and method == "POST":
            self.apply_directive(h._json())
            h._send({})
            return True
        if path == "/dax/snapshot" and method == "POST":
            self.snapshot_dirty()
            h._send({})
            return True
        return False

    def register(self, self_uri: str):
        self.dax_client._call(self.controller_uri, "POST", "/dax/register",
                              {"id": self.worker_id, "uri": self_uri})
