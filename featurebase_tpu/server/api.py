"""API facade over holder + executor.

Mirrors the reference's API struct (reference: api.go:45; Query:209,
CreateIndex:254, CreateField:372, Import:1438, ImportValue:1771, Schema
endpoints schema.go) — the single entry point used by HTTP/gRPC handlers,
ingest, and tests.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from featurebase_tpu.executor.executor import ExecError, Executor
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder, Index, IndexOptions


class APIError(Exception):
    def __init__(self, msg: str, status: int = 400):
        super().__init__(msg)
        self.status = status


class API:
    """When `data_dir` is set the API is durable: every mutation is appended
    to a WAL before being applied, startup restores the newest snapshot and
    replays the log, and checkpoint() cuts a new snapshot + truncates the log
    (reference: rbf WAL + checkpoint rbf/db.go:163,264; backup/restore
    ctl/backup.go)."""

    def __init__(self, holder: Optional[Holder] = None, mesh=None,
                 path: str = "", data_dir: Optional[str] = None):
        from featurebase_tpu.ingest.idalloc import IDAllocator
        self.data_dir = data_dir
        self.idalloc = IDAllocator()
        self.wal = None
        self._replaying = False
        if data_dir:
            import os

            from featurebase_tpu.storage import snapshot as snap
            from featurebase_tpu.storage.wal import WAL
            snap_dir = os.path.join(data_dir, "snapshot")
            holder = snap.load(snap_dir, idalloc=self.idalloc) \
                if os.path.isdir(snap_dir) else (holder or Holder(path))
            self.holder = holder
            self.executor = Executor(self.holder, mesh=mesh)
            self.wal = WAL(os.path.join(data_dir, "wal.jsonl"))
            self._replay_wal()
        else:
            self.holder = holder or Holder(path)
            self.executor = Executor(self.holder, mesh=mesh)

    # -- durability ---------------------------------------------------------

    def _log(self, entry: dict):
        if self.wal is not None and not self._replaying:
            self.wal.append(entry)

    def _replay_wal(self):
        self._replaying = True
        try:
            self.wal.replay(self._apply_wal_entry)
        finally:
            self._replaying = False

    def _apply_wal_entry(self, e: dict):
        from featurebase_tpu.storage.wal import decode_bytes
        op = e["op"]
        if op == "pql":
            try:
                self.executor.execute(e["i"], e["q"])
            except Exception:
                pass  # schema may have changed; logical replay best-effort
        elif op == "create_index":
            self.create_index(e["name"], e.get("options"), if_not_exists=True)
        elif op == "delete_index":
            self.holder.delete_index(e["name"])
        elif op == "create_field":
            self.create_field(e["i"], e["f"], e.get("options"),
                              if_not_exists=True)
        elif op == "delete_field":
            idx = self.holder.index(e["i"])
            if idx is not None:
                idx.delete_field(e["f"])
        elif op == "bits":
            self.import_bits(e["i"], e["f"], e["rows"], e["cols"],
                             timestamps=e.get("ts"),
                             clear=e.get("clear", False),
                             row_keys=e.get("rowKeys"),
                             col_keys=e.get("colKeys"))
        elif op == "vals":
            self.import_values(e["i"], e["f"], e["cols"], e["values"],
                               clear=e.get("clear", False),
                               col_keys=e.get("colKeys"))
        elif op == "roaring":
            from featurebase_tpu.ingest.roaring_import import import_roaring
            idx = self.holder.index(e["i"])
            if idx is not None:
                import_roaring(idx, e["f"], e["shard"],
                               decode_bytes(e["data"]),
                               view=e.get("view", "standard"),
                               clear=e.get("clear", False))

    def checkpoint(self):
        """Snapshot + truncate WAL."""
        if not self.data_dir:
            raise APIError("server is not durable (no data dir)", 400)
        import os

        from featurebase_tpu.storage import snapshot as snap
        snap.save(self.holder, os.path.join(self.data_dir, "snapshot"),
                  idalloc=self.idalloc)
        self.wal.truncate()

    # -- schema -------------------------------------------------------------

    def create_index(self, name: str, options: Optional[dict] = None,
                     if_not_exists: bool = False) -> Index:
        try:
            idx = self.holder.create_index(
                name, IndexOptions.from_json(options or {}),
                if_not_exists=if_not_exists)
        except ValueError as e:
            raise APIError(str(e), 409)
        self._log({"op": "create_index", "name": name, "options": options})
        return idx

    def delete_index(self, name: str):
        if self.holder.index(name) is None:
            raise APIError(f"index not found: {name}", 404)
        self.holder.delete_index(name)
        self._log({"op": "delete_index", "name": name})

    def create_field(self, index: str, field: str,
                     options: Optional[dict] = None,
                     if_not_exists: bool = False):
        idx = self._index(index)
        try:
            f = idx.create_field(field,
                                 FieldOptions.from_json(options or {}),
                                 if_not_exists=if_not_exists)
        except ValueError as e:
            raise APIError(str(e), 409)
        self._log({"op": "create_field", "i": index, "f": field,
                   "options": options})
        return f

    def delete_field(self, index: str, field: str):
        idx = self._index(index)
        if idx.field(field) is None:
            raise APIError(f"field not found: {field}", 404)
        idx.delete_field(field)
        self._log({"op": "delete_field", "i": index, "f": field})

    def schema(self) -> list:
        return self.holder.schema()

    def apply_schema(self, schema: list):
        self.holder.apply_schema(schema)

    def _index(self, name: str) -> Index:
        idx = self.holder.index(name)
        if idx is None:
            raise APIError(f"index not found: {name}", 404)
        return idx

    # -- query --------------------------------------------------------------

    def query(self, index: str, pql: str,
              shards: Optional[List[int]] = None) -> List[Any]:
        from featurebase_tpu.pql.ast import WRITE_CALLS
        from featurebase_tpu.pql.parser import ParseError
        from featurebase_tpu.pql.parser import parse as _parse
        self._index(index)
        try:
            parsed = _parse(pql) if isinstance(pql, str) else pql
            if self.wal is not None and any(
                    c.name in WRITE_CALLS for c in parsed.calls):
                self._log({"op": "pql", "i": index, "q": pql})
            return self.executor.execute(index, parsed, shards=shards)
        except ParseError as e:
            raise APIError(f"parsing: {e}", 400)
        except ExecError as e:
            raise APIError(str(e), 400)

    # -- imports (reference api.go:1438 Import, 1771 ImportValue) ------------

    def import_bits(self, index: str, field: str, rows, cols,
                    timestamps=None, clear: bool = False,
                    row_keys=None, col_keys=None):
        idx = self._index(index)
        f = idx.field(field)
        if f is None:
            raise APIError(f"field not found: {field}", 404)
        if col_keys is not None:
            ids = idx.translate_store.create_keys(col_keys)
            cols = np.array([ids[k] for k in col_keys], dtype=np.int64)
        if row_keys is not None:
            store = idx.row_translation(field)
            if store is None:
                raise APIError("field does not use row keys", 400)
            ids = store.create_keys(row_keys)
            rows = np.array([ids[k] for k in row_keys], dtype=np.int64)
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        self._log({"op": "bits", "i": index, "f": field,
                   "rows": [int(r) for r in rows],
                   "cols": [int(c) for c in cols],
                   "ts": list(timestamps) if timestamps is not None else None,
                   "clear": clear})
        f.import_bits(rows, cols, timestamps=timestamps, clear=clear)
        if not clear:
            idx.mark_exists(cols)

    def import_values(self, index: str, field: str, cols, values,
                      clear: bool = False, col_keys=None):
        idx = self._index(index)
        f = idx.field(field)
        if f is None:
            raise APIError(f"field not found: {field}", 404)
        if not f.is_bsi():
            raise APIError(f"field {field} is not an int-like field", 400)
        if col_keys is not None:
            ids = idx.translate_store.create_keys(col_keys)
            cols = np.array([ids[k] for k in col_keys], dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        self._log({"op": "vals", "i": index, "f": field,
                   "cols": [int(c) for c in cols],
                   "values": [v if not isinstance(v, (np.integer,)) else int(v)
                              for v in values],
                   "clear": clear})
        f.import_values(cols, values, clear=clear)
        if not clear:
            idx.mark_exists(cols)

    # -- translation --------------------------------------------------------

    def create_index_keys(self, index: str, keys: List[str]) -> Dict[str, int]:
        return self._index(index).translate_store.create_keys(keys)

    def find_index_keys(self, index: str, keys: List[str]) -> Dict[str, int]:
        return self._index(index).translate_store.find_keys(keys)

    def create_field_keys(self, index: str, field: str,
                          keys: List[str]) -> Dict[str, int]:
        store = self._index(index).row_translation(field)
        if store is None:
            raise APIError("field does not use keys", 400)
        return store.create_keys(keys)

    def find_field_keys(self, index: str, field: str,
                        keys: List[str]) -> Dict[str, int]:
        store = self._index(index).row_translation(field)
        if store is None:
            raise APIError("field does not use keys", 400)
        return store.find_keys(keys)

    # -- roaring import/export (reference api.go:618,1647; /export route) ----

    def import_roaring(self, index: str, field: str, shard: int, data: bytes,
                       view: str = "standard", clear: bool = False):
        from featurebase_tpu.ingest.roaring_import import import_roaring
        from featurebase_tpu.storage.wal import encode_bytes
        idx = self._index(index)
        if idx.field(field) is None:
            raise APIError(f"field not found: {field}", 404)
        self._log({"op": "roaring", "i": index, "f": field, "shard": shard,
                   "data": encode_bytes(data), "view": view, "clear": clear})
        import_roaring(idx, field, shard, data, view=view, clear=clear)

    def import_roaring_shard(self, index: str, shard: int, views: dict):
        from featurebase_tpu.ingest.roaring_import import import_roaring_shard
        from featurebase_tpu.storage.wal import encode_bytes
        idx = self._index(index)
        if self.wal is not None and not self._replaying:
            for spec, payload in views.items():
                fname = spec.split("/", 1)[0]
                vname = spec.split("/", 1)[1] if "/" in spec else "standard"
                self._log({"op": "roaring", "i": index, "f": fname,
                           "shard": shard,
                           "data": encode_bytes(payload.get("data", b"")),
                           "view": vname,
                           "clear": payload.get("clear", False)})
        import_roaring_shard(idx, shard, views)

    def export_roaring(self, index: str, field: str, shard: int,
                       view: str = "standard") -> bytes:
        from featurebase_tpu.ingest.roaring_import import export_roaring
        idx = self._index(index)
        if idx.field(field) is None:
            raise APIError(f"field not found: {field}", 404)
        return export_roaring(idx, field, shard, view=view)

    # -- ID allocation (reference api.go:2460 ReserveIDs, 2475 CommitIDs) ----

    def reserve_ids(self, index: str, key: str, session: str, offset: int,
                    count: int):
        try:
            return self.idalloc.reserve(index, key, session.encode(), offset,
                                        count)
        except ValueError as e:
            raise APIError(str(e), 409)

    def commit_ids(self, index: str, key: str, session: str, offset: int,
                   count: int):
        try:
            self.idalloc.commit(index, key, session.encode(), offset, count)
        except ValueError as e:
            raise APIError(str(e), 409)

    # -- info ---------------------------------------------------------------

    def available_shards(self, index: str) -> List[int]:
        return self._index(index).available_shards()

    def status(self) -> dict:
        import jax
        return {
            "state": "NORMAL",
            "indexes": sorted(self.holder.indexes),
            "devices": [str(d) for d in jax.devices()],
            "shardWidth": 1 << 20,
        }
