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
    def __init__(self, holder: Optional[Holder] = None, mesh=None,
                 path: str = ""):
        self.holder = holder or Holder(path)
        self.executor = Executor(self.holder, mesh=mesh)

    # -- schema -------------------------------------------------------------

    def create_index(self, name: str, options: Optional[dict] = None,
                     if_not_exists: bool = False) -> Index:
        try:
            return self.holder.create_index(
                name, IndexOptions.from_json(options or {}),
                if_not_exists=if_not_exists)
        except ValueError as e:
            raise APIError(str(e), 409)

    def delete_index(self, name: str):
        if self.holder.index(name) is None:
            raise APIError(f"index not found: {name}", 404)
        self.holder.delete_index(name)

    def create_field(self, index: str, field: str,
                     options: Optional[dict] = None,
                     if_not_exists: bool = False):
        idx = self._index(index)
        try:
            return idx.create_field(field,
                                    FieldOptions.from_json(options or {}),
                                    if_not_exists=if_not_exists)
        except ValueError as e:
            raise APIError(str(e), 409)

    def delete_field(self, index: str, field: str):
        idx = self._index(index)
        if idx.field(field) is None:
            raise APIError(f"field not found: {field}", 404)
        idx.delete_field(field)

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
        from featurebase_tpu.pql.parser import ParseError
        self._index(index)
        try:
            return self.executor.execute(index, pql, shards=shards)
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
