"""Index (table) and Holder (root registry).

Mirrors reference index.go:27 (Index), holder.go:58 (Holder).  The Holder is
the root object: all indexes, their translate stores, and schema load/apply
(reference holder.go:432 Open, 836 applySchema).
"""
from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

from featurebase_tpu.model.field import Field, FieldOptions, TYPE_SET
from featurebase_tpu.storage.translate import (FieldTranslateStore,
                                               IndexTranslateStore)

# reference: index.go existenceFieldName = "_exists"
EXISTENCE_FIELD = "_exists"


class IndexOptions:
    def __init__(self, keys: bool = False, track_existence: bool = True):
        self.keys = keys
        self.track_existence = track_existence

    def to_json(self):
        return {"keys": self.keys, "trackExistence": self.track_existence}

    @classmethod
    def from_json(cls, d: dict) -> "IndexOptions":
        return cls(keys=d.get("keys", False),
                   track_existence=d.get("trackExistence", True))


class Index:
    def __init__(self, name: str, options: Optional[IndexOptions] = None):
        self.name = name
        self.options = options or IndexOptions()
        self._lock = threading.RLock()
        # snapshot-read gate (the Qcx/RBF-MVCC role — see utils/rwlock.py):
        # writers hold it shared; an escalated reader holds it exclusive
        from featurebase_tpu.utils.rwlock import ShardedGate
        self.mutate_gate = ShardedGate()
        self.fields: Dict[str, Field] = {}
        self.translate_store = IndexTranslateStore(name)
        self.field_translate_stores: Dict[str, FieldTranslateStore] = {}
        # optional per-shard columnar side-store (reference: `_dataframe`
        # dirs, index.go:111); created lazily on first dataframe ingest
        self._dataframe = None
        if self.options.track_existence:
            self._create_existence_field()

    @property
    def dataframe(self):
        if self._dataframe is None:
            from featurebase_tpu.model.dataframe import DataframeStore
            self._dataframe = DataframeStore()
        return self._dataframe

    def _create_existence_field(self):
        if EXISTENCE_FIELD not in self.fields:
            self.fields[EXISTENCE_FIELD] = Field(
                self.name, EXISTENCE_FIELD,
                FieldOptions(type=TYPE_SET, cache_type="none"))

    # -- fields --------------------------------------------------------------

    def create_field(self, name: str, options: Optional[FieldOptions] = None,
                     if_not_exists: bool = False) -> Field:
        with self._lock:
            if name in self.fields:
                if if_not_exists:
                    return self.fields[name]
                raise ValueError(f"field already exists: {name}")
            f = Field(self.name, name, options or FieldOptions())
            self.fields[name] = f
            if f.options.keys:
                self.field_translate_stores[name] = FieldTranslateStore(
                    self.name, name)
            return f

    def field(self, name: str) -> Optional[Field]:
        return self.fields.get(name)

    def delete_field(self, name: str):
        with self._lock:
            self.fields.pop(name, None)
            self.field_translate_stores.pop(name, None)

    def existence_field(self) -> Optional[Field]:
        return self.fields.get(EXISTENCE_FIELD)

    def public_fields(self) -> List[Field]:
        # DECLARATION order (the fields dict preserves insertion): the
        # reference returns SELECT * columns and no-column-list INSERT
        # slots in declared order, not alphabetical (found by a tranche
        # probe: INSERT INTO t VALUES(...) mismapped values when the
        # declared order differed from the sorted one)
        return [f for n, f in self.fields.items()
                if n != EXISTENCE_FIELD]

    # -- existence maintenance (reference: fragment importExistenceColumns) --

    def mark_exists(self, cols: np.ndarray):
        if not self.options.track_existence:
            return
        ef = self.existence_field()
        cols = np.asarray(cols, dtype=np.int64)
        if cols.size:
            ef.import_bits(np.zeros(cols.size, dtype=np.int64), cols)

    def available_shards(self) -> List[int]:
        """Union of shards across fields (reference index.go:498
        AvailableShards)."""
        shards = set()
        for f in self.fields.values():
            shards.update(f.available_shards())
        return sorted(shards)

    def row_translation(self, field: str) -> Optional[FieldTranslateStore]:
        return self.field_translate_stores.get(field)

    def iter_fragments(self):
        """Yields ((field, view, shard), fragment) for every fragment
        (snapshot pin capture; list() copies guard concurrent schema/view
        creation)."""
        for fname, f in list(self.fields.items()):
            for vname, v in list(f.views.items()):
                for shard, frag in list(v.fragments.items()):
                    yield (fname, vname, shard), frag

    def fragment_generations(self, keys=None) -> dict:
        """Snapshot of fragment mutation (seqlock) counters, used by the
        executor's optimistic read validation (the reference pins reads to
        RBF page-map snapshots instead; rbf/db.go:45, txfactory.go:84).

        With `keys` (iterable of (field, view, shard)), returns counters for
        exactly those leaves, -1 for fragments that don't exist — the
        leaf-granular validation path."""
        if keys is not None:
            gens = {}
            for key in keys:
                fname, vname, shard = key
                f = self.fields.get(fname)
                v = f.views.get(vname) if f is not None else None
                frag = v.fragments.get(shard) if v is not None else None
                gens[key] = -1 if frag is None else frag.generation
            return gens
        gens = {}
        for fname, f in list(self.fields.items()):
            for vname, v in list(f.views.items()):
                for shard, frag in list(v.fragments.items()):
                    gens[(fname, vname, shard)] = frag.generation
        return gens

    def to_info(self):
        return {"name": self.name, "options": self.options.to_json(),
                "fields": [f.to_info() for f in self.public_fields()]}


class Holder:
    """Root object owning all indexes (reference holder.go:58)."""

    def __init__(self, path: str = ""):
        self.path = path
        self._lock = threading.RLock()
        self.indexes: Dict[str, Index] = {}
        # SQL views: name -> SELECT statement text (reference: sql3 CREATE
        # VIEW; persisted in snapshots, replayed from the WAL)
        self.sql_views: Dict[str, str] = {}
        # SQL databases: name -> options (reference: sql3 CREATE DATABASE —
        # namespaces; in DAX mode they gate worker quotas)
        self.sql_databases: Dict[str, dict] = {}
        # SQL user functions: name -> {"params": [...], "returns", "body"}
        # (reference: sql3 CREATE FUNCTION)
        self.sql_functions: Dict[str, dict] = {}
        # ExternalLookup() database adapter (reference: holder.lookupDB,
        # executor.go:4358; see storage/lookup.py for the protocol)
        self.lookup_db = None

    def create_index(self, name: str, options: Optional[IndexOptions] = None,
                     if_not_exists: bool = False) -> Index:
        with self._lock:
            if name in self.indexes:
                if if_not_exists:
                    return self.indexes[name]
                raise ValueError(f"index already exists: {name}")
            idx = Index(name, options)
            self.indexes[name] = idx
            return idx

    def index(self, name: str) -> Optional[Index]:
        return self.indexes.get(name)

    def delete_index(self, name: str):
        with self._lock:
            self.indexes.pop(name, None)

    def schema(self):
        return [idx.to_info() for _, idx in sorted(self.indexes.items())]

    def apply_schema(self, schema: list):
        """Create indexes/fields from a schema document (reference
        holder.go:836 applySchema)."""
        for idx_info in schema:
            idx = self.create_index(
                idx_info["name"],
                IndexOptions.from_json(idx_info.get("options", {})),
                if_not_exists=True)
            for f_info in idx_info.get("fields", []):
                idx.create_field(
                    f_info["name"],
                    FieldOptions.from_json(f_info.get("options", {})),
                    if_not_exists=True)
