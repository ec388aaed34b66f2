"""Record-batch ingest.

Mirrors the reference's client-side Batch (reference: batch/batch.go:55
RecordBatch iface, Add:459, Import:753 — doTranslation:860, makeFragments:
1327, doImportShardTransactional:1146): records accumulate into per-field
columnar buffers; Import() bulk-translates keys, groups positions by shard,
and feeds the engine through the same bulk import paths the HTTP endpoints
use.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.model.field import Field
from featurebase_tpu.server.api import API, APIError


class Batch:
    def __init__(self, api: API, index: str, fields: List[str],
                 size: int = 1 << 16):
        self.api = api
        self.index = index
        self.fields = fields
        self.size = size
        idx = api.holder.index(index)
        if idx is None:
            raise APIError(f"index not found: {index}", 404)
        self.idx = idx
        self._field_objs: Dict[str, Field] = {}
        for fname in fields:
            f = idx.field(fname)
            if f is None:
                raise APIError(f"field not found: {fname}", 404)
            self._field_objs[fname] = f
        self._ids: List[Any] = []
        self._values: Dict[str, List[Any]] = {f: [] for f in fields}

    def __len__(self):
        return len(self._ids)

    def add(self, record_id, **values):
        """Add one record; flushes automatically when the batch is full
        (reference batch.Add -> ErrBatchNowFull)."""
        self._ids.append(record_id)
        for fname in self.fields:
            self._values[fname].append(values.get(fname))
        if len(self._ids) >= self.size:
            self.import_batch()

    def import_batch(self):
        """Translate + bulk import everything buffered (reference
        batch.Import batch/batch.go:753)."""
        if not self._ids:
            return
        ids = self._ids
        # -- column key translation (reference doTranslation:860)
        if self.idx.options.keys:
            str_keys = [i for i in ids if isinstance(i, str)]
            mapping = self.idx.translate_store.create_keys(str_keys)
            cols = np.array([mapping[i] if isinstance(i, str) else int(i)
                             for i in ids], dtype=np.int64)
        else:
            cols = np.array([int(i) for i in ids], dtype=np.int64)

        # all fragment mutations run under the index mutate gate (shared),
        # like the API import paths, so escalated snapshot reads exclude
        # a half-applied batch
        with self.idx.mutate_gate.shared():
            self._import_fields(cols)
        self._ids = []
        self._values = {f: [] for f in self.fields}

    def _import_fields(self, cols):
        for fname, f in self._field_objs.items():
            vals = self._values[fname]
            present = np.array([v is not None for v in vals], dtype=bool)
            if not present.any():
                continue
            pcols = cols[present]
            pvals = [v for v in vals if v is not None]
            if f.is_bsi():
                f.import_values(pcols, pvals)
            elif f.options.type == "bool":
                rows = np.array([1 if v in (True, 1, "true") else 0
                                 for v in pvals], dtype=np.int64)
                f.import_bits(rows, pcols)
            else:
                # set/mutex/time; values may be scalars or lists; strings
                # are row keys
                flat_rows: List[int] = []
                flat_cols: List[int] = []
                flat_ts: List[Any] = []
                str_rows = set()
                for v in pvals:
                    for x in (v if isinstance(v, (list, tuple)) else [v]):
                        if isinstance(x, tuple) and len(x) == 2:
                            x = x[0]
                        if isinstance(x, str):
                            str_rows.add(x)
                row_map = {}
                if str_rows:
                    store = self.idx.row_translation(fname)
                    if store is None:
                        raise APIError(
                            f"field {fname} does not use row keys", 400)
                    row_map = store.create_keys(sorted(str_rows))
                for c, v in zip(pcols, pvals):
                    items = v if isinstance(v, (list, tuple)) else [v]
                    for x in items:
                        ts = None
                        if isinstance(x, tuple) and len(x) == 2:
                            x, ts = x
                        r = row_map[x] if isinstance(x, str) else int(x)
                        flat_rows.append(r)
                        flat_cols.append(int(c))
                        flat_ts.append(ts)
                if flat_rows:
                    ts_arr = flat_ts if any(t is not None for t in flat_ts) \
                        else None
                    f.import_bits(np.array(flat_rows, dtype=np.int64),
                                  np.array(flat_cols, dtype=np.int64),
                                  timestamps=ts_arr)
        self.idx.mark_exists(cols)


def csv_ingest(api: API, index: str, path: str, id_column: str = "id",
               batch_size: int = 1 << 16, create_fields: bool = True,
               delimiter: str = ",") -> int:
    """Simple CSV loader (reference idk CSV ingester idk/csv; type inference
    by sampling: int columns -> int fields, everything else -> keyed mutex).
    Returns number of records ingested."""
    import csv as _csv
    idx = api.holder.index(index)
    if idx is None:
        api.create_index(index, {"keys": False})
        idx = api.holder.index(index)
    with open(path, newline="") as fh:
        reader = _csv.DictReader(fh, delimiter=delimiter)
        headers = [h for h in (reader.fieldnames or []) if h != id_column]
        rows = list(reader)
    if create_fields:
        for h in headers:
            if idx.field(h) is None:
                # infer: all-int column -> int field, else keyed mutex
                vals = [r[h] for r in rows if r.get(h)]
                is_int = all(_is_int(v) for v in vals) and vals
                if is_int:
                    iv = [int(v) for v in vals]
                    api.create_field(index, h, {
                        "type": "int", "min": min(iv), "max": max(iv)})
                else:
                    api.create_field(index, h,
                                     {"type": "mutex", "keys": True})
    batch = Batch(api, index, headers, size=batch_size)
    n = 0
    for r in rows:
        rid = r.get(id_column)
        if rid is None:
            continue
        vals = {}
        for h in headers:
            v = r.get(h)
            if v is None or v == "":
                continue
            f = idx.field(h)
            vals[h] = int(v) if f.is_bsi() and _is_int(v) else v
        batch.add(int(rid) if _is_int(rid) else rid, **vals)
        n += 1
    batch.import_batch()
    return n


def _is_int(v: str) -> bool:
    try:
        int(v)
        return True
    except (TypeError, ValueError):
        return False
