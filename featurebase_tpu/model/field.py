"""Field: a typed column of the data model.

Mirrors reference field.go:73 (Field struct), field types field.go:42-50
(set/int/time/mutex/bool/decimal/timestamp), option builders field.go:126-391,
and the bsiGroup value encoding (field.go:2394 bsiGroup, 2412 baseValue).

BSI encoding: int-like values are stored relative to `base` as sign-magnitude
bit slices in the `bsig_<field>` view — row 0 exists, row 1 sign, row 2+i =
magnitude bit i (reference fragment.go:62-65).  Timestamps are integers in
`time_unit` granularity from the Unix epoch; decimals are scaled by 10^scale.
"""
from __future__ import annotations

import threading
from datetime import datetime, timezone
from typing import Dict, List, Optional, Tuple

import numpy as np

from featurebase_tpu.core.consts import (BSI_EXISTS_ROW, BSI_OFFSET,
                                         BSI_SIGN_ROW, SHARD_WIDTH)
from featurebase_tpu.model.timequantum import (parse_time, views_by_time,
                                               views_by_time_range)
from featurebase_tpu.model.view import (VIEW_STANDARD, View, view_bsi_group)

# field types (reference field.go:42-50)
TYPE_SET = "set"
TYPE_INT = "int"
TYPE_TIME = "time"
TYPE_MUTEX = "mutex"
TYPE_BOOL = "bool"
TYPE_DECIMAL = "decimal"
TYPE_TIMESTAMP = "timestamp"

BSI_TYPES = (TYPE_INT, TYPE_DECIMAL, TYPE_TIMESTAMP)

# Paranoia mode (reference: roaringparanoia build tag,
# roaring/roaring_paranoia.go:3 — invariant validation on every mutation).
# FEATUREBASE_TPU_PARANOIA=1 turns on per-write invariant checks: mutex/bool
# columns hold at most one row bit; BSI columns with magnitude or sign bits
# always carry the exists bit.
import os as _os

PARANOIA = _os.environ.get("FEATUREBASE_TPU_PARANOIA", "") not in ("", "0")


class ParanoiaError(AssertionError):
    pass

# cache types (reference field.go:2486 CacheType*)
CACHE_RANKED = "ranked"
CACHE_LRU = "lru"
CACHE_NONE = "none"

DEFAULT_CACHE_SIZE = 50000

_EPOCH = datetime(1970, 1, 1)

_TIME_UNIT_NS = {
    "s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "µs": 1_000, "ns": 1,
    "m": 60 * 1_000_000_000, "h": 3600 * 1_000_000_000,
    "d": 86400 * 1_000_000_000,
}


class FieldOptions:
    def __init__(self, type: str = TYPE_SET, keys: bool = False,
                 cache_type: str = CACHE_RANKED,
                 cache_size: int = DEFAULT_CACHE_SIZE,
                 min: Optional[int] = None, max: Optional[int] = None,
                 scale: int = 0, time_unit: str = "s",
                 time_quantum: str = "", ttl: int = 0,
                 no_standard_view: bool = False,
                 foreign_index: str = ""):
        self.type = type
        self.keys = keys
        self.cache_type = cache_type
        self.cache_size = cache_size
        self.min = min
        self.max = max
        self.scale = scale
        self.time_unit = time_unit
        self.time_quantum = time_quantum
        self.ttl = ttl
        self.no_standard_view = no_standard_view
        self.foreign_index = foreign_index

    def to_json(self):
        return {
            "type": self.type, "keys": self.keys,
            "cacheType": self.cache_type, "cacheSize": self.cache_size,
            "min": self.min, "max": self.max, "scale": self.scale,
            "timeUnit": self.time_unit, "timeQuantum": self.time_quantum,
            "ttl": self.ttl, "noStandardView": self.no_standard_view,
            "foreignIndex": self.foreign_index,
        }

    @classmethod
    def from_json(cls, d: dict) -> "FieldOptions":
        return cls(type=d.get("type", TYPE_SET), keys=d.get("keys", False),
                   cache_type=d.get("cacheType", CACHE_RANKED),
                   cache_size=d.get("cacheSize", DEFAULT_CACHE_SIZE),
                   min=d.get("min"), max=d.get("max"),
                   scale=d.get("scale", 0),
                   time_unit=d.get("timeUnit", "s"),
                   time_quantum=d.get("timeQuantum", ""),
                   ttl=d.get("ttl", 0),
                   no_standard_view=d.get("noStandardView", False),
                   foreign_index=d.get("foreignIndex", ""))


class Field:
    def __init__(self, index: str, name: str, options: FieldOptions):
        self.index = index
        self.name = name
        self.options = options
        self._lock = threading.RLock()
        self.views: Dict[str, View] = {}
        # TopN rank cache: (shard, views) -> (generations, {row: count})
        # (reference: cache.go:25 rankCache per fragment; here exact counts
        # cached per shard keyed by fragment generation, honoring
        # cache_type/cache_size)
        self._topn_cache: Dict = {}
        # owner-placed host masters (parallel/placement.py): shards seen
        # in gated (unowned) writes and row-id metadata per view, kept so
        # every process agrees on the global shard set and candidate row
        # ids without holding the data (reference: shard metadata lives in
        # etcd via Sharder, disco/disco.go:113)
        self._known_shards: set = set()
        self._meta_rows: Dict[str, set] = {}
        # dynamic bit depth for BSI fields (grows with observed magnitudes,
        # reference fragment.go importValue bitDepth growth)
        self.bit_depth = 0
        if self.is_bsi():
            self.bit_depth = self._initial_depth()
        # base for value encoding (reference field.go:2412 baseValue)
        self.base = self._compute_base()

    # -- type helpers -------------------------------------------------------

    def is_bsi(self) -> bool:
        return self.options.type in BSI_TYPES

    def _compute_base(self) -> int:
        o = self.options
        if not self.is_bsi():
            return 0
        mn, mx = o.min, o.max
        if mn is None or mx is None:
            return 0
        if mn > 0:
            return mn
        if mx < 0:
            return mx
        return 0

    def _initial_depth(self) -> int:
        o = self.options
        if o.min is None or o.max is None:
            return 1
        base = self._compute_base()
        mag = max(abs(int(o.min) - base), abs(int(o.max) - base))
        return max(1, mag.bit_length())

    def time_quantum(self) -> str:
        return self.options.time_quantum if self.options.type == TYPE_TIME else ""

    # -- value encoding (field-level units -> stored BSI int) ---------------

    def encode_value(self, v) -> int:
        o = self.options
        if o.type == TYPE_DECIMAL:
            if isinstance(v, str):
                v = float(v)
            if isinstance(v, float):
                v = round(v * (10 ** o.scale))
            elif isinstance(v, int):
                v = v * (10 ** o.scale)
            return int(v)
        if o.type == TYPE_TIMESTAMP:
            if isinstance(v, (int, np.integer)):
                return int(v)
            t = parse_time(v)
            ns = int((t - _EPOCH).total_seconds() * 1e9)
            return ns // _TIME_UNIT_NS.get(o.time_unit, 1_000_000_000)
        return int(v)

    def decode_value(self, stored: int):
        o = self.options
        if o.type == TYPE_DECIMAL:
            return stored / (10 ** o.scale)
        return int(stored)

    # -- views --------------------------------------------------------------

    def view(self, name: str) -> Optional[View]:
        return self.views.get(name)

    def create_view_if_not_exists(self, name: str) -> View:
        with self._lock:
            v = self.views.get(name)
            if v is None:
                v = View(self.index, self.name, name)
                self.views[name] = v
            return v

    def bsi_view(self) -> View:
        return self.create_view_if_not_exists(view_bsi_group(self.name))

    def standard_view(self) -> View:
        return self.create_view_if_not_exists(VIEW_STANDARD)

    def available_shards(self) -> List[int]:
        shards = set(self._known_shards)
        for v in self.views.values():
            shards.update(v.available_shards())
        return sorted(shards)

    # -- owner placement (multi-host mesh mode; parallel/placement.py) ------

    def _writable(self, shard: int) -> bool:
        """False when an ownership policy is active and this process does
        not own the shard — the caller records metadata and drops the
        payload (reference: a computer only loads directive-assigned
        shards, api_directive.go:559)."""
        from featurebase_tpu.parallel import placement
        if not placement.active() or placement.owns(self.index, int(shard)):
            return True
        self._known_shards.add(int(shard))
        return False

    def note_shard(self, view_name: str, shard: int, rows) -> None:
        """Record shard + row-id metadata without data (gated writes and
        ownership handoff drops)."""
        self._known_shards.add(int(shard))
        self._meta_rows.setdefault(view_name, set()).update(
            int(r) for r in rows)

    def _meta_note(self, view_name: str, rows) -> None:
        """Row-id metadata for owned writes too — only while a placement
        policy is active (all processes see the same write stream, so the
        union agrees globally)."""
        from featurebase_tpu.parallel import placement
        if placement.active():
            self._meta_rows.setdefault(view_name, set()).update(
                int(r) for r in rows)

    def meta_rows(self, view_names) -> set:
        """Globally-agreed candidate row ids for the given views (empty
        unless an ownership policy is active); may include rows whose bits
        were since cleared — the same caveat as Fragment.row_ids."""
        from featurebase_tpu.parallel import placement
        if not placement.active():
            return set()
        out: set = set()
        for vn in view_names:
            out |= self._meta_rows.get(vn, set())
        return out

    def delete_view(self, name: str):
        with self._lock:
            self.views.pop(name, None)

    # -- bit-level writes (set/mutex/bool/time) -----------------------------

    def set_bit(self, row: int, col: int, timestamp=None) -> bool:
        """Reference field.SetBit field.go:1301."""
        o = self.options
        shard = col >> 20
        self._meta_note(VIEW_STANDARD, (row,))
        if not self._writable(shard):
            vns = [VIEW_STANDARD]
            if o.type == TYPE_TIME and timestamp is not None:
                vns += views_by_time(VIEW_STANDARD, parse_time(timestamp),
                                     o.time_quantum)
            for vn in vns:
                self.note_shard(vn, shard, (row,))
            return False
        changed = False
        if o.type in (TYPE_MUTEX, TYPE_BOOL):
            self._clear_mutex_col(col, keep_row=row)
        if o.type == TYPE_TIME:
            views = []
            if not o.no_standard_view:
                views.append(VIEW_STANDARD)
            if timestamp is not None:
                t = parse_time(timestamp)
                views.extend(views_by_time(VIEW_STANDARD, t, o.time_quantum))
            for vn in views:
                self._meta_note(vn, (row,))
                frag = self.create_view_if_not_exists(vn).create_fragment_if_not_exists(shard)
                if frag.set_bit(row, col):
                    changed = True
                    self._topn_cache_adjust(shard, vn, row, +1)
            return changed
        frag = self.standard_view().create_fragment_if_not_exists(shard)
        out = frag.set_bit(row, col) or changed
        if out:
            self._topn_cache_adjust(shard, VIEW_STANDARD, row, +1)
        if PARANOIA:
            self._paranoia_column(col)
        return out

    def clear_bit(self, row: int, col: int) -> bool:
        shard = col >> 20
        changed = False
        for vn, v in list(self.views.items()):
            frag = v.fragment(shard)
            if frag is not None and frag.clear_bit(row, col):
                changed = True
                self._topn_cache_adjust(shard, vn, row, -1)
        return changed

    def _topn_cache_adjust(self, shard: int, view_name: str, row: int,
                           delta: int):
        """Incremental rank-cache maintenance for single-bit writes
        (reference: cache.go:130 — the rank cache absorbs point updates
        and only re-ranks past a threshold; bulk imports still invalidate
        by generation).  Optimistic install: the entry is updated only
        when the current generations equal the cached ones plus EXACTLY
        this write's seqlock bump — any concurrent or unaccounted write
        makes the generations diverge and the entry drops instead."""
        for key in list(self._topn_cache):
            kshard, names = key
            if kshard != shard or view_name not in names:
                continue
            if names != (view_name,):
                # multi-view entries cache OR-counts across views: a point
                # write's effect on the union isn't derivable from the
                # delta alone, so those just invalidate
                self._topn_cache.pop(key, None)
                continue
            entry = self._topn_cache.get(key)
            if entry is None:
                continue
            old_gens, counts = entry
            cur = tuple(fr.generation for vn in names
                        if (vv := self.views.get(vn)) is not None
                        and (fr := vv.fragments.get(shard)) is not None)
            if (len(cur) != len(old_gens)
                    or sum(c - o for c, o in zip(cur, old_gens)) != 2
                    or any(c - o not in (0, 2)
                           for c, o in zip(cur, old_gens))):
                self._topn_cache.pop(key, None)
                continue
            new_counts = dict(counts)
            new_counts[row] = new_counts.get(row, 0) + delta
            if new_counts[row] <= 0:
                new_counts.pop(row)
            if len(new_counts) > self.options.cache_size:
                self._topn_cache.pop(key, None)
                continue
            self._topn_cache[key] = (cur, new_counts)

    def _clear_mutex_col(self, col: int, keep_row: Optional[int] = None):
        """Mutex invariant: at most one row set per column (reference
        fragment.go:1787 bulkImportMutex)."""
        shard = col >> 20
        v = self.views.get(VIEW_STANDARD)
        if v is None:
            return
        frag = v.fragment(shard)
        if frag is None:
            return
        for r in list(frag.row_ids()):
            r = int(r)
            if r != keep_row and frag.get_bit(r, col):
                frag.clear_bit(r, col)

    # -- BSI writes (reference fragment.setValue:615) -----------------------

    def _check_value_range(self, stored_with_base) -> None:
        """Writes outside the configured [min, max] are rejected
        (reference: fragment.go:615 setValue / importValue bsiGroup
        range errors; silently accepting them breaks range predicates
        that clamp to the declared bounds)."""
        o = self.options
        if o.min is not None and stored_with_base < self.encode_value(o.min):
            raise ValueError(
                f"value {stored_with_base} below field minimum {o.min}")
        if o.max is not None and stored_with_base > self.encode_value(o.max):
            raise ValueError(
                f"value {stored_with_base} above field maximum {o.max}")

    def set_value(self, col: int, value) -> bool:
        stored = self.encode_value(value) - self.base
        self._check_value_range(stored + self.base)
        shard = col >> 20
        if not self._writable(shard):
            self.note_shard(view_bsi_group(self.name), shard, ())
            mag = abs(stored)
            self.bit_depth = max(self.bit_depth, mag.bit_length(), 1)
            return False
        frag = self.bsi_view().create_fragment_if_not_exists(shard)
        mag = abs(stored)
        depth = max(self.bit_depth, mag.bit_length(), 1)
        self.bit_depth = depth
        changed = frag.set_bit(BSI_EXISTS_ROW, col)
        if stored < 0:
            changed |= frag.set_bit(BSI_SIGN_ROW, col)
        else:
            changed |= frag.clear_bit(BSI_SIGN_ROW, col)
        for i in range(depth):
            if (mag >> i) & 1:
                changed |= frag.set_bit(BSI_OFFSET + i, col)
            else:
                changed |= frag.clear_bit(BSI_OFFSET + i, col)
        if PARANOIA:
            self._paranoia_column(col)
        return changed

    def value(self, col: int) -> Tuple[int, bool]:
        shard = col >> 20
        v = self.views.get(view_bsi_group(self.name))
        frag = v.fragment(shard) if v else None
        if frag is None or not frag.get_bit(BSI_EXISTS_ROW, col):
            return 0, False
        mag = 0
        for i in range(self.bit_depth):
            if frag.get_bit(BSI_OFFSET + i, col):
                mag |= 1 << i
        if frag.get_bit(BSI_SIGN_ROW, col):
            mag = -mag
        return mag + self.base, True

    def clear_value(self, col: int) -> bool:
        shard = col >> 20
        v = self.views.get(view_bsi_group(self.name))
        frag = v.fragment(shard) if v else None
        if frag is None:
            return False
        changed = frag.clear_bit(BSI_EXISTS_ROW, col)
        frag.clear_bit(BSI_SIGN_ROW, col)
        for i in range(self.bit_depth):
            frag.clear_bit(BSI_OFFSET + i, col)
        return changed

    # -- bulk imports -------------------------------------------------------

    def import_bits(self, rows: np.ndarray, cols: np.ndarray,
                    timestamps=None, clear: bool = False):
        """Bulk set-bit import (reference fragment.bulkImport:1498; mutex
        variant 1787; time-view fan-out field.Import field.go:1662)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        o = self.options
        shards = cols >> 20
        for s in np.unique(shards):
            m = shards == s
            r, c = rows[m], cols[m] % SHARD_WIDTH
            self._meta_note(VIEW_STANDARD, np.unique(r))
            if not self._writable(int(s)):
                self.note_shard(VIEW_STANDARD, int(s), np.unique(r))
                if o.type == TYPE_TIME and timestamps is not None:
                    for t in np.asarray(timestamps)[m]:
                        for vn in views_by_time(VIEW_STANDARD, parse_time(t),
                                                o.time_quantum):
                            self.note_shard(vn, int(s), np.unique(r))
                continue
            if o.type in (TYPE_MUTEX, TYPE_BOOL) and not clear:
                # clear the imported columns across all rows first
                from featurebase_tpu.ops.bitwise import cols_to_words
                frag = self.standard_view().create_fragment_if_not_exists(int(s))
                frag.clear_columns(cols_to_words(np.unique(c)))
            frag = self.standard_view().create_fragment_if_not_exists(int(s))
            frag.import_bits(r, c, clear=clear)
            if o.type == TYPE_TIME and timestamps is not None:
                ts = np.asarray(timestamps)[m]
                for vn in set(v for t in ts
                              for v in views_by_time(VIEW_STANDARD, parse_time(t),
                                                     o.time_quantum)):
                    tf = self.create_view_if_not_exists(vn).create_fragment_if_not_exists(int(s))
                    sel = np.array([vn in views_by_time(VIEW_STANDARD, parse_time(t),
                                                        o.time_quantum) for t in ts])
                    tf.import_bits(r[sel], c[sel], clear=clear)

    def encode_values_vec(self, values) -> np.ndarray:
        """Vectorized encode_value over a batch (the scalar Python loop
        cost ~0.3s/M records — the single biggest ingest hot spot)."""
        o = self.options
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            if o.type == TYPE_DECIMAL:
                return arr.astype(np.int64) * (10 ** o.scale)
            return arr.astype(np.int64)
        if arr.dtype.kind == "f" and o.type == TYPE_DECIMAL:
            return np.round(arr * (10 ** o.scale)).astype(np.int64)
        return np.array([self.encode_value(v) for v in values],
                        dtype=np.int64)

    @staticmethod
    def _bsi_delta(c, v, mg, depth: int) -> np.ndarray:
        """(depth+2, W) delta tile for one shard's BSI import.  Host
        scatter by default (np.bitwise_or.at); set
        FEATUREBASE_TPU_DEVICE_INGEST=1 to run the scatter on device
        (ops/bsi.py bsi_delta_device — SURVEY §2.9(7) device-side
        position scatter; pays one host->device->host round trip, a win
        only when the link outruns host memory)."""
        import os
        if os.environ.get("FEATUREBASE_TPU_DEVICE_INGEST") == "1" \
                and depth <= 31:
            import jax.numpy as jnp
            from featurebase_tpu.ops.bsi import bsi_delta_device
            return np.asarray(bsi_delta_device(
                jnp.asarray(c, jnp.int32), jnp.asarray(mg, jnp.uint32),
                jnp.asarray((v < 0), jnp.uint32), depth))
        wi = (c >> 5).astype(np.int64)
        bv = (np.uint32(1) << (c & 31).astype(np.uint32))
        delta = np.zeros((depth + 2, SHARD_WIDTH // 32), dtype=np.uint32)
        np.bitwise_or.at(delta[0], wi, bv)                    # exists
        np.bitwise_or.at(delta[1], wi,
                         bv * (v < 0).astype(np.uint32))      # sign
        for i in range(depth):
            np.bitwise_or.at(delta[2 + i], wi,
                             bv * ((mg >> np.uint64(i)) &
                                   np.uint64(1)).astype(np.uint32))
        return delta

    def import_values(self, cols: np.ndarray, values, clear: bool = False):
        """Bulk BSI import (reference fragment.importValue:1947).

        Hot path (reference parallelSlices position-sort analog,
        fragment.go:1614): one word-index scatter builds a (depth+2, W)
        delta tile — exists, sign, magnitude planes — which lands in the
        fragment in a single locked vectorized OR (merge_rows_delta).
        OR-ing a zero bit is a no-op, so no per-plane boolean selection
        is needed."""
        cols = np.asarray(cols, dtype=np.int64)
        encoded = self.encode_values_vec(values)
        o = self.options
        if encoded.size and (o.min is not None or o.max is not None):
            lo = int(encoded.min())
            hi = int(encoded.max())
            self._check_value_range(lo)
            self._check_value_range(hi)
        stored = encoded - self.base
        if clear:
            for c in cols:
                self.clear_value(int(c))
            return
        mags = np.abs(stored)
        depth = max(self.bit_depth, int(mags.max()).bit_length() if mags.size else 1, 1)
        self.bit_depth = depth
        shards = cols >> 20
        for s in np.unique(shards):
            m = shards == s
            c = cols[m] % SHARD_WIDTH
            v = stored[m]
            mg = mags[m].astype(np.uint64)
            if not self._writable(int(s)):
                self.note_shard(view_bsi_group(self.name), int(s), ())
                continue
            frag = self.bsi_view().create_fragment_if_not_exists(int(s))
            delta = self._bsi_delta(c, v, mg, depth)
            # clear previous values on these columns (delta[0] IS the
            # imported-column mask), then land every plane in one window
            frag.clear_columns(delta[0])
            frag.merge_rows_delta(
                [BSI_EXISTS_ROW, BSI_SIGN_ROW] +
                [BSI_OFFSET + i for i in range(depth)], delta)

    # -- BSI device data accessor ------------------------------------------

    def bsi_data(self, shard: int):
        """Device (slices (D, W), exists (W,), sign (W,), depth) for a shard,
        or None if no data."""
        import jax.numpy as jnp
        v = self.views.get(view_bsi_group(self.name))
        frag = v.fragment(shard) if v else None
        if frag is None or frag.num_rows == 0:
            return None
        depth = max(self.bit_depth, 1)
        rows = [BSI_EXISTS_ROW, BSI_SIGN_ROW] + [BSI_OFFSET + i for i in range(depth)]
        tile, _present = frag.device_rows(rows)
        exists = tile[0]
        sign = tile[1]
        slices = tile[2:]
        return slices, exists, sign, depth

    def _paranoia_column(self, col: int):
        """Per-write invariant validation (reference: roaringparanoia
        checks, roaring/roaring_paranoia.go:3).  Raises ParanoiaError on a
        broken invariant — only active with FEATUREBASE_TPU_PARANOIA=1."""
        o = self.options
        if o.type in (TYPE_MUTEX, TYPE_BOOL):
            v = self.views.get(VIEW_STANDARD)
            frag = v.fragment(col >> 20) if v else None
            if frag is None:
                return
            set_rows = [r for r in frag.slot_rows()
                        if frag.get_bit(int(r), col)]
            if len(set_rows) > 1:
                raise ParanoiaError(
                    f"{o.type} field {self.name}: column {col} has "
                    f"{len(set_rows)} rows set: {set_rows}")
        elif self.is_bsi():
            v = self.views.get(view_bsi_group(self.name))
            frag = v.fragment(col >> 20) if v else None
            if frag is None:
                return
            exists = frag.get_bit(BSI_EXISTS_ROW, col)
            has_data = frag.get_bit(BSI_SIGN_ROW, col) or any(
                frag.get_bit(BSI_OFFSET + i, col)
                for i in range(max(self.bit_depth, 1)))
            if has_data and not exists:
                raise ParanoiaError(
                    f"BSI field {self.name}: column {col} has magnitude/"
                    "sign bits without the exists bit")

    def values_dense_host(self, shard: int):
        """Host-decoded dense values for one shard: (values int64
        (SHARD_WIDTH,) in stored units (no base), exists bool (SHARD_WIDTH,)),
        or None if no data.  Vectorized np.unpackbits decode — used by
        Sort/Extract/Distinct when bit_depth > 31 exceeds the 32-bit device
        decode (reference fragment.go:579 value, one col at a time)."""
        from featurebase_tpu.ops.bsi import (decode_values_host,
                                             expand_bits_host)
        v = self.views.get(view_bsi_group(self.name))
        frag = v.fragment(shard) if v else None
        if frag is None or frag.num_rows == 0:
            return None
        depth = max(self.bit_depth, 1)
        slices = np.stack([frag.host_row(BSI_OFFSET + i)
                           for i in range(depth)])
        vals = decode_values_host(slices, frag.host_row(BSI_SIGN_ROW), depth)
        exists = expand_bits_host(frag.host_row(BSI_EXISTS_ROW))
        return vals, exists

    # -- views for a time range --------------------------------------------

    def views_for_range(self, from_t, to_t) -> List[str]:
        from featurebase_tpu.model.timequantum import view_time_range
        lo, hi = parse_time(from_t), parse_time(to_t)
        # clamp open-ended bounds to the hull of EXISTING time views: an
        # unbounded range (rangeq open end = year 1/9999 sentinel) would
        # otherwise enumerate millions of per-quantum view names
        starts, ends = [], []
        for vn in self.views:
            rng = view_time_range(vn)
            if rng is not None:
                starts.append(rng[0])
                ends.append(rng[1])
        if not starts:
            return []
        lo = max(lo, min(starts))
        hi = min(hi, max(ends))
        if lo >= hi:
            return []
        return views_by_time_range(VIEW_STANDARD, lo, hi,
                                   self.options.time_quantum)

    def remove_expired_views(self, now: Optional[datetime] = None
                             ) -> List[str]:
        """Delete time-quantum views whose period ended more than `ttl`
        seconds ago (reference: server.go:920 ViewsRemoval background task;
        field option ttl).  Returns the removed view names."""
        from featurebase_tpu.model.timequantum import view_time_range
        if self.options.type != TYPE_TIME or self.options.ttl <= 0:
            return []
        now = now or datetime.utcnow()
        removed = []
        for vn in list(self.views):
            rng = view_time_range(vn)
            if rng is None:
                continue
            _, end = rng
            if (now - end).total_seconds() > self.options.ttl:
                self.delete_view(vn)
                removed.append(vn)
        return removed

    def to_info(self):
        return {"name": self.name, "options": self.options.to_json(),
                "views": sorted(self.views)}
