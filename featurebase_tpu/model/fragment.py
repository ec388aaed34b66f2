"""Fragment: one dense bitmap per (field, view, shard).

Replaces the reference's fragment-over-roaring-Tx design (reference:
fragment.go:84 struct, setBit:337, row:283, value:579, setValue:615).  The
reference keeps containers in an mmapped RBF B-tree; here the master copy is
host-DRAM numpy (mutable, row-sparse: only rows that exist are materialized)
and a device (HBM) mirror is maintained lazily with dirty-row tracking.
Queries always read the device tile; writes hit the host master and mark rows
dirty — read-your-writes is guaranteed because every query path calls
`device_tile()` / `device_row()` which flushes pending uploads first.

Layout per row: SHARD_WIDTH bits as (WORDS_PER_ROW,) uint32 little-endian
words (see core/consts.py).
"""
from __future__ import annotations

import os
import threading
import weakref
from contextlib import contextmanager
from typing import Dict, List, Optional

import numpy as np

from featurebase_tpu.core.consts import SHARD_WIDTH, WORDS_PER_ROW

_INIT_CAP = 4


def _hostmem():
    from featurebase_tpu.storage.hostmem import hostmem
    return hostmem()


def _drop_host_entry(key):
    _hostmem().remove(key)


def _unlink_spill(path):
    try:
        os.unlink(path)
    except OSError:
        pass


class Fragment:
    """Dense bitmap fragment for (index, field, view, shard)."""

    def __init__(self, index: str, field: str, view: str, shard: int):
        self.index = index
        self.field = field
        self.view = view
        self.shard = shard

        self._lock = threading.RLock()
        # host master: _words_mem may be spilled to disk by the host-DRAM
        # residency manager (storage/hostmem.py — the RBF mmap/page-cache
        # role, reference rbf/db.go:45); the _words property reloads
        # transparently.  Row metadata (_row_of_slot/_slot_of_row) always
        # stays in memory — it's tiny.
        self._words_mem: Optional[np.ndarray] = \
            np.zeros((_INIT_CAP, WORDS_PER_ROW), dtype=np.uint32)
        self._spill_path: Optional[str] = None
        self._spill_gen = -1      # generation persisted in the spill file
        self._finalizer = None
        self._row_of_slot: List[int] = []
        self._slot_of_row: Dict[int, int] = {}
        # device mirror
        self._dev = None            # jax array (cap, W) or None
        self._dev_rows = -1         # number of valid slots on device
        self._dirty: set = set()    # slots needing upload
        self._all_dirty = True
        # Seqlock generation: bumped to ODD before host words mutate and
        # back to EVEN after (both under self._lock).  Lock-free readers
        # (executor snapshot validation, plan-leaf caches) treat an odd or
        # changed value as "unstable — retry" (the reference gets this from
        # RBF page-map snapshot isolation instead, rbf/page_map.go:1).
        self.generation = 0
        # MVCC overlay: row -> [(even-gen tag, words copy)] ascending; rows
        # are preserved first-touch while snapshot pins are active so
        # pinned readers see the row as of their pin (model/snapshot.py;
        # reference analog: RBF page-map snapshots, rbf/page_map.go:1)
        self._overlay: Dict[int, list] = {}
        self._register_host()

    @contextmanager
    def _mutating(self):
        """Seqlock write section; caller must hold self._lock."""
        self.generation += 1
        try:
            yield
        finally:
            self.generation += 1

    def _cow(self, slot: int):
        """Preserve a row about to mutate for active snapshot pins
        (first-touch copy-on-write; caller holds self._lock, INSIDE the
        _mutating odd window, strictly before the row's words change —
        that ordering is what lets pinned readers verify a lock-free live
        read afterwards).  A pin still mid-capture (not .complete) with
        no entry for this fragment is preserved for conservatively: the
        writer cannot tell "absent at pin time" from "capture hasn't
        reached this fragment yet", and a spurious copy is harmless while
        a missed one breaks snapshot isolation (ADVICE r4 #2)."""
        from featurebase_tpu.model.snapshot import active_pins
        pins = active_pins(self.index)
        if not pins:
            if self._overlay:
                self._overlay.clear()
            return
        row = self._row_of_slot[slot]
        e = self.generation & ~1  # committed generation being overwritten
        tags = self._overlay.get(row)
        need = False
        for pin in pins:
            p = pin.gen_for(self.field, self.view, self.shard)
            if p is None:
                if pin.complete:
                    continue  # fragment absent at pin (reads as empty)
                p = e  # capture in flight: assume it will pin <= e
            if p > e:
                continue  # pin is newer than the state being overwritten
            if tags is not None and any(p <= t for t, _ in tags):
                continue  # an existing copy already serves this pin
            need = True
            break
        if need:
            self._overlay.setdefault(row, []).append(
                (e, self._words[slot].copy()))

    def _pinned_row(self, pin, row: int) -> np.ndarray:
        """Row words as of `pin`'s snapshot ((W,) uint32; callers must not
        mutate).  Lock-free: a live read is verified against the overlay
        after copying — any post-pin mutation batch inserted its copy
        before touching the words."""
        p = pin.gen_for(self.field, self.view, self.shard)
        if p is None:
            return np.zeros(WORDS_PER_ROW, dtype=np.uint32)

        def overlay_copy():
            for t, wcopy in self._overlay.get(row, ()):
                if t >= p:
                    return wcopy
            return None

        pre = overlay_copy()
        if pre is not None:
            return pre
        slot = self._slot_of_row.get(row)
        if slot is None:
            return np.zeros(WORDS_PER_ROW, dtype=np.uint32)
        live = self._words[slot].copy()
        post = overlay_copy()  # appeared mid-copy -> live may be torn
        return post if post is not None else live

    def pin_current(self, pin) -> bool:
        """True when the fragment is unchanged since `pin` (live reads and
        generation-keyed device caches are valid for this reader)."""
        return pin.gen_for(self.field, self.view, self.shard) == \
            self.generation

    # -- host-DRAM residency (the RBF page-cache/mmap role) -----------------

    @property
    def _words(self) -> np.ndarray:
        w = self._words_mem
        if w is None:
            return self._reload_host()
        _hostmem().touch(self._host_key())
        return w

    @_words.setter
    def _words(self, v: np.ndarray):
        self._words_mem = v

    def _host_key(self):
        return ("host", self.index, self.field, self.view, self.shard,
                id(self))

    def _register_host(self):
        """(Re-)register this fragment's host bytes with the budget
        manager; may synchronously spill other fragments."""
        from featurebase_tpu.storage.hostmem import hostmem
        w = self._words_mem
        if w is None:
            return
        ref = weakref.ref(self)

        def offload():
            f = ref()
            if f is not None:
                f._offload_host()
        hostmem().add(self._host_key(), int(w.nbytes), offload)
        if self._finalizer is None:
            # drop the LRU entry when the fragment object is collected
            # (module-level fn: the finalize must not keep self alive)
            self._finalizer = weakref.finalize(
                self, _drop_host_entry, self._host_key())

    def _offload_host(self):
        """Spill host words to disk and drop the in-memory array (called
        by HostResidency under budget pressure).  Non-blocking on the
        fragment lock: a fragment busy writing (or mid-reload, itself
        evicting others) is re-registered and skipped — blocking here
        could deadlock two fragments evicting each other."""
        from featurebase_tpu.storage.hostmem import hostmem
        if not self._lock.acquire(blocking=False):
            self._register_host()
            return
        try:
            w = self._words_mem
            if w is None:
                return
            n = self.num_rows
            if self._spill_path is None:
                import tempfile
                fd, path = tempfile.mkstemp(
                    suffix=".npy", prefix="frag_",
                    dir=hostmem().spill_dir())
                os.close(fd)
                self._spill_path = path
                weakref.finalize(self, _unlink_spill, path)
            if self._spill_gen != self.generation:
                np.save(self._spill_path, w[:n], allow_pickle=False)
                self._spill_gen = self.generation
            self._words_mem = None
            hostmem().remove(self._host_key())
        finally:
            self._lock.release()

    def _reload_host(self) -> np.ndarray:
        from featurebase_tpu.storage.hostmem import hostmem
        with self._lock:
            if self._words_mem is not None:
                return self._words_mem
            n = self.num_rows
            cap = max(_INIT_CAP, n)
            w = np.zeros((cap, WORDS_PER_ROW), dtype=np.uint32)
            if self._spill_path is not None and n:
                w[:n] = np.load(self._spill_path, allow_pickle=False)
            self._words_mem = w
            hostmem().note_reload()
            self._register_host()
            return w

    # -- host-side row management ------------------------------------------

    @property
    def num_rows(self) -> int:
        return len(self._row_of_slot)

    def row_ids(self) -> np.ndarray:
        """Sorted row ids present (may include all-zero rows after clears)."""
        return np.array(sorted(self._slot_of_row), dtype=np.uint64)

    def has_row(self, row: int) -> bool:
        return row in self._slot_of_row

    def slot_rows(self) -> List[int]:
        """Row ids in slot order — parallel to device_tile()'s leading axis."""
        return list(self._row_of_slot[: self.num_rows])

    def _ensure_slot(self, row: int) -> int:
        slot = self._slot_of_row.get(row)
        if slot is not None:
            return slot
        slot = len(self._row_of_slot)
        if slot >= self._words.shape[0]:
            new_cap = max(2 * self._words.shape[0], slot + 1)
            grown = np.zeros((new_cap, WORDS_PER_ROW), dtype=np.uint32)
            grown[: self._words.shape[0]] = self._words
            self._words = grown
            self._all_dirty = True
            self._register_host()
        self._row_of_slot.append(row)
        self._slot_of_row[row] = slot
        self._dirty.add(slot)
        return slot

    def host_row(self, row: int) -> np.ndarray:
        """Host words for a row ((W,) uint32); zeros if absent.  Under an
        active snapshot pin whose generation this fragment has moved past,
        serves the row as of the pin (MVCC overlay, model/snapshot.py)."""
        from featurebase_tpu.model.snapshot import current_pin
        pin = current_pin()
        if pin is not None:
            # always copy-then-verify under a pin — a "current" check
            # followed by a live-buffer return races with a write batch
            # starting mid-read (ADVICE r4 #1); _pinned_row's post-copy
            # overlay check is the verification
            return self._pinned_row(pin, row)
        slot = self._slot_of_row.get(row)
        if slot is None:
            return np.zeros(WORDS_PER_ROW, dtype=np.uint32)
        return self._words[slot]

    # -- bit mutation (reference fragment.setBit:337 / clearBit) -----------

    def set_bit(self, row: int, col: int) -> bool:
        """Set bit; returns True if it changed. col is column-within-shard."""
        col %= SHARD_WIDTH
        with self._lock:
            slot = self._ensure_slot(row)
            w, b = col >> 5, np.uint32(1 << (col & 31))
            old = self._words[slot, w]
            if old & b:
                return False
            with self._mutating():
                self._cow(slot)
                self._words[slot, w] = old | b
            self._dirty.add(slot)
            return True

    def clear_bit(self, row: int, col: int) -> bool:
        col %= SHARD_WIDTH
        with self._lock:
            slot = self._slot_of_row.get(row)
            if slot is None:
                return False
            w, b = col >> 5, np.uint32(1 << (col & 31))
            old = self._words[slot, w]
            if not (old & b):
                return False
            with self._mutating():
                self._cow(slot)
                self._words[slot, w] = old & ~b
            self._dirty.add(slot)
            return True

    def get_bit(self, row: int, col: int) -> bool:
        col %= SHARD_WIDTH
        from featurebase_tpu.model.snapshot import current_pin
        pin = current_pin()
        if pin is not None:
            # copy-then-verify (see host_row)
            w = self._pinned_row(pin, row)
            return bool((w[col >> 5] >> (col & 31)) & 1)
        slot = self._slot_of_row.get(row)
        if slot is None:
            return False
        return bool((self._words[slot, col >> 5] >> (col & 31)) & 1)

    # -- bulk ops (reference fragment.bulkImport:1498, importPositions:1731) -

    def merge_row_words(self, row: int, words: np.ndarray, clear: bool = False):
        """OR (or ANDNOT if clear) a dense word vector into a row."""
        with self._lock:
            if clear:
                slot = self._slot_of_row.get(row)
                if slot is None:
                    return
                with self._mutating():
                    self._cow(slot)
                    np.bitwise_and(self._words[slot], ~words,
                                   out=self._words[slot])
            else:
                slot = self._ensure_slot(row)
                with self._mutating():
                    self._cow(slot)
                    np.bitwise_or(self._words[slot], words,
                                  out=self._words[slot])
            self._dirty.add(slot)

    def write_row_words(self, row: int, words: np.ndarray):
        """Replace a row wholesale (reference Store / ClearRow+Set)."""
        with self._lock:
            slot = self._ensure_slot(row)
            with self._mutating():
                self._cow(slot)
                self._words[slot] = words
            self._dirty.add(slot)

    def clear_row(self, row: int):
        with self._lock:
            slot = self._slot_of_row.get(row)
            if slot is not None:
                with self._mutating():
                    self._cow(slot)
                    self._words[slot] = 0
                self._dirty.add(slot)

    def import_bits(self, rows: np.ndarray, cols: np.ndarray, clear: bool = False):
        """Bulk set bits given parallel (row, col-in-shard) arrays."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64) % SHARD_WIDTH
        with self._lock:
            order = np.argsort(rows, kind="stable")
            rows, cols = rows[order], cols[order]
            uniq, starts = np.unique(rows, return_index=True)
            bounds = np.append(starts, rows.size)
            with self._mutating():
                for i, r in enumerate(uniq):
                    c = cols[bounds[i]:bounds[i + 1]]
                    slot = self._ensure_slot(int(r))
                    self._cow(slot)
                    tgt = self._words[slot]
                    vals = np.uint32(1) << (c & 31).astype(np.uint32)
                    if clear:
                        # clear bits: need AND NOT of accumulated mask
                        mask = np.zeros(WORDS_PER_ROW, dtype=np.uint32)
                        np.bitwise_or.at(mask, c >> 5, vals)
                        np.bitwise_and(tgt, ~mask, out=tgt)
                    else:
                        np.bitwise_or.at(tgt, c >> 5, vals)
                    self._dirty.add(slot)

    def merge_rows_delta(self, rows, delta: np.ndarray):
        """OR a (R, W) delta tile into R rows in ONE lock/seqlock window
        (the BSI bulk-import hot path: one scatter pass builds the delta,
        one vectorized OR lands all planes; reference analog:
        fragment.importValue:1947 position batching)."""
        with self._lock:
            slots = [self._ensure_slot(int(r)) for r in rows]
            with self._mutating():
                for slot in slots:
                    self._cow(slot)
                w = self._words
                for slot, d in zip(slots, delta):
                    np.bitwise_or(w[slot], d, out=w[slot])
            self._dirty.update(slots)

    def clear_columns(self, col_mask: np.ndarray):
        """ANDNOT a dense column mask out of every row (reference Delete /
        ClearRecords paths, executor.go:9131)."""
        with self._lock:
            n = self.num_rows
            if n == 0:
                return
            with self._mutating():
                for slot in range(n):
                    self._cow(slot)
                np.bitwise_and(self._words[:n], ~col_mask[None, :],
                               out=self._words[:n])
            self._dirty.update(range(n))

    # -- device mirror ------------------------------------------------------
    # The mirror is a cache entry in the global DeviceResidency LRU (the RBF
    # page-cache role, reference rbf/db.go:45): uploads register their byte
    # size and may be evicted under HBM pressure; the host master is
    # authoritative so eviction just drops the reference.

    def _residency_key(self):
        return ("frag", self.index, self.field, self.view, self.shard,
                id(self))

    def _evict_device(self):
        """Drop the device mirror (called by DeviceResidency under memory
        pressure; in-flight queries keep their local references alive)."""
        self._dev = None
        self._dev_rows = -1
        self._all_dirty = True

    def _flush_to_device(self):
        import jax
        import jax.numpy as jnp
        from featurebase_tpu.storage.residency import residency
        n = self.num_rows
        if n == 0:
            self._dev = jnp.zeros((1, WORDS_PER_ROW), dtype=jnp.uint32)
            self._dev_rows = 0
            self._dirty.clear()
            self._all_dirty = False
            return self._dev
        if self._all_dirty or self._dev is None or self._dev.shape[0] < n:
            self._dev = jax.device_put(self._words[:n])
            residency().add(self._residency_key(), int(n) * WORDS_PER_ROW * 4,
                            self._evict_device)
        elif self._dirty:
            slots = np.array(sorted(self._dirty), dtype=np.int32)
            # pad the slot vector to a power-of-2 bucket (repeating slot 0
            # with its own row data — idempotent) so the scatter program
            # compiles once per bucket, not once per distinct dirty count
            # (point-write churn otherwise compiles endlessly)
            k = len(slots)
            cap = 1 << max(int(k - 1).bit_length(), 2)
            padded = np.full(cap, slots[0], dtype=np.int32)
            padded[:k] = slots
            self._dev = self._dev.at[padded].set(
                jax.device_put(self._words[padded]))
            residency().touch(self._residency_key())
        self._dev_rows = n
        self._dirty.clear()
        self._all_dirty = False
        return self._dev

    def device_tile(self):
        """(num_rows, W) uint32 device array of all rows (slot order).
        Under a diverged snapshot pin, builds an uncached upload of the
        pinned row states (the generation-keyed mirror belongs to live
        readers)."""
        import jax.numpy as jnp
        from featurebase_tpu.model.snapshot import current_pin
        pin = current_pin()
        from featurebase_tpu.storage.residency import residency
        host = None
        with self._lock:
            # the pin decision is made under the fragment lock: writers
            # mutate only while holding it, so pin_current here cannot be
            # invalidated before the flush/cached return below completes
            # (ADVICE r4 #1 — the unlocked check raced with write batches)
            if pin is not None and not self.pin_current(pin):
                rows = list(self._row_of_slot[: self.num_rows])
                if not rows:
                    return jnp.zeros((0, WORDS_PER_ROW), dtype=jnp.uint32)
                host = np.stack([self._pinned_row(pin, r) for r in rows])
            else:
                if self._all_dirty or self._dirty or self._dev is None or \
                        self._dev_rows != self.num_rows:
                    dev = self._flush_to_device()
                else:
                    dev = self._dev
                    residency().touch(self._residency_key())
                return (dev[: max(self.num_rows, 1)] if self.num_rows
                        else dev[:0])
        # upload of the pinned build happens outside the lock — it must
        # not block writers for the host->device transfer duration
        return jnp.asarray(host)

    def device_row(self, row: int):
        """(W,) uint32 device words for one row (zeros if absent)."""
        import jax.numpy as jnp
        slot = self._slot_of_row.get(row)
        if slot is None:
            return jnp.zeros(WORDS_PER_ROW, dtype=jnp.uint32)
        tile = self.device_tile()
        return tile[slot]

    def device_rows(self, rows) -> "tuple":
        """Gather device rows for a list of row ids; absent rows -> zeros.

        Returns (tile (len(rows), W), present mask np.ndarray bool).
        """
        import jax.numpy as jnp
        from featurebase_tpu.model.snapshot import current_pin
        pin = current_pin()
        with self._lock:  # pin decision + slot lookups atomic vs writers
            if pin is not None and not self.pin_current(pin):
                host = np.stack([self._pinned_row(pin, int(r))
                                 for r in rows])
                present = np.array([self._slot_of_row.get(int(r)) is not None
                                    for r in rows])
            else:
                host = None
                tile = self.device_tile()
                slots = np.array([self._slot_of_row.get(int(r), -1)
                                  for r in rows], dtype=np.int32)
        if host is not None:  # upload outside the lock (see device_tile)
            return jnp.asarray(host), present
        present = slots >= 0
        if tile.shape[0] == 0:
            return jnp.zeros((len(rows), WORDS_PER_ROW), dtype=jnp.uint32), present
        safe = np.where(present, slots, 0)
        gathered = tile[safe]
        mask = jnp.asarray(present)[:, None]
        return jnp.where(mask, gathered, jnp.uint32(0)), present

    # -- anti-entropy -------------------------------------------------------

    def checksum(self) -> int:
        """Content checksum over (row ids, words) — the per-fragment block
        checksum of the reference's holderSyncer (reference: holder.go:1303;
        fragment checksum blocks fragment.go Blocks/BlockData).  Cached by
        generation."""
        import zlib
        with self._lock:
            cached = getattr(self, "_cksum", None)
            if cached is not None and cached[0] == self.generation:
                return cached[1]
            n = self.num_rows
            crc = zlib.crc32(
                np.array(self._row_of_slot[:n], dtype=np.int64).tobytes())
            crc = zlib.crc32(np.ascontiguousarray(self._words[:n]).tobytes(),
                             crc)
            self._cksum = (self.generation, crc)
            return crc

    # -- persistence --------------------------------------------------------

    def to_npz_dict(self) -> dict:
        n = self.num_rows
        return {
            "rows": np.array(self._row_of_slot[:n], dtype=np.int64),
            "words": self._words[:n],
        }

    @classmethod
    def from_npz_dict(cls, index, field, view, shard, d) -> "Fragment":
        f = cls(index, field, view, shard)
        rows = d["rows"]
        words = d["words"]
        n = len(rows)
        cap = max(_INIT_CAP, n)
        f._words = np.zeros((cap, WORDS_PER_ROW), dtype=np.uint32)
        f._words[:n] = words
        f._row_of_slot = [int(r) for r in rows]
        f._slot_of_row = {int(r): i for i, r in enumerate(rows)}
        f._all_dirty = True
        f._register_host()
        return f
