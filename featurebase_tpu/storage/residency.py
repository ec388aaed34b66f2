"""Device (HBM) residency manager: LRU eviction under a byte budget.

Plays the RBF page-cache role for the TPU tile store (reference:
rbf/db.go:45 — RBF keeps an 8KB-paged cache of roaring containers;
bufferpool/bufferpool.go slotted-page frames with LRU replacement).  Here
the cached unit is a whole device mirror — a fragment's (rows, W) tile or a
plan executor's stacked leaf — with host DRAM as the backing store: the
host master is always authoritative, so eviction is free (drop the device
reference) and a miss is one async device_put on next use.

Uploads are asynchronous (JAX dispatch), so re-materializing the next
shard's tile overlaps with the current computation — the double-buffered
host->HBM prefetch of SURVEY §7.

Budget: FEATUREBASE_TPU_HBM_BUDGET env (bytes), or a default that keeps
headroom for intermediates.  A single entry larger than the whole budget is
allowed to run (the query would otherwise be impossible); everything else
is evicted around it.
"""
from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Callable, Optional

_DEFAULT_BUDGET = 8 << 30  # conservative v5e default (16GB HBM, half for data)


class DeviceResidency:
    """Thread-safe LRU of device-resident cache entries.

    Entries register with (key, nbytes, evict_fn); evict_fn drops the
    owner's device reference (it must NOT take long-held locks — in-flight
    arrays stay alive through local references until their queries finish).
    """

    def __init__(self, budget: Optional[int] = None):
        env = os.environ.get("FEATUREBASE_TPU_HBM_BUDGET")
        self.budget = budget if budget is not None else (
            int(env) if env else _DEFAULT_BUDGET)
        self._lock = threading.Lock()
        self._entries: "OrderedDict[object, tuple]" = OrderedDict()
        self.bytes = 0
        self.evictions = 0
        # thrash = an evicted entry re-registered soon after (ping-pong
        # between over-budget working sets); exposed so operators see it
        self.thrash = 0
        self._recently_evicted: "OrderedDict[object, None]" = OrderedDict()

    def set_budget(self, budget: int):
        with self._lock:
            self.budget = budget
        self._shrink(protect=None)

    def add(self, key, nbytes: int, evict_fn: Callable[[], None]):
        """Register (or refresh) a device-resident entry, then evict LRU
        entries until the budget holds (never the entry just added)."""
        with self._lock:
            if key in self._recently_evicted:
                self._recently_evicted.pop(key, None)
                self.thrash += 1
            old = self._entries.pop(key, None)
            if old is not None:
                self.bytes -= old[0]
            self._entries[key] = (nbytes, evict_fn)
            self.bytes += nbytes
        self._shrink(protect=key)

    def touch(self, key):
        with self._lock:
            if key in self._entries:
                self._entries.move_to_end(key)

    def remove(self, key):
        with self._lock:
            old = self._entries.pop(key, None)
            if old is not None:
                self.bytes -= old[0]

    def _shrink(self, protect):
        while True:
            with self._lock:
                if self.bytes <= self.budget:
                    return
                victim = None
                for k in self._entries:
                    if k != protect:
                        victim = k
                        break
                if victim is None:
                    return  # only the protected entry remains
                nbytes, evict_fn = self._entries.pop(victim)
                self.bytes -= nbytes
                self.evictions += 1
                self._recently_evicted[victim] = None
                while len(self._recently_evicted) > 256:
                    self._recently_evicted.popitem(last=False)
            evict_fn()  # outside the lock: owner clears its reference

    def stats(self) -> dict:
        with self._lock:
            return {"bytes": self.bytes, "budget": self.budget,
                    "entries": len(self._entries),
                    "evictions": self.evictions, "thrash": self.thrash,
                    "largest": max((n for n, _ in self._entries.values()),
                                   default=0)}


_global: Optional[DeviceResidency] = None
_global_lock = threading.Lock()


def residency() -> DeviceResidency:
    global _global
    with _global_lock:
        if _global is None:
            _global = DeviceResidency()
        return _global


def reset(budget: Optional[int] = None) -> DeviceResidency:
    """Replace the global manager (tests)."""
    global _global
    with _global_lock:
        _global = DeviceResidency(budget)
        return _global
