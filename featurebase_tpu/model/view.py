"""View: named bitmap namespace within a field, holding one fragment per shard.

Mirrors reference view.go:36 (view struct, CreateFragmentIfNotExists:333).
View names: "standard", "bsig_<field>" for BSI data, and time-quantum views
"standard_YYYY[MM[DD[HH]]]" (reference view.go:25-33).
"""
from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Dict, List

from featurebase_tpu.model.fragment import Fragment

VIEW_STANDARD = "standard"
VIEW_EXISTENCE = "existence"

# Leaf-touch recording: while a sink is installed on this thread, every
# fragment lookup records its (field, view, shard) key.  The executor's
# snapshot validation uses this to re-check only the leaves a read query
# actually touched, so writes to unrelated fields never force a retry
# (reference: Qcx write scopes are per-(index,shard), querycontext/doc.go).
_touch = threading.local()


@contextmanager
def record_touches(sink: set):
    prev = getattr(_touch, "sink", None)
    _touch.sink = sink
    try:
        yield
    finally:
        _touch.sink = prev


def view_bsi_group(field_name: str) -> str:
    return f"bsig_{field_name}"


class View:
    def __init__(self, index: str, field: str, name: str):
        self.index = index
        self.field = field
        self.name = name
        self._lock = threading.RLock()
        self.fragments: Dict[int, Fragment] = {}

    def fragment(self, shard: int) -> Fragment | None:
        sink = getattr(_touch, "sink", None)
        if sink is not None:
            # record misses too: a fragment created by a concurrent write
            # mid-read flips -1 -> gen in the validation map
            sink.add((self.field, self.name, shard))
        return self.fragments.get(shard)

    def create_fragment_if_not_exists(self, shard: int) -> Fragment:
        with self._lock:
            f = self.fragments.get(shard)
            if f is None:
                f = Fragment(self.index, self.field, self.name, shard)
                self.fragments[shard] = f
            return f

    def available_shards(self) -> List[int]:
        return sorted(self.fragments)
