"""Snapshot-consistent reads (the Qcx / RBF-MVCC role).

The reference pins every read Tx to an RBF page-map snapshot (reference:
rbf/db.go:45, txfactory.go:84 Qcx).  The TPU engine pins reads to an MVCC
row-overlay snapshot (model/snapshot.py): writers preserve rows
first-touch while pins are active, readers never retry and never freeze
writers.  These tests assert the observable contract: a multi-call read
query never sees a torn state across concurrent writers, and the pinned
state is exactly the committed state at pin time.
"""
import threading
import time

import numpy as np
import pytest

from featurebase_tpu.executor.executor import Executor
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder
from featurebase_tpu.utils.rwlock import ShardedGate


def make_env():
    holder = Holder()
    idx = holder.create_index("snap")
    idx.create_field("f")
    e = Executor(holder)
    return holder, idx, e


class TestShardedGate:
    def test_shared_concurrent(self):
        g = ShardedGate()
        order = []
        with g.shared():
            with g.shared():     # re-entrant via nesting two shared holds
                order.append("both")
        assert order == ["both"]

    def test_exclusive_blocks_shared(self):
        g = ShardedGate()
        got = []

        def writer():
            with g.shared():
                got.append("w")

        with g.exclusive():
            t = threading.Thread(target=writer)
            t.start()
            time.sleep(0.05)
            assert got == []     # writer blocked while exclusive held
        t.join(timeout=2)
        assert got == ["w"]

    def test_exclusive_waits_for_shared(self):
        g = ShardedGate()
        release = threading.Event()
        entered = threading.Event()

        def holder_fn():
            with g.shared():
                entered.set()
                release.wait(2)

        t = threading.Thread(target=holder_fn)
        t.start()
        entered.wait(2)
        acquired = []

        def excl():
            with g.exclusive():
                acquired.append(True)

        t2 = threading.Thread(target=excl)
        t2.start()
        time.sleep(0.05)
        assert acquired == []    # exclusive waits on shared holder
        release.set()
        t2.join(timeout=2)
        t.join(timeout=2)
        assert acquired == [True]


class TestSnapshotReads:
    def test_pinned_read_sees_snapshot_not_racing_write(self):
        """A write landing after the pin is invisible to the pinned read
        (MVCC overlay) but visible to the next read."""
        from featurebase_tpu.model import snapshot
        from featurebase_tpu.pql.parser import parse as pql_parse
        holder, idx, e = make_env()
        e.execute("snap", "Set(1, f=1)")
        pin = snapshot.pin_index(idx)
        try:
            # racing write lands AFTER the pin
            e.execute("snap", "Set(2, f=1)")
            call = pql_parse("Count(Row(f=1))").calls[0]
            with snapshot.pinned(pin):
                count = e._execute_call(idx, call, None)
            assert count == 1      # pinned state
        finally:
            snapshot.release(pin)
        (count,) = e.execute("snap", "Count(Row(f=1))")
        assert count == 2          # live state

    def test_overlay_cleared_after_pins_release(self):
        """Writers GC the overlay once no pins are active."""
        from featurebase_tpu.model import snapshot
        holder, idx, e = make_env()
        e.execute("snap", "Set(1, f=1)")
        pin = snapshot.pin_index(idx)
        e.execute("snap", "Set(2, f=1)")   # forces a COW copy
        frag = idx.field("f").view("standard").fragment(0)
        assert frag._overlay, "write under a pin must preserve the row"
        snapshot.release(pin)
        e.execute("snap", "Set(3, f=1)")   # next write GCs the overlay
        assert not frag._overlay

    def test_no_torn_reads_under_concurrent_writes(self):
        """Two Counts of the same row inside one read query must agree even
        while a writer flips the whole row between states (the reference
        gets this from RBF snapshot isolation; executor_test-style race)."""
        holder, idx, e = make_env()
        cols_a = np.arange(0, 64, dtype=np.int64)
        cols_b = np.arange(1000, 1064, dtype=np.int64)
        f = idx.field("f")
        f.import_bits(np.zeros(64, dtype=np.int64), cols_a)
        stop = threading.Event()

        def writer():
            flip = False
            while not stop.is_set():
                # alternate the row between two disjoint 64-bit states;
                # each import holds the gate shared like the API paths do
                rows = np.zeros(64, dtype=np.int64)
                if flip:
                    with idx.mutate_gate.shared():
                        f.import_bits(rows, cols_a)
                    with idx.mutate_gate.shared():
                        f.import_bits(rows, cols_b, clear=True)
                else:
                    with idx.mutate_gate.shared():
                        f.import_bits(rows, cols_b)
                    with idx.mutate_gate.shared():
                        f.import_bits(rows, cols_a, clear=True)
                flip = not flip

        t = threading.Thread(target=writer)
        t.start()
        try:
            for _ in range(10):
                c1, c2 = e.execute(
                    "snap", "Count(Row(f=0)) Count(Row(f=0))")
                assert c1 == c2, "torn read: counts from one snapshot differ"
                # consistent snapshots land on {a}, {b}, or {a,b} mid-flip
                assert c1 in (64, 128)
        finally:
            stop.set()
            t.join(timeout=5)

    def test_write_query_runs_under_shared_gate(self):
        """A write query must hold the gate shared: exclusive acquisition
        from another thread waits until it finishes."""
        holder, idx, e = make_env()
        in_write = threading.Event()
        proceed = threading.Event()
        real_set = idx.field("f").set_bit

        def slow_set(row, col, **kw):
            in_write.set()
            proceed.wait(2)
            return real_set(row, col, **kw)

        idx.field("f").set_bit = slow_set
        t = threading.Thread(
            target=lambda: e.execute("snap", "Set(1, f=1)"))
        t.start()
        in_write.wait(2)
        acquired = []

        def excl():
            with idx.mutate_gate.exclusive():
                acquired.append(True)

        t2 = threading.Thread(target=excl)
        t2.start()
        time.sleep(0.05)
        assert acquired == []
        proceed.set()
        t.join(timeout=2)
        t2.join(timeout=2)
        assert acquired == [True]

    def test_generations_cover_all_fragments(self):
        holder, idx, e = make_env()
        e.execute("snap", "Set(1, f=1)")
        e.execute("snap", f"Set({2**20 + 5}, f=2)")
        gens = idx.fragment_generations()
        # f has fragments in shards 0 and 1, plus the existence field
        keys = {(f, s) for (f, v, s) in gens}
        assert ("f", 0) in keys and ("f", 1) in keys


class TestLeafGranularValidation:
    def test_unrelated_field_writes_cost_nothing(self):
        """A write on field g while a pin reads field f neither perturbs
        the read nor forces f's fragments to preserve anything."""
        from featurebase_tpu.model import snapshot
        from featurebase_tpu.pql.parser import parse as pql_parse
        holder, idx, e = make_env()
        idx.create_field("g")
        e.execute("snap", "Set(1, f=1)")
        e.execute("snap", "Set(1, g=1)")
        pin = snapshot.pin_index(idx)
        try:
            e.execute("snap", "Set(2, g=1)")   # unrelated write under pin
            call = pql_parse("Count(Row(f=1))").calls[0]
            with snapshot.pinned(pin):
                count = e._execute_call(idx, call, None)
            assert count == 1
            f_frag = idx.field("f").view("standard").fragment(0)
            assert not f_frag._overlay   # f untouched: no copies made
        finally:
            snapshot.release(pin)

    def test_pin_waits_out_inflight_write(self):
        """pin_index captures only committed (even) generations: an odd
        in-flight seqlock window is waited out, never pinned."""
        from featurebase_tpu.model import snapshot
        holder, idx, e = make_env()
        e.execute("snap", "Set(1, f=1)")
        frag = idx.field("f").view("standard").fragment(0)
        frag.generation |= 1     # simulate an in-flight write batch

        def finish():
            time.sleep(0.05)
            frag.generation += 1  # commit

        t = threading.Thread(target=finish)
        t.start()
        pin = snapshot.pin_index(idx)
        t.join(timeout=2)
        try:
            for g in pin.gens.values():
                assert g % 2 == 0
        finally:
            snapshot.release(pin)

    def test_seqlock_generation_is_even_when_quiescent(self):
        holder, idx, e = make_env()
        f = idx.field("f")
        f.set_bit(1, 5)
        f.import_bits(np.array([1, 2]), np.array([7, 9]))
        f.clear_bit(1, 5)
        for v in idx.fragment_generations().values():
            assert v % 2 == 0

    def test_restore_carries_generation_forward(self, tmp_path):
        """A restored fragment must not reuse a generation an optimistic
        reader may have already observed (advisor finding r2)."""
        from featurebase_tpu.server.api import API
        holder, idx, e = make_env()
        e.execute("snap", "Set(1, f=1)")
        api = API.__new__(API)
        api.holder = holder
        api.cluster = None
        snap_bytes = API.shard_snapshot_bytes(api, "snap", 0)
        gen_before = idx.field("f").view("standard").fragment(0).generation
        API.restore_shard(api, "snap", 0, snap_bytes)
        frag = idx.field("f").view("standard").fragment(0)
        assert frag.generation == gen_before + 2
        assert frag.generation % 2 == 0
        (count,) = e.execute("snap", "Count(Row(f=1))")
        assert count == 1
