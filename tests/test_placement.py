"""Owner-placed host masters + shard handoff (parallel/placement.py).

Reference: each computer loads only directive-assigned shards
(api_directive.go:559 loadShard, dax/directive.go:8); shard placement is
FNV partition -> jump hash (disco/snapshot.go:64-135).  The multi-process
end-to-end lives in tests/test_multihost.py (gloo); these cover the policy
math, write gating, and ownership handoff in one process.
"""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.executor.executor import Executor
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder
from featurebase_tpu.parallel import placement


@pytest.fixture(autouse=True)
def _clear_policy():
    yield
    placement.clear()


def build(n=4000, shards=16, with_policy=None):
    if with_policy is not None:
        placement.configure(*with_policy)
    holder = Holder()
    idx = holder.create_index("pl")
    idx.create_field("f")
    idx.create_field("v", FieldOptions(type="int", min=0, max=1000))
    rng = np.random.default_rng(3)
    cols = np.sort(rng.choice(shards * SHARD_WIDTH, size=n, replace=False))
    fr = rng.integers(0, 4, size=n)
    vv = rng.integers(0, 1000, size=n)
    idx.field("f").import_bits(fr, cols)
    idx.field("v").import_values(cols, vv)
    idx.mark_exists(cols)
    return holder, idx, (cols, fr, vv)


class TestPolicy:
    def test_owner_deterministic_and_stable(self):
        placement.configure(4, 0)
        a = [placement.owner("i", s) for s in range(64)]
        b = [placement.owner("i", s) for s in range(64)]
        assert a == b
        assert set(a) <= set(range(4))
        # growing the process count moves only a subset (jump-hash
        # monotonicity: a shard moves only TO the new process)
        moved = [s for s in range(64)
                 if placement.owner("i", s, 4) != placement.owner("i", s, 5)]
        assert 0 < len(moved) < 40
        for s in moved:
            assert placement.owner("i", s, 5) == 4

    def test_layout_alignment(self):
        placement.configure(2, 0)
        shards = list(range(10))
        lay = placement.layout("i", shards, n_devices=8)
        assert len(lay) % 8 == 0
        real = [s for s in lay if s >= 0]
        assert sorted(real) == shards
        # each process's owned shards occupy its contiguous half
        half = len(lay) // 2
        for pos, s in enumerate(lay):
            if s >= 0:
                assert placement.owner("i", s) == (0 if pos < half else 1)


class TestWriteGating:
    def test_host_storage_scoped_to_owned(self):
        holder, idx, (cols, fr, vv) = build(with_policy=(2, 0))
        owned = {s for s in range(16) if placement.owns("pl", s)}
        held = {sh for f in idx.fields.values()
                for v in f.views.values() for sh in v.fragments}
        assert held and held <= owned
        # global shard set + candidate rows stay agreed via metadata
        assert set(idx.available_shards()) == set(range(16))
        assert placement.active()
        assert idx.field("f").meta_rows(("standard",)) == {0, 1, 2, 3}

    def test_single_process_results_cover_owned_data_only(self):
        """With a policy active, a plain executor sees exactly the owned
        share — the global answer comes from the mesh/cluster layer."""
        holder, idx, (cols, fr, vv) = build(with_policy=(2, 1))
        e = Executor(holder)
        (count,) = e.execute("pl", "Count(Row(f=1))")
        owned_mask = np.array([placement.owns("pl", c >> 20) for c in cols])
        assert count == int(((fr == 1) & owned_mask).sum())


class TestHandoff:
    def test_handoff_moves_host_fragments(self):
        # source: a process that owns everything (no policy) — plays the
        # peer serving shard snapshots
        src_holder, src_idx, (cols, fr, vv) = build()
        from featurebase_tpu.server.api import API
        src_api = API.__new__(API)
        src_api.holder = src_holder
        src_api.cluster = None

        # target: process 0 of 2 — owns only its share
        holder, idx, _ = build(with_policy=(2, 0))
        held_before = {sh for v in idx.field("f").views.values()
                       for sh in v.fragments}

        # process count 2 -> 3: load arriving shards from the peer, drop
        # departing ones (reference: ApplyDirective diff,
        # api_directive.go:144)
        placement.configure(3, 0)
        res = placement.handoff(
            holder,
            lambda index, shard: API.shard_snapshot_bytes(
                src_api, index, shard),
            old_n=2, new_n=3)
        held_after = {sh for v in idx.field("f").views.values()
                      for sh in v.fragments}
        owned_now = {s for s in range(16) if placement.owns("pl", s)}
        assert held_after <= owned_now
        for (_ix, sh) in res["loaded"]:
            assert sh in held_after and sh not in held_before
        for (_ix, sh) in res["dropped"]:
            assert sh not in held_after and sh in held_before
        assert res["loaded"] or res["dropped"]

        # data for every now-owned shard is present and exact
        e = Executor(holder)
        (count,) = e.execute("pl", "Count(Row(f=1))")
        owned_mask = np.array([placement.owns("pl", c >> 20) for c in cols])
        assert count == int(((fr == 1) & owned_mask).sum())
        # departed shards stay known (the metadata keeps the global view)
        assert set(idx.available_shards()) == set(range(16))
