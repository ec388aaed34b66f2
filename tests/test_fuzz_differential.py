"""Randomized differential testing: the engine vs a numpy oracle.

The reference hardens its bitmap kernels with a randomized fuzzer and
paranoia builds (reference: roaring/fuzzer.go:311, fuzz_test.go,
roaring_paranoia.go); here the whole query engine is the unit under test —
every seed generates a dataset and a battery of PQL queries whose results
are recomputed independently with numpy set/array algebra.

Shapes are held constant across seeds so XLA kernels compile once.
Set FEATUREBASE_TPU_FUZZ_SEEDS to widen the sweep in a long CI run.
"""
import functools
import os

import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.executor.executor import Executor
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder

N_SEEDS = int(os.environ.get("FEATUREBASE_TPU_FUZZ_SEEDS", "12"))
N_RECORDS = 2000
N_SHARDS = 3
F_ROWS = 6      # rows in set field f
G_ROWS = 4      # rows in set field g
V_LO, V_HI = -120, 500


@functools.lru_cache(maxsize=4)
def dataset(seed: int):
    rng = np.random.default_rng(seed)
    cols = np.sort(rng.choice(N_SHARDS * SHARD_WIDTH, size=N_RECORDS,
                              replace=False))
    f = rng.integers(0, F_ROWS, size=N_RECORDS)
    g = rng.integers(0, G_ROWS, size=N_RECORDS)
    v = rng.integers(V_LO, V_HI, size=N_RECORDS)
    # f is multi-valued for ~20% of records (set semantics)
    extra_mask = rng.random(N_RECORDS) < 0.2
    f2 = rng.integers(0, F_ROWS, size=N_RECORDS)

    holder = Holder()
    idx = holder.create_index("fz")
    idx.create_field("f")
    idx.create_field("g")
    idx.create_field("v", FieldOptions(type="int", min=V_LO, max=V_HI))
    idx.field("f").import_bits(f, cols)
    idx.field("f").import_bits(f2[extra_mask], cols[extra_mask])
    idx.field("g").import_bits(g, cols)
    idx.field("v").import_values(cols, v)
    idx.mark_exists(cols)
    e = Executor(holder)

    member = np.zeros((F_ROWS, N_RECORDS), dtype=bool)
    member[f, np.arange(N_RECORDS)] = True
    member[f2[extra_mask], np.nonzero(extra_mask)[0]] = True
    gmember = np.zeros((G_ROWS, N_RECORDS), dtype=bool)
    gmember[g, np.arange(N_RECORDS)] = True
    return e, dict(cols=cols, member=member, gmember=gmember, v=v)


def cols_of(d, mask) -> list:
    return [int(c) for c in d["cols"][mask]]


SEEDS = list(range(N_SEEDS))


@pytest.mark.parametrize("seed", SEEDS)
class TestDifferential:
    def test_row_and_set_algebra(self, seed):
        e, d = dataset(seed)
        rng = np.random.default_rng(seed + 1000)
        a, b, c = rng.integers(0, F_ROWS, size=3)
        m = d["member"]
        (row,) = e.execute("fz", f"Row(f={a})")
        assert list(row.columns()) == cols_of(d, m[a])
        (row,) = e.execute("fz", f"Union(Row(f={a}), Row(f={b}))")
        assert list(row.columns()) == cols_of(d, m[a] | m[b])
        (row,) = e.execute("fz",
                           f"Intersect(Row(f={a}), Row(f={b}), Row(f={c}))")
        assert list(row.columns()) == cols_of(d, m[a] & m[b] & m[c])
        (row,) = e.execute("fz", f"Difference(Row(f={a}), Row(f={b}))")
        assert list(row.columns()) == cols_of(d, m[a] & ~m[b])
        (row,) = e.execute("fz", f"Xor(Row(f={a}), Row(f={b}))")
        assert list(row.columns()) == cols_of(d, m[a] ^ m[b])
        (row,) = e.execute("fz", f"Not(Row(f={a}))")
        assert list(row.columns()) == cols_of(d, ~m[a])

    def test_counts(self, seed):
        e, d = dataset(seed)
        rng = np.random.default_rng(seed + 2000)
        a, b = rng.integers(0, F_ROWS, size=2)
        m = d["member"]
        assert e.execute("fz", f"Count(Row(f={a}))") == [int(m[a].sum())]
        assert e.execute(
            "fz", f"Count(Union(Row(f={a}), Row(f={b})))") == \
            [int((m[a] | m[b]).sum())]
        assert e.execute("fz", "Count(All())") == [N_RECORDS]

    def test_bsi_ranges(self, seed):
        e, d = dataset(seed)
        rng = np.random.default_rng(seed + 3000)
        v = d["v"]
        for _ in range(4):
            k = int(rng.integers(V_LO - 10, V_HI + 10))
            op, npop = rng.choice([("<", np.less), ("<=", np.less_equal),
                                   (">", np.greater),
                                   (">=", np.greater_equal),
                                   ("==", np.equal), ("!=", np.not_equal)])
            (row,) = e.execute("fz", f"Row(v {op} {k})")
            assert list(row.columns()) == cols_of(d, npop(v, k)), (op, k)
        lo = int(rng.integers(V_LO, 0))
        hi = int(rng.integers(1, V_HI))
        (row,) = e.execute("fz", f"Row({lo} <= v <= {hi})")
        assert list(row.columns()) == cols_of(d, (v >= lo) & (v <= hi))

    def test_aggregates(self, seed):
        e, d = dataset(seed)
        rng = np.random.default_rng(seed + 4000)
        a = int(rng.integers(0, F_ROWS))
        m, v = d["member"], d["v"]
        (vc,) = e.execute("fz", "Sum(field=v)")
        assert (vc.val, vc.count) == (int(v.sum()), N_RECORDS)
        (vc,) = e.execute("fz", f"Sum(Row(f={a}), field=v)")
        assert (vc.val, vc.count) == (int(v[m[a]].sum()), int(m[a].sum()))
        (vc,) = e.execute("fz", "Min(field=v)")
        assert (vc.val, vc.count) == (int(v.min()),
                                      int((v == v.min()).sum()))
        (vc,) = e.execute("fz", "Max(field=v)")
        assert (vc.val, vc.count) == (int(v.max()),
                                      int((v == v.max()).sum()))

    def test_topn_and_distinct(self, seed):
        e, d = dataset(seed)
        m, v = d["member"], d["v"]
        (pf,) = e.execute("fz", "TopN(f)")
        want = sorted(((int(m[r].sum()), int(r)) for r in range(F_ROWS)
                       if m[r].any()), key=lambda t: (-t[0], t[1]))
        assert [(p.count, p.id) for p in pf.pairs] == want
        (sr,) = e.execute("fz", "Distinct(field=v)")
        assert sorted(int(x) for x in sr.values()) == \
            sorted(int(x) for x in np.unique(v))
        assert e.execute("fz", "Count(Distinct(field=v))") == \
            [len(np.unique(v))]

    def test_group_by(self, seed):
        e, d = dataset(seed)
        m, gm, v = d["member"], d["gmember"], d["v"]
        (groups,) = e.execute("fz", "GroupBy(Rows(f), Rows(g))")
        got = {tuple(fr.row_id for fr in gc.group): gc.count
               for gc in groups}
        want = {}
        for a in range(F_ROWS):
            for b in range(G_ROWS):
                c = int((m[a] & gm[b]).sum())
                if c:
                    want[(a, b)] = c
        assert got == want
        (groups,) = e.execute("fz",
                              "GroupBy(Rows(g), aggregate=Sum(field=v))")
        got_s = {gc.group[0].row_id: (gc.count, gc.agg) for gc in groups}
        want_s = {b: (int(gm[b].sum()), int(v[gm[b]].sum()))
                  for b in range(G_ROWS) if gm[b].any()}
        assert got_s == want_s

    def test_sort_and_extract(self, seed):
        e, d = dataset(seed)
        rng = np.random.default_rng(seed + 5000)
        a = int(rng.integers(0, F_ROWS))
        m, v, cols = d["member"], d["v"], d["cols"]
        (res,) = e.execute("fz", f"Sort(Row(f={a}), field=v, limit=20)")
        sel = m[a]
        order = np.lexsort((cols[sel], v[sel]))
        assert res["columns"] == [int(c) for c in cols[sel][order][:20]]
        assert res["values"] == [int(x) for x in v[sel][order][:20]]
        (tbl,) = e.execute("fz", f"Extract(Row(f={a}), Rows(v))")
        got_vals = [c.rows[0] for c in tbl.columns]
        assert got_vals == [int(x) for x in v[sel]]


class TestPercentileDifferential:
    """The device while_loop bisection must match the host loop (and the
    reference's arithmetic, executor.go:1310) for every nth and seed."""

    @pytest.mark.parametrize("seed", range(min(N_SEEDS, 6)))
    def test_device_vs_host_bisection(self, seed, monkeypatch):
        e, d = dataset(seed)
        rng = np.random.default_rng(seed + 7000)
        nths = [0, 50, 90, 100] + [float(rng.integers(1, 100))
                                   for _ in range(3)]
        device_results = []
        for nth in nths:
            (vc,) = e.execute("fz", f"Percentile(field=v, nth={nth})")
            device_results.append((vc.val, vc.count))
        # force the host bisection: an unplannable filter disables every
        # stacked fast path (percentile, min/max) without touching schema
        monkeypatch.setattr(type(e), "_mesh_filter",
                            lambda self, index, call, shards: None)
        for nth, dev in zip(nths, device_results):
            (vc,) = e.execute("fz", f"Percentile(field=v, nth={nth})")
            assert (vc.val, vc.count) == dev, nth
