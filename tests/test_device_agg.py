"""Device-batched aggregation paths: GroupBy cross-product expansion,
device Sort, vectorized Extract, wide-BSI Distinct — verified against
numpy oracles at sizes where the old host loops would crawl (reference:
executor_test.go GroupBy/Sort/Extract cases; BenchmarkGroupBy
executor_test.go:6525)."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.executor.executor import Executor
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder


@pytest.fixture(scope="module")
def big_env():
    """~200K records over 2 shards, 3 categorical dims + int value."""
    rng = np.random.default_rng(7)
    n = 200_000
    cols = np.sort(rng.choice(2 * SHARD_WIDTH, size=n, replace=False))
    a = rng.integers(0, 5, size=n)
    b = rng.integers(0, 7, size=n)
    c = rng.integers(0, 3, size=n)
    v = rng.integers(-50, 1000, size=n)

    holder = Holder()
    idx = holder.create_index("big")
    idx.create_field("a")
    idx.create_field("b")
    idx.create_field("c")
    idx.create_field("v", FieldOptions(type="int", min=-50, max=1000))
    for name, rows in (("a", a), ("b", b), ("c", c)):
        f = idx.field(name)
        f.import_bits(rows, cols)
    idx.field("v").import_values(cols, v)
    idx.mark_exists(cols)
    return Executor(holder), dict(cols=cols, a=a, b=b, c=c, v=v)


class TestGroupByDevice:
    def test_three_dim_group_by_matches_oracle(self, big_env):
        e, d = big_env
        (groups,) = e.execute("big", "GroupBy(Rows(a), Rows(b), Rows(c))")
        got = {tuple(fr.row_id for fr in gc.group): gc.count
               for gc in groups}
        keys, counts = np.unique(
            np.stack([d["a"], d["b"], d["c"]], axis=1),
            axis=0, return_counts=True)
        want = {tuple(int(x) for x in k): int(cnt)
                for k, cnt in zip(keys, counts)}
        assert got == want

    def test_group_by_sum_matches_oracle(self, big_env):
        e, d = big_env
        (groups,) = e.execute("big",
                              "GroupBy(Rows(a), aggregate=Sum(field=v))")
        got = {gc.group[0].row_id: (gc.count, gc.agg) for gc in groups}
        want = {}
        for av in np.unique(d["a"]):
            sel = d["a"] == av
            want[int(av)] = (int(sel.sum()), int(d["v"][sel].sum()))
        assert got == want

    def test_group_by_rows_in_filter(self, big_env):
        e, d = big_env
        (groups,) = e.execute("big", "GroupBy(Rows(a, in=[1, 3]), Rows(b))")
        got = {tuple(fr.row_id for fr in gc.group): gc.count
               for gc in groups}
        sel = np.isin(d["a"], [1, 3])
        keys, counts = np.unique(
            np.stack([d["a"][sel], d["b"][sel]], axis=1),
            axis=0, return_counts=True)
        want = {tuple(int(x) for x in k): int(cnt)
                for k, cnt in zip(keys, counts)}
        assert got == want

    def test_group_by_rows_like_filter(self):
        """Rows(f, like=...) inside GroupBy must restrict the grouped rows
        (reference: executeRows BitmapRowsFilter stack, executor.go:4077;
        previously silently ignored)."""
        holder = Holder()
        idx = holder.create_index("i")
        idx.create_field("f", FieldOptions(keys=True))
        e = Executor(holder)
        e.execute("i", 'Set(1, f="apple")')
        e.execute("i", 'Set(2, f="apricot")')
        e.execute("i", 'Set(3, f="banana")')
        (groups,) = e.execute("i", 'GroupBy(Rows(f, like="ap%"))')
        keys = sorted(gc.group[0].row_key for gc in groups)
        assert keys == ["apple", "apricot"]


class TestSortDevice:
    def test_sort_parity_with_numpy(self, big_env):
        e, d = big_env
        (res,) = e.execute("big", "Sort(All(), field=v)")
        order = np.lexsort((d["cols"], d["v"]))
        assert res["columns"] == [int(c) for c in d["cols"][order]]
        assert res["values"] == [int(x) for x in d["v"][order]]

    def test_sort_desc_limit_offset(self, big_env):
        e, d = big_env
        (res,) = e.execute("big",
                           "Sort(All(), field=v, limit=100, offset=5, "
                           "sort-desc=true)")
        order = np.lexsort((d["cols"], -d["v"]))
        want_cols = [int(c) for c in d["cols"][order][5:105]]
        assert res["columns"] == want_cols

    def test_sort_filtered(self, big_env):
        e, d = big_env
        (res,) = e.execute("big", "Sort(Row(a=2), field=v, limit=10)")
        sel = d["a"] == 2
        order = np.lexsort((d["cols"][sel], d["v"][sel]))
        assert res["columns"] == [int(c) for c in d["cols"][sel][order][:10]]


class TestWideBSI:
    @pytest.fixture()
    def wide(self):
        holder = Holder()
        idx = holder.create_index("w")
        idx.create_field("huge", FieldOptions(type="int",
                                              min=-(2 ** 40), max=2 ** 40))
        e = Executor(holder)
        vals = [2 ** 39, -(2 ** 38), 7, 2 ** 39, 0]
        cols = [1, 2, 3, SHARD_WIDTH + 4, 5]
        idx.field("huge").import_values(np.array(cols), vals)
        idx.mark_exists(np.array(cols))
        return e, cols, vals

    def test_distinct_wide_field(self, wide):
        e, cols, vals = wide
        (res,) = e.execute("w", "Distinct(field=huge)")
        got = sorted(int(v) for v in res.values())
        assert got == sorted(set(vals))

    def test_sort_wide_field(self, wide):
        e, cols, vals = wide
        (res,) = e.execute("w", "Sort(All(), field=huge)")
        order = np.lexsort((np.array(cols), np.array(vals)))
        assert res["columns"] == [int(np.array(cols)[i]) for i in order]
        assert res["values"] == [int(np.array(vals)[i]) for i in order]

    def test_extract_wide_field(self, wide):
        e, cols, vals = wide
        (tbl,) = e.execute("w", "Extract(All(), Rows(huge))")
        got = {c.column: c.rows[0] for c in tbl.columns}
        assert got == {c: v for c, v in zip(cols, vals)}


class TestExtractDevice:
    def test_extract_large_matches_oracle(self, big_env):
        e, d = big_env
        (tbl,) = e.execute(
            "big", "Extract(Row(c=1), Rows(a), Rows(v))")
        sel = d["c"] == 1
        want_cols = d["cols"][sel]
        assert [c.column for c in tbl.columns] == [int(x) for x in want_cols]
        for crec, av, vv in zip(tbl.columns, d["a"][sel], d["v"][sel]):
            assert crec.rows[0] == [int(av)]
            assert crec.rows[1] == int(vv)
