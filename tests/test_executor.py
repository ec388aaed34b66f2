"""End-to-end PQL executor tests, modeled on reference executor_test.go
cases (Set/Row/Count round trip, set algebra, BSI ranges and aggregates,
TopN, GroupBy, Rows, Extract, keys)."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.executor.executor import Executor
from featurebase_tpu.executor.results import Pair, ValCount
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder, IndexOptions
from featurebase_tpu.model.row import Row, SignedRow


@pytest.fixture()
def env():
    holder = Holder()
    idx = holder.create_index("i")
    return holder, idx, Executor(holder)


def q(e, pql, index="i"):
    return e.execute(index, pql)


class TestSetRowCount:
    def test_set_row_count(self, env):
        holder, idx, e = env
        idx.create_field("f")
        assert q(e, "Set(10, f=1)") == [True]
        assert q(e, "Set(10, f=1)") == [False]  # no change
        assert q(e, "Set(20, f=1) Set(30, f=2)") == [True, True]
        (row,) = q(e, "Row(f=1)")
        np.testing.assert_array_equal(row.columns(), [10, 20])
        assert q(e, "Count(Row(f=1))") == [2]
        assert q(e, "Count(Row(f=2))") == [1]
        assert q(e, "Count(Row(f=99))") == [0]

    def test_cross_shard(self, env):
        holder, idx, e = env
        idx.create_field("f")
        cols = [5, SHARD_WIDTH + 7, 3 * SHARD_WIDTH + 1]
        for c in cols:
            q(e, f"Set({c}, f=1)")
        (row,) = q(e, "Row(f=1)")
        np.testing.assert_array_equal(row.columns(), cols)
        assert q(e, "Count(Row(f=1))") == [3]

    def test_clear(self, env):
        holder, idx, e = env
        idx.create_field("f")
        q(e, "Set(10, f=1)")
        assert q(e, "Clear(10, f=1)") == [True]
        assert q(e, "Clear(10, f=1)") == [False]
        assert q(e, "Count(Row(f=1))") == [0]

    def test_clear_row(self, env):
        holder, idx, e = env
        idx.create_field("f")
        q(e, f"Set(1, f=1) Set({SHARD_WIDTH+2}, f=1) Set(3, f=2)")
        assert q(e, "ClearRow(f=1)") == [True]
        assert q(e, "Count(Row(f=1))") == [0]
        assert q(e, "Count(Row(f=2))") == [1]

    def test_store(self, env):
        holder, idx, e = env
        idx.create_field("f")
        idx.create_field("g")
        q(e, "Set(1, f=1) Set(2, f=1) Set(3, f=1)")
        assert q(e, "Store(Row(f=1), g=7)") == [True]
        (row,) = q(e, "Row(g=7)")
        np.testing.assert_array_equal(row.columns(), [1, 2, 3])


class TestSetAlgebra:
    @pytest.fixture()
    def loaded(self, env):
        holder, idx, e = env
        idx.create_field("f")
        for c in (1, 2, 3, SHARD_WIDTH + 1):
            q(e, f"Set({c}, f=1)")
        for c in (2, 3, 4):
            q(e, f"Set({c}, f=2)")
        return e

    def test_intersect(self, loaded):
        (row,) = q(loaded, "Intersect(Row(f=1), Row(f=2))")
        np.testing.assert_array_equal(row.columns(), [2, 3])

    def test_union(self, loaded):
        (row,) = q(loaded, "Union(Row(f=1), Row(f=2))")
        np.testing.assert_array_equal(row.columns(), [1, 2, 3, 4, SHARD_WIDTH + 1])

    def test_difference(self, loaded):
        (row,) = q(loaded, "Difference(Row(f=1), Row(f=2))")
        np.testing.assert_array_equal(row.columns(), [1, SHARD_WIDTH + 1])

    def test_xor(self, loaded):
        (row,) = q(loaded, "Xor(Row(f=1), Row(f=2))")
        np.testing.assert_array_equal(row.columns(), [1, 4, SHARD_WIDTH + 1])

    def test_not(self, loaded):
        (row,) = q(loaded, "Not(Row(f=2))")
        np.testing.assert_array_equal(row.columns(), [1, SHARD_WIDTH + 1])

    def test_all(self, loaded):
        (row,) = q(loaded, "All()")
        np.testing.assert_array_equal(row.columns(),
                                      [1, 2, 3, 4, SHARD_WIDTH + 1])

    def test_const_row(self, loaded):
        (row,) = q(loaded, "Intersect(Row(f=1), ConstRow(columns=[1, 3, 9]))")
        np.testing.assert_array_equal(row.columns(), [1, 3])

    def test_shift(self, loaded):
        (row,) = q(loaded, "Shift(Row(f=2), n=2)")
        np.testing.assert_array_equal(row.columns(), [4, 5, 6])

    def test_includes_column(self, loaded):
        assert q(loaded, "IncludesColumn(Row(f=1), column=2)") == [True]
        assert q(loaded, "IncludesColumn(Row(f=1), column=4)") == [False]


class TestBSI:
    @pytest.fixture()
    def loaded(self, env):
        holder, idx, e = env
        idx.create_field("n", FieldOptions(type="int", min=-1000, max=1000))
        vals = {1: 5, 2: -10, 3: 100, 4: 0, SHARD_WIDTH + 1: 37}
        for c, v in vals.items():
            q(e, f"Set({c}, n={v})")
        return e, vals

    def test_value_roundtrip(self, env):
        holder, idx, e = env
        f = idx.create_field("n", FieldOptions(type="int", min=-1000, max=1000))
        q(e, "Set(9, n=-123)")
        assert f.value(9) == (-123, True)
        q(e, "Set(9, n=77)")
        assert f.value(9) == (77, True)
        assert f.value(10) == (0, False)

    def test_row_eq(self, loaded):
        e, vals = loaded
        (row,) = q(e, "Row(n=5)")
        np.testing.assert_array_equal(row.columns(), [1])
        (row,) = q(e, "Row(n=-10)")
        np.testing.assert_array_equal(row.columns(), [2])

    def test_row_ranges(self, loaded):
        e, vals = loaded
        (row,) = q(e, "Row(n > 0)")
        np.testing.assert_array_equal(row.columns(), [1, 3, SHARD_WIDTH + 1])
        (row,) = q(e, "Row(n <= 0)")
        np.testing.assert_array_equal(row.columns(), [2, 4])
        (row,) = q(e, "Row(0 <= n < 100)")
        np.testing.assert_array_equal(row.columns(), [1, 4, SHARD_WIDTH + 1])
        (row,) = q(e, "Row(n != null)")
        assert row.count() == 5
        (row,) = q(e, "Row(n == null)")
        assert row.count() == 0

    def test_sum_min_max(self, loaded):
        e, vals = loaded
        (vc,) = q(e, "Sum(field=n)")
        assert vc == ValCount(sum(vals.values()), 5)
        (vc,) = q(e, "Min(field=n)")
        assert vc == ValCount(-10, 1)
        (vc,) = q(e, "Max(field=n)")
        assert vc == ValCount(100, 1)

    def test_sum_filtered(self, loaded):
        e, vals = loaded
        (vc,) = q(e, "Sum(Row(n > 0), field=n)")
        assert vc == ValCount(5 + 100 + 37, 3)

    def test_distinct(self, loaded):
        e, vals = loaded
        (sr,) = q(e, "Distinct(field=n)")
        assert isinstance(sr, SignedRow)
        np.testing.assert_array_equal(sr.values(),
                                      sorted(set(vals.values())))
        assert q(e, "Count(Distinct(field=n))") == [5]

    def test_field_value(self, loaded):
        e, vals = loaded
        (vc,) = q(e, "FieldValue(field=n, column=3)")
        assert vc == ValCount(100, 1)

    def test_percentile(self, loaded):
        e, vals = loaded
        (vc,) = q(e, "Percentile(field=n, nth=50)")
        # values: -10, 0, 5, 37, 100.  The reference's bisection
        # (executor.go:1543-1575) terminates at 4 here: count(<4)=2 and
        # count(>4)=3 are both "reasonable" per its break condition, and the
        # returned pivot need not be a stored value.  We reproduce that
        # contract exactly.
        assert vc.val == 4

    def test_sort(self, loaded):
        e, vals = loaded
        (res,) = q(e, "Sort(All(), field=n)")
        assert res["columns"] == [2, 4, 1, SHARD_WIDTH + 1, 3]
        (res,) = q(e, "Sort(All(), field=n, sort-desc=true, limit=2)")
        assert res["columns"] == [3, SHARD_WIDTH + 1]


class TestDecimalTimestamp:
    def test_decimal(self, env):
        holder, idx, e = env
        idx.create_field("d", FieldOptions(type="decimal", scale=2,
                                           min=-100000, max=100000))
        q(e, "Set(1, d=1.5) Set(2, d=-2.25) Set(3, d=10)")
        (vc,) = q(e, "Sum(field=d)")
        assert vc.float_val == pytest.approx(9.25)
        (row,) = q(e, "Row(d > 1)")
        np.testing.assert_array_equal(row.columns(), [1, 3])

    def test_timestamp(self, env):
        holder, idx, e = env
        idx.create_field("ts", FieldOptions(type="timestamp", time_unit="s"))
        q(e, "Set(1, ts='2020-01-01T00:00:00Z')")
        q(e, "Set(2, ts='2021-06-15T12:30:00Z')")
        (row,) = q(e, "Row(ts > '2021-01-01T00:00:00Z')")
        np.testing.assert_array_equal(row.columns(), [2])


class TestTopN:
    def test_topn(self, env):
        holder, idx, e = env
        idx.create_field("f")
        # row 1: 3 cols, row 2: 2 cols, row 3: 1 col
        for c in (1, 2, 3):
            q(e, f"Set({c}, f=1)")
        for c in (1, 2):
            q(e, f"Set({c}, f=2)")
        q(e, "Set(1, f=3)")
        (pf,) = q(e, "TopN(f, n=2)")
        assert pf.pairs == [Pair(1, 3), Pair(2, 2)]
        (pf,) = q(e, "TopN(f)")
        assert pf.pairs == [Pair(1, 3), Pair(2, 2), Pair(3, 1)]

    def test_topn_filtered(self, env):
        holder, idx, e = env
        idx.create_field("f")
        idx.create_field("g")
        for c in (1, 2, 3):
            q(e, f"Set({c}, f=1)")
        for c in (2, 3):
            q(e, f"Set({c}, f=2)")
        q(e, "Set(2, g=1)")
        (pf,) = q(e, "TopN(f, Row(g=1), n=5)")
        assert pf.pairs == [Pair(1, 1), Pair(2, 1)]


class TestRows:
    def test_rows(self, env):
        holder, idx, e = env
        idx.create_field("f")
        q(e, "Set(1, f=3) Set(2, f=1) Set(3, f=7)")
        assert q(e, "Rows(f)") == [[1, 3, 7]]
        assert q(e, "Rows(f, limit=2)") == [[1, 3]]
        assert q(e, "Rows(f, previous=3)") == [[7]]
        assert q(e, "Rows(f, column=1)") == [[3]]
        assert q(e, "Rows(f, in=[3, 7, 99])") == [[3, 7]]


class TestGroupBy:
    def test_group_by(self, env):
        holder, idx, e = env
        idx.create_field("a")
        idx.create_field("b")
        # a=1: {1,2,3}, a=2: {4}
        for c in (1, 2, 3):
            q(e, f"Set({c}, a=1)")
        q(e, "Set(4, a=2)")
        # b=10: {1,2}, b=20: {3,4}
        for c in (1, 2):
            q(e, f"Set({c}, b=10)")
        for c in (3, 4):
            q(e, f"Set({c}, b=20)")
        (groups,) = q(e, "GroupBy(Rows(a), Rows(b))")
        got = {(tuple(fr.row_id for fr in g.group)): g.count for g in groups}
        assert got == {(1, 10): 2, (1, 20): 1, (2, 20): 1}

    def test_group_by_sum(self, env):
        holder, idx, e = env
        idx.create_field("a")
        idx.create_field("v", FieldOptions(type="int", min=0, max=1000))
        q(e, "Set(1, a=1) Set(2, a=1) Set(3, a=2)")
        q(e, "Set(1, v=10) Set(2, v=20) Set(3, v=40)")
        (groups,) = q(e, "GroupBy(Rows(a), aggregate=Sum(field=v))")
        got = {g.group[0].row_id: (g.count, g.agg) for g in groups}
        assert got == {1: (2, 30), 2: (1, 40)}

    def test_group_by_filter_limit(self, env):
        holder, idx, e = env
        idx.create_field("a")
        for c in (1, 2, 3):
            q(e, f"Set({c}, a=1)")
        q(e, "Set(4, a=2)")
        (groups,) = q(e, "GroupBy(Rows(a), filter=ConstRow(columns=[1, 4]))")
        got = {g.group[0].row_id: g.count for g in groups}
        assert got == {1: 1, 2: 1}
        (groups,) = q(e, "GroupBy(Rows(a), limit=1)")
        assert len(groups) == 1

    def test_group_by_having(self, env):
        holder, idx, e = env
        idx.create_field("a")
        for c in (1, 2, 3):
            q(e, f"Set({c}, a=1)")
        q(e, "Set(4, a=2)")
        (groups,) = q(e, "GroupBy(Rows(a), having=Condition(count > 1))")
        assert len(groups) == 1 and groups[0].group[0].row_id == 1


class TestKeys:
    def test_column_keys(self, env):
        holder, _, e = env
        idx = holder.create_index("k", IndexOptions(keys=True))
        idx.create_field("f")
        e.execute("k", 'Set("alice", f=1)')
        e.execute("k", 'Set("bob", f=1)')
        (row,) = e.execute("k", "Row(f=1)")
        assert sorted(row.keys) == ["alice", "bob"]
        assert e.execute("k", "Count(Row(f=1))") == [2]

    def test_row_keys(self, env):
        holder, _, e = env
        idx = holder.create_index("k2")
        idx.create_field("color", FieldOptions(keys=True))
        e.execute("k2", 'Set(1, color="red")')
        e.execute("k2", 'Set(2, color="red")')
        e.execute("k2", 'Set(3, color="blue")')
        (row,) = e.execute("k2", 'Row(color="red")')
        np.testing.assert_array_equal(row.columns(), [1, 2])
        (pf,) = e.execute("k2", "TopN(color)")
        assert [(p.key, p.count) for p in pf.pairs] == [("red", 2), ("blue", 1)]

    def test_missing_read_key(self, env):
        holder, _, e = env
        idx = holder.create_index("k3", IndexOptions(keys=True))
        idx.create_field("f")
        (row,) = e.execute("k3", 'Row(f=1)')
        assert row.count() == 0


class TestMutexBool:
    def test_mutex(self, env):
        holder, idx, e = env
        idx.create_field("m", FieldOptions(type="mutex"))
        q(e, "Set(1, m=1)")
        q(e, "Set(1, m=2)")  # replaces
        assert q(e, "Count(Row(m=1))") == [0]
        assert q(e, "Count(Row(m=2))") == [1]

    def test_bool(self, env):
        holder, idx, e = env
        idx.create_field("b", FieldOptions(type="bool"))
        q(e, "Set(1, b=true) Set(2, b=false)")
        (row,) = q(e, "Row(b=true)")
        np.testing.assert_array_equal(row.columns(), [1])
        q(e, "Set(1, b=false)")
        (row,) = q(e, "Row(b=false)")
        np.testing.assert_array_equal(row.columns(), [1, 2])


class TestTimeFields:
    def test_time_range_query(self, env):
        holder, idx, e = env
        idx.create_field("t", FieldOptions(type="time", time_quantum="YMD"))
        q(e, "Set(1, t=1, 2010-01-01T00:00)")
        q(e, "Set(2, t=1, 2010-06-15T00:00)")
        q(e, "Set(3, t=1, 2011-01-01T00:00)")
        (row,) = q(e, "Row(t=1)")  # standard view: all
        assert row.count() == 3
        (row,) = q(e, "Row(t=1, from='2010-01-01T00:00', to='2011-01-01T00:00')")
        np.testing.assert_array_equal(row.columns(), [1, 2])
        (row,) = q(e, "Row(t=1, from='2010-06-01T00:00', to='2012-01-01T00:00')")
        np.testing.assert_array_equal(row.columns(), [2, 3])


class TestDeleteExtract:
    def test_delete(self, env):
        holder, idx, e = env
        idx.create_field("f")
        idx.create_field("n", FieldOptions(type="int", min=0, max=100))
        q(e, "Set(1, f=1) Set(2, f=1) Set(1, n=5) Set(2, n=6)")
        assert q(e, "Delete(Row(f=1))") == [True]
        assert q(e, "Count(Row(f=1))") == [0]
        assert q(e, "Count(Row(n=6))") == [0]
        assert q(e, "Count(All())") == [0]

    def test_extract(self, env):
        holder, idx, e = env
        idx.create_field("f")
        idx.create_field("n", FieldOptions(type="int", min=0, max=100))
        q(e, "Set(1, f=1) Set(1, f=2) Set(2, f=1) Set(1, n=42) Set(2, n=7)")
        (tbl,) = q(e, "Extract(All(), Rows(f), Rows(n))")
        assert [f.name for f in tbl.fields] == ["f", "n"]
        cols = {c.column: c.rows for c in tbl.columns}
        assert cols[1] == [[1, 2], 42]
        assert cols[2] == [[1], 7]

    def test_limit(self, env):
        holder, idx, e = env
        idx.create_field("f")
        for c in (1, 2, 3, 4, 5):
            q(e, f"Set({c}, f=1)")
        (row,) = q(e, "Limit(Row(f=1), limit=2, offset=1)")
        np.testing.assert_array_equal(row.columns(), [2, 3])


class TestTopNRankCache:
    """cache_type/cache_size drive a real per-shard rank cache
    (reference: cache.go:25 rankCache; fragment.go:201 openCache)."""

    def test_cache_hit_and_invalidation(self, env):
        holder, idx, e = env
        idx.create_field("f")
        for c, r in ((1, 1), (2, 1), (3, 2)):
            q(e, f"Set({c}, f={r})")
        f = idx.field("f")
        (first,) = q(e, "TopN(f)")
        assert f._topn_cache, "unfiltered TopN must populate the cache"
        # served from cache: same result
        (second,) = q(e, "TopN(f)")
        assert [(p.id, p.count) for p in second.pairs] == \
            [(p.id, p.count) for p in first.pairs]
        # a write bumps the generation -> cache entry ignored + refreshed
        q(e, "Set(9, f=2)")
        (third,) = q(e, "TopN(f)")
        assert [(p.id, p.count) for p in third.pairs] == [(1, 2), (2, 2)]

    def test_cache_none_disables(self, env):
        holder, idx, e = env
        from featurebase_tpu.model.field import FieldOptions
        idx.create_field("nc", FieldOptions(cache_type="none"))
        q(e, "Set(1, nc=1)")
        q(e, "TopN(nc)")
        assert not idx.field("nc")._topn_cache

    def test_filtered_topn_not_cached(self, env):
        holder, idx, e = env
        idx.create_field("ff")
        q(e, "Set(1, ff=1)")
        q(e, "TopN(ff, Row(ff=1))")
        assert not idx.field("ff")._topn_cache


class TestTopNCacheIncremental:
    """Single-bit writes maintain the rank cache in place instead of
    invalidating it (reference: cache.go:130 threshold re-rank)."""

    def _env(self):
        from featurebase_tpu.model.index import Holder
        from featurebase_tpu.executor.executor import Executor
        holder = Holder()
        idx = holder.create_index("tc")
        idx.create_field("f")
        e = Executor(holder)
        return holder, idx, e

    def test_point_write_updates_cache_in_place(self):
        holder, idx, e = self._env()
        f = idx.field("f")
        for c in range(10):
            e.execute("tc", f"Set({c}, f={c % 3})")
        (before,) = e.execute("tc", "TopN(f)")  # fills the cache
        key = (0, ("standard",))
        assert key in f._topn_cache
        gens0, counts0 = f._topn_cache[key]

        e.execute("tc", "Set(100, f=1)")  # single-bit write
        # entry survived with adjusted counts + advanced generations
        assert key in f._topn_cache
        gens1, counts1 = f._topn_cache[key]
        assert gens1 != gens0
        assert counts1[1] == counts0[1] + 1

        # and the served TopN is exact, straight from the cache
        import featurebase_tpu.ops.bitwise as bw
        calls = {"n": 0}
        real = bw.popcount_rows

        def spy(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        bw.popcount_rows, real_saved = spy, real
        try:
            (topn,) = e.execute("tc", "TopN(f)")
        finally:
            bw.popcount_rows = real_saved
        got = {p.id: p.count for p in topn.pairs}
        assert got == {0: 4, 1: 4, 2: 3}
        assert calls["n"] == 0, "cache hit must not re-count on device"

    def test_bulk_import_still_invalidates(self):
        import numpy as np
        holder, idx, e = self._env()
        f = idx.field("f")
        for c in range(6):
            e.execute("tc", f"Set({c}, f=0)")
        e.execute("tc", "TopN(f)")
        key = (0, ("standard",))
        gens0, _ = f._topn_cache[key]
        f.import_bits(np.array([0, 1]), np.array([50, 51]))
        (topn,) = e.execute("tc", "TopN(f)")  # rebuilt, not stale
        got = {p.id: p.count for p in topn.pairs}
        assert got == {0: 7, 1: 1}

    def test_clear_bit_decrements(self):
        holder, idx, e = self._env()
        f = idx.field("f")
        for c in range(5):
            e.execute("tc", f"Set({c}, f=0)")
        e.execute("tc", "TopN(f)")
        e.execute("tc", "Clear(3, f=0)")
        key = (0, ("standard",))
        assert f._topn_cache[key][1][0] == 4
        (topn,) = e.execute("tc", "TopN(f)")
        assert {p.id: p.count for p in topn.pairs} == {0: 4}
