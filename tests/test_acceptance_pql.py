"""Table-driven PQL acceptance corpus.

Cases translated from the reference's executor test tables (reference:
executor_test.go — TestExecutor_Execute_{ConstRow,Difference,Intersect,
Union,Xor,Count,Set,SetBool,SetDecimal,SetValue,TopN,MinMax,MinMaxRow,Sum,
Row_BSIGroup,Row_BSIGroupEdge,Existence,Not,FieldValue,Limit,Sort,All,
ClearRow,SetRow,Extract,Rows,GroupBy,Shift,IncludesColumn,UnionRows,
CountDistinct,BareDistinct} and TestVariousQueries:7430).  The *cases* are
ported — the expectations are recomputed by hand against the documented
semantics, not copied."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH as SW
from featurebase_tpu.executor.executor import ExecError, Executor
from featurebase_tpu.executor.results import (ExtractedTable, GroupCount,
                                              PairField, PairsField,
                                              ValCount)
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder
from featurebase_tpu.model.row import Row, SignedRow

F0 = [0, 1, SW + 2, 2 * SW + 4]
F1 = [1, 2, 65537]
F2 = [SW - 1, 2 * SW + 4]
ALL_COLS = sorted({*F0, *F1, *F2, 9})
V = {0: -1000, 1: -3, 2: 0, SW + 2: 7, 2 * SW + 4: 1000}


def norm(r):
    """Normalize engine results to plain comparable Python values."""
    if isinstance(r, Row):
        return r.keys if r.keys is not None else \
            [int(c) for c in r.columns()]
    if isinstance(r, SignedRow):
        return [int(v) for v in r.values()]
    if isinstance(r, ValCount):
        return (r.val, r.count)
    if isinstance(r, PairsField):
        return [(p.key if p.key is not None else p.id, p.count)
                for p in r.pairs]
    if isinstance(r, PairField):
        p = r.pair
        return (p.key if p.key is not None else p.id, p.count)
    if isinstance(r, list) and r and isinstance(r[0], GroupCount):
        return [(tuple((fr.row_key if fr.row_key is not None else fr.row_id)
                       for fr in g.group), g.count, g.agg) for g in r]
    if isinstance(r, ExtractedTable):
        return {c.column: list(c.rows) for c in r.columns}
    return r


@pytest.fixture(scope="module")
def env():
    holder = Holder()
    idx = holder.create_index("i")
    idx.create_field("f")
    idx.create_field("g")
    idx.create_field("m", FieldOptions(type="mutex"))
    idx.create_field("b", FieldOptions(type="bool"))
    idx.create_field("v", FieldOptions(type="int", min=-1000, max=1000))
    idx.create_field("d", FieldOptions(type="decimal", scale=2))
    idx.create_field("t", FieldOptions(type="time", time_quantum="YMDH"))
    idx.create_field("kf", FieldOptions(keys=True))
    e = Executor(holder)
    f = idx.field("f")
    for c in F0:
        f.set_bit(0, c)
    for c in F1:
        f.set_bit(1, c)
    for c in F2:
        f.set_bit(2, c)
    gf = idx.field("g")
    for c in (1, 2, SW + 2):
        gf.set_bit(5, c)
    m = idx.field("m")
    m.set_bit(10, 1)
    m.set_bit(20, 2)
    m.set_bit(10, SW + 2)
    bf = idx.field("b")
    bf.set_bit(1, 1)   # true
    bf.set_bit(0, 2)   # false
    vf = idx.field("v")
    for c, val in V.items():
        vf.set_value(c, val)
    df = idx.field("d")
    df.set_value(1, 1.25)
    df.set_value(2, -0.5)
    tf = idx.field("t")
    tf.set_bit(1, 1, timestamp="2001-02-03T04:00")
    tf.set_bit(1, 2, timestamp="2001-02-04T00:00")
    tf.set_bit(2, 1, timestamp="2002-01-01T00:00")
    kf = idx.field("kf")
    e.execute("i", 'Set(1, kf="alpha")')
    e.execute("i", f'Set({SW + 2}, kf="alpha")')
    e.execute("i", 'Set(2, kf="beta")')
    idx.mark_exists(np.array(ALL_COLS))
    return e


# (pql, expected-normalized) — reference test table names in comments
CASES = [
    # -- Row / set algebra (TestExecutor_Execute_{Intersect,Union,...})
    ("Row(f=0)", F0),
    ("Row(f=1)", F1),
    ("Row(f=2)", F2),
    ("Row(f=99)", []),
    ("Union(Row(f=0), Row(f=1))", sorted({*F0, *F1})),
    ("Union(Row(f=0))", F0),
    ("Union()", []),                                  # Empty_Union
    ("Intersect(Row(f=0), Row(f=1))", [1]),
    ("Intersect(Row(f=0), Row(f=2))", [2 * SW + 4]),
    ("Intersect(Row(f=0), Row(f=99))", []),
    ("Difference(Row(f=0), Row(f=1))", [0, SW + 2, 2 * SW + 4]),
    ("Difference(Row(f=0))", F0),                     # Empty_Difference
    ("Difference(Row(f=99), Row(f=0))", []),
    ("Xor(Row(f=0), Row(f=1))", [0, 2, 65537, SW + 2, 2 * SW + 4]),
    ("Xor(Row(f=0), Row(f=0))", []),
    ("Union(Row(f=0), Row(f=1), Row(f=2))",
     sorted({*F0, *F1, *F2})),
    # -- Not / All / existence (TestExecutor_Execute_{Existence,Not,All})
    ("Not(Row(f=0))", [c for c in ALL_COLS if c not in F0]),
    ("Not(All())", []),
    ("Not(Row(f=99))", ALL_COLS),
    ("All()", ALL_COLS),
    ("Count(All())", len(ALL_COLS)),
    # -- ConstRow (TestExecutor_Execute_ConstRow)
    ("ConstRow(columns=[1, 2, 3])", [1, 2, 3]),
    ("Intersect(ConstRow(columns=[1, 2, 3]), Row(f=1))", [1, 2]),
    ("Count(ConstRow(columns=[1, 2]))", 2),
    # -- Count (TestExecutor_Execute_Count)
    ("Count(Row(f=0))", 4),
    ("Count(Row(f=99))", 0),
    ("Count(Intersect(Row(f=0), Row(f=1)))", 1),
    # -- Shift (TestExecutor_Execute_Shift)
    ("Shift(ConstRow(columns=[1, 5]), n=2)", [3, 7]),
    ("Shift(ConstRow(columns=[0]))", [1]),
    ("Count(Shift(Row(f=1), n=1))", 3),
    # -- IncludesColumn (TestExecutor_Execute_IncludesColumn)
    ("IncludesColumn(Row(f=0), column=1)", True),
    ("IncludesColumn(Row(f=0), column=3)", False),
    (f"IncludesColumn(Row(f=0), column={SW + 2})", True),
    # -- BSI ranges (TestExecutor_Execute_Row_BSIGroup + Edge)
    ("Row(v > 0)", [SW + 2, 2 * SW + 4]),
    ("Row(v >= 0)", [2, SW + 2, 2 * SW + 4]),
    ("Row(v < 0)", [0, 1]),
    ("Row(v <= 0)", [0, 1, 2]),
    ("Row(v == 7)", [SW + 2]),
    ("Row(v != 7)", [0, 1, 2, 2 * SW + 4]),
    ("Row(v == -3)", [1]),
    ("Row(v == -1000)", [0]),      # min boundary
    ("Row(v == 1000)", [2 * SW + 4]),  # max boundary
    ("Row(v > -1001)", sorted(V)),
    ("Row(v < 1001)", sorted(V)),
    ("Row(v > 1000)", []),
    ("Row(v < -1000)", []),
    ("Row(v != null)", sorted(V)),
    ("Row(v == null)", [9, 65537, SW - 1]),
    ("Row(-3 <= v <= 7)", [1, 2, SW + 2]),
    ("Row(-3 < v < 7)", [2]),
    ("Row(0 <= v <= 0)", [2]),
    ("Row(v == 12345)", []),       # out of depth
    # -- Sum / Min / Max (TestExecutor_Execute_Sum, MinMax,
    #    MinMaxCountEqual)
    ("Sum(field=v)", (4, 5)),
    ("Sum(Row(f=0), field=v)", (4, 4)),
    ("Sum(Row(f=99), field=v)", (0, 0)),
    ("Min(field=v)", (-1000, 1)),
    ("Max(field=v)", (1000, 1)),
    ("Min(Row(f=1), field=v)", (-3, 1)),
    ("Max(Row(f=1), field=v)", (0, 1)),
    ("Min(Row(v > 0), field=v)", (7, 1)),
    ("Max(Row(v < 0), field=v)", (-3, 1)),
    # -- MinRow/MaxRow (TestExecutor_Execute_MinMaxRow)
    ("MinRow(field=f)", (0, 4)),
    ("MaxRow(field=f)", (2, 2)),
    ("MinRow(field=m)", (10, 2)),
    ("MaxRow(field=m)", (20, 1)),
    # -- FieldValue (TestExecutor_Execute_FieldValue)
    ("FieldValue(field=v, column=1)", (-3, 1)),
    ("FieldValue(field=v, column=0)", (-1000, 1)),
    ("FieldValue(field=v, column=9)", (0, 0)),
    # -- decimal (TestExecutor_Execute_SetDecimal)
    ("Row(d > 1)", [1]),
    ("Row(d < 0)", [2]),
    ("Row(d == 1.25)", [1]),
    ("Row(d >= -0.5)", [1, 2]),
    ("Sum(field=d)", (75, 2)),     # stored scaled by 10^2
    # -- bool (TestExecutor_Execute_SetBool)
    ("Row(b=true)", [1]),
    ("Row(b=false)", [2]),
    ("Count(Row(b=true))", 1),
    # -- mutex
    ("Row(m=10)", [1, SW + 2]),
    ("Row(m=20)", [2]),
    # -- TopN / TopK (TestExecutor_Execute_TopN, _fill, TopK)
    ("TopN(f)", [(0, 4), (1, 3), (2, 2)]),
    ("TopN(f, n=2)", [(0, 4), (1, 3)]),
    ("TopK(f, k=1)", [(0, 4)]),
    ("TopN(f, Row(f=1))", [(1, 3), (0, 1), (2, 0)][:2] if False else
     [(1, 3), (0, 1)]),
    ("TopN(m)", [(10, 2), (20, 1)]),
    ("TopN(g)", [(5, 3)]),
    ('TopN(kf)', [("alpha", 2), ("beta", 1)]),
    # -- Rows (TestExecutor_Execute_Rows)
    ("Rows(f)", [0, 1, 2]),
    ("Rows(f, limit=2)", [0, 1]),
    ("Rows(f, previous=0)", [1, 2]),
    ("Rows(f, previous=1)", [2]),
    ("Rows(f, column=1)", [0, 1]),
    ("Rows(f, column=2)", [1]),
    (f"Rows(f, column={SW - 1})", [2]),
    ("Rows(f, in=[0, 2])", [0, 2]),
    ("Rows(f, in=[7])", []),
    ("Rows(m)", [10, 20]),
    ('Rows(kf)', ["alpha", "beta"]),
    ('Rows(kf, like="al%")', ["alpha"]),
    ('Rows(kf, like="%a")', ["alpha", "beta"]),
    ('Rows(kf, like="x%")', []),
    # -- UnionRows (Test_Executor_Execute_UnionRows)
    ("UnionRows(Rows(f))", sorted({*F0, *F1, *F2})),
    ("Count(UnionRows(Rows(m)))", 3),
    # -- Limit (TestExecutor_Execute_Limit)
    ("Limit(Row(f=0), limit=2)", F0[:2]),
    ("Limit(Row(f=0), limit=2, offset=1)", F0[1:3]),
    ("Limit(Row(f=0), limit=0)", []),
    ("Limit(All(), offset=5)", ALL_COLS[5:]),
    ("Count(Limit(Row(f=0), limit=3))", 3),
    # -- Distinct (TestExecutor_BareDistinct, CountDistinct)
    ("Distinct(field=v)", [-1000, -3, 0, 7, 1000]),
    ("Distinct(Row(f=0), field=v)", [-1000, -3, 7, 1000]),
    ("Count(Distinct(field=v))", 5),
    ("Count(Distinct(Row(f=1), field=v))", 2),
    ("Distinct(field=m)", [10, 20]),
    ("Intersect(Row(f=1), Distinct(field=m))", []),
    # -- Sort (TestExecutor_Sort)
    ("Sort(All(), field=v)",
     {"columns": [0, 1, 2, SW + 2, 2 * SW + 4],
      "values": [-1000, -3, 0, 7, 1000]}),
    ("Sort(All(), field=v, sort-desc=true)",
     {"columns": [2 * SW + 4, SW + 2, 2, 1, 0],
      "values": [1000, 7, 0, -3, -1000]}),
    ("Sort(All(), field=v, limit=2)",
     {"columns": [0, 1], "values": [-1000, -3]}),
    ("Sort(All(), field=v, limit=2, offset=1)",
     {"columns": [1, 2], "values": [-3, 0]}),
    ("Sort(Row(f=0), field=v)",
     {"columns": [0, 1, SW + 2, 2 * SW + 4],
      "values": [-1000, -3, 7, 1000]}),
    # -- GroupBy (TestExecutor_Execute_GroupBy, GroupByStrings)
    ("GroupBy(Rows(f))", [((0,), 4, 0), ((1,), 3, 0), ((2,), 2, 0)]),
    ("GroupBy(Rows(f), limit=2)", [((0,), 4, 0), ((1,), 3, 0)]),
    ("GroupBy(Rows(f), Rows(g))",
     [((0, 5), 2, 0), ((1, 5), 2, 0)]),
    ("GroupBy(Rows(f), filter=Row(f=1))",
     [((0,), 1, 0), ((1,), 3, 0)]),
    ("GroupBy(Rows(f), aggregate=Sum(field=v))",
     [((0,), 4, 4), ((1,), 2, -3), ((2,), 1, 1000)]),
    ("GroupBy(Rows(f), having=Condition(count > 2))",
     [((0,), 4, 0), ((1,), 3, 0)]),
    ("GroupBy(Rows(f), having=Condition(count == 2))",
     [((2,), 2, 0)]),
    ("GroupBy(Rows(f), Rows(m))",
     [((0, 10), 2, 0), ((1, 10), 1, 0), ((1, 20), 1, 0)]),
    ('GroupBy(Rows(kf))', [(("alpha",), 2, 0), (("beta",), 1, 0)]),
    ("GroupBy(Rows(f, in=[1]))", [((1,), 3, 0)]),
    # -- time quantum (TestExecutorTimeRange, Execute_Rows w/ time)
    ('Row(t=1, from="2001-01-01T00:00", to="2001-02-03T05:00")', [1]),
    ('Row(t=1, from="2001-01-01T00:00", to="2001-02-05T00:00")', [1, 2]),
    ('Row(t=1, from="2002-01-01T00:00", to="2003-01-01T00:00")', []),
    ('Row(t=2, from="2001-01-01T00:00", to="2003-01-01T00:00")', [1]),
    ('Row(t=1)', [1, 2]),  # no range: standard view
    # -- Extract (TestExecutor_Execute_Extract)
    ("Extract(Row(f=1), Rows(f))",
     {1: [[0, 1]], 2: [[1]], 65537: [[1]]}),
    ("Extract(ConstRow(columns=[1, 2]), Rows(v))",
     {1: [-3], 2: [0]}),
    ("Extract(ConstRow(columns=[1, 2]), Rows(m), Rows(b))",
     {1: [10, True], 2: [20, False]}),
    ("Extract(ConstRow(columns=[9]), Rows(v))", {9: [None]}),
    ("Extract(ConstRow(columns=[1]), Rows(d))", {1: [1.25]}),
    # -- Percentile (TestExecutor Percentile cases in TestVariousQueries)
    ("Percentile(field=v, nth=0)", (-1000, 1)),
    ("Percentile(field=v, nth=100)", (1000, 1)),
    ("Percentile(field=v, nth=50)", (0, 1)),
    ("Percentile(field=v, nth=99)", (1000, 1)),
    ("Percentile(field=v, nth=25)", (-3, 1)),
    # filter is a named arg, not a child (reference executor.go:1296
    # reads c.Args["filter"]; children are ignored)
    # bisection may settle on an unattained midpoint: values {-1000,-3,
    # 7,1000}, possible=0 satisfies less<=2 and greater<=2 (reference
    # executor.go:1497-1520 returns `possible` without an equality probe)
    ("Percentile(filter=Row(f=0), field=v, nth=50)", (0, 1)),
    # -- n-ary set algebra edge cases (TestExecutor_Execute_
    #    {Intersect,Union,Difference,Xor} multi-operand rows)
    ("Intersect(Row(f=0), Row(f=1), Row(g=5))", [1]),
    ("Union(Row(f=1), Not(Row(f=1)))", ALL_COLS),
    ("Difference(Row(f=0), Row(f=1), Row(f=2))", [0, SW + 2]),
    ("Xor(Row(f=0), Row(f=1), Row(g=5))",
     [0, 1, 65537, 2 * SW + 4]),
    ("Intersect(All(), Row(f=2))", F2),
    ("Difference(All(), Row(f=0), Row(f=1), Row(f=2))",
     [c for c in ALL_COLS if c not in {*F0, *F1, *F2}]),
    ("Count(Union(Row(f=0), Row(f=1), Row(f=2)))",
     len({*F0, *F1, *F2})),
    # -- Shift at the shard boundary drops the carried bit (reference
    # row.go:366-374: per-segment shift, "TODO: deal with overflow",
    # issue #403 — bits do not carry into the next shard)
    (f"Shift(ConstRow(columns=[{SW - 1}]), n=1)", []),
    (f"Shift(ConstRow(columns=[{SW - 1}, {SW}]), n=2)",
     [SW + 2]),
    # -- decimal ranges / aggregates (TestExecutor_Execute_SetDecimal,
    #    DecimalSum)
    ("Row(d >= 1.25)", [1]),
    ("Row(d != null)", [1, 2]),
    ("Row(d == null)",
     [c for c in ALL_COLS if c not in (1, 2)]),
    ("Row(-1 <= d <= 2)", [1, 2]),
    ("Min(field=d)", (-50, 1)),     # scaled by 10^2
    ("Max(field=d)", (125, 1)),
    ("Sum(Row(f=1), field=d)", (75, 2)),
    ("FieldValue(field=d, column=1)", (125, 1)),
    # -- TopN/TopK breadth (TestExecutor_Execute_TopN_fill,
    #    TopN_Src_Dst_Key, TopK)
    ("TopK(f, k=10)", [(0, 4), (1, 3), (2, 2)]),
    ("TopK(f, k=2)", [(0, 4), (1, 3)]),
    ("TopK(m, k=5)", [(10, 2), (20, 1)]),
    ("TopN(f, Row(g=5))", [(0, 2), (1, 2)]),     # ties: id asc
    ("TopN(b)", [(0, 1), (1, 1)]),
    ("TopK(f, k=0)", [(0, 4), (1, 3), (2, 2)]),  # k=0: unbounded
    # -- Distinct on keyed fields (TestExecutor_Execute_
    #    DistinctOnKeyedField)
    ("Distinct(field=kf)", ["alpha", "beta"]),
    ("Distinct(Row(f=1), field=kf)", ["alpha", "beta"]),
    ("Distinct(ConstRow(columns=[2]), field=kf)", ["beta"]),
    # -- Rows previous+limit combos (TestExecutor_Execute_Rows)
    ("Rows(f, previous=0, limit=1)", [1]),
    ("Rows(g)", [5]),
    ("Rows(b)", [0, 1]),
    # -- GroupBy breadth (TestExecutor_Execute_GroupBy aggregate/
    #    having/3-field combos)
    ("GroupBy(Rows(f), Rows(g), Rows(m))",
     [((0, 5, 10), 2, 0), ((1, 5, 10), 1, 0), ((1, 5, 20), 1, 0)]),
    ("GroupBy(Rows(f), aggregate=Sum(field=d))",
     [((0,), 1, 125), ((1,), 2, 75)]),
    ("GroupBy(Rows(g), aggregate=Sum(field=v))",
     [((5,), 3, 4)]),
    ("GroupBy(Rows(f), Rows(g), limit=1)", [((0, 5), 2, 0)]),
    ("GroupBy(Rows(f), filter=Row(v > 0))",
     [((0,), 2, 0), ((2,), 1, 0)]),
    ("GroupBy(Rows(f), having=Condition(count < 3))", [((2,), 2, 0)]),
    # -- Sort on decimal + ties (TestExecutor_Sort)
    ("Sort(All(), field=d)",
     {"columns": [2, 1], "values": [-0.5, 1.25]}),
    ("Sort(Row(f=99), field=v)", {"columns": [], "values": []}),
    # -- Extract breadth (TestExecutor_Execute_Extract)
    ("Extract(ConstRow(columns=[1, 9]), Rows(kf))",
     {1: [["alpha"]], 9: [[]]}),
    (f"Extract(ConstRow(columns=[{SW + 2}]), Rows(f), Rows(v))",
     {SW + 2: [[0], 7]}),
    # -- time-quantum views (TestExecutorTimeRange granularity)
    ('Row(t=1, from="2001-02-03T04:00", to="2001-02-03T05:00")', [1]),
    ('Row(t=1, from="2001-02-01T00:00", to="2001-03-01T00:00")',
     [1, 2]),
    ('Row(t=1, from="1999-01-01T00:00", to="2000-01-01T00:00")', []),
    ('Row(t=2, from="2002-01-01T00:00", to="2002-01-02T00:00")', [1]),
    # -- IncludesColumn / ConstRow interplay
    ("IncludesColumn(Union(Row(f=0), Row(f=1)), column=65537)", True),
    ("IncludesColumn(All(), column=9)", True),
    ("IncludesColumn(All(), column=12345)", False),
]


@pytest.mark.parametrize("pql,expected",
                         CASES, ids=[c[0][:60] for c in CASES])
def test_acceptance(env, pql, expected):
    (result,) = env.execute("i", pql)
    assert norm(result) == expected, pql


class TestWriteSemantics:
    """Mutation-return contracts (reference TestExecutor_Execute_Set,
    SetValue, ClearRow, SetRow/Store)."""

    @pytest.fixture()
    def we(self):
        holder = Holder()
        idx = holder.create_index("w")
        idx.create_field("f")
        idx.create_field("m", FieldOptions(type="mutex"))
        idx.create_field("v", FieldOptions(type="int", min=-10, max=10))
        return Executor(holder)

    def test_set_returns_changed(self, we):
        assert we.execute("w", "Set(1, f=1)") == [True]
        assert we.execute("w", "Set(1, f=1)") == [False]  # already set
        assert we.execute("w", "Set(1, f=2)") == [True]

    def test_clear_returns_changed(self, we):
        we.execute("w", "Set(1, f=1)")
        assert we.execute("w", "Clear(1, f=1)") == [True]
        assert we.execute("w", "Clear(1, f=1)") == [False]
        assert we.execute("w", "Clear(99, f=1)") == [False]

    def test_set_value_and_overwrite(self, we):
        assert we.execute("w", "Set(1, v=5)") == [True]
        assert we.execute("w", "Set(1, v=5)") == [False]
        assert we.execute("w", "Set(1, v=-7)") == [True]
        (vc,) = we.execute("w", "Sum(field=v)")
        assert (vc.val, vc.count) == (-7, 1)

    def test_mutex_set_clears_previous(self, we):
        we.execute("w", "Set(1, m=10)")
        we.execute("w", "Set(1, m=20)")
        (r10,) = we.execute("w", "Row(m=10)")
        (r20,) = we.execute("w", "Row(m=20)")
        assert norm(r10) == [] and norm(r20) == [1]

    def test_clear_row(self, we):
        for c in (1, 2, SW + 5):
            we.execute("w", f"Set({c}, f=3)")
        assert we.execute("w", "ClearRow(f=3)") == [True]
        assert we.execute("w", "Count(Row(f=3))") == [0]
        assert we.execute("w", "ClearRow(f=3)") == [False]

    def test_store(self, we):
        we.execute("w", "Set(1, f=1)")
        we.execute("w", "Set(2, f=1)")
        we.execute("w", "Store(Row(f=1), f=9)")
        assert we.execute("w", "Count(Row(f=9))") == [2]
        # Store overwrites wholesale
        we.execute("w", "Store(ConstRow(columns=[5]), f=9)")
        (r,) = we.execute("w", "Row(f=9)")
        assert norm(r) == [5]

    def test_delete(self, we):
        we.execute("w", "Set(1, f=1)")
        we.execute("w", "Set(2, f=1)")
        we.execute("w", "Set(1, v=3)")
        assert we.execute("w", "Delete(ConstRow(columns=[1]))") == [True]
        assert we.execute("w", "Count(Row(f=1))") == [1]
        (vc,) = we.execute("w", "Sum(field=v)")
        assert (vc.val, vc.count) == (0, 0)


class TestQueryErrors:
    """Error contracts (reference TestExecutor_Execute_Query_Error)."""

    @pytest.fixture()
    def ee(self):
        holder = Holder()
        idx = holder.create_index("e")
        idx.create_field("f")
        return Executor(holder)

    @pytest.mark.parametrize("pql", [
        "Row(nope=1)",                  # unknown field
        "Sum(field=nope)",              # unknown field in aggregate
        "Set(1, nope=1)",
        "Count()",                      # missing child
        "Set(1)",                       # missing field arg
        "Percentile(field=f, nth=101)",
        "Percentile(field=f, nth=-1)",
        "ExternalLookup(query=\"x\")",
    ])
    def test_bad_queries_raise(self, ee, pql):
        with pytest.raises(ExecError):
            ee.execute("e", pql)


class TestTranche3Edges:
    """Edge-focused cases ported by semantics from executor_test.go
    (Row_BSIGroupEdge:3290, MinMaxCountEqual, TopK_Time, RowsTimeEmpty,
    ExtractWithTime, ConstRowTrackExistence); expectations recomputed."""

    def _api(self):
        from featurebase_tpu.server.api import API
        api = API()
        api.create_index("t3")
        return api

    def test_bsi_bitdepth_edge_lt(self):
        # value at 2^n - 1 (bit-depth edge) must satisfy < predicates
        api = self._api()
        api.create_field("t3", "f1", {"type": "int", "min": -2000,
                                      "max": 2000})
        api.query("t3", "Set(100, f1=7)")
        (row,) = api.query("t3", "Row(f1 < 10)")
        assert list(row.columns()) == [100]

    def test_bsi_bitdepth_edge_gt_negative(self):
        api = self._api()
        api.create_field("t3", "f2", {"type": "int", "min": -2000,
                                      "max": 2000})
        api.query("t3", "Set(200, f2=-7)")
        (row,) = api.query("t3", "Row(f2 > -10)")
        assert list(row.columns()) == [200]
        (row2,) = api.query("t3", "Row(f2 < -6)")
        assert list(row2.columns()) == [200]
        (row3,) = api.query("t3", "Row(f2 == -7)")
        assert list(row3.columns()) == [200]

    def test_bsi_depth_growth_preserves_old_values(self):
        api = self._api()
        api.create_field("t3", "v", {"type": "int", "min": -10**6,
                                     "max": 10**6})
        api.query("t3", "Set(1, v=3)")        # depth 2
        api.query("t3", "Set(2, v=250000)")   # depth grows to 18
        (r1,) = api.query("t3", "Row(v == 3)")
        assert list(r1.columns()) == [1]
        (r2,) = api.query("t3", "Row(v > 100)")
        assert list(r2.columns()) == [2]
        (s,) = api.query("t3", "Sum(field=v)")
        assert s.val == 250003 and s.count == 2

    def test_minmax_count_equal(self):
        # count reflects how many records hold the min/max value
        api = self._api()
        api.create_field("t3", "v", {"type": "int", "min": 0, "max": 100})
        for col, val in ((1, 5), (2, 5), (3, 9), (4, 9), (5, 9)):
            api.query("t3", f"Set({col}, v={val})")
        (mn,) = api.query("t3", "Min(field=v)")
        assert (mn.val, mn.count) == (5, 2)
        (mx,) = api.query("t3", "Max(field=v)")
        assert (mx.val, mx.count) == (9, 3)

    def test_topk_time_range(self):
        # TopK over a time field honors from/to view selection
        api = self._api()
        api.create_field("t3", "ev", {"type": "time",
                                      "timeQuantum": "YMD"})
        api.query("t3", "Set(1, ev=10, 2024-01-01T00:00)")
        api.query("t3", "Set(2, ev=10, 2024-01-02T00:00)")
        api.query("t3", "Set(3, ev=20, 2024-03-01T00:00)")
        (tk,) = api.query(
            "t3", "TopK(ev, k=5, from=2024-01-01T00:00, "
                  "to=2024-02-01T00:00)")
        got = [(p.id, p.count) for p in tk.pairs]
        assert got == [(10, 2)]

    def test_rows_time_empty(self):
        # a time range touching no views yields no rows (reference:
        # TestExecutor_Execute_RowsTimeEmpty)
        api = self._api()
        api.create_field("t3", "ev", {"type": "time",
                                      "timeQuantum": "YMD"})
        api.query("t3", "Set(1, ev=3, 2024-06-01T00:00)")
        (rows,) = api.query(
            "t3", "Rows(ev, from=2020-01-01T00:00, to=2020-02-01T00:00)")
        assert list(rows) == []

    def test_extract_with_time_field(self):
        api = self._api()
        api.create_field("t3", "ev", {"type": "time",
                                      "timeQuantum": "YMD"})
        api.create_field("t3", "v", {"type": "int", "min": 0, "max": 50})
        api.query("t3", "Set(7, ev=1, 2024-06-01T00:00) Set(7, v=42)")
        (tbl,) = api.query("t3", "Extract(All(), Rows(ev), Rows(v))")
        assert tbl.columns[0].column == 7
        assert tbl.columns[0].rows == [[1], 42]

    def test_const_row_respects_existence(self):
        # ConstRow emits exactly the given columns, even ones that do not
        # exist in the index (reference: ConstRowTrackExistence contract:
        # existence interacts through Not/All, not ConstRow itself)
        api = self._api()
        api.create_field("t3", "f", {"type": "set"})
        api.query("t3", "Set(1, f=1)")
        (row,) = api.query("t3", "ConstRow(columns=[1, 99])")
        assert list(row.columns()) == [1, 99]
        (inter,) = api.query(
            "t3", "Intersect(ConstRow(columns=[1, 99]), All())")
        assert list(inter.columns()) == [1]

    def test_empty_compound_ops(self):
        api = self._api()
        api.create_field("t3", "f", {"type": "set"})
        api.query("t3", "Set(1, f=1)")
        for q, want in (("Union()", []), ("Xor()", []),
                        ("Union(Row(f=404))", []),
                        ("Intersect(Row(f=1), Row(f=404))", []),
                        ("Difference(Row(f=404), Row(f=1))", [])):
            (row,) = api.query("t3", q)
            assert list(row.columns()) == want, q

    def test_max_writes_per_request_parity(self):
        # reference: TestExecutor_Execute_ErrMaxWritesPerRequest
        from featurebase_tpu.server.api import API, APIError
        import pytest as _pytest
        api = API(max_writes_per_request=1)
        api.create_index("t3")
        api.create_field("t3", "f", {"type": "set"})
        with _pytest.raises(APIError, match="max-writes"):
            api.query("t3", "Set(1, f=1) Clear(1, f=1)")


class TestVarCorrPQL:
    """Engine-internal Var/Corr PQL calls backing the SQL pushdown
    (reference semantics: sql3 VAR/CORR aggregators,
    expressionagg.go:950,1110 — population variance /n, 6dp,
    CORR over rows where both values exist)."""

    @pytest.fixture()
    def env(self):
        holder = Holder()
        idx = holder.create_index("vc")
        idx.create_field("f")
        idx.create_field("x", FieldOptions(type="int", min=-100, max=100))
        idx.create_field("y", FieldOptions(type="int", min=-500, max=500))
        cols = [1, 2, 3, 4, 5, SW + 1, SW + 2]
        xs = [10, -5, 0, 20, 7, -3, 15]
        ys = [30, -16, 1, 59, 22, -8, 44]
        idx.field("f").import_bits([1, 1, 0, 1, 0, 1, 1],
                                   np.array(cols))
        idx.field("x").import_values(np.array(cols), xs)
        # y missing for col 5 — CORR must skip that pair
        ycols = [1, 2, 3, 4, SW + 1, SW + 2]
        idx.field("y").import_values(np.array(ycols),
                                     [30, -16, 1, 59, -8, 44])
        idx.mark_exists(np.array(cols))
        e = Executor(holder)
        return e, cols, np.array(xs), dict(zip(ycols,
                                               [30, -16, 1, 59, -8, 44]))

    def test_var_matches_numpy(self, env):
        e, cols, xs, _ = env
        (got,) = e.execute("vc", "Var(field=x)")
        assert got == pytest.approx(float(np.var(xs)), abs=1e-6)

    def test_var_with_filter(self, env):
        e, cols, xs, _ = env
        (got,) = e.execute("vc", "Var(field=x, filter=Row(f=1))")
        sel = np.array([10, -5, 20, -3, 15], dtype=float)
        assert got == pytest.approx(float(np.var(sel)), abs=1e-6)

    def test_corr_skips_missing_pairs(self, env):
        e, cols, xs, ymap = env
        pairs = [(x, ymap[c]) for c, x in zip(cols, xs) if c in ymap]
        a = np.array([p[0] for p in pairs], dtype=float)
        b = np.array([p[1] for p in pairs], dtype=float)
        (got,) = e.execute("vc", "Corr(field=x, field2=y)")
        assert got == pytest.approx(float(np.corrcoef(a, b)[0, 1]),
                                    abs=1e-6)

    def test_corr_empty_and_degenerate(self, env):
        e, *_ = env
        (none_r,) = e.execute("vc",
                              "Corr(field=x, field2=y, "
                              "filter=Row(x > 1000))")
        assert none_r is None
        # single pair: zero variance -> None (reference yields NaN)
        (one,) = e.execute("vc", "Corr(field=x, field2=y, "
                                 "filter=Row(x=10))")
        assert one is None

    def test_var_empty(self, env):
        e, *_ = env
        (got,) = e.execute("vc", "Var(field=x, filter=Row(x > 1000))")
        assert got is None


class TestPercentileThresholdCompat:
    """COMPATIBILITY NOTE (tracked divergence, ADVICE r4 #5): the
    reference computes Percentile's desired_less/desired_greater
    thresholds in float64 (reference executor.go:1462), so for (total,
    nth) combinations where float64 rounding crosses an integer the two
    engines can pick adjacent values.  This engine computes the
    thresholds exact-rationally (identical limb arithmetic on the fused
    device path, ops/bsi.py percentile_fused) — intentionally: the
    exact form is deterministic across platforms and both of our paths.

    Pinned example: total=500, nth=20.2.  Exactly: 500 * 20.2/100 with
    20.2's binary value 20.19999999999999928946… gives 100.9999999…,
    floor 100; float64 arithmetic rounds 500*20.2 up to 10100.000000000002
    and floors to 101.  Over values 1..500 the reference would therefore
    answer 102 where we answer 101.
    """

    def test_exact_rational_thresholds_pinned(self):
        from featurebase_tpu.executor.executor import Executor
        from featurebase_tpu.model.field import FieldOptions
        from featurebase_tpu.model.index import Holder
        holder = Holder()
        idx = holder.create_index("pctl")
        idx.create_field("v", FieldOptions(type="int", min=0, max=1000))
        cols = np.arange(1, 501)
        idx.field("v").import_values(cols, cols)
        idx.mark_exists(cols)
        e = Executor(holder)
        (vc,) = e.execute("pctl", "Percentile(field=v, nth=20.2)")
        # exact-rational thresholds: desired_less=100 -> value 101
        # (float64 thresholds would give desired_less=101 -> value 102)
        assert vc.val == 101
