"""PQL acceptance corpus, tranche 2: the long tail of call families over
a multi-shard dataset — Rows filters, Store/ClearRow, UnionRows,
IncludesColumn, FieldValue, Limit, Xor/Not/Shift, MinRow/MaxRow, GroupBy
having/limit/sort, TopN filters, TopK, Distinct-with-filter, Sort
filters, time-quantum ranges, keyed-index flows, Delete (reference:
executor_test.go case shapes re-authored with hand-computed
expectations)."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.server.api import API

SW = SHARD_WIDTH


@pytest.fixture(scope="module")
def api():
    api = API()
    api.create_index("i", {"trackExistence": True})
    api.create_field("i", "f", {"type": "set"})
    api.create_field("i", "g", {"type": "set"})
    api.create_field("i", "v", {"type": "int"})
    cols = [1, 2, 7, SW + 3, 2 * SW + 5]
    api.import_bits("i", "f", [1, 1, 10, 2, 3], cols)
    api.import_bits("i", "g", [0, 1, 0, 0, 1], cols)
    api.import_values("i", "v", cols, [10, 20, 50, 30, 40])
    return api


def q1(api, pql):
    (r,) = api.query("i", pql)
    return r


def cols_of(r):
    return list(r.columns())


# f: row1={1,2}, row10={7}, row2={SW+3}, row3={2SW+5}
# g: row0={1,7,SW+3}, row1={2,2SW+5}
# v: {1:10, 2:20, 7:50, SW+3:30, 2SW+5:40}

ROWS_CASES = [
    ("Rows(f)", [1, 2, 3, 10]),
    ("Rows(f, limit=2)", [1, 2]),
    ("Rows(f, previous=1)", [2, 3, 10]),
    ("Rows(f, previous=2, limit=1)", [3]),
    ("Rows(f, column=1)", [1]),
    ("Rows(f, column=7)", [10]),
    # from/to are TIME bounds — unused on set fields (reference:
    # executeRowsShard parses them only for FieldTypeTime)
    ("Rows(f, from=2, to=10)", [1, 2, 3, 10]),
    ("Rows(f, in=[1,3])", [1, 3]),
    ("Rows(f, in=[99])", []),
    ("Rows(g)", [0, 1]),
]


@pytest.mark.parametrize("pql,want", ROWS_CASES,
                         ids=[c[0] for c in ROWS_CASES])
def test_rows_filters(api, pql, want):
    got = [getattr(r, "row_id", r) for r in q1(api, pql)]
    assert got == want


BITMAP_CASES = [
    ("Xor(Row(f=1), Row(g=0))", [2, 7, SW + 3]),
    ("Not(Row(f=1))", [7, SW + 3, 2 * SW + 5]),
    ("Difference(Row(g=0), Row(f=1))", [7, SW + 3]),
    ("Union(Row(f=2), Row(f=3))", [SW + 3, 2 * SW + 5]),
    ("Intersect(Row(f=1), Row(g=1))", [2]),
    ("Shift(Row(f=1), n=1)", [2, 3]),
    ("Shift(Row(f=1))", [2, 3]),  # default n=1 (executor.go:5818)
    ("Limit(Row(g=0), limit=2)", [1, 7]),
    ("Limit(Row(g=0), limit=1, offset=1)", [7]),
    ("UnionRows(Rows(f, limit=2))", [1, 2, SW + 3]),
    ("UnionRows(Rows(f, in=[10,3]))", [7, 2 * SW + 5]),
    ("All(limit=3)", [1, 2, 7]),
    ("All(limit=2, offset=2)", [7, SW + 3]),
]


@pytest.mark.parametrize("pql,want", BITMAP_CASES,
                         ids=[c[0][:40] for c in BITMAP_CASES])
def test_bitmap_calls(api, pql, want):
    assert cols_of(q1(api, pql)) == want


SCALAR_CASES = [
    ("IncludesColumn(Row(f=1), column=1)", True),
    ("IncludesColumn(Row(f=1), column=7)", False),
    ("Count(Union(Row(f=1), Row(f=10)))", 3),
    ("Count(Row(v > 25))", 3),
    ("Count(Row(v >= 40))", 2),
    ("Count(Row(10 < v < 40))", 2),
    ("Count(Row(v != 30))", 4),
    ("Count(Row(v != null))", 5),
    ("Count(Row(v == null))", 0),
]


@pytest.mark.parametrize("pql,want", SCALAR_CASES,
                         ids=[c[0][:44] for c in SCALAR_CASES])
def test_scalar_calls(api, pql, want):
    assert q1(api, pql) == want


def test_field_value(api):
    vc = q1(api, "FieldValue(field=v, column=7)")
    assert (vc.val, vc.count) == (50, 1)
    missing = q1(api, "FieldValue(field=v, column=999)")
    assert missing.count == 0  # reference: zero-count ValCount


def test_min_max_row(api):
    mn = q1(api, "MinRow(field=f)")
    mx = q1(api, "MaxRow(field=f)")
    assert (mn.pair.id, mn.pair.count) == (1, 2)
    assert (mx.pair.id, mx.pair.count) == (10, 1)


def test_groupby_variants(api):
    gcs = q1(api, "GroupBy(Rows(f), limit=2)")
    assert [(g.group[0].row_id, g.count) for g in gcs] == [(1, 2), (2, 1)]
    gcs = q1(api, "GroupBy(Rows(f), having=Condition(count > 1))")
    assert [(g.group[0].row_id, g.count) for g in gcs] == [(1, 2)]
    gcs = q1(api, 'GroupBy(Rows(f), sort="count desc")')
    assert [g.group[0].row_id for g in gcs][:1] == [1]
    assert [g.count for g in gcs] == sorted(
        (g.count for g in gcs), reverse=True)
    gcs = q1(api, "GroupBy(Rows(f), Rows(g))")
    got = {(g.group[0].row_id, g.group[1].row_id): g.count for g in gcs}
    assert got == {(1, 0): 1, (1, 1): 1, (2, 0): 1, (3, 1): 1, (10, 0): 1}


def test_groupby_sum_aggregate(api):
    gcs = q1(api, "GroupBy(Rows(g), aggregate=Sum(field=v))")
    got = {g.group[0].row_id: (g.count, g.agg) for g in gcs}
    assert got == {0: (3, 90), 1: (2, 60)}


def test_topn_topk(api):
    pairs = q1(api, "TopN(f, n=2, filter=Row(g=0))").pairs
    assert [(p.id, p.count) for p in pairs] == [(1, 1), (2, 1)] or \
        [(p.id, p.count) for p in pairs] == [(1, 1), (10, 1)]
    pairs = q1(api, "TopK(f, k=1)").pairs
    assert [(p.id, p.count) for p in pairs] == [(1, 2)]
    # TopN without n returns all ranked rows
    pairs = q1(api, "TopN(f)").pairs
    assert [p.id for p in pairs][0] == 1 and len(pairs) == 4


def test_distinct_with_filter(api):
    assert q1(api, "Count(Distinct(Row(g=0), field=f))") == 3
    sr = q1(api, "Distinct(Row(g=1), field=v)")
    assert list(sr.values()) == [20, 40]


def test_sort_filtered(api):
    out = q1(api, "Sort(Row(g=0), field=v, limit=2)")
    assert out["columns"] == [1, SW + 3]
    assert out["values"] == [10, 30]
    out = q1(api, "Sort(All(), field=v, limit=2, sort-desc=true)")
    assert out["values"] == [50, 40]


def test_extract_with_limit_filter(api):
    tbl = q1(api, "Extract(Limit(All(), limit=2), Rows(v))")
    assert [c.column for c in tbl.columns] == [1, 2]
    assert [c.rows[0] for c in tbl.columns] == [10, 20]


class TestStoreClearDelete:
    """Write-call flows on a scratch index (Store executor.go:1698,
    ClearRow, Delete executor.go:9050)."""

    @pytest.fixture()
    def wapi(self):
        api = API()
        api.create_index("w", {"trackExistence": True})
        api.create_field("w", "f", {"type": "set"})
        api.create_field("w", "g", {"type": "set"})
        api.import_bits("w", "f", [1, 1, 2], [1, 2, SW + 3])
        return api

    def test_store_then_clearrow(self, wapi):
        assert wapi.query("w", "Store(Row(f=1), g=9)") == [True]
        assert wapi.query("w", "Count(Row(g=9))") == [2]
        # Store REPLACES the row wholesale (reference executeSetRow)
        wapi.query("w", "Store(Row(f=2), g=9)")
        (cols,) = wapi.query("w", "Row(g=9)")
        assert list(cols.columns()) == [SW + 3]
        assert wapi.query("w", "ClearRow(g=9)") == [True]
        assert wapi.query("w", "Count(Row(g=9))") == [0]

    def test_delete_records(self, wapi):
        assert wapi.query("w", "Count(All())") == [3]
        wapi.query("w", "Delete(Row(f=1))")
        assert wapi.query("w", "Count(All())") == [1]
        assert wapi.query("w", "Count(Row(f=1))") == [0]
        # deleted columns stay deleted for every field
        assert wapi.query("w", "Count(Row(f=2))") == [1]


class TestTimeQuantum:
    @pytest.fixture()
    def tapi(self):
        api = API()
        api.create_index("t", {"trackExistence": True})
        api.create_field("t", "e", {"type": "time", "timeQuantum": "YMD"})
        api.import_bits(
            "t", "e", [1, 1, 2], [10, 20, 30],
            timestamps=["2020-01-15T00:00:00Z", "2020-03-02T00:00:00Z",
                        "2020-01-20T00:00:00Z"])
        return api

    def test_row_time_range(self, tapi):
        (r,) = tapi.query(
            "t", "Row(e=1, from='2020-01-01T00:00:00Z', "
                 "to='2020-02-01T00:00:00Z')")
        assert list(r.columns()) == [10]
        (r,) = tapi.query("t", "Row(e=1)")
        assert list(r.columns()) == [10, 20]

    def test_rows_time_range(self, tapi):
        (rows,) = tapi.query(
            "t", "Rows(e, from='2020-01-01T00:00:00Z', "
                 "to='2020-02-01T00:00:00Z')")
        assert [getattr(r, "row_id", r) for r in rows] == [1, 2]
        (rows,) = tapi.query(
            "t", "Rows(e, from='2020-02-01T00:00:00Z', "
                 "to='2020-04-01T00:00:00Z')")
        assert [getattr(r, "row_id", r) for r in rows] == [1]


class TestKeyedFlows:
    @pytest.fixture()
    def kapi(self):
        api = API()
        api.create_index("k", {"keys": True, "trackExistence": True})
        api.create_field("k", "kf", {"type": "set", "keys": True})
        api.import_bits("k", "kf", row_keys=["alpha", "alpha", "beta"],
                        col_keys=["u1", "u2", "u3"], rows=None, cols=None)
        return api

    def test_keyed_count_and_set(self, kapi):
        assert kapi.query("k", 'Count(Row(kf="alpha"))') == [2]
        kapi.query("k", 'Set("u9", kf="alpha")')
        assert kapi.query("k", 'Count(Row(kf="alpha"))') == [3]

    def test_keyed_topn_returns_keys(self, kapi):
        (pf,) = kapi.query("k", "TopN(kf, n=2)")
        assert [(p.key, p.count) for p in pf.pairs] == \
            [("alpha", 2), ("beta", 1)]

    def test_keyed_rows_returns_keys(self, kapi):
        (rows,) = kapi.query("k", "Rows(kf)")
        got = [getattr(r, "row_key", None) or getattr(r, "key", r)
               for r in rows]
        assert sorted(str(x) for x in got) == ["alpha", "beta"]

    def test_keyed_extract_returns_column_keys(self, kapi):
        (tbl,) = kapi.query("k", "Extract(All(), Rows(kf))")
        assert sorted(c.column for c in tbl.columns) == ["u1", "u2", "u3"]

    def test_keyed_delete(self, kapi):
        kapi.query("k", 'Delete(Row(kf="beta"))')
        assert kapi.query("k", 'Count(Row(kf="beta"))') == [0]
        assert kapi.query("k", "Count(All())") == [2]


def test_keyed_sort_returns_keys():
    """Sort on a keyed index translates sorted record ids to keys
    (reference translateResults; the columns were raw ids before r5)."""
    api = API()
    api.create_index("ks", {"keys": True, "trackExistence": True})
    api.create_field("ks", "v", {"type": "int"})
    api.import_values("ks", "v", cols=None, values=[30, 10, 20],
                      col_keys=["c", "a", "b"])
    (out,) = api.query("ks", "Sort(All(), field=v, limit=3)")
    assert out["values"] == [10, 20, 30]
    assert out["columns"] == ["a", "b", "c"]


def test_decimal_percentile_one_sync_fused():
    """Decimal fields ride the fused Percentile program (stored-unit
    bisection; the host fallback is for wide fields only)."""
    api = API()
    api.create_index("dp", {"trackExistence": True})
    api.create_field("dp", "d", {"type": "decimal", "scale": 2})
    api.import_values("dp", "d", [1, 2, 3, 4, 5, 6],
                      [10.0, 10.0, 11.0, 12.0, 12.0, 13.0])
    (vc,) = api.query("dp", "Percentile(field=d, nth=50)")
    assert vc.float_val == 11.5


def test_options_shards_restricts_execution(api):
    """Options(call, shards=[...]) runs only the listed shards
    (reference: executor.go Options -> opt.Shards; was silently ignored
    — found by a parity probe)."""
    # f row1 = {1, 2}: both in shard 0; shard 2 holds only 2*SW+5
    assert api.query("i", "Options(Count(Row(f=1)), shards=[0])") == [2]
    assert api.query("i", "Options(Count(Row(f=1)), shards=[1, 2])") == [0]
    assert api.query("i", "Options(Count(All()), shards=[2])") == [1]
    assert api.query("i", "Options(Count(All()), shards=[0, 1, 2])") == [5]
    # restriction to an empty shard: nothing runs
    assert api.query("i", "Options(Count(All()), shards=[7])") == [0]


def test_keyed_constrow_and_column_args():
    """ConstRow(columns=[keys]) and column= filters translate record
    keys on keyed indexes (reference translateCall; both crashed or
    returned empty before r5 — found by a parity probe)."""
    api = API()
    api.create_index("kc", {"keys": True, "trackExistence": True})
    api.create_field("kc", "f", {"type": "set", "keys": True})
    api.import_bits("kc", "f", row_keys=["a", "a", "b"],
                    col_keys=["u1", "u2", "u3"], rows=None, cols=None)
    assert api.query("kc", 'Count(ConstRow(columns=["u1", "u2"]))') == [2]
    assert api.query("kc", 'Count(ConstRow(columns=["missing"]))') == [0]
    assert api.query("kc", 'IncludesColumn(Row(f="a"), column="u1")') \
        == [True]
    assert api.query("kc", 'IncludesColumn(Row(f="a"), column="u3")') \
        == [False]
    (rows,) = api.query("kc", 'Rows(f, column="u3")')
    assert [getattr(r, "row_key", None) or r for r in rows] == ["b"]


def test_field_option_validation():
    """Malformed field options are rejected at create time (reference:
    field.go applyOption, time.go:44 TimeQuantum.Valid — all four were
    silently accepted before r5, found by a parity probe)."""
    from featurebase_tpu.server.api import APIError
    api = API()
    api.create_index("fv", {})
    bad = [
        ({"type": "int", "min": 10, "max": 5}, "greater than max"),
        ({"type": "set", "cacheType": "nope"}, "cache type"),
        ({"type": "decimal", "scale": -1}, "scale"),
        ({"type": "decimal", "scale": 20}, "scale"),
        ({"type": "time", "timeQuantum": "YD"}, "time quantum"),
        ({"type": "time", "timeQuantum": "XB"}, "time quantum"),
        ({"type": "time", "ttl": 60}, "ttl requires"),
    ]
    for opts, msg in bad:
        with pytest.raises(APIError, match=msg):
            api.create_field("fv", "bad", opts)
    # valid shapes still create
    api.create_field("fv", "ok1", {"type": "int", "min": 0, "max": 10})
    api.create_field("fv", "ok2", {"type": "time", "timeQuantum": "MDH",
                                   "ttl": 60})
    api.create_field("fv", "ok3", {"type": "set", "cacheType": "none"})


def test_groupby_count_distinct_aggregate():
    """GroupBy(..., aggregate=Count(Distinct(field=x))) fills agg with
    the per-group distinct value count via the reference's coordinator
    post-pass (executor.go:3342; agg was silently 0 before r5)."""
    api = API()
    api.create_index("gcd", {"trackExistence": True})
    api.create_field("gcd", "f", {"type": "set"})
    api.create_field("gcd", "v", {"type": "int"})
    api.import_bits("gcd", "f", [1, 1, 1, 2], [1, 2, 3, 4])
    api.import_values("gcd", "v", [1, 2, 3, 4], [5, 10, 5, 15])
    (gcs,) = api.query(
        "gcd", "GroupBy(Rows(f), aggregate=Count(Distinct(field=v)))")
    got = {gc.group[0].row_id: gc.agg for gc in gcs}
    assert got == {1: 2, 2: 1}
    # with a filter: distinct counts respect it
    (gcs,) = api.query(
        "gcd", "GroupBy(Rows(f), filter=Row(v > 9), "
               "aggregate=Count(Distinct(field=v)))")
    got = {gc.group[0].row_id: (gc.count, gc.agg) for gc in gcs}
    assert got == {1: (1, 1), 2: (1, 1)}


def test_bsi_writes_outside_min_max_rejected():
    """Values outside the configured [min, max] are rejected at write
    time (reference: fragment.go:615 bsiGroup range errors; both Set()
    and bulk import silently accepted them before r5)."""
    api = API()
    api.create_index("rng", {"trackExistence": True})
    api.create_field("rng", "v", {"type": "int", "min": 0, "max": 100})
    with pytest.raises(Exception, match="above field maximum"):
        api.query("rng", "Set(1, v=500)")
    with pytest.raises(Exception, match="below field minimum"):
        api.query("rng", "Set(1, v=-5)")
    with pytest.raises(Exception, match="maximum"):
        api.import_values("rng", "v", [1, 2], [50, 101])
    api.query("rng", "Set(1, v=100)")  # boundary ok
    api.import_values("rng", "v", [2], [0])
    # unbounded fields stay unbounded
    api.create_field("rng", "u", {"type": "int"})
    api.query("rng", "Set(1, u=123456789)")


def test_string_row_on_unkeyed_field_clean_error():
    api = API()
    api.create_index("uk", {"trackExistence": True})
    api.create_field("uk", "f", {"type": "set"})
    with pytest.raises(Exception, match="unkeyed field"):
        api.query("uk", 'Row(f="nope")')
