"""ExternalLookup(): bitmap columns bound into an external SQL query
(reference: executor.go:4357 executeExternalLookup against
holder.lookupDB; adapter protocol + in-box sqlite3 adapter in
storage/lookup.py)."""
import pytest

from featurebase_tpu.executor.executor import ExecError
from featurebase_tpu.server.api import API
from featurebase_tpu.storage.lookup import SQLiteLookup, open_lookup


@pytest.fixture()
def api():
    a = API()
    a.create_index("i")
    a.create_field("i", "f", {"type": "set"})
    a.query("i", "Set(1, f=1) Set(3, f=1) Set(5, f=2)")
    db = SQLiteLookup(":memory:")
    conn = db._conn()
    conn.execute("CREATE TABLE ext (id INTEGER PRIMARY KEY, "
                 "name TEXT, score REAL)")
    conn.executemany("INSERT INTO ext VALUES (?, ?, ?)",
                     [(1, "one", 1.5), (3, "three", 3.5), (5, "five", 5.5),
                      (9, "nine", 9.5)])
    conn.commit()
    a.holder.lookup_db = db
    return a


class TestExternalLookup:
    def test_read_joins_bitmap_columns(self, api):
        (tbl,) = api.query(
            "i", 'ExternalLookup(Row(f=1), query="SELECT id, name, score '
                 'FROM ext WHERE id IN $1 ORDER BY id")')
        assert [f.name for f in tbl.fields] == ["name", "score"]
        got = [(c.column, c.rows) for c in tbl.columns]
        assert got == [(1, ["one", 1.5]), (3, ["three", 3.5])]

    def test_empty_bitmap_short_circuits(self, api):
        (tbl,) = api.query(
            "i", 'ExternalLookup(Row(f=9), query="SELECT id FROM ext '
                 'WHERE id IN $1")')
        assert tbl.columns == []

    def test_write_statement(self, api):
        api.query("i", 'ExternalLookup(Row(f=2), write=true, '
                       'query="DELETE FROM ext WHERE id IN $1")')
        cur = api.holder.lookup_db._conn().execute(
            "SELECT id FROM ext ORDER BY id")
        assert [r[0] for r in cur.fetchall()] == [1, 3, 9]

    def test_unconfigured_errors(self):
        a = API()
        a.create_index("i")
        a.create_field("i", "f", {"type": "set"})
        a.query("i", "Set(1, f=1)")
        with pytest.raises(Exception, match="not configured"):
            a.query("i", 'ExternalLookup(Row(f=1), query="SELECT 1")')

    def test_open_lookup_dsn(self, tmp_path):
        db = open_lookup(f"sqlite:{tmp_path}/x.db")
        assert isinstance(db, SQLiteLookup)
        with pytest.raises(Exception, match="unsupported"):
            open_lookup("postgres://x")
