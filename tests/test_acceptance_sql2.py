"""SQL acceptance corpus, tranche 2: null semantics, joins, time-quantum
rangeq, and operator edges (reference: sql3/test/defs — defs_null.go,
defs_join.go, defs_timequantum.go, defs_binops.go, defs_unops.go,
defs_between.go, defs_in.go case shapes, re-authored with hand-computed
expectations; VERDICT r3 #8 defs tranche)."""
import pytest

from featurebase_tpu.server.api import API
from featurebase_tpu.sql.engine import execute_sql


@pytest.fixture(scope="module")
def db():
    api = API()
    # null_all_types analog (defs_null.go): row 1 mostly null, row 2 full
    execute_sql(api, """CREATE TABLE nl (_id ID, i INT MIN 0 MAX 1000,
        i1 INT MIN 0 MAX 1000, b1 BOOL, d1 DECIMAL(2), s1 STRING,
        ss1 STRINGSET)""")
    execute_sql(api, """INSERT INTO nl (_id, i) VALUES (1, 1)""")
    execute_sql(api, """INSERT INTO nl (_id, i, i1, b1, d1, s1, ss1)
        VALUES (2, 2, 20, true, 1.25, 'two', ['x', 'y'])""")
    # join tables (defs_join.go analog)
    execute_sql(api, """CREATE TABLE dept (_id ID, dname STRING,
        budget INT MIN 0 MAX 100000)""")
    execute_sql(api, """INSERT INTO dept (_id, dname, budget) VALUES
        (1, 'eng', 500), (2, 'ops', 300), (3, 'empty', 100)""")
    execute_sql(api, """CREATE TABLE emp (_id ID, ename STRING,
        dept_id INT MIN 0 MAX 100, salary INT MIN 0 MAX 10000)""")
    execute_sql(api, """INSERT INTO emp (_id, ename, dept_id, salary) VALUES
        (1, 'ann', 1, 100), (2, 'bob', 1, 200), (3, 'cid', 2, 150),
        (4, 'dee', 9, 50)""")
    # time-quantum table (defs_timequantum.go analog)
    execute_sql(api, """CREATE TABLE tq (_id ID,
        ev STRINGSET TIMEQUANTUM 'YMD')""")
    execute_sql(api, """INSERT INTO tq (_id, ev) VALUES (1, ['a'])""")
    api.query("tq", "Set(2, ev='jan', 2022-01-02T00:00)")
    api.query("tq", "Set(2, ev='mar', 2022-03-05T00:00)")
    api.query("tq", "Set(3, ev='mar', 2022-03-06T00:00)")
    return api


def rows_of(api, sql):
    return execute_sql(api, sql)["data"]


def unordered(rows):
    return sorted(map(repr, rows))


# -- null semantics (defs_null.go shapes) ------------------------------------

NULL_CASES = [
    ("SELECT _id IS NULL FROM nl WHERE _id = 1", [[False]]),
    ("SELECT i IS NULL FROM nl WHERE _id = 1", [[False]]),
    ("SELECT i1 IS NULL FROM nl WHERE _id = 1", [[True]]),
    ("SELECT b1 IS NULL FROM nl WHERE _id = 1", [[True]]),
    ("SELECT d1 IS NULL FROM nl WHERE _id = 1", [[True]]),
    ("SELECT s1 IS NULL FROM nl WHERE _id = 1", [[True]]),
    ("SELECT ss1 IS NULL FROM nl WHERE _id = 1", [[True]]),
    ("SELECT i1 IS NULL FROM nl WHERE _id = 2", [[False]]),
    ("SELECT b1 IS NULL FROM nl WHERE _id = 2", [[False]]),
    ("SELECT s1 IS NOT NULL FROM nl WHERE _id = 1", [[False]]),
    ("SELECT s1 IS NOT NULL FROM nl WHERE _id = 2", [[True]]),
    # null propagation through arithmetic
    ("SELECT i1 + 1 FROM nl WHERE _id = 1", [[None]]),
    ("SELECT i1 - 1 FROM nl WHERE _id = 1", [[None]]),
    ("SELECT i1 * 2 FROM nl WHERE _id = 1", [[None]]),
    ("SELECT i1 / 2 FROM nl WHERE _id = 1", [[None]]),
    ("SELECT i1 + 1 FROM nl WHERE _id = 2", [[21]]),
    # comparisons against null match nothing
    ("SELECT _id FROM nl WHERE i1 > 0", [[2]]),
    ("SELECT _id FROM nl WHERE i1 < 1000", [[2]]),
    ("SELECT _id FROM nl WHERE i1 IS NULL", [[1]]),
    ("SELECT _id FROM nl WHERE i1 IS NOT NULL", [[2]]),
    # aggregates skip nulls; COUNT(col) counts non-null
    ("SELECT COUNT(*) FROM nl", [[2]]),
    ("SELECT COUNT(i1) FROM nl", [[1]]),
    ("SELECT COUNT(i) FROM nl", [[2]]),
    ("SELECT SUM(i1) FROM nl", [[20]]),
    ("SELECT MIN(i1), MAX(i1) FROM nl", [[20, 20]]),
    ("SELECT AVG(i1) FROM nl", [[20.0]]),
    # coalesce / nullif
    ("SELECT COALESCE(i1, 7) FROM nl WHERE _id = 1", [[7]]),
    ("SELECT COALESCE(i1, 7) FROM nl WHERE _id = 2", [[20]]),
    ("SELECT NULLIF(i, 1) FROM nl WHERE _id = 1", [[None]]),
    ("SELECT NULLIF(i, 1) FROM nl WHERE _id = 2", [[2]]),
    # CASE with null branches
    ("SELECT CASE WHEN i1 IS NULL THEN 'n' ELSE 's' END FROM nl "
     "WHERE _id = 1", [['n']]),
    ("SELECT CASE WHEN i1 IS NULL THEN 'n' ELSE 's' END FROM nl "
     "WHERE _id = 2", [['s']]),
    # IN with null member (three-valued logic filters as false)
    ("SELECT _id FROM nl WHERE i1 IN (20, 30)", [[2]]),
    ("SELECT _id FROM nl WHERE i1 NOT IN (30)", [[2]]),
]


@pytest.mark.parametrize("sql,want", NULL_CASES,
                         ids=[c[0][:60] for c in NULL_CASES])
def test_null_semantics(db, sql, want):
    assert unordered(rows_of(db, sql)) == unordered(want)


# -- joins (defs_join.go shapes) ---------------------------------------------

JOIN_CASES = [
    ("SELECT e.ename, d.dname FROM emp AS e INNER JOIN dept AS d "
     "ON e.dept_id = d._id ORDER BY e._id",
     [['ann', 'eng'], ['bob', 'eng'], ['cid', 'ops']]),
    ("SELECT COUNT(*) FROM emp AS e INNER JOIN dept AS d "
     "ON e.dept_id = d._id", [[3]]),
    # left join: unmatched left rows null-extend
    ("SELECT e.ename, d.dname FROM emp AS e LEFT JOIN dept AS d "
     "ON e.dept_id = d._id ORDER BY e._id",
     [['ann', 'eng'], ['bob', 'eng'], ['cid', 'ops'], ['dee', None]]),
    ("SELECT e.ename FROM emp AS e LEFT JOIN dept AS d "
     "ON e.dept_id = d._id WHERE d.dname IS NULL", [['dee']]),
    # join + aggregate + group by
    ("SELECT d.dname, COUNT(*) FROM emp AS e INNER JOIN dept AS d "
     "ON e.dept_id = d._id GROUP BY d.dname ORDER BY d.dname",
     [['eng', 2], ['ops', 1]]),
    ("SELECT d.dname, SUM(e.salary) FROM emp AS e INNER JOIN dept AS d "
     "ON e.dept_id = d._id GROUP BY d.dname ORDER BY d.dname",
     [['eng', 300], ['ops', 150]]),
    # join with residual predicate
    ("SELECT e.ename FROM emp AS e INNER JOIN dept AS d "
     "ON e.dept_id = d._id WHERE d.budget > 400 ORDER BY e._id",
     [['ann'], ['bob']]),
    ("SELECT e.ename FROM emp AS e INNER JOIN dept AS d "
     "ON e.dept_id = d._id AND e.salary > 150", [['bob']]),
    # self-ish multi-join: every emp of dept with another emp
    ("SELECT COUNT(*) FROM emp AS a INNER JOIN emp AS b "
     "ON a.dept_id = b.dept_id", [[6]]),
    # dept with no emps never appears in inner join
    ("SELECT d.dname FROM dept AS d INNER JOIN emp AS e "
     "ON d._id = e.dept_id GROUP BY d.dname ORDER BY d.dname",
     [['eng'], ['ops']]),
    # subquery as join side
    ("SELECT e.ename FROM emp AS e INNER JOIN "
     "(SELECT _id FROM dept WHERE budget > 400) AS big "
     "ON e.dept_id = big._id ORDER BY e._id", [['ann'], ['bob']]),
    # order by joined column desc
    ("SELECT e.ename FROM emp AS e INNER JOIN dept AS d "
     "ON e.dept_id = d._id ORDER BY e.salary DESC",
     [['bob'], ['cid'], ['ann']]),
]


@pytest.mark.parametrize("sql,want", JOIN_CASES,
                         ids=[c[0][:60] for c in JOIN_CASES])
def test_joins(db, sql, want):
    got = rows_of(db, sql)
    if "ORDER BY" in sql:
        assert got == want
    else:
        assert unordered(got) == unordered(want)


# -- time quantum / rangeq (defs_timequantum.go shapes) ----------------------

TQ_CASES = [
    # no-quantum bits always visible
    ("SELECT _id FROM tq WHERE rangeq(ev, '2022-01-01T00:00:00Z', "
     "'2022-12-31T00:00:00Z')", [[2], [3]]),
    # from-only range
    ("SELECT _id FROM tq WHERE rangeq(ev, '2022-03-01T00:00:00Z', null)",
     [[2], [3]]),
    # window containing only january
    ("SELECT _id FROM tq WHERE rangeq(ev, '2022-01-01T00:00:00Z', "
     "'2022-01-31T00:00:00Z')", [[2]]),
    # to-only range ending before everything
    ("SELECT _id FROM tq WHERE rangeq(ev, null, '2021-12-31T00:00:00Z')",
     []),
    # window for a single march day (end exclusive at the next day
    # boundary — reference nextDayGTE, time.go:263; a sub-day range with
    # quantum YMD matches nothing)
    ("SELECT _id FROM tq WHERE rangeq(ev, '2022-03-06T00:00:00Z', "
     "'2022-03-07T00:00:00Z')", [[3]]),
    ("SELECT _id FROM tq WHERE rangeq(ev, '2022-03-06T00:00:00Z', "
     "'2022-03-06T23:00:00Z')", []),
]


@pytest.mark.parametrize("sql,want", TQ_CASES,
                         ids=[c[0][:60] for c in TQ_CASES])
def test_time_quantum(db, sql, want):
    assert unordered(rows_of(db, sql)) == unordered(want)


def test_rangeq_both_null_errors(db):
    from featurebase_tpu.server.api import APIError
    with pytest.raises(APIError):
        rows_of(db, "SELECT _id FROM tq WHERE rangeq(ev, null, null)")


# -- operator edges (defs_binops/unops/between/in shapes) --------------------

OP_CASES = [
    ("SELECT 7 % 3", [[1]]),
    ("SELECT -(2 + 3)", [[-5]]),
    ("SELECT NOT TRUE, NOT FALSE", [[False, True]]),
    ("SELECT 10 / 4", [[2]]),           # int division truncates
    ("SELECT 10.0 / 4", [[2.5]]),
    ("SELECT 2 < 3, 3 <= 3, 4 > 5, 5 >= 5, 1 = 1, 1 != 2",
     [[True, True, False, True, True, True]]),
    ("SELECT 'ab' || 'cd'", [['abcd']]),
    ("SELECT _id FROM emp WHERE salary BETWEEN 100 AND 150 ORDER BY _id",
     [[1], [3]]),
    ("SELECT _id FROM emp WHERE salary NOT BETWEEN 100 AND 150 "
     "ORDER BY _id", [[2], [4]]),
    ("SELECT _id FROM emp WHERE dept_id IN (1, 2) ORDER BY _id",
     [[1], [2], [3]]),
    ("SELECT _id FROM emp WHERE dept_id NOT IN (1, 2) ORDER BY _id",
     [[4]]),
    ("SELECT _id FROM emp WHERE ename LIKE 'a%'", [[1]]),
    ("SELECT _id FROM emp WHERE ename LIKE '%d'", [[3]]),
    ("SELECT _id FROM emp WHERE ename NOT LIKE 'a%' ORDER BY _id",
     [[2], [3], [4]]),
    ("SELECT _id FROM emp WHERE ename LIKE '_ee'", [[4]]),
    # precedence: AND binds tighter than OR
    ("SELECT _id FROM emp WHERE dept_id = 1 AND salary > 150 "
     "OR ename = 'dee' ORDER BY _id", [[2], [4]]),
    ("SELECT _id FROM emp WHERE dept_id = 1 AND (salary > 150 "
     "OR ename = 'dee')", [[2]]),
    # unary minus on columns
    ("SELECT -salary FROM emp WHERE _id = 1", [[-100]]),
    ("SELECT salary * -1 FROM emp WHERE _id = 2", [[-200]]),
]


@pytest.mark.parametrize("sql,want", OP_CASES,
                         ids=[c[0][:60] for c in OP_CASES])
def test_operator_edges(db, sql, want):
    got = rows_of(db, sql)
    if "ORDER BY" in sql:
        assert got == want
    else:
        assert unordered(got) == unordered(want)


# -- keyed tables / cast / date functions (defs_keyed.go, defs_cast.go,
# defs_date_functions.go shapes) ---------------------------------------------

@pytest.fixture(scope="module")
def kdb():
    api = API()
    execute_sql(api, """CREATE TABLE kt (_id STRING, color STRING,
        tags STRINGSET, n INT MIN 0 MAX 100)""")
    execute_sql(api, """INSERT INTO kt (_id, color, tags, n) VALUES
        ('a', 'red', ['x', 'y'], 1),
        ('b', 'blue', ['y'], 2),
        ('c', 'red', ['z'], 3)""")
    return api


KEYED_CASES = [
    ("SELECT _id FROM kt WHERE color = 'red'", [['a'], ['c']]),
    ("SELECT color FROM kt WHERE _id = 'b'", [['blue']]),
    ("SELECT _id, tags FROM kt WHERE _id = 'a'", [['a', ['x', 'y']]]),
    ("SELECT _id FROM kt WHERE setcontains(tags, 'y') ORDER BY n",
     [['a'], ['b']]),
    ("SELECT COUNT(*) FROM kt WHERE color != 'red'", [[1]]),
    ("SELECT color, COUNT(*) FROM kt GROUP BY color ORDER BY color",
     [['blue', 1], ['red', 2]]),
    ("SELECT _id FROM kt WHERE color IN ('red', 'blue') AND n > 1 "
     "ORDER BY n", [['b'], ['c']]),
    ("SELECT SUM(n) FROM kt WHERE color = 'red'", [[4]]),
]


@pytest.mark.parametrize("sql,want", KEYED_CASES,
                         ids=[c[0][:60] for c in KEYED_CASES])
def test_keyed(kdb, sql, want):
    got = rows_of(kdb, sql)
    if "ORDER BY" in sql:
        assert got == want
    else:
        assert unordered(got) == unordered(want)


CAST_DATE_CASES = [
    ("SELECT CAST(3.7 AS INT)", [[3]]),
    ("SELECT CAST(5 AS DECIMAL(2))", [[5.0]]),
    ("SELECT CAST(1 AS BOOL), CAST(0 AS BOOL)", [[True, False]]),
    ("SELECT CAST('12' AS INT) + 1", [[13]]),
    ("SELECT CAST(42 AS STRING)", [['42']]),
    ("SELECT ABS(-5), SIGN(-2), MOD(7, 3)", [[5, -1, 1]]),
    ("SELECT CEIL(1.2), FLOOR(1.8), ROUND(1.46, 1)", [[2, 1, 1.5]]),
    ("SELECT POWER(2, 10)", [[1024]]),
    ("SELECT UPPER('ab'), LOWER('CD'), REVERSE('abc')",
     [['AB', 'cd', 'cba']]),
    ("SELECT TRIM('  x  '), CHAR_LENGTH('abcd')", [['x', 4]]),
    ("SELECT SUBSTRING('hello', 1, 3)", [['ell']]),
    ("SELECT REPLACE('axaxa', 'x', '-')", [['a-a-a']]),
    ("SELECT DATETIMEPART('yy', '2022-03-06T10:30:00Z')", [[2022]]),
    ("SELECT DATETIMEPART('m', '2022-03-06T10:30:00Z')", [[3]]),
    ("SELECT DATETIMEPART('d', '2022-03-06T10:30:00Z')", [[6]]),
    ("SELECT DATETIMEPART('hh', '2022-03-06T10:30:00Z')", [[10]]),
    ("SELECT GREATEST(1, 5, 3), LEAST(4, 2, 9)", [[5, 2]]),
    ("SELECT IIF(2 > 1, 'yes', 'no')", [['yes']]),
    ("SELECT COALESCE(NULL, NULL, 7)", [[7]]),
]


@pytest.mark.parametrize("sql,want", CAST_DATE_CASES,
                         ids=[c[0][:60] for c in CAST_DATE_CASES])
def test_cast_and_functions(db, sql, want):
    assert rows_of(db, sql) == want
