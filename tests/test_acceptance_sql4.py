"""SQL acceptance corpus, tranche 5: scalar string/date/number function
edges, casts, boolean logic, the sql1 grouper/joiner join set, insert/
replace semantics, BULK INSERT and COPY shapes, SHOW statements
(reference: sql3/test/defs — defs_string_functions.go,
defs_date_functions.go, defs_cast.go, defs_bool.go, defs_sql1.go,
defs_inserts.go, defs_bulkinsert.go, defs_copy.go case shapes,
re-authored with hand-computed expectations; VERDICT r4 next #7
tranche target).
"""
import pytest

from featurebase_tpu.server.api import API, APIError
from featurebase_tpu.sql.engine import execute_sql


@pytest.fixture(scope="module")
def db():
    api = API()
    # sql1 grouper/joiner analog (defs_sql1.go)
    execute_sql(api, """CREATE TABLE grouper (_id ID, color STRING,
        score INT MIN 0 MAX 1000, age INT MIN 0 MAX 100)""")
    execute_sql(api, """INSERT INTO grouper (_id, color, score, age)
        VALUES (1,'red',10,20), (2,'blue',20,30), (3,'red',30,20),
               (4,'green',40,40), (5,'blue',50,30), (6,'red',60,20)""")
    execute_sql(api, """CREATE TABLE joiner (_id ID,
        grouperid INT MIN 0 MAX 100, jointype INT MIN 0 MAX 10)""")
    execute_sql(api, """INSERT INTO joiner (_id, grouperid, jointype)
        VALUES (1,1,1),(2,1,2),(3,2,1),(4,3,2),(5,9,1)""")
    return api


def one(api, sql):
    return execute_sql(api, sql)["data"][0][0]


def data(api, sql):
    return execute_sql(api, sql)["data"]


# ------------------------------------------------------- string functions

STRING_CASES = [
    # defs_string_functions.go shapes, expectations recomputed
    ("select reverse(null)", None),
    ("select reverse('')", ""),
    ("select reverse('this')", "siht"),
    ("select reverse(reverse('this'))", "this"),
    ("select substring(null, 1, 3)", None),
    ("select substring('testing', 1, 3)", "est"),
    ("select substring('testing', -5)", "sting"),
    ("select substring(reverse('testing'), 3)", "tset"),
    ("select stringsplit('string,split', ',')", "string"),
    ("select stringsplit('test,hello', ',', 1)", "hello"),
    ("select char(82)", "R"),
    ("select ascii('R')", 82),
    ("select ascii(char(255))", 255),
    ("select upper(null)", None),
    ("select upper('this')", "THIS"),
    ("select lower('THIS')", "this"),
    ("select ltrim('  x')", "x"),
    ("select rtrim('x  ')", "x"),
    ("select trim('  x ')", "x"),
    ("select char_length('hello')", 5),
    ("select char_length('')", 0),
    ("select space(3)", "   "),
    ("select replicate('ab', 3)", "ababab"),
    ("select charindex('st', 'testing')", 2),
    ("select charindex('zz', 'testing')", -1),
    ("select replaceall('aaa', 'a', 'b')", "bbb"),
    ("select format('{0}-{1}', 'a', 'b')", "a-b"),
    ("select prefix('hello', 2)", "he"),
    ("select suffix('hello', 2)", "lo"),
    ("select str(12)", "12"),
    ("select upper(lower('MiXeD'))", "MIXED"),
    ("select 'a' || 'b' || 'c'", "abc"),
]


@pytest.mark.parametrize("sql,want", STRING_CASES,
                         ids=[c[0][:44] for c in STRING_CASES])
def test_string_functions(db, sql, want):
    assert one(db, sql) == want


STRING_ERRORS = [
    # wrong arity / wrong types error (defs_string_functions.go ExpErr)
    "select reverse()",
    "select char()",
    "select ascii()",
    "select upper('a','b')",
]


@pytest.mark.parametrize("sql", STRING_ERRORS)
def test_string_function_errors(db, sql):
    with pytest.raises(Exception):
        execute_sql(db, sql)


# --------------------------------------------------------- date functions

DATE_CASES = [
    # defs_date_functions.go shapes (datetimepart/-name/-diff/-add,
    # totimestamp) over fixed instants
    ("select datetimepart('yy', '2023-06-15T10:30:45Z')", 2023),
    ("select datetimepart('m', '2023-06-15T10:30:45Z')", 6),
    ("select datetimepart('d', '2023-06-15T10:30:45Z')", 15),
    ("select datetimepart('hh', '2023-06-15T10:30:45Z')", 10),
    ("select datetimepart('mi', '2023-06-15T10:30:45Z')", 30),
    ("select datetimepart('s', '2023-06-15T10:30:45Z')", 45),
    ("select datetimename('m', '2023-06-15T00:00:00Z')", "June"),
    ("select datetimediff('yy', '2013-01-01T00:00:00Z', "
     "'2023-02-03T12:00:00Z')", 10),
    ("select datetimediff('d', '2024-01-01T00:00:00Z', "
     "'2024-01-31T00:00:00Z')", 30),
    ("select datetimediff('hh', '2024-01-01T00:00:00Z', "
     "'2024-01-02T06:00:00Z')", 30),
    ("select datetimediff('s', '2024-01-01T00:00:00Z', "
     "'2024-01-01T00:01:30Z')", 90),
    ("select dateadd('d', 1, '2023-06-15T00:00:00Z')",
     "2023-06-16T00:00:00"),
    ("select dateadd('yy', -1, '2023-06-15T00:00:00Z')",
     "2022-06-15T00:00:00"),
    ("select datetimediff('yy', null, '2023-01-01T00:00:00Z')", None),
]


@pytest.mark.parametrize("sql,want", DATE_CASES,
                         ids=[c[0][:44] for c in DATE_CASES])
def test_date_functions(db, sql, want):
    assert one(db, sql) == want


# ----------------------------------------------------------------- casts

CAST_CASES = [
    ("select cast(1.7 as int)", 1),
    ("select cast(-1.7 as int)", -1),
    ("select cast(12 as string)", "12"),
    ("select cast('123' as int)", 123),
    ("select cast(1 as bool)", True),
    ("select cast(0 as bool)", False),
    ("select cast(12 as decimal(2))", 12.0),
    ("select cast('1.5' as decimal(2))", 1.5),
    ("select cast(true as int)", 1),
    ("select cast(null as int)", None),
]


@pytest.mark.parametrize("sql,want", CAST_CASES,
                         ids=[c[0][:40] for c in CAST_CASES])
def test_casts(db, sql, want):
    assert one(db, sql) == want


# -------------------------------------------------------- numbers / bools

NUM_BOOL_CASES = [
    ("select abs(-5)", 5),
    ("select ceil(1.2)", 2),
    ("select floor(1.8)", 1),
    ("select round(1.25, 1)", 1.2),
    ("select sqrt(9)", 3.0),
    ("select power(2, 10)", 1024),
    ("select mod(7, 3)", 1),
    ("select sign(-3)", -1),
    ("select sign(0)", 0),
    ("select 5 / 2", 2),          # int division truncates
    ("select 5.0 / 2", 2.5),
    ("select 5 / 0", None),        # division by zero -> NULL
    ("select 7 % 3", 1),
    ("select true and false", False),
    ("select true or false", True),
    ("select not true", False),
    ("select 1 = 1 and 2 = 2", True),
    ("select 1 != 2", True),
    ("select -(-3)", 3),
    ("select 2 * 3 + 1", 7),
    ("select 2 + 3 * 2", 8),       # precedence
    ("select (2 + 3) * 2", 10),
]


@pytest.mark.parametrize("sql,want", NUM_BOOL_CASES,
                         ids=[c[0][:40] for c in NUM_BOOL_CASES])
def test_numbers_and_bools(db, sql, want):
    assert one(db, sql) == want


# --------------------------------------------------------- sql1 join set

class TestSql1Joins:
    """defs_sql1.go grouper/joiner shapes (expectations recomputed over
    the seeded rows)."""

    def test_inner_join_count(self, db):
        # joiner grouperids {1,1,2,3,9}; 9 has no grouper -> 4 matches
        assert one(db, "select count(*) from grouper g INNER JOIN joiner "
                       "j ON g._id = j.grouperid") == 4

    def test_join_distinct_ids(self, db):
        got = sorted(r[0] for r in data(
            db, "select distinct _id from grouper g INNER JOIN joiner j "
                "ON g._id = j.grouperid"))
        assert got == [1, 2, 3]

    def test_join_filter_left(self, db):
        got = sorted(r[0] for r in data(
            db, "select _id from grouper g INNER JOIN joiner j ON "
                "g._id = j.grouperid where g.color = 'red'"))
        assert got == [1, 1, 3]  # grouper 1 matches twice

    def test_join_filter_both(self, db):
        got = sorted(r[0] for r in data(
            db, "select _id from grouper g INNER JOIN joiner j ON "
                "g._id = j.grouperid where g.color = 'red' and "
                "j.jointype = 2"))
        assert got == [1, 3]

    def test_distinct_order(self, db):
        got = data(db, "select distinct score from grouper "
                       "order by score asc")
        assert got == [[10], [20], [30], [40], [50], [60]]

    def test_select_column(self, db):
        got = sorted(r[0] for r in data(db, "select age from grouper"))
        assert got == [20, 20, 20, 30, 30, 40]

    def test_select_by_id(self, db):
        got = data(db, "select * from grouper where _id=2")
        assert len(got) == 1 and got[0][0] == 2

    def test_group_by_color_count(self, db):
        got = sorted(map(tuple, data(
            db, "select count(*) as c, color from grouper "
                "group by color")))
        assert got == [(1, "green"), (2, "blue"), (3, "red")]

    def test_group_by_with_having(self, db):
        got = sorted(map(tuple, data(
            db, "select count(*) as c, color from grouper "
                "group by color having count(*) > 1")))
        assert got == [(2, "blue"), (3, "red")]

    def test_avg_per_group(self, db):
        got = sorted(map(tuple, data(
            db, "select avg(score) as a, color from grouper "
                "group by color")))
        assert len(got) == 3
        byc = {c: a for a, c in got}
        assert byc["blue"] == 35.0 and byc["green"] == 40.0
        assert abs(byc["red"] - 100 / 3) < 1e-6


# ---------------------------------------------- inserts / bulk / copy

class TestInsertShapes:
    def test_replace_overwrites(self):
        api = API()
        execute_sql(api, "CREATE TABLE ins (_id ID, s STRING, "
                         "n INT MIN 0 MAX 100)")
        execute_sql(api, "INSERT INTO ins (_id, s, n) VALUES (1,'a',1)")
        execute_sql(api, "REPLACE INTO ins (_id, s, n) VALUES (1,'b',2)")
        assert data(api, "select s, n from ins where _id = 1") \
            == [["b", 2]]

    def test_insert_without_columns_uses_schema_order(self):
        api = API()
        execute_sql(api, "CREATE TABLE ins2 (_id ID, a INT MIN 0 MAX 9, "
                         "b STRING)")
        execute_sql(api, "INSERT INTO ins2 VALUES (1, 5, 'x')")
        assert data(api, "select a, b from ins2") == [[5, "x"]]

    def test_insert_arity_mismatch_errors(self):
        api = API()
        execute_sql(api, "CREATE TABLE ins3 (_id ID, a INT MIN 0 MAX 9)")
        with pytest.raises(Exception):
            execute_sql(api, "INSERT INTO ins3 (_id, a) VALUES (1)")

    def test_bulk_insert_csv(self, tmp_path):
        # defs_bulkinsert.go: BULK INSERT from a csv file
        api = API()
        execute_sql(api, "CREATE TABLE bk (_id ID, n INT MIN 0 MAX 100, "
                         "s STRING)")
        p = tmp_path / "rows.csv"
        p.write_text("1,10,a\n2,20,b\n3,30,c\n")
        execute_sql(api, f"""BULK INSERT INTO bk (_id, n, s)
            MAP (0 ID, 1 INT, 2 STRING) FROM '{p}' WITH FORMAT 'CSV'
            INPUT 'FILE'""")
        assert one(api, "select count(*) from bk") == 3
        assert data(api, "select n from bk where _id = 2") == [[20]]

    def test_copy_table(self):
        # defs_copy.go: COPY t TO t2 clones schema + data
        api = API()
        execute_sql(api, "CREATE TABLE src (_id ID, n INT MIN 0 MAX 100)")
        execute_sql(api, "INSERT INTO src (_id, n) VALUES (1,10),(2,20)")
        execute_sql(api, "COPY src TO dst")
        assert sorted(map(tuple, data(api, "select _id, n from dst"))) \
            == [(1, 10), (2, 20)]


# ---------------------------------------------------------------- show

class TestShow:
    def test_show_tables_and_columns(self, db):
        tables = [r[0] for r in data(db, "SHOW TABLES")]
        assert "grouper" in tables and "joiner" in tables
        cols = [r[0] for r in data(db, "SHOW COLUMNS FROM grouper")]
        assert "color" in cols and "score" in cols

    def test_show_create_table(self, db):
        out = data(db, "SHOW CREATE TABLE grouper")
        assert "grouper" in out[0][0]

    def test_show_missing_table_errors(self, db):
        with pytest.raises(APIError):
            execute_sql(db, "SHOW COLUMNS FROM missing")


def test_declared_column_order():
    """SELECT * and no-column-list INSERT use DECLARED field order, not
    alphabetical (reference: defs_select ExpHdrs; found when INSERT
    INTO t VALUES(...) mismapped values on a table whose declared order
    differed from the sorted one)."""
    api = API()
    execute_sql(api, "CREATE TABLE ord (_id ID, zz INT MIN 0 MAX 9, "
                     "aa STRING)")
    execute_sql(api, "INSERT INTO ord VALUES (1, 5, 'x')")
    out = execute_sql(api, "SELECT * FROM ord")
    assert [f["name"] for f in out["schema"]["fields"]] == \
        ["_id", "zz", "aa"]
    assert out["data"] == [[1, 5, "x"]]
