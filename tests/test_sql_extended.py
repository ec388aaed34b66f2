"""Extended SQL coverage: expressions, functions, joins, subqueries, views,
ALTER, system tables, BULK INSERT (modeled on reference sql3/test/defs —
defs_*.go table-driven suites)."""
import pytest

from featurebase_tpu.server.api import API, APIError
from featurebase_tpu.sql.engine import execute_sql


@pytest.fixture()
def api():
    return API()


def q(api, sql):
    return execute_sql(api, sql)


@pytest.fixture()
def shop(api):
    q(api, """CREATE TABLE orders (_id ID, cust IDSET, qty INT MIN 0 MAX 100000,
              price DECIMAL(2), region STRING)""")
    q(api, """INSERT INTO orders (_id, cust, qty, price, region) VALUES
              (1, [10], 5, 2.50, 'east'),
              (2, [11], 7, 1.00, 'west'),
              (3, [10], 2, 4.75, 'east'),
              (4, [12], 9, 3.00, 'north'),
              (5, [11], 4, 0.50, 'west')""")
    q(api, """CREATE TABLE custs (_id ID, name STRING, tier INT MIN 0 MAX 10)""")
    q(api, """INSERT INTO custs (_id, name, tier) VALUES
              (10, 'alice', 1), (11, 'bob', 2), (12, 'carol', 1)""")
    return api


class TestExpressions:
    def test_arithmetic_projection(self, shop):
        out = q(shop, "SELECT _id, qty * 2 + 1 AS dbl FROM orders "
                      "WHERE _id = 1")
        assert out["data"] == [[1, 11]]

    def test_select_without_from(self, api):
        out = q(api, "SELECT 1 + 2 AS x, 'a' || 'b' AS s")
        assert out["data"] == [[3, "ab"]]

    def test_case_expression(self, shop):
        out = q(shop, "SELECT _id, CASE WHEN qty > 5 THEN 'big' "
                      "ELSE 'small' END AS sz FROM orders ORDER BY _id")
        assert [r[1] for r in out["data"]] == \
            ["small", "big", "small", "big", "small"]

    def test_functions(self, api):
        out = q(api, "SELECT UPPER('abc'), LEN('hello'), ABS(0 - 5), "
                     "SUBSTRING('featurebase', 0, 7), COALESCE(NULL, 3)")
        assert out["data"] == [["ABC", 5, 5, "feature", 3]]

    def test_residual_filter_arithmetic(self, shop):
        # qty % 2 = 1 is not bitmap-pushable -> residual row filter
        out = q(shop, "SELECT _id FROM orders WHERE qty % 2 = 1 ORDER BY _id")
        assert out["data"] == [[1], [2], [4]]

    def test_mixed_pushdown_and_residual(self, shop):
        out = q(shop, "SELECT _id FROM orders "
                      "WHERE region = 'west' AND qty * 2 > 9 ORDER BY _id")
        assert out["data"] == [[2]]

    def test_like(self, shop):
        out = q(shop, "SELECT _id FROM orders WHERE region LIKE 'w%'"
                      " ORDER BY _id")
        assert out["data"] == [[2], [5]]

    def test_order_by_expression(self, shop):
        out = q(shop, "SELECT _id FROM orders ORDER BY qty * price DESC "
                      "LIMIT 2")
        assert out["data"] == [[4], [1]]


class TestJoins:
    def test_inner_join(self, shop):
        out = q(shop, "SELECT o._id, c.name FROM orders o "
                      "INNER JOIN custs c ON o.cust = c._id ORDER BY o._id")
        assert out["data"] == [[1, "alice"], [2, "bob"], [3, "alice"],
                               [4, "carol"], [5, "bob"]]

    def test_left_join(self, shop):
        q(shop, "INSERT INTO orders (_id, cust, qty) VALUES (6, [99], 1)")
        out = q(shop, "SELECT o._id, c.name FROM orders o "
                      "LEFT JOIN custs c ON o.cust = c._id "
                      "WHERE o._id = 6")
        assert out["data"] == [[6, None]]

    def test_join_with_aggregate(self, shop):
        out = q(shop, "SELECT c.name, SUM(o.qty) AS total FROM orders o "
                      "INNER JOIN custs c ON o.cust = c._id "
                      "GROUP BY c.name ORDER BY total DESC")
        assert out["data"] == [["carol", 9], ["bob", 11], ["alice", 7]] or \
            out["data"] == [["bob", 11], ["carol", 9], ["alice", 7]]


class TestSubqueries:
    def test_from_subquery(self, shop):
        out = q(shop, "SELECT s.qty FROM (SELECT qty FROM orders "
                      "WHERE region = 'east') s ORDER BY s.qty")
        assert out["data"] == [[2], [5]]

    def test_in_select(self, shop):
        out = q(shop, "SELECT _id FROM orders WHERE cust IN "
                      "(SELECT _id FROM custs WHERE tier = 1) ORDER BY _id")
        assert out["data"] == [[1], [3], [4]]


class TestGroupByGeneral:
    def test_group_by_avg_min_max(self, shop):
        out = q(shop, "SELECT region, AVG(qty), MIN(qty), MAX(qty) "
                      "FROM orders GROUP BY region ORDER BY region")
        data = {r[0]: r[1:] for r in out["data"]}
        assert data["east"] == [3.5, 2, 5]
        assert data["west"] == [5.5, 4, 7]

    def test_group_by_bsi_column(self, shop):
        # grouping on an int column is not PQL-pushable -> hash agg
        out = q(shop, "SELECT tier, COUNT(*) FROM custs GROUP BY tier "
                      "ORDER BY tier")
        assert out["data"] == [[1, 2], [2, 1]]

    def test_having_general(self, shop):
        out = q(shop, "SELECT region, COUNT(*) AS n FROM orders "
                      "GROUP BY region HAVING COUNT(*) > 1 ORDER BY region")
        assert out["data"] == [["east", 2], ["west", 2]]

    def test_count_distinct(self, shop):
        out = q(shop, "SELECT COUNT(DISTINCT region) FROM orders")
        assert out["data"] == [[3]]

    def test_distinct_column(self, shop):
        out = q(shop, "SELECT DISTINCT region FROM orders ORDER BY region")
        assert [r[0] for r in out["data"]] == ["east", "north", "west"]


class TestDDLAndViews:
    def test_alter_table(self, api):
        q(api, "CREATE TABLE a1 (_id ID, x INT MIN 0 MAX 10)")
        q(api, "ALTER TABLE a1 ADD COLUMN y STRING")
        out = q(api, "SHOW COLUMNS FROM a1")
        assert {"x", "y"} <= {r[0] for r in out["data"]}
        q(api, "ALTER TABLE a1 DROP COLUMN y")
        out = q(api, "SHOW COLUMNS FROM a1")
        assert "y" not in {r[0] for r in out["data"]}

    def test_views(self, shop):
        q(shop, "CREATE VIEW east_orders AS SELECT _id, qty FROM orders "
                "WHERE region = 'east'")
        out = q(shop, "SELECT * FROM east_orders ORDER BY _id")
        assert out["data"] == [[1, 5], [3, 2]]
        out = q(shop, "SHOW VIEWS")
        assert out["data"] == [["east_orders"]]
        q(shop, "DROP VIEW east_orders")
        with pytest.raises(APIError):
            q(shop, "SELECT * FROM east_orders")

    def test_show_create_table(self, shop):
        out = q(shop, "SHOW CREATE TABLE custs")
        ddl = out["data"][0][0]
        assert ddl.startswith("CREATE TABLE custs")
        assert "name string" in ddl

    def test_drop_if_exists(self, api):
        q(api, "DROP TABLE IF EXISTS never_existed")


class TestSystemTables:
    def test_fb_table_info(self, shop):
        out = q(shop, "SELECT name FROM fb_table_info ORDER BY name")
        assert [r[0] for r in out["data"]] == ["custs", "orders"]

    def test_fb_table_columns(self, shop):
        out = q(shop, "SELECT name FROM fb_table_columns "
                      "WHERE \"table\" = 'orders'")
        assert {"cust", "qty", "price", "region"} <= \
            {r[0] for r in out["data"]}

    def test_fb_version_and_cluster(self, api):
        assert q(api, "SELECT * FROM fb_version")["data"]
        assert q(api, "SELECT state FROM fb_cluster_info")["data"] == \
            [["NORMAL"]]

    def test_fb_exec_requests(self, api):
        q(api, "SELECT 1")
        out = q(api, "SELECT status FROM fb_exec_requests")
        assert out["data"]


class TestBulkInsert:
    def test_bulk_insert_csv(self, api, tmp_path):
        p = tmp_path / "data.csv"
        p.write_text("_id,color,qty\n1,red,10\n2,blue,20\n3,red,5\n")
        q(api, "CREATE TABLE bulk (_id ID, color STRING, "
               "qty INT MIN 0 MAX 1000)")
        q(api, f"BULK INSERT INTO bulk FROM '{p}' WITH FORMAT 'CSV'")
        out = q(api, "SELECT COUNT(*) FROM bulk WHERE color = 'red'")
        assert out["data"] == [[2]]
        out = q(api, "SELECT SUM(qty) FROM bulk")
        assert out["data"] == [[35]]


class TestTimestamps:
    def test_timestamp_roundtrip(self, api):
        q(api, "CREATE TABLE ev (_id ID, at TIMESTAMP)")
        q(api, "INSERT INTO ev (_id, at) VALUES (1, '2024-03-01T12:00:00')")
        out = q(api, "SELECT at FROM ev")
        assert out["data"][0][0].startswith("2024-03-01T12:00:00")
        out = q(api, "SELECT DATETIMEPART('year', at) FROM ev")
        assert out["data"] == [[2024]]


class TestDistributedSQL:
    def test_sql_runs_distributed(self):
        from featurebase_tpu.testing import TestCluster
        with TestCluster(3) as tc:
            q(tc[0], "CREATE TABLE d (_id ID, v INT MIN 0 MAX 10000)")
            ids = list(range(1, 30))
            vals = ", ".join(f"({i * 1048576 + 1}, {i})" for i in ids)
            q(tc[0], f"INSERT INTO d (_id, v) VALUES {vals}")
            # query from a different node than the writer
            out = q(tc[2], "SELECT SUM(v) FROM d")
            assert out["data"] == [[sum(ids)]]
            out = q(tc[1], "SELECT COUNT(*) FROM d WHERE v >= 15")
            assert out["data"] == [[15]]


class TestR3Functions:
    """String/date function breadth added round 3 (reference:
    inbuiltfunctionsstring.go, inbuiltfunctionsdate.go)."""

    def _one(self, api, expr):
        out = execute_sql(api, f"SELECT {expr} AS x")
        return out["data"][0][0]

    def test_string_functions(self):
        api = API()
        assert self._one(api, "ascii('A')") == 65
        assert self._one(api, "char(66)") == "B"
        assert self._one(api, "charindex('lo', 'hello')") == 3
        assert self._one(api, "replicate('ab', 3)") == "ababab"

    def test_date_functions(self):
        api = API()
        assert self._one(
            api, "datetimediff('d', '2024-01-01T00:00:00', "
                 "'2024-01-11T00:00:00')") == 10
        assert self._one(
            api, "datetimefromparts(2024, 2, 29, 13, 30, 0, 0)") == \
            "2024-02-29T13:30:00"
        assert self._one(
            api, "datetrunc('m', '2024-05-17T13:30:45')") == \
            "2024-05-01T00:00:00"

    def test_system_tables_r3(self):
        api = API()
        api.create_index("t1")
        api.create_field("t1", "f", {"type": "int", "min": 0, "max": 10})
        out = execute_sql(api, "SELECT * FROM fb_tables")
        assert ["t1", "t1", "table", 1] in out["data"]
        ddl = execute_sql(api, "SELECT * FROM fb_table_ddl")["data"]
        assert any("create table t1" in r[1] and "f int" in r[1]
                   for r in ddl)
        fns = execute_sql(api, "SELECT * FROM fb_functions")["data"]
        assert ["charindex", "builtin"] in fns
        perf = execute_sql(
            api, "SELECT * FROM fb_performance_counters")["data"]
        assert isinstance(perf, list)
        dbs = execute_sql(api, "SELECT * FROM fb_database_nodes")["data"]
        assert dbs and dbs[0][0] == "featurebase_tpu"


class TestRangeQ:
    """rangeq(col, from, to): time-quantum range predicate pushed into a
    Rows(field, from, to) bitmap filter (reference: defs_timequantum.go +
    expressionpql.go RANGEQ lowering)."""

    def _env(self):
        api = API()
        execute_sql(api, "CREATE TABLE tq (_id ID, ev STRINGSET "
                         "TIMEQUANTUM 'YMD')")
        # events on three different days
        api.query("tq", 'Set(1, ev="a", 2024-01-01T00:00)')
        api.query("tq", 'Set(2, ev="a", 2024-02-01T00:00)')
        api.query("tq", 'Set(3, ev="b", 2024-03-01T00:00)')
        return api

    def test_range_filters_records(self):
        api = self._env()
        out = execute_sql(
            api, "SELECT _id FROM tq WHERE "
                 "rangeq(ev, '2024-01-15T00:00:00', '2024-02-15T00:00:00')")
        assert out["data"] == [[2]]

    def test_open_ended_from(self):
        api = self._env()
        out = execute_sql(
            api, "SELECT _id FROM tq WHERE "
                 "rangeq(ev, '2024-02-15T00:00:00', null)")
        assert out["data"] == [[3]]

    def test_open_ended_to(self):
        api = self._env()
        out = execute_sql(
            api, "SELECT _id FROM tq WHERE "
                 "rangeq(ev, null, '2024-01-15T00:00:00')")
        assert out["data"] == [[1]]

    def test_both_null_errors(self):
        api = self._env()
        import pytest as _pytest
        with _pytest.raises(Exception, match="cannot both be null"):
            execute_sql(api, "SELECT _id FROM tq WHERE "
                             "rangeq(ev, null, null)")

    def test_pql_rows_bitmap_position(self):
        api = self._env()
        (count,) = api.query(
            "tq", "Count(Rows(ev, from='2024-01-01T00:00', "
                  "to='2024-02-15T00:00'))")
        assert count == 2


class TestQualifiedStar:
    def test_table_star_in_join(self):
        api = API()
        q(api, "CREATE TABLE users (_id ID, age INT MIN 0 MAX 200)")
        q(api, "CREATE TABLE orders (_id ID, userid INT MIN 0 MAX 1000)")
        q(api, "INSERT INTO users (_id, age) VALUES (1, 30), (2, 15)")
        q(api, "INSERT INTO orders (_id, userid) VALUES (10, 1)")
        out = q(api, "SELECT DISTINCT u.* FROM users u "
                     "JOIN orders o ON o.userid = u._id")
        assert [f["name"] for f in out["schema"]["fields"]] == \
            ["_id", "age"]
        assert out["data"] == [[1, 30]]
        out2 = q(api, "SELECT o.*, u.age FROM orders o "
                      "JOIN users u ON o.userid = u._id")
        assert out2["data"] == [[10, 1, 30]]


class TestVarCorr:
    """VAR/CORR aggregates (reference: sql3/planner/expressionanalyzercall.go
    case "VAR"/"CORR"; aggregators expressionagg.go:950,1110).  Differential
    against numpy on both the fused-BSI pushdown path and the volcano
    accumulator (GROUP BY forces the latter)."""

    @pytest.fixture()
    def stats(self, api):
        import numpy as np
        rng = np.random.default_rng(11)
        n = 500
        a = rng.integers(-50, 200, size=n)
        b = (a * 3 + rng.integers(-20, 20, size=n)).astype(int)
        g = rng.integers(0, 3, size=n)
        q(api, "CREATE TABLE s (_id ID, a INT MIN -100 MAX 1000, "
               "b INT MIN -1000 MAX 1000, g INT MIN 0 MAX 10)")
        rows = ", ".join(f"({i+1}, {int(a[i])}, {int(b[i])}, {int(g[i])})"
                         for i in range(n))
        q(api, f"INSERT INTO s (_id, a, b, g) VALUES {rows}")
        return api, a, b, g

    def test_var_pushdown_matches_numpy(self, stats):
        import numpy as np
        api, a, b, g = stats
        out = q(api, "SELECT VAR(a) FROM s")
        got = out["data"][0][0]
        assert got == pytest.approx(float(np.var(a)), abs=1e-4)

    def test_corr_pushdown_matches_numpy(self, stats):
        import numpy as np
        api, a, b, g = stats
        out = q(api, "SELECT CORR(a, b) FROM s")
        got = out["data"][0][0]
        want = float(np.corrcoef(a, b)[0, 1])
        assert got == pytest.approx(want, abs=1e-5)

    def test_var_corr_with_where(self, stats):
        import numpy as np
        api, a, b, g = stats
        out = q(api, "SELECT VAR(a), CORR(a, b) FROM s WHERE g = 1")
        m = g == 1
        assert out["data"][0][0] == pytest.approx(float(np.var(a[m])),
                                                  abs=1e-4)
        assert out["data"][0][1] == pytest.approx(
            float(np.corrcoef(a[m], b[m])[0, 1]), abs=1e-5)

    def test_var_corr_volcano_group_by(self, stats):
        import numpy as np
        api, a, b, g = stats
        out = q(api, "SELECT g, VAR(a), CORR(a, b) FROM s "
                     "GROUP BY g ORDER BY g")
        for row in out["data"]:
            gv = row[0]
            m = g == gv
            assert row[1] == pytest.approx(float(np.var(a[m])), abs=1e-4)
            assert row[2] == pytest.approx(
                float(np.corrcoef(a[m], b[m])[0, 1]), abs=1e-5)

    def test_var_empty_and_constant(self, api):
        q(api, "CREATE TABLE e (_id ID, v INT MIN 0 MAX 10)")
        out = q(api, "SELECT VAR(v) FROM e")
        assert out["data"][0][0] is None
        q(api, "INSERT INTO e (_id, v) VALUES (1, 5), (2, 5)")
        out = q(api, "SELECT VAR(v), CORR(v, v) FROM e")
        assert out["data"][0][0] == 0.0
        assert out["data"][0][1] is None  # zero variance


class TestTableValuedFunctions:
    """FROM-clause function calls (reference: optablevaluedfunction.go has
    the plumbing with an unimplemented iterator; these execute)."""

    def test_generate_series(self, api):
        out = q(api, "SELECT value FROM generate_series(1, 5)")
        assert out["data"] == [[1], [2], [3], [4], [5]]

    def test_generate_series_step_and_alias(self, api):
        out = q(api, "SELECT g.value * 10 AS x FROM "
                     "generate_series(0, 10, 5) AS g")
        assert out["data"] == [[0], [50], [100]]

    def test_generate_series_descending(self, api):
        out = q(api, "SELECT value FROM generate_series(3, 1, -1)")
        assert out["data"] == [[3], [2], [1]]

    def test_tvf_with_where_and_agg(self, api):
        out = q(api, "SELECT SUM(value) FROM generate_series(1, 100) "
                     "WHERE value % 2 = 0")
        assert out["data"] == [[2550]]

    def test_split_string(self, api):
        out = q(api, "SELECT value FROM split_string('a,b,c', ',')")
        assert out["data"] == [["a"], ["b"], ["c"]]

    def test_unknown_tvf_errors(self, api):
        with pytest.raises(APIError):
            q(api, "SELECT * FROM no_such_fn(1)")

    def test_join_table_with_series(self, shop):
        out = q(shop, "SELECT s.value FROM generate_series(1, 3) AS s "
                      "INNER JOIN orders AS o ON s.value = o._id "
                      "ORDER BY s.value")
        assert out["data"] == [[1], [2], [3]]
