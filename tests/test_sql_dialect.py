"""SQL dialect breadth: CREATE DATABASE/FUNCTION, COPY, SHOW variants,
plan-graph endpoint (reference: sql3 parser dialect; /sql-exec-graph
http_handler.go:538)."""
import csv
import json
import urllib.request

import pytest

from featurebase_tpu.server.api import API, APIError
from featurebase_tpu.sql.engine import execute_sql


def q(api, sql):
    return execute_sql(api, sql)


class TestDatabases:
    def test_create_show_drop(self):
        api = API()
        q(api, "CREATE DATABASE analytics WITH minworkers 2")
        q(api, "CREATE DATABASE staging")
        out = q(api, "SHOW DATABASES")
        assert [r[0] for r in out["data"]] == ["analytics", "staging"]
        q(api, "DROP DATABASE staging")
        out = q(api, "SHOW DATABASES")
        assert [r[0] for r in out["data"]] == ["analytics"]
        with pytest.raises(APIError):
            q(api, "CREATE DATABASE analytics")
        q(api, "CREATE DATABASE IF NOT EXISTS analytics")
        with pytest.raises(APIError):
            q(api, "DROP DATABASE nope")
        q(api, "DROP DATABASE IF EXISTS nope")


class TestFunctions:
    def test_create_call_drop(self):
        api = API()
        q(api, "CREATE FUNCTION plus_ten(@n int) RETURNS int AS (n + 10)")
        out = q(api, "SELECT plus_ten(5)")
        assert out["data"] == [[15]]
        # functions compose with builtins and columns
        q(api, "CREATE TABLE ft (_id ID, v INT MIN 0 MAX 100)")
        q(api, "INSERT INTO ft (_id, v) VALUES (1, 7)")
        out = q(api, "SELECT plus_ten(v) FROM ft")
        assert out["data"] == [[17]]
        out = q(api, "SHOW FUNCTIONS")
        assert out["data"][0][0] == "plus_ten"
        q(api, "DROP FUNCTION plus_ten")
        with pytest.raises(APIError):
            q(api, "SELECT plus_ten(1)")

    def test_function_with_two_params_and_case(self):
        api = API()
        q(api, "CREATE FUNCTION clamp(@x int, @hi int) RETURNS int AS "
               "(CASE WHEN x > hi THEN hi ELSE x END)")
        assert q(api, "SELECT clamp(5, 3)")["data"] == [[3]]
        assert q(api, "SELECT clamp(2, 3)")["data"] == [[2]]

    def test_wrong_arity_errors(self):
        api = API()
        q(api, "CREATE FUNCTION one(@x int) RETURNS int AS (x)")
        with pytest.raises(APIError):
            q(api, "SELECT one(1, 2)")


class TestCopy:
    def test_copy_to_and_from(self, tmp_path):
        api = API()
        q(api, "CREATE TABLE src (_id ID, region STRING, "
               "qty INT MIN 0 MAX 100)")
        q(api, "INSERT INTO src (_id, region, qty) VALUES "
               "(1, 'east', 10), (2, 'west', 20)")
        path = str(tmp_path / "out.csv")
        out = q(api, f"COPY src TO '{path}'")
        assert out["data"] == [[2]]
        rows = list(csv.reader(open(path)))
        assert rows[0][0] == "_id"
        assert len(rows) == 3
        # round trip into a fresh table on a fresh API
        api2 = API()
        out = q(api2, f"COPY dst FROM '{path}'")
        assert out["data"] == [[2]]
        got = q(api2, "SELECT COUNT(*) FROM dst")
        assert got["data"] == [[2]]


class TestPlanGraph:
    def test_exec_graph_endpoint(self):
        from featurebase_tpu.server.http_server import Server
        api = API()
        q(api, "CREATE TABLE pg (_id ID, v INT MIN 0 MAX 100)")
        srv = Server(api=api).start()
        try:
            req = urllib.request.Request(
                srv.url + "/sql-exec-graph",
                data=json.dumps({"sql": "SELECT _id FROM pg WHERE v > 1 "
                                        "ORDER BY _id LIMIT 3"}).encode(),
                method="POST")
            with urllib.request.urlopen(req, timeout=30) as r:
                out = json.loads(r.read())
        finally:
            srv.stop()
        (plan,) = out["plans"]
        names = []

        def walk(n):
            names.append(n["op"])
            for c in n.get("children", []):
                walk(c)
        walk(plan)
        assert any("Scan" in n for n in names)
        assert any("Top" in n or "OrderBy" in n for n in names)


class TestPersistence:
    def test_databases_functions_survive_restart(self, tmp_path):
        d = str(tmp_path / "data")
        api = API(data_dir=d)
        q(api, "CREATE DATABASE keep")
        q(api, "CREATE FUNCTION dbl(@x int) RETURNS int AS (x * 2)")
        api.checkpoint()
        api2 = API(data_dir=d)
        assert "keep" in api2.holder.sql_databases
        assert q(api2, "SELECT dbl(4)")["data"] == [[8]]

    def test_wal_replay_without_checkpoint(self, tmp_path):
        d = str(tmp_path / "data")
        api = API(data_dir=d)
        q(api, "CREATE FUNCTION trpl(@x int) RETURNS int AS (x * 3)")
        api3 = API(data_dir=d)  # replays the WAL
        assert q(api3, "SELECT trpl(3)")["data"] == [[9]]
