"""gRPC service tests (reference: server/grpc.go QuerySQL/QueryPQL/Inspect/
index CRUD; grpc_test.go)."""
import pytest

grpc = pytest.importorskip("grpc")

from featurebase_tpu.proto import pilosa_pb2 as pb  # noqa: E402
from featurebase_tpu.server.api import API  # noqa: E402
from featurebase_tpu.server.grpc_server import (GRPCServer,  # noqa: E402
                                                make_channel_callables)


@pytest.fixture(scope="module")
def rig():
    api = API()
    api.create_index("g", {})
    api.create_field("g", "f", {"type": "set"})
    api.create_field("g", "v", {"type": "int"})
    api.query("g", "Set(1, f=1) Set(2, f=1) Set(3, f=2)")
    api.import_values("g", "v", [1, 2, 3], [10, 20, 30])
    srv = GRPCServer(api=api).start()
    channel = grpc.insecure_channel(srv.address)
    calls = make_channel_callables(channel)
    yield api, calls
    channel.close()
    srv.stop()


class TestQueryPQL:
    def test_count_unary(self, rig):
        _, calls = rig
        t = calls["QueryPQLUnary"](pb.QueryPQLRequest(
            index="g", pql="Count(Row(f=1))"))
        assert t.rows[0].columns[0].uint64_val == 2

    def test_row_stream(self, rig):
        _, calls = rig
        rows = list(calls["QueryPQL"](pb.QueryPQLRequest(
            index="g", pql="Row(f=1)")))
        assert [r.columns[0].uint64_val for r in rows] == [1, 2]

    def test_topn(self, rig):
        _, calls = rig
        rows = list(calls["QueryPQL"](pb.QueryPQLRequest(
            index="g", pql="TopN(f, n=2)")))
        assert rows[0].columns[1].uint64_val == 2

    def test_bad_index_errors(self, rig):
        _, calls = rig
        with pytest.raises(grpc.RpcError) as ei:
            calls["QueryPQLUnary"](pb.QueryPQLRequest(
                index="nope", pql="Count(All())"))
        assert ei.value.code() == grpc.StatusCode.NOT_FOUND


class TestQuerySQL:
    def test_sql_unary(self, rig):
        _, calls = rig
        t = calls["QuerySQLUnary"](pb.QuerySQLRequest(
            sql="SELECT COUNT(*) FROM g"))
        assert t.rows[0].columns[0].uint64_val == 3

    def test_sql_stream(self, rig):
        _, calls = rig
        rows = list(calls["QuerySQL"](pb.QuerySQLRequest(
            sql="SELECT _id, v FROM g ORDER BY _id")))
        assert len(rows) == 3
        assert rows[0].headers[0].name == "_id"
        assert rows[2].columns[1].uint64_val == 30


class TestIndexCRUD:
    def test_create_get_delete(self, rig):
        _, calls = rig
        calls["CreateIndex"](pb.CreateIndexRequest(name="tmp"))
        names = [i.name for i in
                 calls["GetIndexes"](pb.GetIndexesRequest()).indexes]
        assert "tmp" in names
        got = calls["GetIndex"](pb.GetIndexRequest(name="tmp"))
        assert got.index.name == "tmp"
        calls["DeleteIndex"](pb.DeleteIndexRequest(name="tmp"))
        names = [i.name for i in
                 calls["GetIndexes"](pb.GetIndexesRequest()).indexes]
        assert "tmp" not in names


class TestInspect:
    def test_inspect_columns(self, rig):
        _, calls = rig
        rows = list(calls["Inspect"](pb.InspectRequest(
            index="g", columns=[1])))
        assert rows
        assert rows[0].columns[0].uint64_val == 1
