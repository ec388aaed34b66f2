"""Client library tests (reference: client/ — cluster-aware HTTP client,
ORM builders orm.go, batch importer importer.go)."""
import pytest

from featurebase_tpu.client import Client, ClientError
from featurebase_tpu.server.api import API
from featurebase_tpu.server.http_server import Server


@pytest.fixture(scope="module")
def rig():
    api = API()
    srv = Server(api=api).start()
    yield Client(srv.url)
    srv.stop()


class TestORM:
    def test_builders_compose(self, rig):
        idx = rig.index("orm")
        f = idx.field("f", type="set")
        v = idx.field("v", type="int")
        assert str(idx.count(idx.intersect(f.row(1), v.gt(5)))) == \
            "Count(Intersect(Row(f=1), Row(v > 5)))"
        assert str(f.topn(5)) == "TopN(f, n=5)"
        assert str(v.sum(f.row(2))) == "Sum(Row(f=2), field=v)"

    def test_schema_query_roundtrip(self, rig):
        idx = rig.index("orm")
        f = idx.field("f", type="set")
        v = idx.field("v", type="int")
        rig.create_schema(idx)
        rig.query(idx, f.set(1, 3))
        rig.query(idx, f.set(2, 3))
        rig.import_values("orm", "v", [1, 2], [10, 20])
        assert rig.query(idx, idx.count(f.row(3))) == [2]
        out = rig.query(idx, v.sum(f.row(3)))
        assert out[0]["value"] == 30
        assert rig.sql("SELECT COUNT(*) FROM orm")["data"] == [[2]]

    def test_error_surface(self, rig):
        with pytest.raises(ClientError) as ei:
            rig.query("missing", "Count(All())")
        assert ei.value.status == 404


class TestBatch:
    def test_batch_import(self, rig):
        idx = rig.index("b1")
        idx.field("kind", type="mutex")
        idx.field("score", type="int")
        rig.create_schema(idx)
        with rig.batch(idx, ["kind", "score"]) as b:
            for i in range(100):
                b.add(i, kind=i % 3, score=i)
        assert rig.query(idx, "Count(Row(kind=0))") == [34]
        out = rig.query(idx, "Sum(field=score)")
        assert out[0]["value"] == sum(range(100))

    def test_keyed_batch(self, rig):
        idx = rig.index("b2", keys=True)
        idx.field("tag", type="set", keys=True)
        rig.create_schema(idx)
        with rig.batch(idx, ["tag"]) as b:
            b.add("u1", tag="red")
            b.add("u2", tag=["red", "blue"])
        assert rig.query(idx, 'Count(Row(tag="red"))') == [2]

    def test_failover_hosts(self):
        api = API()
        srv = Server(api=api).start()
        try:
            c = Client(["http://127.0.0.1:1", srv.url])
            assert c.status()["state"] == "NORMAL"
        finally:
            srv.stop()
