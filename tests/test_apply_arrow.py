"""Apply() programs and Arrow() dataframe queries (reference: apply.go
executeApply + ivy; arrow.go executeArrow + /index/{i}/dataframe/{shard})."""
import json
import urllib.request

import pytest

from featurebase_tpu.server.api import API
from featurebase_tpu.server.http_server import Server


@pytest.fixture()
def api():
    api = API()
    api.create_index("i", {"trackExistence": True})
    api.create_field("i", "f", {"type": "set"})
    api.create_field("i", "qty", {"type": "int"})
    api.import_bits("i", "f", [1, 1, 2], [1, 2, 3])
    api.import_values("i", "qty", [1, 2, 3], [10, 20, 30])
    return api


class TestApply:
    def test_apply_projection(self, api):
        (vals,) = api.query("i", 'Apply(Row(f=1), "qty * 2")')
        assert vals == [20, 40]

    def test_apply_reduce(self, api):
        (vals,) = api.query("i", 'Apply(Row(f=1), "qty", "sum")')
        assert vals == [30]

    def test_apply_no_filter(self, api):
        (vals,) = api.query("i", 'Apply(All(), "_id + qty", "max")')
        assert vals == [33]

    def test_apply_bad_program(self, api):
        from featurebase_tpu.server.api import APIError
        with pytest.raises(APIError):
            api.query("i", 'Apply(All(), "qty +")')

    def test_apply_distributed(self):
        from featurebase_tpu.testing import TestCluster
        with TestCluster(2) as tc:
            tc[0].create_index("a", {"trackExistence": True})
            tc[0].create_field("a", "v", {"type": "int"})
            cols = [1, 1048577, 2097153]
            tc[0].import_values("a", "v", cols, [1, 2, 3])
            (vals,) = tc[1].query("a", 'Apply(All(), "v", "sum")')
            assert vals == [6]


class TestArrow:
    def test_arrow_roundtrip_http(self, api):
        srv = Server(api=api).start()
        try:
            body = json.dumps({"columns": {"_id": [1, 2, 3],
                                           "price": [1.5, 2.5, 3.5]}})
            req = urllib.request.Request(
                srv.url + "/index/i/dataframe/0", data=body.encode(),
                method="POST")
            req.add_header("Content-Type", "application/json")
            urllib.request.urlopen(req, timeout=30).read()
            req = urllib.request.Request(
                srv.url + "/index/i/query", data=b'Arrow(Row(f=1))',
                method="POST")
            out = json.loads(urllib.request.urlopen(req, timeout=30).read())
            tbl = out["results"][0]
            assert tbl["columns"]["_id"] == [1, 2]
            assert tbl["columns"]["price"] == [1.5, 2.5]
        finally:
            srv.stop()

    def test_arrow_parquet_ingest(self, api):
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq
        table = pa.table({"_id": [1, 3], "name": ["a", "b"]})
        buf = io.BytesIO()
        pq.write_table(table, buf)
        api.holder.index("i").dataframe.ingest_parquet(0, buf.getvalue())
        (tbl,) = api.query("i", "Arrow()")
        assert tbl["columns"]["name"] == ["a", "b"]
