"""Synthetic data generation kit (reference: idk/datagen — named source
generators, custom sources, kafka or direct-index targets)."""
import numpy as np
import pytest

from featurebase_tpu.ingest import datagen as dg
from featurebase_tpu.server.api import API


class TestGenerators:
    def test_deterministic_and_range_scoped(self):
        schema = dg.resolve_source("customer")
        a = list(dg.generate_batches(schema, 0, 99, seed=7))
        b = list(dg.generate_batches(schema, 0, 99, seed=7))
        assert all((x[0] == y[0]).all() for x, y in zip(a, b))
        for (ids, cols), (ids2, cols2) in zip(a, b):
            for k in cols:
                assert (cols[k] == cols2[k]).all()
        ids = np.concatenate([x[0] for x in a])
        assert ids.tolist() == list(range(100))

    def test_unknown_source_lists_available(self):
        with pytest.raises(ValueError, match="customer"):
            dg.resolve_source("nope")

    def test_custom_source(self):
        custom = {"x": {"type": "int", "min": 5, "max": 9},
                  "tags": {"type": "set", "values": 4, "per_record": 2}}
        (ids, cols), = dg.generate_batches(custom, 0, 49, seed=1)
        assert cols["x"].min() >= 5 and cols["x"].max() <= 9
        assert cols["tags"].shape == (50, 2)


class TestLoadTargets:
    def test_load_index_and_query(self):
        api = API()
        n = dg.load_index(api, "cust", "customer", 0, 499, seed=3)
        assert n == 500
        (count,) = api.query("cust", "Count(All())")
        assert count == 500
        out = api.query("cust", "Min(field=age) Max(field=age)")
        assert 18 <= out[0].val <= out[1].val <= 95
        (pairs,) = api.query("cust", "TopN(segment, n=5)")
        assert sum(p.count for p in pairs.pairs) == 500

    def test_load_kafka_then_ingest(self):
        from featurebase_tpu.ingest.kafka_broker import KafkaBroker
        from featurebase_tpu.ingest.kafka_source import KafkaClient
        b = KafkaBroker(num_partitions=1).start()
        try:
            c = KafkaClient("127.0.0.1", b.port)
            c.negotiate()  # flexible fetch path carries the records too
            n = dg.load_kafka(c, "gen", "equipment", 0, 99, seed=2)
            assert n == 100
            msgs = c.fetch("gen", 0, 0, max_bytes=1 << 22)
            assert len(msgs) == 100
            import json
            rec = json.loads(msgs[0][2])
            assert {"id", "etype", "year", "cost",
                    "available"} <= set(rec)
            c.close()
        finally:
            b.stop()


class TestDatagenCLI:
    def test_cli_lists_sources(self, capsys):
        from featurebase_tpu.cli import main
        assert main(["datagen"]) == 0
        out = capsys.readouterr().out
        assert "customer" in out and "kitchen-sink" in out


class TestFileToKafka:
    def test_csv_and_jsonl_to_kafka(self, tmp_path):
        """CSV/JSON-lines file -> kafka topic as JSON messages
        (reference: idk kafkaput / csv-kafka variants)."""
        import json
        from featurebase_tpu.ingest.kafka_broker import KafkaBroker
        from featurebase_tpu.ingest.kafka_source import KafkaClient
        csvp = tmp_path / "d.csv"
        csvp.write_text("id,color,n\n1,red,10\n2,blue,20\n")
        jlp = tmp_path / "d.jsonl"
        jlp.write_text('{"id": 3, "color": "green"}\n'
                       '{"id": 4, "color": "red"}\n')
        b = KafkaBroker(num_partitions=1).start()
        try:
            c = KafkaClient("127.0.0.1", b.port)
            n1 = dg.load_kafka_file(c, "f", str(csvp), key_column="id")
            n2 = dg.load_kafka_file(c, "f", str(jlp))
            assert (n1, n2) == (2, 2)
            msgs = c.fetch("f", 0, 0)
            assert len(msgs) == 4
            assert msgs[0][1] == b"1"  # key column
            rec = json.loads(msgs[0][2])
            assert rec == {"id": "1", "color": "red", "n": "10"}
            assert json.loads(msgs[2][2]) == {"id": 3, "color": "green"}
            c.close()
        finally:
            b.stop()
