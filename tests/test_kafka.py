"""Kafka-protocol ingest: wire codec, in-process broker, consumer-group
offsets, Avro decoding, and the e2e produce -> ingest -> crash mid-batch ->
resume exactly-once flow (reference: idk/kafka/source.go:1 +
idk/docker-compose.yml integration rig)."""
import json

import numpy as np
import pytest

from featurebase_tpu.ingest import kafka_wire as kw
from featurebase_tpu.ingest.idk import Ingester
from featurebase_tpu.ingest.kafka_broker import KafkaBroker
from featurebase_tpu.ingest.kafka_source import (AvroDeserializer,
                                                 KafkaClient, KafkaSource,
                                                 avro_encode)
from featurebase_tpu.server.api import API


@pytest.fixture()
def broker():
    b = KafkaBroker(num_partitions=2).start()
    yield b
    b.stop()


class TestWireProtocol:
    def test_message_set_roundtrip(self):
        msgs = [(b"k1", b"v1", 111), (None, b"v2", 222), (b"k3", None, -1)]
        data = kw.encode_message_set(5, msgs)
        got = kw.decode_message_set(data)
        assert got == [(5, b"k1", b"v1", 111), (6, None, b"v2", 222),
                       (7, b"k3", None, -1)]

    def test_crc_validation(self):
        data = bytearray(kw.encode_message_set(0, [(b"k", b"v", 1)]))
        data[-1] ^= 0xFF  # corrupt the value
        with pytest.raises(ValueError, match="crc"):
            kw.decode_message_set(bytes(data))

    def test_produce_fetch_over_socket(self, broker):
        c = KafkaClient("127.0.0.1", broker.port)
        md = c.metadata(["t"])
        assert md["topics"][0]["partitions"] == [0, 1]
        base = c.produce("t", 0, [(None, b'{"a": 1}'), (b"k", b'{"a": 2}')])
        assert base == 0
        assert c.produce("t", 0, [(None, b'{"a": 3}')]) == 2
        msgs = c.fetch("t", 0, 1)
        assert [(m[0], m[2]) for m in msgs] == \
            [(1, b'{"a": 2}'), (2, b'{"a": 3}')]

    def test_offset_commit_fetch(self, broker):
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["t"])
        assert c.offset_fetch("g1", "t", [0, 1]) == {0: -1, 1: -1}
        c.offset_commit("g1", {("t", 0): 7, ("t", 1): 3})
        assert c.offset_fetch("g1", "t", [0, 1]) == {0: 7, 1: 3}
        assert c.offset_fetch("g2", "t", [0]) == {0: -1}  # per-group


AVRO_SCHEMA = {
    "type": "record", "name": "rec",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "segment", "type": "string"},
        {"name": "value", "type": ["null", "long"]},
        {"name": "score", "type": "double"},
    ],
}


class TestAvro:
    def test_roundtrip(self):
        rec = {"id": 42, "segment": "gold", "value": 7, "score": 1.5}
        blob = avro_encode(AVRO_SCHEMA, rec, schema_id=9)
        de = AvroDeserializer({9: AVRO_SCHEMA})
        assert de(blob) == rec

    def test_null_union_and_negative(self):
        rec = {"id": -3, "segment": "s", "value": None, "score": -0.25}
        blob = avro_encode(AVRO_SCHEMA, rec, schema_id=9)
        assert AvroDeserializer({9: AVRO_SCHEMA})(blob) == rec

    def test_unknown_schema_id_errors(self):
        blob = avro_encode(AVRO_SCHEMA, {"id": 1, "segment": "x",
                                         "value": None, "score": 0.0}, 5)
        with pytest.raises(Exception, match="unknown schema"):
            AvroDeserializer({9: AVRO_SCHEMA})(blob)


def _mk_api():
    api = API()
    api.create_index("k")
    api.create_field("k", "segment", {"type": "set"})
    api.create_field("k", "value", {"type": "int", "min": -10**6,
                                    "max": 10**6})
    return api


def _produce_json(broker, n, start=0):
    c = KafkaClient("127.0.0.1", broker.port)
    c.metadata(["events"])
    for p in (0, 1):
        msgs = [(None, json.dumps(
            {"id": i, "segment": i % 5, "value": i * 3}).encode())
            for i in range(start, start + n) if i % 2 == p]
        if msgs:
            c.produce("events", p, msgs)
    c.close()


class TestKafkaIngestE2E:
    def test_produce_ingest_query(self, broker):
        _produce_json(broker, 50)
        api = _mk_api()
        src = KafkaSource(f"127.0.0.1:{broker.port}", "events", group="g")
        ing = Ingester(api, "k", src, fields=["segment", "value"],
                       batch_size=16)
        stats = ing.run()
        assert stats["records"] == 50
        assert api.query("k", "Count(Row(segment=1))") == [10]
        (sum_vc,) = api.query("k", "Sum(field=value)")
        assert sum_vc.val == sum(i * 3 for i in range(50))
        # nothing new: poll returns empty, offsets committed
        assert ing.run()["records"] == 0

    def test_crash_mid_batch_resume_exactly_once(self, broker, tmp_path):
        """Produce -> ingest -> crash after import but before offset
        commit -> restart with a fresh consumer -> exactly-once result
        (reference contract: idk/ingest.go:1062 commitRecord ordering)."""
        _produce_json(broker, 40)
        api = _mk_api()
        boom = RuntimeError("crash before offset commit")

        src = KafkaSource(f"127.0.0.1:{broker.port}", "events", group="g")
        ing = Ingester(api, "k", src, fields=["segment", "value"],
                       batch_size=16)

        def crash(batch_no):
            if batch_no == 1:  # second batch: imported, not committed
                raise boom
        ing._post_import_hook = crash
        with pytest.raises(RuntimeError):
            ing.run()

        # fresh consumer in the same group resumes from COMMITTED offsets,
        # so the crashed batch replays; Set-bit idempotence dedups it
        src2 = KafkaSource(f"127.0.0.1:{broker.port}", "events", group="g")
        ing2 = Ingester(api, "k", src2, fields=["segment", "value"],
                        batch_size=16)
        ing2.run()
        for r in range(5):
            assert api.query("k", f"Count(Row(segment={r}))") == [8], r
        (sum_vc,) = api.query("k", "Sum(field=value)")
        assert sum_vc.val == sum(i * 3 for i in range(40))
        assert sum_vc.count == 40

    def test_committed_offsets_survive_broker_restart(self, broker,
                                                      tmp_path):
        offs = str(tmp_path / "offsets.json")
        b2 = KafkaBroker(num_partitions=1, offsets_path=offs).start()
        try:
            c = KafkaClient("127.0.0.1", b2.port)
            c.metadata(["t"])
            c.offset_commit("g", {("t", 0): 5})
            c.close()
        finally:
            b2.stop()
        b3 = KafkaBroker(num_partitions=1, offsets_path=offs).start()
        try:
            c = KafkaClient("127.0.0.1", b3.port)
            assert c.offset_fetch("g", "t", [0]) == {0: 5}
            c.close()
        finally:
            b3.stop()

    def test_avro_pipeline(self, broker):
        c = KafkaClient("127.0.0.1", broker.port)
        c.metadata(["av"])
        recs = [{"id": i, "segment": f"s{i % 3}", "value": i,
                 "score": float(i)} for i in range(12)]
        c.produce("av", 0, [(None, avro_encode(AVRO_SCHEMA, r, 7))
                            for r in recs])
        c.close()
        api = API()
        api.create_index("k")
        api.create_field("k", "segment", {"type": "set", "keys": True})
        api.create_field("k", "value", {"type": "int", "min": 0,
                                        "max": 1000})
        src = KafkaSource(
            f"127.0.0.1:{broker.port}", "av", group="g",
            deserializer=AvroDeserializer({7: AVRO_SCHEMA}))
        ing = Ingester(api, "k", src, fields=["segment", "value"])
        assert ing.run()["records"] == 12
        assert api.query("k", 'Count(Row(segment="s0"))') == [4]
