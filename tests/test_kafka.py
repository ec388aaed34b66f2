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


class TestFlexibleProtocol:
    """KIP-482 flexible (compact) versions + RecordBatch v2 (VERDICT r3
    #10): ApiVersions v3 / Metadata v9 / Fetch v12 negotiated against the
    in-process broker, with the legacy encodings still served."""

    def test_varint_primitives(self):
        for v in (0, 1, 127, 128, 300, 2**31 - 1):
            w = kw.Writer().uvarint(v)
            assert kw.Reader(w.build()).uvarint() == v
        for v in (0, -1, 1, -64, 63, -(2**31), 2**31 - 1):
            w = kw.Writer().varint(v)
            assert kw.Reader(w.build()).varint() == v

    def test_compact_primitives(self):
        w = kw.Writer()
        w.compact_string(None).compact_string("").compact_string("abc")
        w.compact_bytes(None).compact_bytes(b"xy")
        w.compact_array([1, 2, 3], lambda w2, x: w2.i32(x))
        w.compact_array(None, None)
        w.tags()
        r = kw.Reader(w.build())
        assert r.compact_string() is None
        assert r.compact_string() == ""
        assert r.compact_string() == "abc"
        assert r.compact_bytes() is None
        assert r.compact_bytes() == b"xy"
        assert r.compact_array(lambda rr: rr.i32()) == [1, 2, 3]
        assert r.compact_array(lambda rr: rr.i32()) is None
        r.tags()
        assert r.remaining() == 0

    def test_crc32c_check_vector(self):
        assert kw.crc32c(b"123456789") == 0xE3069283

    def test_record_batch_roundtrip(self):
        recs = [(b"k1", b"v1", 1000), (None, b"v2", 1005),
                (b"k3", None, 1010)]
        batch = kw.encode_record_batch(42, recs)
        got = kw.decode_record_batches(batch)
        assert got == [(42, b"k1", b"v1", 1000), (43, None, b"v2", 1005),
                       (44, b"k3", None, 1010)]

    def test_record_batch_crc_detects_corruption(self):
        batch = bytearray(kw.encode_record_batch(0, [(b"k", b"v", 1)]))
        batch[-1] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            kw.decode_record_batches(bytes(batch))

    def test_negotiate_flexible_broker(self, broker):
        c = KafkaClient("127.0.0.1", broker.port)
        vers = c.negotiate()
        assert vers[kw.API_API_VERSIONS][1] == 3
        assert vers[kw.API_METADATA][1] == 9
        assert vers[kw.API_FETCH][1] == 12
        c.close()

    def test_flexible_metadata_and_fetch_e2e(self, broker):
        c = KafkaClient("127.0.0.1", broker.port)
        c.negotiate()
        c.produce("flex", 0, [(b"k1", b"v1"), (None, b"v2")])
        md = c.metadata(["flex"])  # routed through the v9 compact path
        assert md["topics"][0]["name"] == "flex"
        assert md["topics"][0]["partitions"] == [0, 1]
        msgs = c.fetch("flex", 0, 0)  # v12 + RecordBatch v2
        assert [(m[1], m[2]) for m in msgs] == [(b"k1", b"v1"),
                                                (None, b"v2")]
        assert [m[0] for m in msgs] == [0, 1]
        # offset seek within the batch
        assert [m[0] for m in c.fetch("flex", 0, 1)] == [1]
        c.close()

    def test_apiversions_v3_direct(self, broker):
        c = KafkaClient("127.0.0.1", broker.port)
        body = kw.Writer().compact_string("fb-tpu") \
            .compact_string("1").tags().build()
        r = c._request(kw.API_API_VERSIONS, 3, body)
        assert r.i16() == 0
        apis = r.compact_array(
            lambda rr: (rr.i16(), rr.i16(), rr.i16(), rr.tags())[0:3])
        assert (kw.API_FETCH, 0, 12) in apis
        c.close()

    def test_legacy_broker_still_served(self):
        b = KafkaBroker(num_partitions=1, flexible=False).start()
        try:
            c = KafkaClient("127.0.0.1", b.port)
            vers = c.negotiate()
            assert vers[kw.API_METADATA][1] == 0
            assert vers[kw.API_FETCH][1] == 0
            c.produce("t", 0, [(b"k", b"v")])
            md = c.metadata(["t"])   # legacy v0 path
            assert md["topics"][0]["name"] == "t"
            msgs = c.fetch("t", 0, 0)  # legacy v0 + MessageSet v1
            assert [(m[1], m[2]) for m in msgs] == [(b"k", b"v")]
            c.close()
        finally:
            b.stop()


class TestSchemaRegistry:
    """Confluent Schema Registry service integration (reference: idk's
    schema-registry client + the docker-compose registry service,
    idk/kafka/source.go, idk/docker-compose.yml)."""

    @pytest.fixture()
    def registry(self):
        from featurebase_tpu.ingest.schema_registry import (
            SchemaRegistryServer)
        s = SchemaRegistryServer().start()
        yield s
        s.stop()

    def test_register_lookup_roundtrip(self, registry):
        from featurebase_tpu.ingest.schema_registry import (
            SchemaRegistryClient, SchemaRegistryError)
        c = SchemaRegistryClient(registry.url)
        sid = c.register("orders-value", AVRO_SCHEMA)
        assert sid >= 1
        # content dedup: same schema -> same id (real-service behavior)
        assert c.register("other-value", AVRO_SCHEMA) == sid
        assert c.get_schema(sid)["name"] == AVRO_SCHEMA["name"]
        assert c.get_schema(sid + 999) is None
        assert set(c.subjects()) == {"orders-value", "other-value"}
        latest = c.latest("orders-value")
        assert latest["id"] == sid and latest["version"] == 1
        with pytest.raises(SchemaRegistryError):
            c.latest("missing-subject")

    def test_avro_consume_through_registry_service(self, registry, broker):
        """End-to-end: producer registers the schema with the service,
        consumer resolves ids through the REST client (the deserializer's
        callable-registry protocol)."""
        from featurebase_tpu.ingest.schema_registry import (
            SchemaRegistryClient)
        c = SchemaRegistryClient(registry.url)
        sid = c.register("av2-value", AVRO_SCHEMA)
        kc = KafkaClient("127.0.0.1", broker.port)
        rec = {"id": 5, "segment": "gold", "value": 123, "score": 1.5}
        kc.produce("av2", 0, [(None, avro_encode(AVRO_SCHEMA, rec, sid))])
        # fresh client (separate cache) plays the consumer side
        consumer_registry = SchemaRegistryClient(registry.url)
        de = AvroDeserializer(consumer_registry)
        msgs = kc.fetch("av2", 0, 0)
        got = de(msgs[0][2])
        assert got == rec
        kc.close()


class TestSaslPlain:
    """SASL/PLAIN auth (reference deployment: idk kafka-sasl consumer;
    SaslHandshake v1 + SaslAuthenticate with RFC 4616 tokens)."""

    def test_handshake_and_authenticated_flow(self):
        b = KafkaBroker(num_partitions=1,
                        users={"svc": "hunter2"}).start()
        try:
            c = KafkaClient("127.0.0.1", b.port, sasl_user="svc",
                            sasl_password="hunter2")
            c.produce("t", 0, [(None, b'{"id": 1, "f": 2}')])
            msgs = c.fetch("t", 0, 0)
            assert len(msgs) == 1
        finally:
            b.stop()

    def test_bad_credentials_rejected(self):
        from featurebase_tpu.ingest.kafka_source import KafkaError
        b = KafkaBroker(num_partitions=1,
                        users={"svc": "hunter2"}).start()
        try:
            with pytest.raises(KafkaError, match="authentication failed"):
                KafkaClient("127.0.0.1", b.port, sasl_user="svc",
                            sasl_password="wrong")
        finally:
            b.stop()

    def test_unauthenticated_requests_refused(self):
        from featurebase_tpu.ingest.kafka_source import KafkaError
        b = KafkaBroker(num_partitions=1,
                        users={"svc": "hunter2"}).start()
        try:
            c = KafkaClient("127.0.0.1", b.port)  # no credentials
            with pytest.raises((KafkaError, OSError)):
                c.metadata(["t"])
        finally:
            b.stop()

    def test_wrong_mechanism_lists_plain(self):
        from featurebase_tpu.ingest import kafka_wire as kw2
        from featurebase_tpu.ingest.kafka_source import KafkaError
        b = KafkaBroker(num_partitions=1,
                        users={"svc": "x"}).start()
        try:
            c = KafkaClient("127.0.0.1", b.port)
            r = c._request(kw2.API_SASL_HANDSHAKE, 1,
                           kw2.Writer().string("SCRAM-SHA-256").build())
            assert r.i16() == 33  # UNSUPPORTED_SASL_MECHANISM
            assert r.array(lambda rr: rr.string()) == ["PLAIN"]
        finally:
            b.stop()

    def test_sasl_source_end_to_end(self):
        import json as _json

        from featurebase_tpu.ingest.kafka_source import KafkaSource
        b = KafkaBroker(num_partitions=1,
                        users={"svc": "hunter2"}).start()
        try:
            prod = KafkaClient("127.0.0.1", b.port, sasl_user="svc",
                               sasl_password="hunter2")
            prod.produce("orders", 0, [
                (None, _json.dumps({"id": i, "n": i}).encode())
                for i in range(3)])
            src = KafkaSource(f"127.0.0.1:{b.port}", "orders",
                              sasl_user="svc", sasl_password="hunter2")
            got = src.poll(10)
            assert [r["id"] for r in got] == [0, 1, 2]
        finally:
            b.stop()
