"""Roaring codec, batch ingest, ID allocator, WAL + snapshot durability
tests (modeled on reference roaring serialization tests, batch tests, and
backup/restore gauntlet)."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.native import roaring
from featurebase_tpu.server.api import API, APIError


# ---------------------------------------------------------------------------
# roaring codec
# ---------------------------------------------------------------------------

def _dense(vals):
    w = np.zeros(roaring.WORDS_PER_CONTAINER, dtype=np.uint32)
    v = np.asarray(vals, dtype=np.int64)
    np.bitwise_or.at(w, v >> 5, np.uint32(1) << (v & 31).astype(np.uint32))
    return w


class TestRoaringCodec:
    def test_native_lib_builds(self):
        assert roaring._load() is not None, "C++ codec failed to build"

    @pytest.mark.parametrize("vals", [
        [0], [65535], [0, 1, 2, 3], list(range(100)),
        list(range(0, 65536, 2))[:5000],   # array (large)
        list(range(20000)),                # run-friendly + >4096 card
        list(range(0, 65536)),             # full container
        [1, 5, 9, 100, 4000, 65535],
    ])
    def test_roundtrip_one_container(self, vals):
        keys = np.array([7], dtype=np.uint64)
        words = _dense(vals)[None, :]
        data = roaring.encode(keys, words)
        k2, w2 = roaring.decode(data)
        np.testing.assert_array_equal(k2, keys)
        np.testing.assert_array_equal(w2, words)

    def test_roundtrip_multi_container(self):
        rng = np.random.default_rng(0)
        keys = np.array([0, 3, 16, 1 << 30], dtype=np.uint64)
        words = np.stack([
            _dense(rng.integers(0, 65536, 50)),       # sparse -> array
            _dense(rng.integers(0, 65536, 30000)),    # dense -> bitmap
            _dense(np.arange(1000, 9000)),            # runs
            _dense([42]),
        ])
        data = roaring.encode(keys, words)
        k2, w2 = roaring.decode(data)
        np.testing.assert_array_equal(k2, keys)
        np.testing.assert_array_equal(w2, words)

    def test_python_native_agree(self):
        """Differential: C++ decode == numpy decode; C++ encode decodable by
        numpy."""
        rng = np.random.default_rng(1)
        keys = np.array([2, 5, 77], dtype=np.uint64)
        words = np.stack([_dense(rng.integers(0, 65536, n))
                          for n in (10, 20000, 60000)])
        data_native = roaring.encode(keys, words)
        k_py, w_py = roaring._decode_py(data_native)
        np.testing.assert_array_equal(k_py, keys)
        np.testing.assert_array_equal(w_py, words)
        data_py = roaring._encode_py(keys, words)
        k_n, w_n = roaring.decode(data_py)
        np.testing.assert_array_equal(k_n, keys)
        np.testing.assert_array_equal(w_n, words)

    def test_empty(self):
        k, w = roaring.decode(b"")
        assert len(k) == 0
        assert roaring.encode(np.empty(0, np.uint64),
                              np.empty((0, 2048), np.uint32)) == b""

    def test_malformed(self):
        with pytest.raises(ValueError):
            roaring.decode(b"\x00" * 32)


# ---------------------------------------------------------------------------
# roaring import path (reference api.ImportRoaring semantics)
# ---------------------------------------------------------------------------

class TestRoaringImport:
    def test_import_export_roundtrip(self):
        from featurebase_tpu.ingest.roaring_import import payload_from_rows
        api = API()
        api.create_index("i")
        api.create_field("i", "f", {"type": "set"})
        # rows 2 and 9, various columns
        rows = {
            2: np.zeros(SHARD_WIDTH // 32, dtype=np.uint32),
            9: np.zeros(SHARD_WIDTH // 32, dtype=np.uint32),
        }
        cols2 = [0, 100, 65536, 65537, 900000]
        cols9 = [5, 70000]
        for c in cols2:
            rows[2][c >> 5] |= np.uint32(1 << (c & 31))
        for c in cols9:
            rows[9][c >> 5] |= np.uint32(1 << (c & 31))
        payload = payload_from_rows(rows)
        api.import_roaring("i", "f", 0, payload)
        (r,) = api.query("i", "Row(f=2)")
        np.testing.assert_array_equal(r.columns(), sorted(cols2))
        (r,) = api.query("i", "Row(f=9)")
        np.testing.assert_array_equal(r.columns(), sorted(cols9))
        # existence was updated
        assert api.query("i", "Count(All())") == [len(set(cols2 + cols9))]
        # export roundtrip
        out = api.export_roaring("i", "f", 0)
        k1, w1 = roaring.decode(payload)
        k2, w2 = roaring.decode(out)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(w1, w2)

    def test_import_roaring_shard_multi_view(self):
        from featurebase_tpu.ingest.roaring_import import payload_from_rows
        api = API()
        api.create_index("i")
        api.create_field("i", "f", {"type": "set"})
        api.create_field("i", "g", {"type": "set"})
        mk = lambda row, cols: payload_from_rows(
            {row: _row_words(cols)})
        api.import_roaring_shard("i", 0, {
            "f": {"data": mk(1, [10, 20])},
            "g/standard": {"data": mk(3, [20, 30])},
        })
        assert api.query("i", "Count(Row(f=1))") == [2]
        assert api.query("i", "Count(Row(g=3))") == [2]
        assert api.query("i", "Count(All())") == [3]


def _row_words(cols):
    w = np.zeros(SHARD_WIDTH // 32, dtype=np.uint32)
    c = np.asarray(cols, dtype=np.int64)
    np.bitwise_or.at(w, c >> 5, np.uint32(1) << (c & 31).astype(np.uint32))
    return w


# ---------------------------------------------------------------------------
# batch ingest
# ---------------------------------------------------------------------------

class TestBatch:
    def test_batch_keyed(self):
        from featurebase_tpu.ingest.batch import Batch
        api = API()
        api.create_index("b", {"keys": True})
        api.create_field("b", "color", {"type": "set", "keys": True})
        api.create_field("b", "qty", {"type": "int", "min": 0, "max": 1000})
        batch = Batch(api, "b", ["color", "qty"], size=100)
        batch.add("u1", color=["red", "blue"], qty=5)
        batch.add("u2", color="red", qty=10)
        batch.add("u3", qty=20)
        batch.import_batch()
        (row,) = api.query("b", 'Row(color="red")')
        assert sorted(row.keys) == ["u1", "u2"]
        (vc,) = api.query("b", "Sum(field=qty)")
        assert (vc.val, vc.count) == (35, 3)
        assert api.query("b", "Count(All())") == [3]

    def test_batch_auto_flush(self):
        from featurebase_tpu.ingest.batch import Batch
        api = API()
        api.create_index("b2")
        api.create_field("b2", "f", {"type": "set"})
        batch = Batch(api, "b2", ["f"], size=10)
        for i in range(25):
            batch.add(i, f=1)
        assert len(batch) == 5  # two auto-flushes at 10
        batch.import_batch()
        assert api.query("b2", "Count(Row(f=1))") == [25]

    def test_csv_ingest(self, tmp_path):
        from featurebase_tpu.ingest.batch import csv_ingest
        p = tmp_path / "data.csv"
        p.write_text("id,color,qty\n1,red,10\n2,blue,20\n3,red,30\n")
        api = API()
        api.create_index("c")
        n = csv_ingest(api, "c", str(p))
        assert n == 3
        (row,) = api.query("c", 'Row(color="red")')
        np.testing.assert_array_equal(row.columns(), [1, 3])
        (vc,) = api.query("c", "Sum(field=qty)")
        assert vc.val == 60


# ---------------------------------------------------------------------------
# ID allocator
# ---------------------------------------------------------------------------

class TestIDAlloc:
    def test_reserve_commit(self):
        api = API()
        r = api.reserve_ids("i", "k", "sess1", 0, 10)
        assert (r[0].start, r[0].end) == (1, 11)
        # replay same offset -> same range (exactly-once)
        r2 = api.reserve_ids("i", "k", "sess1", 0, 10)
        assert (r2[0].start, r2[0].end) == (1, 11)
        api.commit_ids("i", "k", "sess1", 0, 10)
        r3 = api.reserve_ids("i", "k", "sess1", 1, 5)
        assert (r3[0].start, r3[0].end) == (11, 16)

    def test_stale_offset_rejected(self):
        api = API()
        api.reserve_ids("i", "k", "s", 5, 10)
        with pytest.raises(APIError):
            api.reserve_ids("i", "k", "s", 3, 10)


# ---------------------------------------------------------------------------
# durability: WAL + snapshot + restart
# ---------------------------------------------------------------------------

class TestDurability:
    def _fill(self, api):
        api.create_index("d", {"keys": False})
        api.create_field("d", "f", {"type": "set"})
        api.create_field("d", "n", {"type": "int", "min": -100, "max": 100})
        api.query("d", "Set(1, f=1) Set(2, f=1) Set(3, f=2)")
        api.query("d", "Set(1, n=42) Set(2, n=-5)")
        api.import_bits("d", "f", [7, 7], [10, 11])

    def _check(self, api):
        assert api.query("d", "Count(Row(f=1))") == [2]
        assert api.query("d", "Count(Row(f=7))") == [2]
        (vc,) = api.query("d", "Sum(field=n)")
        assert (vc.val, vc.count) == (37, 2)
        assert api.query("d", "Count(All())") == [5]

    def test_wal_replay(self, tmp_path):
        d = str(tmp_path / "data")
        api = API(data_dir=d)
        self._fill(api)
        self._check(api)
        # "crash" (no checkpoint) -> new API replays WAL
        api2 = API(data_dir=d)
        self._check(api2)

    def test_checkpoint_restart(self, tmp_path):
        d = str(tmp_path / "data")
        api = API(data_dir=d)
        self._fill(api)
        api.checkpoint()
        import os
        assert os.path.getsize(os.path.join(d, "wal.jsonl")) == 0
        api2 = API(data_dir=d)
        self._check(api2)

    def test_checkpoint_plus_wal(self, tmp_path):
        d = str(tmp_path / "data")
        api = API(data_dir=d)
        self._fill(api)
        api.checkpoint()
        api.query("d", "Set(9, f=1)")  # post-snapshot write -> WAL only
        api2 = API(data_dir=d)
        assert api2.query("d", "Count(Row(f=1))") == [3]

    def test_keyed_durability(self, tmp_path):
        d = str(tmp_path / "data")
        api = API(data_dir=d)
        api.create_index("k", {"keys": True})
        api.create_field("k", "tag", {"type": "set", "keys": True})
        api.query("k", 'Set("a", tag="x") Set("b", tag="x")')
        api.checkpoint()
        api2 = API(data_dir=d)
        (row,) = api2.query("k", 'Row(tag="x")')
        assert sorted(row.keys) == ["a", "b"]
        # same translations survive
        assert api2.find_index_keys("k", ["a"]) == api.find_index_keys("k", ["a"])

    def test_snapshot_preserves_bsi_depth(self, tmp_path):
        d = str(tmp_path / "data")
        api = API(data_dir=d)
        api.create_index("s")
        api.create_field("s", "n", {"type": "int"})
        api.query("s", "Set(1, n=1000)")  # needs 10 bits
        api.checkpoint()
        api2 = API(data_dir=d)
        (vc,) = api2.query("s", "Sum(field=n)")
        assert vc.val == 1000
