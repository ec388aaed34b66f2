"""WAL group commit + recovery (reference: rbf WAL rbf/db.go:163,264 —
one sync per committed group, torn-tail tolerance on replay)."""
import json
import os
import threading

from featurebase_tpu.storage.wal import WAL


class TestGroupCommit:
    def test_concurrent_appends_share_fsyncs(self, tmp_path):
        path = str(tmp_path / "wal.jsonl")
        wal = WAL(path, fsync=True)
        n_threads, per_thread = 8, 50

        def writer(t):
            for i in range(per_thread):
                wal.append({"t": t, "i": i})
        threads = [threading.Thread(target=writer, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wal.close()
        total = n_threads * per_thread
        # every entry durable and intact
        lines = [json.loads(x) for x in open(path).read().splitlines()]
        assert len(lines) == total
        assert {(e["t"], e["i"]) for e in lines} == {
            (t, i) for t in range(n_threads) for i in range(per_thread)}
        # group commit: far fewer syncs than entries
        assert wal.sync_count < total / 2, wal.sync_count

    def test_append_is_durable_before_return(self, tmp_path):
        path = str(tmp_path / "wal.jsonl")
        wal = WAL(path, fsync=True)
        wal.append({"x": 1})
        # entry must be on disk already (no close needed)
        assert json.loads(open(path).read().strip()) == {"x": 1}
        wal.close()

    def test_replay_and_truncate(self, tmp_path):
        path = str(tmp_path / "wal.jsonl")
        wal = WAL(path)
        for i in range(10):
            wal.append({"i": i})
        wal.close()
        wal2 = WAL(path)
        seen = []
        assert wal2.replay(seen.append) == 10
        assert [e["i"] for e in seen] == list(range(10))
        wal2.truncate()
        wal2.append({"i": 99})
        wal2.close()
        seen2 = []
        WAL(path).replay(seen2.append)
        assert [e["i"] for e in seen2] == [99]

    def test_torn_tail_tolerated(self, tmp_path):
        path = str(tmp_path / "wal.jsonl")
        with open(path, "w") as fh:
            fh.write('{"i": 0}\n{"i": 1}\n{"i": 2')  # torn final write
        seen = []
        assert WAL(path).replay(seen.append) == 2
        assert [e["i"] for e in seen] == [0, 1]


class TestReplayErrorSurfacing:
    """WAL replay failures are counted, logged, and fail loud above a
    threshold instead of silently dropping writes (advisor/verdict r2)."""

    def _write_wal(self, d, entries):
        import json
        import os
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wal.jsonl"), "w") as fh:
            for e in entries:
                fh.write(json.dumps(e) + "\n")

    def test_few_errors_counted_not_fatal(self, tmp_path):
        from featurebase_tpu.server.api import API
        d = str(tmp_path / "data")
        good = [{"op": "create_index", "name": "t"},
                {"op": "create_field", "i": "t", "f": "f"},
                {"op": "bits", "i": "t", "f": "f", "rows": [0], "cols": [1]}]
        bad = [{"op": "totally_bogus"}]
        self._write_wal(d, good + bad)
        api = API(data_dir=d)
        assert api.wal_replay_errors == 1
        (count,) = api.query("t", "Count(Row(f=0))")
        assert count == 1

    def test_many_errors_fail_loud(self, tmp_path):
        import pytest

        from featurebase_tpu.server.api import API
        d = str(tmp_path / "data")
        good = [{"op": "create_index", "name": "t"}]
        bad = [{"op": "bogus", "n": i} for i in range(5)]
        self._write_wal(d, good + bad)
        with pytest.raises(RuntimeError, match="WAL replay dropped"):
            API(data_dir=d)
