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
