"""Streaming ingest kit (IDK): source loop, recordizers, exactly-once
offset commit with crash/resume (reference: idk/ingest.go:59 Main,
:255 Run, :319 runIngester, :1062 commitRecord; idalloc.go reserveIDs)."""
import json
import os

import numpy as np
import pytest

from featurebase_tpu.ingest.idk import (FileTailSource, GeneratorSource,
                                        Ingester, Recordizer)
from featurebase_tpu.server.api import API


def make_api():
    api = API()
    api.create_index("i")
    api.create_field("i", "segment", {"type": "set"})
    api.create_field("i", "value", {"type": "int", "min": -100, "max": 1000})
    return api


class TestGeneratorSource:
    def test_streams_100k_records_in_batches(self):
        api = make_api()
        src = GeneratorSource(total=100_000, seed=1)
        ing = Ingester(api, "i", src, batch_size=8192)
        stats = ing.run()
        assert stats["records"] == 100_000
        assert api.query("i", "Count(All())") == [100_000]
        want_sum = sum(src.record(i)["value"] for i in range(100_000))
        assert api.query("i", "Sum(field=value)")[0].val == want_sum

    def test_crash_mid_stream_resume_no_dups(self):
        """Crash after a batch imports but before its offset commits; the
        resumed ingester replays that batch — counts must not double."""
        api = make_api()
        src = GeneratorSource(total=100_000, seed=1)
        ing = Ingester(api, "i", src, batch_size=8192)

        class Crash(Exception):
            pass

        def boom(batch_no):
            if batch_no == 5:
                raise Crash()
        ing._post_import_hook = boom
        with pytest.raises(Crash):
            ing.run()
        # batch 5 imported but is uncommitted: replay it + the rest
        src2 = GeneratorSource(total=100_000, seed=1)
        src2._cursor = src2._committed = src.checkpoint() * 8192
        ing2 = Ingester(api, "i", src2, batch_size=8192)
        # hand the source the same position the committed checkpoint implies
        src2._cursor = src2._committed = 5 * 8192
        ing2.run()
        assert api.query("i", "Count(All())") == [100_000]
        want_sum = sum(src.record(i)["value"] for i in range(100_000))
        assert api.query("i", "Sum(field=value)")[0].val == want_sum


class TestFileTailSource:
    def _write(self, path, records):
        with open(path, "a") as fh:
            for r in records:
                fh.write(json.dumps(r) + "\n")

    def test_tail_commit_resume(self, tmp_path):
        path = str(tmp_path / "records.jsonl")
        self._write(path, [{"id": i, "segment": i % 3, "value": i}
                           for i in range(100)])
        api = make_api()
        src = FileTailSource(path)
        ing = Ingester(api, "i", src, batch_size=40)
        assert ing.run()["records"] == 100
        assert api.query("i", "Count(All())") == [100]
        # more records appear; a NEW source resumes from the offset file
        self._write(path, [{"id": i, "segment": i % 3, "value": i}
                           for i in range(100, 150)])
        src2 = FileTailSource(path)
        ing2 = Ingester(api, "i", src2, batch_size=40)
        assert ing2.run()["records"] == 50
        assert api.query("i", "Count(All())") == [150]

    def test_crash_before_commit_replays_idempotently(self, tmp_path):
        path = str(tmp_path / "records.jsonl")
        self._write(path, [{"id": i, "segment": i % 5, "value": i % 7}
                           for i in range(1000)])
        api = make_api()
        src = FileTailSource(path)
        ing = Ingester(api, "i", src, batch_size=256)

        class Crash(Exception):
            pass

        def boom(batch_no):
            if batch_no == 1:
                raise Crash()
        ing._post_import_hook = boom
        with pytest.raises(Crash):
            ing.run()
        # restart from the offset file: batch 1 replays (idempotent Sets)
        src2 = FileTailSource(path)
        Ingester(api, "i", src2, batch_size=256).run()
        assert api.query("i", "Count(All())") == [1000]
        want = sum(i % 7 for i in range(1000))
        assert api.query("i", "Sum(field=value)")[0].val == want

    def test_incomplete_trailing_line_waits(self, tmp_path):
        path = str(tmp_path / "records.jsonl")
        with open(path, "w") as fh:
            fh.write(json.dumps({"id": 1, "segment": 0}) + "\n")
            fh.write('{"id": 2, "segm')  # writer mid-line
        src = FileTailSource(path)
        assert len(src.poll(10)) == 1


class TestAutoID:
    def test_auto_ids_exactly_once_across_crash(self, tmp_path):
        """Auto-id ingest: a replayed batch reserves the SAME id range
        (reference idalloc (key, session, offset) semantics), so even
        crash-between-import-and-commit cannot duplicate records."""
        path = str(tmp_path / "records.jsonl")
        with open(path, "w") as fh:
            for i in range(500):
                fh.write(json.dumps({"segment": i % 4, "value": i % 11})
                         + "\n")
        api = make_api()
        src = FileTailSource(path)
        ing = Ingester(api, "i", src, batch_size=100, id_field=None)

        class Crash(Exception):
            pass

        def boom(batch_no):
            if batch_no == 2:
                raise Crash()
        ing._post_import_hook = boom
        with pytest.raises(Crash):
            ing.run()
        src2 = FileTailSource(path)
        ing2 = Ingester(api, "i", src2, batch_size=100, id_field=None)
        ing2.run()
        assert api.query("i", "Count(All())") == [500]
        want = sum(i % 11 for i in range(500))
        assert api.query("i", "Sum(field=value)")[0].val == want


class TestRecordizer:
    def test_field_mapping(self):
        rz = Recordizer(id_field="pk",
                        fields={"segment": "seg", "value": None})
        rid, vals = rz({"pk": 7, "seg": 3, "value": 9, "junk": 1})
        assert rid == 7
        assert vals == {"segment": 3, "value": 9}


class TestSQLSource:
    """Incremental SQL-database ingest (reference: idk sql source) with
    crash/resume through a persisted cursor."""

    def _mk_db(self, path, n=30):
        import sqlite3
        conn = sqlite3.connect(path)
        conn.execute("CREATE TABLE events (id INTEGER PRIMARY KEY, "
                     "seg INTEGER, val INTEGER)")
        conn.executemany("INSERT INTO events VALUES (?, ?, ?)",
                         [(i, i % 3, i * 2) for i in range(1, n + 1)])
        conn.commit()
        conn.close()

    def _api(self):
        from featurebase_tpu.server.api import API
        api = API()
        api.create_index("s")
        api.create_field("s", "seg", {"type": "set"})
        api.create_field("s", "val", {"type": "int", "min": 0,
                                      "max": 1000})
        return api

    def test_incremental_ingest(self, tmp_path):
        from featurebase_tpu.ingest.idk import Ingester, SQLSource
        db = str(tmp_path / "src.db")
        self._mk_db(db)
        src = SQLSource(
            db, "SELECT rowid, id, seg, val FROM events WHERE rowid > ? "
                "ORDER BY rowid LIMIT ?", ["id", "seg", "val"],
            checkpoint_path=str(tmp_path / "cur.json"))
        ing = Ingester(self._api(), "s", src, fields=["seg", "val"],
                       batch_size=8)
        stats = ing.run()
        assert stats["records"] == 30
        assert ing.api.query("s", "Count(Row(seg=0))") == [10]
        # new rows appear -> next run picks up only those
        import sqlite3
        conn = sqlite3.connect(db)
        conn.execute("INSERT INTO events VALUES (31, 0, 62)")
        conn.commit()
        conn.close()
        assert ing.run()["records"] == 1
        assert ing.api.query("s", "Count(Row(seg=0))") == [11]

    def test_crash_resume_from_persisted_cursor(self, tmp_path):
        from featurebase_tpu.ingest.idk import Ingester, SQLSource
        db = str(tmp_path / "src.db")
        cur = str(tmp_path / "cur.json")
        self._mk_db(db, n=20)
        api = self._api()
        src = SQLSource(
            db, "SELECT rowid, id, seg, val FROM events WHERE rowid > ? "
                "ORDER BY rowid LIMIT ?", ["id", "seg", "val"],
            checkpoint_path=cur)
        ing = Ingester(api, "s", src, fields=["seg", "val"], batch_size=8)

        def crash(bn):
            if bn == 1:
                raise RuntimeError("crash before cursor commit")
        ing._post_import_hook = crash
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            ing.run()
        # resume with a FRESH source from the persisted cursor
        src2 = SQLSource(
            db, "SELECT rowid, id, seg, val FROM events WHERE rowid > ? "
                "ORDER BY rowid LIMIT ?", ["id", "seg", "val"],
            checkpoint_path=cur)
        Ingester(api, "s", src2, fields=["seg", "val"],
                 batch_size=8).run()
        (sum_vc,) = api.query("s", "Sum(field=val)")
        assert sum_vc.val == sum(i * 2 for i in range(1, 21))
        assert sum_vc.count == 20
