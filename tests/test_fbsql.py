"""fbsql interactive shell (reference: cli/cli.go psql-style REPL)."""
import io

import pytest

from featurebase_tpu.fbsql import Shell, render_table, split_statements
from featurebase_tpu.server.api import API
from featurebase_tpu.server.http_server import Server


@pytest.fixture(scope="module")
def server():
    api = API()
    srv = Server(api=api).start()
    yield srv
    srv.stop()


def run_shell(server, text: str) -> str:
    out = io.StringIO()
    sh = Shell(server.url, out=out)
    sh.interact(in_stream=io.StringIO(text))
    return out.getvalue()


class TestShell:
    def test_ddl_insert_select_roundtrip(self, server):
        out = run_shell(server, """
CREATE TABLE sh (_id ID, name STRING, n INT MIN 0 MAX 100);
INSERT INTO sh (_id, name, n) VALUES (1, 'x', 7), (2, 'y', 9);
SELECT _id, name, n FROM sh ORDER BY n DESC;
""")
        assert "x" in out and "y" in out
        # psql-style aligned output with row count
        assert "(2 rows)" in out
        # desc order: y (9) before x (7)
        assert out.index("y") < out.index("x")

    def test_multiline_statement(self, server):
        out = run_shell(server, "SELECT\n1\n;\n")
        assert "(1 row)" in out

    def test_meta_commands(self, server):
        out = run_shell(server, "\\dt\n\\d sh\n\\timing on\nSELECT 1;\n\\q\n")
        assert "sh" in out            # \dt lists the table
        assert "name" in out          # \d sh lists columns
        assert "Timing is on." in out
        assert "Time:" in out

    def test_error_keeps_going(self, server):
        out = run_shell(server, "SELECT FROM nope;\nSELECT 2;\n")
        assert "ERROR" in out
        assert "(1 row)" in out       # the second statement still ran

    def test_split_statements_respects_quotes(self):
        stmts = split_statements(
            "INSERT INTO t VALUES ('a;b');SELECT 1;  ")
        assert stmts == ["INSERT INTO t VALUES ('a;b')", "SELECT 1"]

    def test_render_table_nulls_and_bools(self):
        out = render_table({"schema": [{"name": "a"}, {"name": "b"}],
                            "data": [[None, True], [1, False]]})
        assert "NULL" in out and "true" in out and "false" in out


class TestIngestMeta:
    """\\ingest: kafka-source configuration from the shell (VERDICT r4
    next #10; reference: fbsql kafka ingest config, cli/cli.go) — drives
    a kafka -> table ingest against the connected server end-to-end."""

    def test_kafka_ingest_to_table(self, server, tmp_path):
        import json as _json

        from featurebase_tpu.ingest.kafka_broker import KafkaBroker
        from featurebase_tpu.ingest.kafka_source import KafkaClient
        broker = KafkaBroker(num_partitions=1).start()
        try:
            c = KafkaClient("127.0.0.1", broker.port)
            msgs = [(None, _json.dumps(
                {"id": i, "seg": f"s{i % 2}", "qty": i * 10}).encode())
                for i in range(1, 7)]
            c.produce("orders", 0, msgs)
            cfg = {
                "bootstrap": f"127.0.0.1:{broker.port}",
                "topic": "orders",
                "index": "korders",
                "id_field": "id",
                "max_batches": 2,
                "fields": {"seg": {"type": "set", "keys": True},
                           "qty": {"type": "int", "min": 0, "max": 1000}},
            }
            cfg_path = tmp_path / "ingest.json"
            cfg_path.write_text(_json.dumps(cfg))
            out = run_shell(server, f"""\\ingest {cfg_path}
SELECT COUNT(*) FROM korders;
SELECT _id, qty FROM korders WHERE seg = 's1' ORDER BY qty;
""")
            assert "ingested 6 records" in out, out
            assert "(3 rows)" in out  # s1 -> ids 1, 3, 5
            assert "50" in out        # qty of id 5
        finally:
            broker.stop()


class TestAuth:
    """fbsql auth (reference: fbsql cloud auth, cli/cli.go): bearer
    tokens via Shell(token=) / \\auth, minted by `auth-token`."""

    def test_token_sent_and_required(self, tmp_path):
        from featurebase_tpu.server.api import API
        from featurebase_tpu.server.auth import (Auth, GroupAuthorizer,
                                                 TokenVerifier, mint_hs256)
        from featurebase_tpu.server.http_server import Server
        api = API()
        api.auth = Auth(TokenVerifier(secret="s3cret"),
                        GroupAuthorizer({"admins": {"*": "admin"}}))
        srv = Server(api=api).start()
        try:
            # unauthenticated shell: server rejects
            out = run_shell(srv, "SELECT 1;\n")
            assert "ERROR" in out
            # token minted exactly like `featurebase-tpu auth-token`
            tok = mint_hs256("s3cret", "ops", ["admins"])
            outio = io.StringIO()
            sh = Shell(srv.url, out=outio, token=tok)
            sh.interact(in_stream=io.StringIO("SELECT 1;\n"))
            assert "1 row" in outio.getvalue()
            # \auth meta-command sets the token mid-session
            outio = io.StringIO()
            sh = Shell(srv.url, out=outio)
            sh.interact(in_stream=io.StringIO(
                f"\\auth {tok}\nSELECT 1;\n"))
            assert "1 row" in outio.getvalue()
        finally:
            srv.stop()


class TestCliAuthTools:
    def test_auth_token_and_keygen(self, capsys, tmp_path, monkeypatch):
        from featurebase_tpu.cli import main
        from featurebase_tpu.server.auth import TokenVerifier
        assert main(["auth-token", "--secret", "k", "--sub", "me",
                     "--groups", "a,b"]) == 0
        tok = capsys.readouterr().out.strip()
        user = TokenVerifier(secret="k").verify(tok)
        assert user.name == "me" and user.groups == ["a", "b"]
        monkeypatch.chdir(tmp_path)
        assert main(["keygen"]) == 0
        assert len(capsys.readouterr().out.strip()) >= 32
        assert main(["generate-config"]) == 0
        assert "bind" in capsys.readouterr().out
