"""Authn/authz: offline JWT verification (HS256 + RS256), per-index group
grants, HTTP enforcement, and gRPC TLS + auth.

Reference: authn/authn.go:1 (OIDC access-token middleware), authz/authz.go:14
(group -> index -> permission YAML; read < write < admin).
"""
import base64
import hashlib
import hmac
import json
import time

import pytest

from featurebase_tpu.server.auth import (Auth, AuthError, GroupAuthorizer,
                                         TokenVerifier, pql_access_level,
                                         route_access, sql_access)

SECRET = "test-secret"


def b64u(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).decode().rstrip("=")


def make_jwt(claims: dict, secret: str = SECRET, alg: str = "HS256",
             key=None) -> str:
    header = b64u(json.dumps({"alg": alg, "typ": "JWT"}).encode())
    payload = b64u(json.dumps(claims).encode())
    signing = f"{header}.{payload}".encode()
    if alg == "HS256":
        sig = hmac.new(secret.encode(), signing, hashlib.sha256).digest()
    else:
        from cryptography.hazmat.primitives.asymmetric.padding import \
            PKCS1v15
        from cryptography.hazmat.primitives.hashes import SHA256
        sig = key.sign(signing, PKCS1v15(), SHA256())
    return f"{header}.{payload}.{b64u(sig)}"


def claims(groups, exp_in=600, **kw):
    return {"sub": "user1", "groups": groups,
            "exp": time.time() + exp_in, **kw}


GRANTS = GroupAuthorizer({
    "readers": {"sales": "read"},
    "writers": {"sales": "write"},
    "everything": {"*": "read"},
}, admin_group="admins")


class TestTokenVerifier:
    def test_hs256_roundtrip(self):
        v = TokenVerifier(secret=SECRET)
        u = v.verify(make_jwt(claims(["readers"])))
        assert u.name == "user1" and u.groups == ["readers"]

    def test_bad_signature(self):
        v = TokenVerifier(secret=SECRET)
        with pytest.raises(AuthError, match="bad signature"):
            v.verify(make_jwt(claims(["readers"]), secret="wrong"))

    def test_expired(self):
        v = TokenVerifier(secret=SECRET, leeway=0)
        with pytest.raises(AuthError, match="expired"):
            v.verify(make_jwt(claims(["readers"], exp_in=-120)))

    def test_issuer_audience(self):
        v = TokenVerifier(secret=SECRET, issuer="https://idp",
                          audience="fb")
        good = claims(["readers"], iss="https://idp", aud=["fb", "other"])
        assert v.verify(make_jwt(good)).groups == ["readers"]
        with pytest.raises(AuthError, match="issuer"):
            v.verify(make_jwt(claims(["readers"], iss="https://evil",
                                     aud="fb")))
        with pytest.raises(AuthError, match="audience"):
            v.verify(make_jwt(claims(["readers"], iss="https://idp",
                                     aud="nope")))

    def test_rs256_roundtrip_and_alg_confusion(self):
        from cryptography.hazmat.primitives.asymmetric.rsa import \
            generate_private_key
        from cryptography.hazmat.primitives.serialization import (
            Encoding, PublicFormat)
        key = generate_private_key(public_exponent=65537, key_size=2048)
        pem = key.public_key().public_bytes(
            Encoding.PEM, PublicFormat.SubjectPublicKeyInfo)
        v = TokenVerifier(public_key_pem=pem)
        tok = make_jwt(claims(["writers"]), alg="RS256", key=key)
        assert v.verify(tok).groups == ["writers"]
        # HS256 token signed with the PEM as secret must NOT pass (classic
        # algorithm-confusion attack)
        evil = make_jwt(claims(["admins"]), secret=pem.decode())
        with pytest.raises(AuthError, match="alg"):
            v.verify(evil)


class TestGroupAuthorizer:
    def test_levels(self):
        from featurebase_tpu.server.auth import UserInfo
        r = UserInfo("u", ["readers"])
        w = UserInfo("u", ["writers"])
        a = UserInfo("u", ["admins"])
        assert GRANTS.allowed(r, "sales", "read")
        assert not GRANTS.allowed(r, "sales", "write")
        assert not GRANTS.allowed(r, "hr", "read")
        assert GRANTS.allowed(w, "sales", "write")
        assert not GRANTS.allowed(w, "sales", "admin")
        assert GRANTS.allowed(a, "anything", "admin")
        star = UserInfo("u", ["everything"])
        assert GRANTS.allowed(star, "hr", "read")
        assert not GRANTS.allowed(star, "hr", "write")


class TestRouteAccess:
    def test_pql_level(self):
        assert pql_access_level("Count(Row(f=1))") == "read"
        assert pql_access_level("Set(1, f=1)") == "write"
        assert pql_access_level("Delete(Row(f=1))") == "write"

    def test_sql_access(self):
        assert sql_access("SELECT * FROM sales") == ("sales", "read")
        assert sql_access("INSERT INTO sales (_id) VALUES (1)") == \
            ("sales", "write")
        assert sql_access("CREATE TABLE t (_id id)")[1] == "admin"

    def test_routes(self):
        assert route_access("POST", "/index/sales/query",
                            pql="Count(Row(f=1))") == ("sales", "read")
        assert route_access("POST", "/index/sales") == ("sales", "admin")
        assert route_access("GET", "/index/sales") == ("sales", "read")
        assert route_access("POST", "/internal/resync") == (None, "admin")


class TestHTTPEnforcement:
    @pytest.fixture()
    def server(self):
        from featurebase_tpu.server.api import API
        from featurebase_tpu.server.http_server import Server
        api = API()
        api.create_index("sales")
        api.create_field("sales", "f", {"type": "set"})
        api.query("sales", "Set(1, f=1)")
        api.create_index("hr")
        api.auth = Auth(TokenVerifier(secret=SECRET), GRANTS)
        srv = Server(api=api).start()
        yield srv
        srv.stop()

    def _req(self, srv, method, path, token=None, body=b""):
        import urllib.error
        import urllib.request
        req = urllib.request.Request(srv.url + path, data=body or None,
                                     method=method)
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read() or b"{}")

    def test_no_token_rejected(self, server):
        code, _ = self._req(server, "POST", "/index/sales/query",
                            body=b"Count(Row(f=1))")
        assert code == 401

    def test_reader_can_read_not_write(self, server):
        tok = make_jwt(claims(["readers"]))
        code, out = self._req(server, "POST", "/index/sales/query",
                              token=tok, body=b"Count(Row(f=1))")
        assert code == 200 and out["results"] == [1]
        code, _ = self._req(server, "POST", "/index/sales/query",
                            token=tok, body=b"Set(2, f=1)")
        assert code == 403

    def test_reader_denied_other_index(self, server):
        tok = make_jwt(claims(["readers"]))
        code, _ = self._req(server, "POST", "/index/hr/query",
                            token=tok, body=b"Count(Row(f=1))")
        assert code == 403

    def test_writer_can_write_not_admin(self, server):
        tok = make_jwt(claims(["writers"]))
        code, _ = self._req(server, "POST", "/index/sales/query",
                            token=tok, body=b"Set(2, f=1)")
        assert code == 200
        code, _ = self._req(server, "DELETE", "/index/sales", token=tok)
        assert code == 403

    def test_admin_everything(self, server):
        tok = make_jwt(claims(["admins"]))
        code, _ = self._req(server, "POST", "/index/newidx",
                            token=tok, body=b'{"options": {}}')
        assert code == 200
        code, _ = self._req(server, "POST", "/internal/resync", token=tok)
        assert code in (200, 400)  # authorized (may no-op un-clustered)

    def test_expired_token_401(self, server):
        tok = make_jwt(claims(["admins"], exp_in=-3600))
        code, _ = self._req(server, "GET", "/schema", token=tok)
        assert code == 401


def _self_signed_cert(tmp_path):
    """Self-signed localhost cert via cryptography (test-only)."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric.rsa import \
        generate_private_key
    from cryptography.x509.oid import NameOID
    key = generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(minutes=5))
            .not_valid_after(now + datetime.timedelta(days=1))
            .add_extension(x509.SubjectAlternativeName(
                [x509.DNSName("localhost")]), critical=False)
            .sign(key, hashes.SHA256()))
    cert_path = tmp_path / "cert.pem"
    key_path = tmp_path / "key.pem"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    return str(cert_path), str(key_path)


class TestGRPCTLSAuth:
    def test_tls_channel_with_jwt_authz(self, tmp_path):
        grpc = pytest.importorskip("grpc")
        from featurebase_tpu.proto import pilosa_pb2 as pb
        from featurebase_tpu.server.api import API
        from featurebase_tpu.server.grpc_server import (GRPCServer,
                                                        make_channel_callables)
        cert, key = _self_signed_cert(tmp_path)
        api = API()
        api.create_index("sales")
        api.create_field("sales", "f", {"type": "set"})
        api.query("sales", "Set(1, f=1)")
        api.auth = Auth(TokenVerifier(secret=SECRET), GRANTS)
        srv = GRPCServer(api=api, tls_cert=cert, tls_key=key).start()
        try:
            creds = grpc.ssl_channel_credentials(
                root_certificates=open(cert, "rb").read())
            chan = grpc.secure_channel(
                f"localhost:{srv.port}", creds,
                options=(("grpc.ssl_target_name_override", "localhost"),))
            calls = make_channel_callables(chan)
            tok = make_jwt(claims(["readers"]))
            md = (("authorization", f"Bearer {tok}"),)
            rows = list(calls["QueryPQL"](
                pb.QueryPQLRequest(index="sales", pql="Count(Row(f=1))"),
                metadata=md))
            assert rows, "authorized read over TLS must return rows"
            # write with a read-only token -> PERMISSION_DENIED
            with pytest.raises(grpc.RpcError) as ei:
                list(calls["QueryPQL"](
                    pb.QueryPQLRequest(index="sales", pql="Set(9, f=1)"),
                    metadata=md))
            assert ei.value.code() == grpc.StatusCode.PERMISSION_DENIED
            # no token -> UNAUTHENTICATED
            with pytest.raises(grpc.RpcError) as ei:
                list(calls["QueryPQL"](
                    pb.QueryPQLRequest(index="sales",
                                       pql="Count(Row(f=1))")))
            assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED
            chan.close()
        finally:
            srv.stop()
