"""HttpRegistry against a live in-process HTTP server implementing the
Confluent Schema Registry REST surface the client uses — the registry
path runs end-to-end, not just the in-memory stand-in. The wire protocol
is public (Confluent REST API v1); the server here is backed by
MemoryRegistry so both implementations are exercised against each other.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from zync_spark.cli import main
from zync_spark.sources.registry import HttpRegistry, MemoryRegistry


def _make_server(backing: MemoryRegistry, require_auth: str | None = None):
    """Start a registry server; require_auth is a base64 basic credential
    that, when set, every request must present."""

    class Handler(BaseHTTPRequestHandler):
        def _check_auth(self):
            if require_auth is None:
                return True
            if self.headers.get("Authorization") == f"Basic {require_auth}":
                return True
            self._send({"error_code": 401, "message": "unauthorized"}, 401)
            return False
        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if not self._check_auth():
                return
            if self.path == "/subjects":
                return self._send(backing.subjects())
            m = re.fullmatch(r"/schemas/ids/(\d+)", self.path)
            if m:
                return self._send(
                    {"schema": json.dumps(backing.lookup(int(m.group(1))))}
                )
            m = re.fullmatch(r"/subjects/([^/]+)/versions/latest", self.path)
            if m:
                out = backing.latest(m.group(1))
                return self._send(
                    {"id": out["id"], "version": out["version"],
                     "schema": json.dumps(out["schema"])}
                )
            self._send({"error_code": 40401, "message": "not found"}, 404)

        def do_POST(self):
            if not self._check_auth():
                return
            m = re.fullmatch(r"/subjects/([^/]+)/versions", self.path)
            if m:
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                sid = backing.register(m.group(1), body["schema"])
                return self._send({"id": sid})
            self._send({"error_code": 40401, "message": "not found"}, 404)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture()
def registry_server():
    srv, url = _make_server(MemoryRegistry())
    try:
        yield url
    finally:
        srv.shutdown()


def test_http_registry_roundtrip_and_caches(registry_server):
    reg = HttpRegistry(registry_server)
    schema = json.dumps({"type": "record", "name": "zng_ab12", "fields": []})
    sid = reg.register("zng_ab12", schema)
    assert sid == 1
    # same schema text → same id (Confluent semantics), served from cache
    assert reg.register("zng_ab12", schema) == sid
    assert reg.lookup(sid)["name"] == "zng_ab12"
    other = json.dumps({"type": "record", "name": "zng_cd34", "fields": []})
    sid2 = reg.register("zng_cd34", other)
    assert sid2 != sid
    assert reg.subjects() == ["zng_ab12", "zng_cd34"]
    latest = reg.latest("zng_cd34")
    assert latest["id"] == sid2 and latest["version"] == 1
    assert latest["schema"]["name"] == "zng_cd34"


def test_http_registry_basic_auth(tmp_path, monkeypatch):
    import base64
    import urllib.error

    from zync_spark.sources.registry import registry_from_config

    cred = base64.b64encode(b"svc:hunter2").decode()
    srv, url = _make_server(MemoryRegistry(), require_auth=cred)
    try:
        schema = json.dumps({"type": "record", "name": "zng_aa11", "fields": []})
        # unauthenticated client is rejected
        with pytest.raises(urllib.error.HTTPError):
            HttpRegistry(url).register("zng_aa11", schema)
        # credentialed client (the reference's schema_registry.json shape,
        # schema_registry.json:1-5) round-trips
        cfg = tmp_path / "schema_registry.json"
        cfg.write_text(json.dumps({"url": url, "user": "svc", "password": "hunter2"}))
        from zync_spark.sources.registry import load_registry_config

        reg = registry_from_config(load_registry_config(str(cfg)))
        sid = reg.register("zng_aa11", schema)
        assert reg.latest("zng_aa11")["id"] == sid
    finally:
        srv.shutdown()


def test_cli_ls_over_http(registry_server, capsys):
    reg = HttpRegistry(registry_server)
    reg.register("zng_ff99", json.dumps(
        {"type": "record", "name": "zng_ff99", "fields": []}
    ))
    assert main(["ls", "--registry", registry_server]) == 0
    out = capsys.readouterr().out
    assert "subject zng_ff99:" in out and "id 1" in out and "version 1" in out
