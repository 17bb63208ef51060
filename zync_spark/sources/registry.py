"""Confluent Schema Registry client.

Subjects follow the reference's RecordNameStrategy: one subject per record
type, named ``zng_<md5>`` (zavro/encoder.go:37-57, cmd/zync/ls/command.go:
42-63). Registration and id-lookup round-trips are cached per type/schema-id
exactly like the reference encoder/decoder caches (zavro/encoder.go:38-39,
zavro/decoder.go:55-57).

``MemoryRegistry`` provides the same interface in-process for tests and for
running the full Kafka-less demo path.
"""

from __future__ import annotations

import base64
import json
import os
import urllib.request


def load_registry_config(path: str | None = None) -> dict:
    """~/.zync/schema_registry.json: {"url":..., "user":..., "password":...}
    (the reference's config file, schema_registry.json:1-5,
    cli/flags.go:36-141)."""
    path = path or os.path.expanduser("~/.zync/schema_registry.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def registry_from_config(config: dict | None = None) -> "HttpRegistry":
    config = config if config is not None else load_registry_config()
    return HttpRegistry(
        config.get("url", "http://localhost:8081"),
        user=config.get("user"),
        password=config.get("password"),
    )


class BaseRegistry:
    def register(self, subject: str, schema_json: str) -> int:
        raise NotImplementedError

    def lookup(self, schema_id: int) -> dict:
        raise NotImplementedError

    def subjects(self) -> list[str]:
        raise NotImplementedError

    def latest(self, subject: str) -> dict:
        """{id, version, schema} of the subject's latest version
        (cmd/zync/ls/command.go:53-60)."""
        raise NotImplementedError


class MemoryRegistry(BaseRegistry):
    """In-memory registry with Confluent semantics (same schema text →
    same id)."""

    def __init__(self):
        self._by_text: dict[str, int] = {}
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}

    def register(self, subject: str, schema_json: str) -> int:
        if schema_json in self._by_text:
            sid = self._by_text[schema_json]
        else:
            sid = len(self._by_text) + 1
            self._by_text[schema_json] = sid
            self._by_id[sid] = schema_json
        self._subjects.setdefault(subject, [])
        if sid not in self._subjects[subject]:
            self._subjects[subject].append(sid)
        return sid

    def lookup(self, schema_id: int) -> dict:
        return json.loads(self._by_id[schema_id])

    def subjects(self) -> list[str]:
        return sorted(self._subjects)

    def latest(self, subject: str) -> dict:
        ids = self._subjects[subject]
        return {
            "id": ids[-1],
            "version": len(ids),
            "schema": json.loads(self._by_id[ids[-1]]),
        }


class HttpRegistry(BaseRegistry):
    """Minimal Confluent Schema Registry REST client (no external deps)."""

    def __init__(self, url: str, timeout: int = 10,
                 user: str | None = None, password: str | None = None):
        self.url = url.rstrip("/")
        self.timeout = timeout
        self._auth = (
            base64.b64encode(f"{user}:{password or ''}".encode()).decode()
            if user
            else None
        )
        self._id_cache: dict[int, dict] = {}
        self._reg_cache: dict[str, int] = {}

    def _request(self, method: str, path: str, body: dict | None = None):
        headers = {"Content-Type": "application/vnd.schemaregistry.v1+json"}
        if self._auth:
            headers["Authorization"] = f"Basic {self._auth}"
        req = urllib.request.Request(
            self.url + path,
            data=json.dumps(body).encode() if body is not None else None,
            method=method,
            headers=headers,
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read())

    def register(self, subject: str, schema_json: str) -> int:
        key = subject + "\x00" + schema_json
        if key not in self._reg_cache:
            out = self._request(
                "POST", f"/subjects/{subject}/versions", {"schema": schema_json}
            )
            self._reg_cache[key] = out["id"]
        return self._reg_cache[key]

    def lookup(self, schema_id: int) -> dict:
        if schema_id not in self._id_cache:
            out = self._request("GET", f"/schemas/ids/{schema_id}")
            self._id_cache[schema_id] = json.loads(out["schema"])
        return self._id_cache[schema_id]

    def subjects(self) -> list[str]:
        return sorted(self._request("GET", "/subjects"))

    def latest(self, subject: str) -> dict:
        out = self._request("GET", f"/subjects/{subject}/versions/latest")
        return {
            "id": out["id"],
            "version": out["version"],
            "schema": json.loads(out["schema"]),
        }
