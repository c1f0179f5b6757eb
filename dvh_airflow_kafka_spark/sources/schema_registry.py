"""Confluent-style schema-registry client (S4 driver side).

The reference fetches the writer schema for each Confluent-framed message
id over the registry's REST API with basic auth and keeps a per-run cache
(reference src/kafka_source.py:129-133, 153-161: ``GET
{registry}/schemas/ids/{id}`` → ``json()["schema"]``). This client is the
driver-side analogue: resolve ids → schema JSON once, then hand the
schema string to ``avro_payload`` / ``avro_payload_json`` as a plan
literal — executors never talk to the registry (at 100 TB, a thousand
executors hammering a registry per task would be an outage, not a
design).

The HTTP transport is injectable for tests (no registry in this
environment); the default uses stdlib ``urllib`` — no extra dependency.
"""

from __future__ import annotations

import base64
import json
import urllib.request
from typing import Callable, Optional


def _default_transport(url: str, auth_header: Optional[str]) -> dict:
    req = urllib.request.Request(url)
    if auth_header:
        req.add_header("Authorization", auth_header)
    with urllib.request.urlopen(req, timeout=30) as resp:  # pragma: no cover
        return json.loads(resp.read().decode("utf-8"))


class SchemaRegistryClient:
    """Minimal registry reader: ``schema_for_id`` with a per-instance
    cache (the reference's ``schema_cache``, src/kafka_source.py:132-133).

    ``transport(url, auth_header) -> dict`` is the seam tests inject a
    fake through; production uses the urllib default.
    """

    def __init__(
        self,
        base_url: str,
        username: Optional[str] = None,
        password: Optional[str] = None,
        transport: Optional[Callable[[str, Optional[str]], dict]] = None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self._auth: Optional[str] = None
        if username is not None:
            token = base64.b64encode(f"{username}:{password or ''}".encode()).decode()
            self._auth = f"Basic {token}"
        self._transport = transport or _default_transport
        self._cache: dict[int, str] = {}

    def schema_for_id(self, schema_id: int) -> str:
        """Writer-schema JSON for a registry id; cached per instance."""
        if schema_id not in self._cache:
            payload = self._transport(
                f"{self.base_url}/schemas/ids/{schema_id}", self._auth
            )
            self._cache[schema_id] = payload["schema"]
        return self._cache[schema_id]

    def schemas_for_ids(self, schema_ids) -> dict[int, str]:
        """Batch resolve (driver-side, before plan build): one fetch per
        DISTINCT id seen in the batch — the cache makes re-runs free."""
        return {sid: self.schema_for_id(sid) for sid in schema_ids}
