"""Per-topic Avro schema registry SPI.

Mirrors the reference's ``AvroDeserializeService`` hierarchy: schemas are
resolved once at pipeline-build time and cached (the reference populates a
ConcurrentMap in init(), AbstractAvroDeserializeService.java:19,28-34 —
there is no runtime schema evolution, and a topic without a schema is a
hard error, matching the reference's fail-fast RuntimeException at
AbstractAvroDeserializeService.java:56-59).

Implementations:
- DictSchemaRegistry   — in-memory topic→avsc map (tests, programmatic use)
- FileSchemaRegistry   — topic→.avsc file path, the classpath-registry
                         equivalent (ClasspathAvroDeserializeService.java:16-42)
- ConsulSchemaRegistry — topic→Consul KV path over the plain HTTP KV API
                         (GET /v1/kv/<path>, values base64-encoded JSON),
                         the ConsulAvroDeserializeService.java:32-96
                         equivalent; ``http_get`` is injectable so tests
                         never need a live agent.
"""

from __future__ import annotations

import base64
import json
import urllib.request
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import types as T

from kafka_etl_consumer_spark.avro_codec import parse_schema, to_spark_struct


class SchemaRegistry(ABC):
    """topic → Avro schema, resolved eagerly and cached."""

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    @abstractmethod
    def _load(self, topic: str) -> str:
        """Return the avsc JSON string for a topic (raise KeyError if absent)."""

    def avsc(self, topic: str) -> str:
        if topic not in self._cache:
            self._cache[topic] = self._load(topic)
        return self._cache[topic]

    def schema(self, topic: str) -> dict:
        """Resolved Avro schema tree (avro_codec.parse_schema)."""
        return parse_schema(self.avsc(topic))

    def spark_schema(self, topic: str) -> T.StructType:
        return to_spark_struct(self.avsc(topic))


class DictSchemaRegistry(SchemaRegistry):
    def __init__(self, topic_to_avsc: dict[str, str | dict]) -> None:
        super().__init__()
        self._map = {
            t: (json.dumps(s) if isinstance(s, dict) else s)
            for t, s in topic_to_avsc.items()
        }

    def _load(self, topic: str) -> str:
        if topic not in self._map:
            raise KeyError(f"no Avro schema registered for topic {topic!r}")
        return self._map[topic]


class FileSchemaRegistry(SchemaRegistry):
    """topic → filesystem path of an .avsc file.

    ``topic_to_path`` mirrors the reference's Properties(topic→classpath
    resource); alternatively pass ``root`` to resolve ``<root>/<topic>.avsc``.
    """

    def __init__(
        self, topic_to_path: dict[str, str] | None = None, root: str | None = None
    ) -> None:
        super().__init__()
        self._paths = dict(topic_to_path or {})
        self._root = Path(root) if root else None

    def _load(self, topic: str) -> str:
        if topic in self._paths:
            return Path(self._paths[topic]).read_text()
        if self._root is not None:
            p = self._root / f"{topic}.avsc"
            if p.exists():
                return p.read_text()
        raise KeyError(f"no .avsc found for topic {topic!r}")


class ConsulSchemaRegistry(SchemaRegistry):
    """topic → Consul KV path; values are base64-encoded avsc JSON.

    Speaks the plain HTTP KV API (``GET http://host:port/v1/kv/<path>``)
    rather than requiring a client library. ``http_get(url) -> bytes`` is
    injectable for tests/mocks.
    """

    def __init__(
        self,
        topic_to_kv_path: dict[str, str],
        agent_host: str = "localhost",
        agent_port: int = 8500,
        http_get: Callable[[str], bytes] | None = None,
    ) -> None:
        super().__init__()
        self._paths = dict(topic_to_kv_path)
        self._base = f"http://{agent_host}:{agent_port}/v1/kv"
        self._http_get = http_get or self._default_http_get

    @staticmethod
    def _default_http_get(url: str) -> bytes:
        with urllib.request.urlopen(url, timeout=10) as resp:  # noqa: S310
            return resp.read()

    def _load(self, topic: str) -> str:
        if topic not in self._paths:
            raise KeyError(f"no Consul KV path registered for topic {topic!r}")
        url = f"{self._base}/{self._paths[topic]}"
        entries: list[dict[str, Any]] = json.loads(self._http_get(url).decode("utf-8"))
        if not entries:
            raise KeyError(f"empty Consul KV result for topic {topic!r} at {url}")
        value_b64 = entries[0]["Value"]
        return base64.b64decode(value_b64).decode("utf-8")


class HttpSchemaRegistry(SchemaRegistry):
    """topic → URL serving the raw avsc JSON document (a static schema
    server, an object store, or any REST endpoint that returns the
    schema body on GET).

    Rounds out the SPI beyond the reference's classpath/Consul pair
    (ConsulAvroDeserializeService.java:32-96 is the reference's only
    networked registry): pass an explicit ``topic_to_url`` map, or
    ``base_url`` to resolve ``<base_url>/<topic>.avsc``. Like every
    registry here, resolution happens once at pipeline build and is
    cached — no per-record network I/O ever. ``http_get`` is injectable
    so tests never need a live server."""

    def __init__(
        self,
        topic_to_url: dict[str, str] | None = None,
        base_url: str | None = None,
        http_get: Callable[[str], bytes] | None = None,
    ) -> None:
        super().__init__()
        self._urls = dict(topic_to_url or {})
        self._base = base_url.rstrip("/") if base_url else None
        self._http_get = http_get or ConsulSchemaRegistry._default_http_get

    def _load(self, topic: str) -> str:
        if topic in self._urls:
            url = self._urls[topic]
        elif self._base is not None:
            url = f"{self._base}/{topic}.avsc"
        else:
            raise KeyError(f"no schema URL registered for topic {topic!r}")
        body = self._http_get(url).decode("utf-8")
        json.loads(body)  # fail fast on non-JSON bodies (error pages)
        return body
