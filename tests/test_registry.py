from __future__ import annotations

import base64
import json

import pytest

from kafka_etl_consumer_spark.fixtures import ITEM_VIEW_EVENT_AVSC, ITEM_VIEW_EVENT_TOPIC
from kafka_etl_consumer_spark.schema.registry import (
    ConsulSchemaRegistry,
    DictSchemaRegistry,
    FileSchemaRegistry,
)


def test_dict_registry():
    reg = DictSchemaRegistry({ITEM_VIEW_EVENT_TOPIC: ITEM_VIEW_EVENT_AVSC})
    assert reg.spark_schema(ITEM_VIEW_EVENT_TOPIC)["price"].dataType.simpleString() == "bigint"
    with pytest.raises(KeyError):
        reg.avsc("unknown-topic")


def test_file_registry(tmp_path):
    p = tmp_path / f"{ITEM_VIEW_EVENT_TOPIC}.avsc"
    p.write_text(ITEM_VIEW_EVENT_AVSC)
    by_path = FileSchemaRegistry({ITEM_VIEW_EVENT_TOPIC: str(p)})
    by_root = FileSchemaRegistry(root=str(tmp_path))
    assert by_path.avsc(ITEM_VIEW_EVENT_TOPIC) == ITEM_VIEW_EVENT_AVSC
    assert by_root.avsc(ITEM_VIEW_EVENT_TOPIC) == ITEM_VIEW_EVENT_AVSC
    with pytest.raises(KeyError):
        by_root.avsc("missing")


def test_consul_registry_http_mock():
    """Consul KV returns [{Key, Value(base64)}] — no live agent needed
    (mirrors ConsulAvroDeserializeService.java:32-61 of the reference)."""
    kv_path = "schemas/item-view-event"
    calls = []

    def fake_http_get(url: str) -> bytes:
        calls.append(url)
        payload = [{
            "Key": kv_path,
            "Value": base64.b64encode(ITEM_VIEW_EVENT_AVSC.encode()).decode(),
        }]
        return json.dumps(payload).encode()

    reg = ConsulSchemaRegistry(
        {ITEM_VIEW_EVENT_TOPIC: kv_path}, agent_host="consul.test", http_get=fake_http_get
    )
    assert json.loads(reg.avsc(ITEM_VIEW_EVENT_TOPIC)) == json.loads(ITEM_VIEW_EVENT_AVSC)
    assert calls == ["http://consul.test:8500/v1/kv/schemas/item-view-event"]
    reg.avsc(ITEM_VIEW_EVENT_TOPIC)
    assert len(calls) == 1  # cached after first resolve (schema loaded once)


def test_http_registry_resolves_and_caches():
    from kafka_etl_consumer_spark.schema.registry import HttpSchemaRegistry

    calls = []

    def fake_get(url):
        calls.append(url)
        return b'{"type": "record", "name": "E", "fields": [{"name": "x", "type": "long"}]}'

    reg = HttpSchemaRegistry(base_url="http://schemas.local/v1", http_get=fake_get)
    s1 = reg.avsc("events")
    s2 = reg.avsc("events")  # cached: no second fetch
    assert '"name": "E"' in s1 and s1 == s2
    assert calls == ["http://schemas.local/v1/events.avsc"]
    assert reg.spark_schema("events").fieldNames() == ["x"]


def test_http_registry_explicit_map_and_errors():
    import pytest

    from kafka_etl_consumer_spark.schema.registry import HttpSchemaRegistry

    reg = HttpSchemaRegistry(
        topic_to_url={"t": "http://x/t.avsc"},
        http_get=lambda url: b'{"type": "record", "name": "T", "fields": []}',
    )
    assert "T" in reg.avsc("t")
    with pytest.raises(KeyError):
        reg.avsc("unknown")
    bad = HttpSchemaRegistry(
        topic_to_url={"t": "http://x/t"}, http_get=lambda url: b"<html>404</html>"
    )
    with pytest.raises(ValueError):
        bad.avsc("t")  # non-JSON body fails fast
