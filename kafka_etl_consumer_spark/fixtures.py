"""The ItemViewEvent fixture stream (FIXTURES.md §A).

Reproduces the reference's test input — its only shipped schema
(item-view-event.avsc:1-154 in the reference) and its 10-record producer
(GenericRecordKafkaProducer.java:58-96) — deterministically (fixed UUIDs /
timestamps instead of ``new Date()``), so ingest round-trip tests are
repeatable without Kafka.
"""

from __future__ import annotations

import json
import uuid

ITEM_VIEW_EVENT_TOPIC = "item-view-event"

_NULLABLE_STR = ["null", "string"]
_NULLABLE_LONG = ["null", "long"]

ITEM_VIEW_EVENT_AVSC: str = json.dumps(
    {
        "type": "record",
        "name": "ItemViewEvent",
        "namespace": "engine.domain.event",
        "fields": [
            {
                "name": "baseProperties",
                "type": {
                    "type": "record",
                    "name": "BaseProperties",
                    "fields": [
                        {"name": "eventType", "type": "string"},
                        {"name": "timestamp", "type": _NULLABLE_LONG},
                        {"name": "url", "type": _NULLABLE_STR},
                        {"name": "referer", "type": _NULLABLE_STR},
                        {"name": "uid", "type": _NULLABLE_STR},
                        {"name": "pcid", "type": _NULLABLE_STR},
                        {"name": "serviceId", "type": _NULLABLE_STR},
                        {"name": "version", "type": _NULLABLE_STR},
                        {"name": "deviceType", "type": _NULLABLE_STR},
                        {"name": "domain", "type": _NULLABLE_STR},
                        {"name": "site", "type": _NULLABLE_STR},
                    ],
                },
            },
            {"name": "itemId", "type": _NULLABLE_STR},
            {"name": "categoryId", "type": _NULLABLE_STR},
            {"name": "brandId", "type": _NULLABLE_STR},
            {"name": "itemType", "type": _NULLABLE_STR},
            {"name": "promotionId", "type": _NULLABLE_STR},
            {"name": "price", "type": _NULLABLE_LONG},
            {"name": "itemTitle", "type": _NULLABLE_STR},
            {"name": "itemDescription", "type": _NULLABLE_STR},
            {"name": "thumbnailUrl", "type": _NULLABLE_STR},
        ],
    }
)

_BASE_TS_MILLIS = 1_700_000_000_000  # deterministic stand-in for Date().getTime()


def item_view_events(n: int = 10) -> list[dict]:
    """The producer's rows: only url/uid/itemId/price vary with i
    (GenericRecordKafkaProducer.java:66-91 of the reference)."""
    rows = []
    for i in range(n):
        rows.append(
            {
                "baseProperties": {
                    "eventType": "item-view-event",
                    "timestamp": _BASE_TS_MILLIS + i,
                    "url": f"http://any-url...{i}",
                    "referer": "http://any-referer...",
                    "uid": str(uuid.UUID(int=i)),
                    "pcid": "any-pc-id",
                    "serviceId": "any-service-id",
                    "version": "1.0.0",
                    "deviceType": "MOBILE",
                    "domain": "kafka.com",
                    "site": "m.kafka.com",
                },
                "itemId": f"any-item-id{i}",
                "categoryId": "any-category-id",
                "brandId": "any-brand-id",
                "itemType": "any-item-type",
                "promotionId": "any-promotion-id",
                "price": 168000 + i,
                "itemTitle": "any item title...",
                "itemDescription": "any item desc....",
                "thumbnailUrl": "http://any-thumbnail-url...",
            }
        )
    return rows
