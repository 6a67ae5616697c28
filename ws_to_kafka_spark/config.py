"""Pipeline configuration model.

Mirrors the reference's ``config.json`` shape (reference: config fields
extracted at ``/root/reference/src/main.cpp:80-97``; documented example at
``/root/reference/README.md:30-52``):

* ``url`` — ws:// or wss:// endpoint
* ``brokers`` — Kafka bootstrap servers
* ``topic`` — destination topic
* ``key`` — static record key applied to every record
* ``message`` — JSON object serialized and sent once per (re)connect as the
  subscription message
* ``interval_messages.interval`` — seconds between control-message bursts
* ``interval_messages.messages`` — JSON messages re-sent every interval

The reference re-serializes the JSON sub-objects to strings and passes them
to the websocket client verbatim (``src/main.cpp:89-94``); we keep the same
contract — messages are opaque strings by the time they reach the source.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class IntervalMessages:
    """Periodic control messages (reference: src/main.cpp:90-94)."""

    interval_seconds: float = 0.0
    messages: tuple[str, ...] = ()


@dataclass(frozen=True)
class PipelineConfig:
    """Full WebSocket -> Kafka pipeline configuration."""

    url: str
    brokers: str
    topic: str
    key: str
    subscribe_message: str | None = None
    interval_messages: IntervalMessages = field(default_factory=IntervalMessages)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "PipelineConfig":
        interval_raw = raw.get("interval_messages") or {}
        interval = IntervalMessages(
            interval_seconds=float(interval_raw.get("interval", 0) or 0),
            messages=tuple(
                json.dumps(m) if not isinstance(m, str) else m
                for m in interval_raw.get("messages", [])
            ),
        )
        message = raw.get("message")
        if message is not None and not isinstance(message, str):
            message = json.dumps(message)
        return cls(
            url=raw["url"],
            brokers=raw.get("brokers", ""),
            topic=raw.get("topic", ""),
            key=raw.get("key", ""),
            subscribe_message=message,
            interval_messages=interval,
        )

    @classmethod
    def from_json_file(cls, path: str) -> "PipelineConfig":
        with open(path, encoding="utf-8") as fh:
            return cls.from_dict(json.load(fh))
