"""Config model round-trip against the reference's config.json shape
(/root/reference/src/main.cpp:80-97; example /root/reference/README.md:30-52)."""

from __future__ import annotations

import json

from ws_to_kafka_spark.config import PipelineConfig

# Shaped like the reference README example (field names, nesting).
EXAMPLE = {
    "url": "wss://ws.example.test/v2/",
    "brokers": "localhost:9092",
    "topic": "raw-frames",
    "key": "book-feed",
    "message": {"action": "subscribe", "channels": ["book"]},
    "interval_messages": {
        "interval": 120,
        "messages": [{"action": "getBook", "market": "A-B"}],
    },
}


def test_from_dict_full():
    cfg = PipelineConfig.from_dict(EXAMPLE)
    assert cfg.url == EXAMPLE["url"]
    assert cfg.brokers == "localhost:9092"
    assert cfg.topic == "raw-frames"
    assert cfg.key == "book-feed"
    # sub-objects are re-serialized to opaque strings, like the reference
    # (src/main.cpp:89-94) hands strings to the websocket client.
    assert json.loads(cfg.subscribe_message) == EXAMPLE["message"]
    assert cfg.interval_messages.interval_seconds == 120.0
    assert len(cfg.interval_messages.messages) == 1
    assert json.loads(cfg.interval_messages.messages[0]) == {
        "action": "getBook",
        "market": "A-B",
    }


def test_minimal_config():
    cfg = PipelineConfig.from_dict({"url": "ws://h/p"})
    assert cfg.url == "ws://h/p"
    assert cfg.subscribe_message is None
    assert cfg.interval_messages.interval_seconds == 0.0
    assert cfg.interval_messages.messages == ()


def test_from_json_file(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps(EXAMPLE))
    assert PipelineConfig.from_json_file(str(p)) == PipelineConfig.from_dict(EXAMPLE)
