"""Offline contract tests for the Kafka CONSUME wrapper
(ws_to_kafka_spark/sources/kafka.py) — the §2.3 source cell.

No broker and no connector jar exist in this sandbox (KAFKA_IT.json
records the probes), so these tests pin everything pinnable offline:
the exact option dict the connector receives, the kafka-schema ->
stream-contract projection on real rows, and the precise jar-less
failure mode of the composed path.  The live round-trip (the only part
that needs a broker) is integration/test_kafka_live.py.
"""

from __future__ import annotations

import datetime as dt

import pytest

from ws_to_kafka_spark.sources.kafka import (
    decode_kafka_frames,
    kafka_reader_options,
    read_kafka_stream,
)


def test_reader_options_contract():
    opts = kafka_reader_options(
        "broker1:9092,broker2:9092",
        "ticks",
        starting_offsets="latest",
        max_offsets_per_trigger=2500,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "ticks",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "2500",
    }
    # defaults: replayable start, no admission cap key at all
    d = kafka_reader_options("b:9092", "t")
    assert d["startingOffsets"] == "earliest"
    assert "maxOffsetsPerTrigger" not in d


def test_decode_kafka_frames_matches_stream_contract(spark):
    """The kafka source's fixed schema projects to the repo's
    (value binary, ws_timestamp timestamp) contract with byte-faithful
    payloads — the same two columns the websocket source emits, so
    build_stream is source-agnostic."""
    ts = dt.datetime(2024, 1, 1, 0, 0, 5, tzinfo=dt.timezone.utc)
    rows = [
        (b"key-0", b"\x00\xffraw-bytes", "ticks", 0, 7, ts, 0),
        (None, b"{}", "ticks", 1, 8, ts, 0),
    ]
    kafka_df = spark.createDataFrame(
        rows,
        schema=(
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp timestamp, timestampType int"
        ),
    )
    out = decode_kafka_frames(kafka_df)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema] == [
        ("value", "binary"),
        ("ws_timestamp", "timestamp"),
    ]
    got = sorted(
        (bytes(r.value), r.ws_timestamp) for r in out.collect()
    )
    assert got[0][0] == b"\x00\xffraw-bytes"
    assert got[1][0] == b"{}"
    assert all(t is not None for _, t in got)


def test_read_kafka_stream_without_connector_raises_cleanly(spark):
    """Jar-less environments must fail with Spark's own
    DATA_SOURCE_NOT_FOUND at .load(), never a masked or partial
    stream — the first real deployment then knows exactly which jar to
    add (the module docstring names the coordinates)."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as exc:
        read_kafka_stream(spark, "localhost:9092", "ticks")
    msg = str(exc.value).lower()
    assert "kafka" in msg
