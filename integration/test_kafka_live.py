"""Opt-in LIVE Kafka round-trip for the O8 sink path.

The sandbox has no broker, so the kafka sink is normally validated only by
the writer-contract test (tests/test_streaming.py) — but a user's first
real deployment exercises exactly the untested path: the
``kafka.bootstrap.servers`` option plumbing, topic publication, and the
``key``/``value``/``timestamp`` column contract as Kafka actually stores
it. Wherever a broker exists, run::

    KAFKA_BOOTSTRAP=localhost:9092 python -m pytest integration/test_kafka_live.py

Requirements in that environment (both public artifacts):

* a reachable Kafka broker with topic auto-creation (or pre-create the
  ``ws_to_kafka_it`` topic);
* the Spark Kafka connector on the session classpath, e.g.
  ``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>``
  — set ``KAFKA_CONNECTOR_PACKAGE`` to override the coordinates.

Lives OUTSIDE tests/ so the default suite (``pytest tests/``) collects
zero skips; when ``KAFKA_BOOTSTRAP`` is unset this module still skips
rather than fails, so an accidental collection stays green. The
cannot-skip twin asserting the same key/value/timestamp contract on
real rows is tests/test_streaming.py::test_pipeline_foreach_batch_parquet.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="set KAFKA_BOOTSTRAP=<host:port> to run live-Kafka tests"
)

_N_FRAMES = 50


@pytest.fixture(scope="module")
def kafka_spark():
    """A session with the Kafka connector jars — separate from the shared
    test session because spark.jars.packages only applies at JVM launch."""
    from pyspark.sql import SparkSession

    pkg = os.environ.get(
        "KAFKA_CONNECTOR_PACKAGE",
        "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2",
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-it")
        .config("spark.jars.packages", pkg)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_ws_to_kafka_roundtrip(kafka_spark, tmp_path):
    """Full production path: ws frames -> pipeline -> LIVE kafka sink,
    then a batch read of the topic must return every frame verbatim with
    the static key — byte-for-byte at-least-once delivery."""
    from tests.ws_server import RecordingWsServer
    from ws_to_kafka_spark.config import PipelineConfig
    from ws_to_kafka_spark.streaming.pipeline import start_pipeline

    topic = f"ws_to_kafka_it_{uuid.uuid4().hex[:8]}"
    frames = [
        json.dumps({"event_id": i, "value": float(i)}).encode()
        for i in range(_N_FRAMES)
    ]
    server = RecordingWsServer(frames_per_connection=frames)
    config = PipelineConfig(
        url=server.url, brokers=BOOTSTRAP, topic=topic, key="it-key"
    )
    query = start_pipeline(
        kafka_spark,
        config,
        str(tmp_path / "ckpt"),
        trigger_interval="200 milliseconds",
    )
    try:
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = (
                kafka_spark.read.format("kafka")
                .option("kafka.bootstrap.servers", BOOTSTRAP)
                .option("subscribe", topic)
                .option("startingOffsets", "earliest")
                .load()
                .select("key", "value")
                .collect()
            )
            if len(got) >= _N_FRAMES:
                break
            time.sleep(0.5)
    finally:
        query.stop()
        server.close()
    # at-least-once: every frame present (dedupe on bytes for the >= case)
    values = {bytes(r.value) for r in got}
    assert values == set(frames)
    assert {bytes(r.key) for r in got} == {b"it-key"}


def test_restart_resumes_from_checkpoint_against_live_broker(
    kafka_spark, tmp_path
):
    """Stop mid-stream and restart with the same checkpoint: the second
    run must not re-publish the already-committed microbatches (the
    at-least-once floor stays tight when offsets commit cleanly)."""
    from tests.ws_server import RecordingWsServer
    from ws_to_kafka_spark.config import PipelineConfig
    from ws_to_kafka_spark.streaming.pipeline import start_pipeline

    topic = f"ws_to_kafka_it_{uuid.uuid4().hex[:8]}"
    frames = [f"frame-{i}".encode() for i in range(_N_FRAMES)]
    ckpt = str(tmp_path / "ckpt2")

    def run(stop_after: float) -> None:
        server = RecordingWsServer(frames_per_connection=frames)
        config = PipelineConfig(
            url=server.url, brokers=BOOTSTRAP, topic=topic, key="k"
        )
        query = start_pipeline(
            kafka_spark, config, ckpt, trigger_interval="200 milliseconds"
        )
        time.sleep(stop_after)
        query.stop()
        server.close()

    run(3.0)
    run(5.0)
    rows = (
        kafka_spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select("value")
        .collect()
    )
    values = [bytes(r.value) for r in rows]
    assert set(values) >= set(frames), "frames lost across restart"
    # duplicates only from the (rare) uncommitted-batch replay window, not
    # a wholesale re-send of the stream
    assert len(values) < 2 * len(frames), "checkpoint resume re-published everything"


def test_streaming_consume_wrapper_round_trip(kafka_spark, tmp_path):
    """The CONSUME wrapper (sources/kafka.read_kafka_stream) against a
    live broker: publish via the pipeline, then stream the topic back
    through the wrapper and assert the repo's (value, ws_timestamp)
    contract — the §2.3 consume cell executed end-to-end wherever a
    broker exists (its offline halves are tests/test_kafka_source.py)."""
    from tests.ws_server import RecordingWsServer
    from ws_to_kafka_spark.config import PipelineConfig
    from ws_to_kafka_spark.sources.kafka import read_kafka_stream
    from ws_to_kafka_spark.streaming.pipeline import start_pipeline

    topic = f"ws_to_kafka_it_{uuid.uuid4().hex[:8]}"
    frames = [f"consume-{i}".encode() for i in range(_N_FRAMES)]
    server = RecordingWsServer(frames_per_connection=frames)
    config = PipelineConfig(
        url=server.url, brokers=BOOTSTRAP, topic=topic, key="k"
    )
    producer = start_pipeline(
        kafka_spark,
        config,
        str(tmp_path / "ckpt3"),
        trigger_interval="200 milliseconds",
    )
    consumer = (
        read_kafka_stream(kafka_spark, BOOTSTRAP, topic)
        .writeStream.format("memory")
        .queryName("kafka_consume_it")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = kafka_spark.sql(
                "SELECT value, ws_timestamp FROM kafka_consume_it"
            ).collect()
            if len(got) >= _N_FRAMES:
                break
            time.sleep(0.5)
    finally:
        consumer.stop()
        producer.stop()
        server.close()
    assert {bytes(r.value) for r in got} == set(frames)
    assert all(r.ws_timestamp is not None for r in got)
