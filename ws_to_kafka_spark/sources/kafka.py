"""Kafka CONSUME-side wrapper — the §2.3 source cell paired with the
pipeline's kafka sink (reference parity note: the reference only ever
PRODUCES — ``kafka_producer.cpp:36-57`` — so this is extension surface;
it exists so a deployment can read back what the pipeline wrote with
the same column contract the websocket source emits).

The sandbox ships no Kafka connector jar and no broker (probed in
KAFKA_IT.json), so the split here is deliberate:

* :func:`kafka_reader_options` is PURE — the exact option dict the
  Spark kafka source receives; contract-tested offline.
* :func:`decode_kafka_frames` maps the kafka source's fixed schema to
  this repo's ``(value binary, ws_timestamp timestamp)`` stream
  contract; testable offline on a static frame with the kafka schema.
* :func:`read_kafka_stream` composes them against the real connector;
  in a jar-less environment it raises the connector's own
  DATA_SOURCE_NOT_FOUND error (asserted in tests), and the live
  integration suite (integration/test_kafka_live.py) runs it for real
  wherever ``KAFKA_BOOTSTRAP`` points at a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_reader_options(
    bootstrap: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The option dict for ``readStream.format("kafka")`` — the consume
    mirror of the sink's option plumbing (pipeline.build_writer):
    bootstrap servers, one subscribed topic, a replayable starting
    position, and the same admission-control knob
    (``maxOffsetsPerTrigger``) the websocket source exposes as
    ``max_records_per_batch``."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    return opts


def decode_kafka_frames(df: DataFrame) -> DataFrame:
    """Kafka source schema -> this repo's stream contract
    ``(value binary, ws_timestamp timestamp)`` (websocket.py _SCHEMA_DDL):
    the payload bytes ride through verbatim (the byte-faithful rule the
    sink upholds — main.cpp:48-50 parity) and the broker's record
    timestamp becomes the event's ``ws_timestamp``, so everything
    downstream of ``build_stream`` is source-agnostic."""
    return df.select(
        F.col("value").cast("binary").alias("value"),
        F.col("timestamp").alias("ws_timestamp"),
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    **kwargs,
) -> DataFrame:
    """The composed consume path. Requires the Spark Kafka connector on
    the session classpath (``spark.jars.packages=
    org.apache.spark:spark-sql-kafka-0-10_2.13:<version>``); without it
    Spark raises DATA_SOURCE_NOT_FOUND at ``.load()`` — surfaced as-is,
    never masked."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap, topic, **kwargs).items():
        reader = reader.option(k, v)
    return decode_kafka_frames(reader.load())
