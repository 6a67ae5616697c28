"""Observability for streaming queries — the reference's O13 surface
(spdlog lifecycle/delivery logging: ``/root/reference/src/wsclient.hpp:
153,159,164``, ``src/kafka_producer.cpp:66-74,80-86``) re-expressed as a
``StreamingQueryListener`` plus plain ``logging``.

The reference logs: connect/reconnect lifecycle, per-message delivery
failures, and flush progress on shutdown. Spark's equivalents are query
start/progress/termination events — progress additionally carries rates
and batch durations the reference never had.
"""

from __future__ import annotations

import logging

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("ws_to_kafka_spark.streaming")


class PipelineListener(StreamingQueryListener):
    """Logs lifecycle + throughput; keeps last-progress counters queryable
    (the tests assert on them; production scrapes them instead)."""

    def __init__(self) -> None:
        self.started: list[str] = []
        self.terminated: list[str] = []
        self.rows_seen: int = 0
        self.last_progress: dict | None = None

    def onQueryStarted(self, event) -> None:
        self.started.append(event.name or event.id)
        log.info("query started: %s", event.name or event.id)

    def onQueryProgress(self, event) -> None:
        progress = event.progress
        self.last_progress = {
            "batchId": progress.batchId,
            "numInputRows": progress.numInputRows,
            "inputRowsPerSecond": progress.inputRowsPerSecond,
        }
        self.rows_seen += progress.numInputRows
        log.info(
            "progress: batch=%s rows=%s rate=%.1f/s",
            progress.batchId,
            progress.numInputRows,
            progress.inputRowsPerSecond or 0.0,
        )

    def onQueryIdle(self, event) -> None:
        log.debug("query idle: %s", event.id)

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))
        if event.exception:
            # reference: delivery failure -> error log (kafka_producer.cpp:80-86)
            log.error("query failed: %s", event.exception)
        else:
            log.info("query stopped cleanly: %s", event.id)
