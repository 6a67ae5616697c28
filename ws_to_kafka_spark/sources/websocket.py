"""WebSocket streaming source — the reference's core capability, as a
PySpark Python DataSource (Spark 4.x ``pyspark.sql.datasource`` API).

Reference behaviors reproduced (``/root/reference/src/wsclient.hpp``):

* connect → (TLS) → handshake → **send subscribe message** → read loop
  (``wsclient.hpp:132-168``; subscribe at ``:144``);
* on connection error: log, sleep 5 s, full re-resolve/re-handshake/
  re-subscribe (``wsclient.hpp:158-162``, ``kErrorDelay`` at ``:22``);
* handshake/idle timeouts 2 s / 10 s with ping keep-alive
  (``wsclient.hpp:20-21,141-142``);
* periodic control messages re-sent every ``interval`` seconds
  (``interval_timer.hpp:8-47``, fixed-rate drift-free deadline stepping;
  wiring ``main.cpp:54-62``) — sent from a timer thread through the same
  connection (``wsclient.hpp:171-182``);
* each data frame becomes one record tagged with a processing-time
  timestamp (``kafka_producer.cpp:41-42``);
* payload bytes are forwarded VERBATIM as a ``binary`` column
  (``main.cpp:48-50`` → ``kafka_producer.cpp:47-49``, ``RK_MSG_COPY`` —
  the reference never decodes; neither do we).

Delivery semantics are the reference's **at-most-once** (SURVEY.md §2.1):
a WebSocket is not replayable, so offsets only bound microbatches —
``readBetweenOffsets`` replays from a bounded retention cache (strictly
better than the reference, which loses everything in flight), and frames
arriving while disconnected are lost on both systems.

Scale note: one WebSocket connection is inherently ONE input partition
(the reference is likewise single-connection, ``wsclient.hpp:38-53``);
parallelism comes from running one source per stream/topic and from
everything downstream of the source exchange. The simple-reader variant
buffers on the driver, which is exactly where a single ordered socket
must serialize anyway.
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from .ws_client import RECONNECT_DELAY_S, WsClient, WsError

# value is BINARY, not string: the reference forwards frame bytes verbatim
# (src/main.cpp:48-50 hands the payload pointer straight to
# kafka_producer.cpp:47-49, RK_MSG_COPY — no decode), so a non-UTF-8 binary
# frame must survive byte-for-byte. A string column decoded with
# errors="replace" is lossy exactly there; Kafka's sink contract accepts
# binary values natively, and text consumers cast: value.cast("string").
_SCHEMA_DDL = "value binary, ws_timestamp timestamp"


@dataclass
class _Record:
    index: int
    value: bytes
    ts: datetime


class _FeedWorker:
    """Background connection owner: dial → subscribe → read → buffer,
    redialing forever on error (the reference's Start() loop)."""

    def __init__(
        self,
        url: str,
        subscribe: str | None,
        interval_seconds: float,
        interval_messages: tuple[str, ...],
        reconnect_delay: float = RECONNECT_DELAY_S,
        retention: int = 100_000,
    ):
        self._url = url
        self._subscribe = subscribe
        self._interval = interval_seconds
        self._interval_messages = interval_messages
        self._reconnect_delay = reconnect_delay
        self._buffer: deque[_Record] = deque(maxlen=retention)
        self._lock = threading.Lock()
        self._next_index = 0
        self._stop = threading.Event()
        self._client: WsClient | None = None
        self._reader_thread: threading.Thread | None = None
        self._timer_thread: threading.Thread | None = None

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> None:
        self._reader_thread = threading.Thread(
            target=self._run, name="ws-feed", daemon=True
        )
        self._reader_thread.start()
        if self._interval > 0 and self._interval_messages:
            self._timer_thread = threading.Thread(
                target=self._run_timer, name="ws-interval", daemon=True
            )
            self._timer_thread.start()

    def stop(self) -> None:
        self._stop.set()
        client, self._client = self._client, None
        if client is not None:
            try:
                client.close()
            except Exception:
                pass

    def _run(self) -> None:
        """Reference Start() semantics: infinite dial loop, 5 s backoff,
        re-subscribe after every reconnect (wsclient.hpp:132-168). A CLEAN
        server close also redials: the reference's while(keep_running_)
        wraps the whole connect+run sequence, so only Shutdown() ends it —
        the feed is expected to be persistent."""
        while not self._stop.is_set():
            client = WsClient(self._url)
            try:
                client.connect()
                if self._subscribe:
                    client.send(self._subscribe)
                self._client = client
                for payload in client.frames():
                    self._append(payload)
                    if self._stop.is_set():
                        break
            except WsError:
                pass
            finally:
                self._client = None
                client.close_socket()
            if not self._stop.is_set():
                self._stop.wait(self._reconnect_delay)

    def _run_timer(self) -> None:
        """Drift-free fixed-rate resend (interval_timer.hpp:23-38:
        deadline += interval, never now + interval)."""
        deadline = time.monotonic() + self._interval
        while not self._stop.wait(max(0.0, deadline - time.monotonic())):
            deadline += self._interval
            client = self._client
            if client is None:
                continue  # disconnected — reference drops the tick too
            # All frame writes — these interval messages, the reader
            # thread's pong/ping replies, stop()'s close — serialize on
            # WsClient's internal write lock.
            for msg in self._interval_messages:
                try:
                    client.send(msg)
                except WsError:
                    break  # write failure is logged-and-dropped in the ref

    # -- buffer -------------------------------------------------------------

    def _append(self, payload: bytes) -> None:
        rec = _Record(
            index=self._next_index,
            value=bytes(payload),  # byte-faithful (main.cpp:48-50 parity)
            ts=datetime.now(timezone.utc),
        )
        with self._lock:
            self._next_index += 1
            self._buffer.append(rec)

    def snapshot(self, start_index: int) -> tuple[list[_Record], int]:
        """Records with index >= start_index, plus the next offset."""
        with self._lock:
            records = [r for r in self._buffer if r.index >= start_index]
            return records, self._next_index

    def between(self, start_index: int, end_index: int) -> list[_Record]:
        with self._lock:
            return [r for r in self._buffer if start_index <= r.index < end_index]

    def prune(self, end_index: int) -> None:
        with self._lock:
            while self._buffer and self._buffer[0].index < end_index:
                self._buffer.popleft()


class WebSocketStreamReader(SimpleDataSourceStreamReader):
    """Simple (driver-buffered) stream reader over one WebSocket feed.

    Pickling contract: Spark ships this reader to (a) the driver-side
    prefetch runner process, which calls ``read()`` and OWNS the live
    connection, and (b) executors, which only ever call
    ``readBetweenOffsets`` as a cache-miss fallback. The live worker
    (threads, socket, locks) is therefore started LAZILY on first
    ``read()`` and excluded from pickles; an executor copy without a
    worker answers the fallback with an empty replay — the reference's
    at-most-once (SURVEY.md §2.1), never a second competing connection.
    """

    def __init__(self, options: dict):
        if not options.get("url"):
            raise ValueError("websocket source requires an 'url' option")
        self._options = dict(options)
        self._worker: _FeedWorker | None = None

    def __getstate__(self) -> dict:
        return {"_options": self._options}

    def __setstate__(self, state: dict) -> None:
        self._options = state["_options"]
        self._worker = None

    def _ensure_worker(self, base_index: int = 0) -> _FeedWorker:
        if self._worker is None:
            opts = self._options
            parsed = json.loads(opts.get("interval_messages") or "[]")
            self._worker = _FeedWorker(
                url=opts["url"],
                subscribe=opts.get("subscribe"),
                interval_seconds=float(opts.get("interval", 0) or 0),
                interval_messages=tuple(
                    m if isinstance(m, str) else json.dumps(m) for m in parsed
                ),
                reconnect_delay=float(
                    opts.get("reconnect_delay", RECONNECT_DELAY_S)
                ),
                retention=int(opts.get("retention", 100_000)),
            )
            # Checkpoint-restart: the engine resumes from committed offset N,
            # but a socket cannot replay — a fresh worker numbering from 0
            # would have its first N frames treated as already-consumed and
            # silently skipped. Baseline the new connection's numbering at
            # the resume offset instead: restart means "continue from now",
            # the reference's semantics (it restarts from scratch,
            # /root/reference/src/wsclient.hpp:158-162 — ours additionally
            # keeps offsets monotonic for the engine's bookkeeping).
            self._worker._next_index = base_index
            self._worker.start()
        return self._worker

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple:
        records, next_index = self._ensure_worker(start["index"]).snapshot(
            start["index"]
        )
        # Admission control (the kafka maxOffsetsPerTrigger analog): cap
        # rows per microbatch so a burst — or a backlog after restart —
        # drains as several bounded batches instead of one giant one.
        # Bounded batches keep per-batch latency flat and state-store /
        # sink pressure constant; the un-consumed tail stays in the
        # buffer and the returned offset only advances past what this
        # batch actually took. 0 (default) = unlimited, the reference's
        # drain-everything behavior.
        cap = int(self._options.get("max_records_per_batch", 0) or 0)
        if cap > 0 and len(records) > cap:
            records = records[:cap]
            next_index = records[-1].index + 1
        rows = [(r.value, r.ts) for r in records]
        return iter(rows), {"index": next_index}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Failure recovery: best-effort replay from the retention cache.
        # A socket can't seek — outside the cache (or on a worker-less
        # executor copy) this degrades to the reference's at-most-once.
        if self._worker is None:
            return iter(())
        return iter(
            (r.value, r.ts) for r in self._worker.between(start["index"], end["index"])
        )

    def commit(self, end: dict) -> None:
        if self._worker is not None:
            self._worker.prune(end["index"])

    def stop(self) -> None:
        if self._worker is not None:
            self._worker.stop()


class WebSocketDataSource(DataSource):
    """``spark.readStream.format("websocket")`` after registration.

    Options (mirroring config.json fields, ``/root/reference/src/main.cpp:
    80-97``): ``url``, ``subscribe`` (message sent on every (re)connect),
    ``interval`` + ``interval_messages`` (JSON array, re-sent every
    interval), ``reconnect_delay``, ``retention``.
    """

    @classmethod
    def name(cls) -> str:
        return "websocket"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType) -> WebSocketStreamReader:
        return WebSocketStreamReader(dict(self.options))


def register_websocket_source(spark) -> None:
    """Register the source under the name ``websocket`` (idempotent)."""
    spark.dataSource.register(WebSocketDataSource)
