"""Streaming-ingest throughput measurement: frames/sec through the full
WebSocket source -> Structured Streaming -> memory sink path.

The reference publishes no throughput numbers (BASELINE.md), so this tool
exists to make OUR single-node streaming rate a measured fact instead of a
claim. It spins up the test suite's in-process WS server with N JSON
frames, runs the production pipeline projection over the registered
``websocket`` data source, and times arrival of the last frame at the sink.

Usage::

    python tools/stream_bench.py [n_frames]      # default 20000

Prints one JSON line: {"metric": "stream_ingest_fps", "value": ..., ...}.

What the number covers: RFC 6455 client decode, driver-side buffering in
the SimpleDataSourceStreamReader, Arrow conversion, the projection, and
sink append — i.e. the whole source path a real deployment pays per
frame. What it does not cover: a Kafka broker (absent here; the
reference's librdkafka write is its own bottleneck) and network latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.ws_server import RecordingWsServer  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402
from ws_to_kafka_spark.sources.websocket import register_websocket_source  # noqa: E402


def measure(spark, n: int = 20000, queryName: str = "stream_bench") -> dict:
    """Run the ws -> memory-sink pipeline over ``n`` frames and return the
    throughput/latency dict (importable by bench.py's ``streaming``
    section as well as this CLI). Raises RuntimeError if frames are lost.
    """
    frames = [
        json.dumps(
            {"event_id": i, "user_id": i % 100, "value": float(i), "ts_ms": 1704067200000 + i}
        ).encode()
        for i in range(n)
    ]
    server = RecordingWsServer(frames_per_connection=frames)
    register_websocket_source(spark)
    # Cap each microbatch at ~1/4 of the run so the latency numbers
    # summarize a DISTRIBUTION of bounded batches (the production
    # admission-control setting) instead of one giant drain batch.
    # Round-12 frontier (STREAM_FRONTIER.json): 25k-row batches at a
    # 500 ms trigger measured 76.2k steady fps at p50 256 ms / max
    # 738 ms, flat to 117-122k fps at 50-100k admission — wider
    # admission amortizes the ~95 ms fixed commit cost that dominated
    # 6.25k-row batches. bench.py calls this with n=150000, i.e.
    # 37.5k-row admission batches inside that flat region, and the
    # 150k-frame window gives steady-state a multi-second sample (the
    # round-11 measurement-window lesson). retention must exceed n or the
    # worker's deque silently evicts frames the engine hasn't admitted
    # yet and the run deadlines short.
    # Trigger/cap sizing (round-6 item 7): measured per-batch breakdown
    # at this scale is ~95 ms of FIXED driver-side commit cost
    # (walCommit ~47 + commitOffsets ~46 — the offset/commit logs are
    # correctness machinery) plus ~110 ms addBatch for a 6.25k-row
    # batch, so a 200 ms trigger leaves structurally ZERO headroom: every
    # steady batch ran 210-250 ms and Spark logged `Current batch is
    # falling behind` on most triggers (drain-mode bookkeeping — the
    # next batch starts immediately; admission control bounds every
    # batch). A 500 ms trigger amortizes the fixed cost with real
    # headroom (~250 ms batch vs 500 ms window) so the recorded p50/max
    # measure scheduling slack, not saturation. See BASELINE.md
    # "Streaming microbatch latency".
    raw = (
        spark.readStream.format("websocket")
        .option("url", server.url)
        .option("max_records_per_batch", str(max(1, n // 4)))
        .option("retention", str(n + 1000))
        .load()
    )
    start = time.perf_counter()
    query = (
        raw.writeStream.format("memory")
        .queryName(queryName)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 300
        count = 0
        while time.time() < deadline:
            count = spark.sql(f"SELECT COUNT(*) c FROM {queryName}").first().c
            if count >= n:
                break
            time.sleep(0.2)
        elapsed = time.perf_counter() - start
        if count < n:
            raise RuntimeError(f"only {count}/{n} frames in {elapsed:.1f}s")
        # Steady-state rate + per-microbatch latency from the engine's own
        # progress metrics, excluding batch 0 (one-time codegen + sink
        # init, ~3 s — a fixed cost that would otherwise dominate any
        # finite run).
        steady_rows = steady_ms = 0
        batch_ms: list[int] = []
        for p in query.recentProgress:
            if p["batchId"] == 0 or p["numInputRows"] == 0:
                continue
            steady_rows += p["numInputRows"]
            dur = p["durationMs"].get("triggerExecution", 0)
            steady_ms += dur
            batch_ms.append(dur)
        batch_ms.sort()
        return {
            "metric": "stream_ingest_fps",
            "value": round(n / elapsed, 1),
            "steady_state_fps": (
                round(steady_rows / (steady_ms / 1000.0), 1) if steady_ms else None
            ),
            # end-to-end microbatch latency: trigger fire -> sink commit,
            # the engine's own triggerExecution clock per non-warmup batch
            "microbatch_ms_p50": (
                batch_ms[len(batch_ms) // 2] if batch_ms else None
            ),
            "microbatch_ms_max": batch_ms[-1] if batch_ms else None,
            "n_batches": len(batch_ms),
            "unit": "frames/sec",
            "n_frames": n,
            "elapsed_sec": round(elapsed, 2),
        }
    finally:
        query.stop()
        server.close()


_FEED_SERVER_SCRIPT = """
import json, sys
sys.path.insert(0, {root!r})
from tests.ws_server import RecordingWsServer
per, feed = int(sys.argv[1]), int(sys.argv[2])
frames = [
    json.dumps(
        {{
            "event_id": feed * per + i,
            "user_id": i % 100,
            "value": float(i),
            "ts_ms": 1704067200000 + i,
        }}
    ).encode()
    for i in range(per)
]
server = RecordingWsServer(frames_per_connection=frames)
print(server.url, flush=True)
sys.stdin.read()  # parent closes stdin to shut us down
server.close()
"""


def _spawn_feed_servers(n_feeds: int, per: int) -> tuple[list, list[str]]:
    """One ws server SUBPROCESS per feed. In-process servers share the
    driver's GIL, so at 4 feeds the measurement had 8 Python byte-pushing
    threads (4 server + 4 client) against the single-connection run's 2 —
    the recorded 'scaling' was dominated by server-side contention that a
    real deployment (remote feed) never pays. Subprocess servers leave
    only the client decode threads in the measured process, which is the
    production shape."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs, urls = [], []
    for feed in range(n_feeds):
        p = subprocess.Popen(
            [sys.executable, "-c", _FEED_SERVER_SCRIPT.format(root=root),
             str(per), str(feed)],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )
        urls.append(p.stdout.readline().strip())
        procs.append(p)
    return procs, urls


def _close_feed_servers(procs: list) -> None:
    for p in procs:
        try:
            p.stdin.close()
            p.wait(timeout=10)
        except Exception:
            p.kill()


def measure_raw_ingest(n: int = 60000, n_feeds: int = 1) -> dict:
    """SOURCE-side decode throughput, isolated from the microbatch
    drain: spin the reader's feed workers directly (no Spark query) and
    time frame arrival in the buffers.  This is the number that scales
    with sockets — the end-to-end `value` above is admission-paced by
    design (cap x trigger), so it cannot show ingest scaling.  The
    timer starts once ~5% of frames have landed, so child-process
    spawn/connect cost is excluded from the rate (it's a fixed startup
    cost, not a per-frame one)."""
    from ws_to_kafka_spark.sources.websocket import (
        MultiWebSocketStreamReader,
    )

    per = n // n_feeds
    n = per * n_feeds
    procs, urls = _spawn_feed_servers(n_feeds, per)
    reader = MultiWebSocketStreamReader(
        {"urls": json.dumps(urls), "retention": str(n + 1000)}
    )
    try:
        workers = reader._ensure_workers()
        warm = max(1000, n // 20)
        t_start = c0 = None
        deadline = time.time() + 180
        total = 0
        while time.time() < deadline:
            total = sum(w.peek()[0] for w in workers)
            if t_start is None and total >= warm:
                t_start, c0 = time.perf_counter(), total
            if total >= n:
                break
            time.sleep(0.02)  # coarse poll: the counter thread must not
            # steal meaningful GIL time from the pump threads it measures
        if total < n or t_start is None:
            raise RuntimeError(
                f"raw ingest: only {total}/{n} frames buffered"
            )
        elapsed = time.perf_counter() - t_start
        return {
            "fps": round((total - c0) / elapsed, 1) if elapsed > 0 else None,
            "n_feeds": n_feeds,
            "n_frames": n,
            "measured_frames": total - c0,
        }
    finally:
        reader.stop()
        _close_feed_servers(procs)


def measure_multi(
    spark, n: int = 20000, n_feeds: int = 4, queryName: str = "stream_bench_multi"
) -> dict:
    """Multi-connection ingest (round-8 VERDICT item 2's measurement):
    ``n`` total frames split evenly across ``n_feeds`` independent ws
    servers, drained through ONE ``websocket_multi`` stream — each feed
    is its own socket thread AND its own input partition per microbatch.

    What scales and what doesn't, stated plainly: the per-feed decode
    threads share the driver's GIL (frame DECODE is Python), so the
    frames/sec ceiling grows sub-linearly with sockets on one driver;
    what the N partitions buy is N-wide DOWNSTREAM parallelism (the
    projection/sink work leaves the driver as N map tasks with no
    exchange) and per-feed isolation (a stalled feed can't head-of-line
    block the others' admission). Feed servers run as SUBPROCESSES (see
    `_spawn_feed_servers`) so the measured process pays only what a real
    deployment pays — the client decode threads. For a like-for-like
    scaling ratio, run this with n_feeds=1 and n_feeds=N and divide:
    identical machinery, only the socket count varies.
    """
    from ws_to_kafka_spark.sources.websocket import (
        register_websocket_multi_source,
    )

    per = n // n_feeds
    n = per * n_feeds
    procs, urls = _spawn_feed_servers(n_feeds, per)
    query = None
    try:
        # everything after the spawn sits inside this try: a failure in
        # source registration, .load() option parsing, or .start() must
        # still close the server subprocesses (they block on stdin and
        # would otherwise hold ports/threads for the process lifetime)
        register_websocket_multi_source(spark)
        raw = (
            spark.readStream.format("websocket_multi")
            .option("urls", json.dumps(urls))
            # per-feed admission at the round-12 frontier operating
            # point (quarter-of-run batches; see `measure`) — the old
            # per//8 caps starved 4-feed runs down to ~1.5k-row batches
            # where the fixed per-batch commit cost dominated every
            # steady-state number
            .option("max_records_per_batch", str(max(1, per // 4)))
            .option("retention", str(per + 1000))
            .load()
        )
        start = time.perf_counter()
        query = (
            raw.writeStream.format("memory")
            .queryName(queryName)
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        deadline = time.time() + 300
        count = 0
        while time.time() < deadline:
            count = spark.sql(f"SELECT COUNT(*) c FROM {queryName}").first().c
            if count >= n:
                break
            time.sleep(0.2)
        elapsed = time.perf_counter() - start
        if count < n:
            raise RuntimeError(
                f"multi: only {count}/{n} frames in {elapsed:.1f}s"
            )
        per_feed = {
            int(r.feed_id): int(r.c)
            for r in spark.sql(
                f"SELECT feed_id, COUNT(*) c FROM {queryName} GROUP BY feed_id"
            ).collect()
        }
        if sorted(per_feed) != list(range(n_feeds)) or any(
            v != per for v in per_feed.values()
        ):
            raise RuntimeError(f"multi: uneven per-feed landing {per_feed}")
        # same steady-state extraction as `measure` (skip batch 0's
        # codegen/sink-init) so the multi/single ratio compares like with
        # like instead of being dominated by the fixed warmup batch
        steady_rows = steady_ms = 0
        for p in query.recentProgress:
            if p["batchId"] == 0 or p["numInputRows"] == 0:
                continue
            steady_rows += p["numInputRows"]
            steady_ms += p["durationMs"].get("triggerExecution", 0)
        return {
            "metric": "stream_ingest_multi_fps",
            "value": round(n / elapsed, 1),
            "steady_state_fps": (
                round(steady_rows / (steady_ms / 1000.0), 1)
                if steady_ms
                else None
            ),
            "n_feeds": n_feeds,
            "unit": "frames/sec",
            "n_frames": n,
            "elapsed_sec": round(elapsed, 2),
        }
    finally:
        if query is not None:
            query.stop()
        _close_feed_servers(procs)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_feeds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("stream-bench")
    try:
        result = measure(spark, n)
        base = measure_multi(spark, n, 1, queryName="stream_bench_multi1")
        multi = measure_multi(spark, n, n_feeds)
    except RuntimeError as exc:
        print(json.dumps({"metric": "stream_ingest_fps", "error": str(exc)}))
        raise SystemExit(1)
    multi["scaling_vs_1conn"] = (
        round(multi["value"] / base["value"], 2) if base["value"] else None
    )
    multi["baseline_1conn_fps"] = base["value"]
    # decode-path scaling (round-9 VERDICT item 6): raw source-side
    # ingest fps, 1 vs N sockets, no microbatch pacing in the way.
    # Median of 3 interleaved trials: single-trial retention swings
    # ~0.79-0.93 on this host (the documented bimodal contention), so
    # the artifact records the median plus the spread.
    retentions = []
    fps1s, fpsNs = [], []
    for _ in range(3):
        raw1 = measure_raw_ingest(max(n * 3, 300000), 1)
        rawN = measure_raw_ingest(max(n * 3, 300000), n_feeds)
        fps1s.append(raw1["fps"])
        fpsNs.append(rawN["fps"])
        retentions.append(round(rawN["fps"] / n_feeds / raw1["fps"], 3))
    retentions.sort()
    fps1_med, fpsN_med = sorted(fps1s)[1], sorted(fpsNs)[1]
    multi["raw_ingest_1conn_fps"] = fps1_med
    multi[f"raw_ingest_{n_feeds}conn_fps"] = fpsN_med
    # ratio of MEDIANS, not median of ratios: each per-trial ratio
    # divides two independently-noisy rates (observed single-trial
    # swing 0.87-1.08 on this host), while the medians de-noise each
    # side first; the per-trial spread is recorded alongside.
    multi["per_socket_retention"] = round(
        fpsN_med / n_feeds / fps1_med, 3
    )
    multi["per_socket_retention_spread"] = [retentions[0], retentions[-1]]
    print(json.dumps(result))
    print(json.dumps(multi))


if __name__ == "__main__":
    main()
