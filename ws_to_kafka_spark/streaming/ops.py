"""Streaming analytics operators: watermarks, streaming dedup, stateful agg
(SURVEY.md §2.3 "streaming" rows).

Each operator is a function over a (streaming or batch) DataFrame — under
Structured Streaming the SAME expression runs incrementally with state;
the batch twins are registered as driver-checkable queries, and
``tests/test_streaming.py`` drives the streaming forms end-to-end through
the WebSocket source → memory sink.

The reference has no event-time concept at all (timestamps are producer
wall clock, ``/root/reference/src/kafka_producer.cpp:41-42``); these are
the driver-mandated extension surface.

Scale notes: watermarking bounds state (without it, windowed state grows
forever at 100 TB/day); streaming dedup keys state by the dedup key only —
key design (user_id, event_id) keeps per-key state O(1); the stateful
``applyInPandasWithState`` operator shuffles once on the group key and
stores one small tuple per key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .. import tables
from ..operators.registry import register

DEFAULT_WATERMARK = "1 hour"


# ---------------------------------------------------------------------------
# Streaming builders (applied to streaming DataFrames in tests/production)
# ---------------------------------------------------------------------------

def watermarked_tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window agg with late-data drop: rows later than
    the watermark behind max(event time) are discarded and their windows
    finalized — the streaming form of ``q_win_tumble``."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def streaming_session_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: per-user session windows that close after
    ``gap`` of event-time silence — the streaming form of the operator
    ``q_win_session`` runs in batch (same ``session_window`` function, same
    half-open ``[start, last+gap)`` semantics).

    State per key is one open session (start, last-ts, partials), merged
    on overlap and evicted once the watermark passes ``session_end`` —
    bounded regardless of stream length. Append output emits only
    finalized (watermark-passed) sessions; complete re-emits the full
    result per trigger (session merging precludes update mode)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(ts_col, gap))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "ts",
) -> DataFrame:
    """Keep the first occurrence per key; state expires with the watermark
    (``dropDuplicatesWithinWatermark`` — unbounded-state-safe, unlike plain
    ``dropDuplicates`` which at 100 TB/day grows state forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stateful_running_max(
    events: DataFrame,
    ts_col: str = "ts",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful aggregation via ``applyInPandasWithState``: per-user
    running max value + event count carried across microbatches."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, n_events long, max_value double"
    state_schema = "n long, mx double"

    def update(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user event count + running value total via
    ``transformWithStateInPandas`` — Spark 4's arbitrary-state API (the
    successor to ``applyInPandasWithState``): explicit typed state handles
    (ValueState here; ListState/MapState/timers/TTL also available), so the
    engine — not the UDF — owns the state encoding, and a long-running job
    gets state-schema evolution and per-state TTLs.

    Scale: one shuffle on the group key, a single (n, total) tuple per key
    in the state store — O(|keys|) state, like the other stateful ops.

    Environment note: the transformWithState Python worker protocol
    needs ``google.protobuf``; containers without it activate the
    vendored minimal wire-format runtime (vendor/protostub, installed by
    :func:`ws_to_kafka_spark.streaming.protostub.ensure_protobuf` before
    the session starts). The live streaming test runs the full protocol
    on that stub (RocksDB state store — transformWithState's per-state
    column families need it), and the batch twin
    ``q_stream_user_totals`` pins the semantics against the oracle.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                state = self._totals.get()
                n, total = int(state[0]), float(state[1])
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def stateful_zscore(
    events: DataFrame,
    threshold: float = 3.0,
    min_history: int = 5,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming anomaly detection via ``applyInPandasWithState``: per-user
    Welford state (count, mean, M2) carried across microbatches; each event
    is scored against the statistics of everything BEFORE it (prior mean /
    sample std), flagged when ``|z| > threshold`` after ``min_history``
    prior events, then folded into the state.

    The batch twin ``q_stream_anomaly`` expresses the identical
    prior-window semantics with cumulative window aggregates ordered by
    (ts, event_id) and is oracle-checked; this operator processes rows in
    that same order within each batch, so final per-key outputs agree.

    Scale: one shuffle on user_id, O(1) state per key (three floats + two
    counters) — the streaming z-score never re-reads history, which is the
    point: the batch formulation re-sorts the past every run, the stateful
    one amortizes it to a constant per event.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = (
        "user_id long, n_events long, n_anomalies long, "
        "mean_value double, std_value double"
    )
    state_schema = "n long, mean double, m2 double, anomalies long"

    def update(key, pdfs, state: GroupState):
        n, mean, m2, anomalies = (
            state.get if state.exists else (0, 0.0, 0.0, 0)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            # arrival order == event-time order in the twins; make it
            # explicit so a re-partitioned batch can't reorder scoring
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].astype(float):
                if n >= min_history and n >= 2:
                    std = (m2 / (n - 1)) ** 0.5
                    if std > 0 and round(abs(v - mean) / std, 4) > threshold:
                        anomalies += 1
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2, anomalies))
        std_final = (m2 / (n - 1)) ** 0.5 if n >= 2 else None
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_anomalies": [anomalies],
                "mean_value": [round(mean, 4) if n else None],
                "std_value": [
                    round(std_final, 4) if std_final is not None else None
                ],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


#: Event-time gap that closes a session (batch twin q_stream_session
#: shares it) — 2 h in microseconds.
_SESSION_GAP_US = 7_200 * 1_000_000


def stateful_sessionize(
    events: DataFrame,
    gap_us: int = _SESSION_GAP_US,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``: per-user
    session COUNT and event count carried across microbatches, where a
    new session opens when the event-time gap to the previous event
    exceeds ``gap_us`` — the canonical arbitrary-state streaming
    operator (gap-based sessions cannot be a fixed window; the boundary
    depends on the data).

    Semantics are EVENT-TIME gaps scored in (ts, event_id) order — the
    same order contract as ``stateful_zscore``: arrival order equals
    event-time order in the twins, and each batch is sorted explicitly
    (NaT first, matching the batch NULLS FIRST) so a re-partitioned
    batch cannot reorder the gap scan. NULL ts follows the batch rule
    exactly: the event counts, a NULL gap never breaks a session, and
    the per-key first event opens session 1 regardless of its ts. Late
    (out-of-order ACROSS batches) data would need the watermarked
    session-window form instead — that path is the oracle-checked
    ``q_win_session``; this operator pins the O(1)-state streaming
    equivalent whose final per-key output the batch twin
    ``q_stream_session`` verifies.

    Scale: one shuffle on user_id, state is three longs per key; each
    event is O(1) — the batch formulation re-sorts history every run,
    the stateful one amortizes it away, which is why sessionization is
    the textbook stateful-streaming example.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, n_events long, n_sessions long"
    state_schema = "last_us long, n_sessions long, n_events long"

    def update(key, pdfs, state: GroupState):
        # last_us = -1 sentinel for "no prior VALID timestamp" (kept
        # non-null so the state row round-trips without nullable-field
        # surprises). NULL ts must match the batch twin: NULLS FIRST
        # ordering, the event COUNTS, and a NULL gap is never a break —
        # so NaT leaves last_us untouched (pandas NaT.value is int64
        # min; feeding it through would poison every later gap). The
        # first event of a key opens session 1 whether or not its ts is
        # NULL (the batch rule's "1 +" term), tracked by n_events == 0,
        # NOT by last_us — an all-NULL prefix must not reopen sessions.
        last_us, n_sessions, n_events = (
            state.get if state.exists else (-1, 0, 0)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"], na_position="first")
            for ts in pdf["ts"]:
                if pd.isna(ts):
                    if n_events == 0:
                        n_sessions += 1
                    n_events += 1
                    continue
                us = int(ts.value // 1000)  # pandas ns -> us
                if n_events == 0 or (
                    last_us >= 0 and us - last_us > gap_us
                ):
                    n_sessions += 1
                n_events += 1
                last_us = us
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def stateful_session_timeout(
    events: DataFrame, timeout_ms: int = 2_000
) -> DataFrame:
    """Processing-time session CLOSE via transformWithState TIMERS: each
    key's event count accumulates in a typed ValueState, every batch
    re-arms a single per-key timer at now + ``timeout_ms``, and when the
    timer fires (no events arrived for a full timeout) the operator
    emits one session-closed record and evicts the state — the
    idle-session eviction shape (cart abandonment, device-offline
    alerts) that NEEDS the timer API: gap-based close cannot be a
    window, and :func:`stateful_sessionize`-style operators can only
    observe a close when the NEXT event arrives, which for an abandoned
    session is never.

    API coverage: registerTimer / deleteTimer / listTimers /
    handleExpiredTimer + state eviction — the timer half of the
    arbitrary-state surface (:func:`stateful_user_totals` covers the
    ValueState half). Requires the RocksDB state store provider (per-
    state column families) and ``google.protobuf`` — containers without
    it run on the vendored wire-format runtime (streaming/protostub).

    Scale: one shuffle on the key; state is one long plus one timer per
    LIVE key, and closed keys are evicted — state tracks concurrent
    sessions, not stream history. Timers fire on microbatch boundaries
    (engine contract: an idle source produces no batch, so a fully
    quiet stream defers the close until the next batch — acceptable for
    eviction semantics and pinned in the test).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionTimeout(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._n = handle.getValueState("n_events", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = int(self._n.get()[0]) if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            # one live timer per key: clear stale deadlines, arm the new
            # one (materialize before deleting — listTimers streams)
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + timeout_ms
            )
            return iter([])  # sessions emit only when they close

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            n = int(self._n.get()[0]) if self._n.exists() else 0
            self._n.clear()  # evict: closed sessions hold no state
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "closed_at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionTimeout(),
        outputStructType="user_id long, n_events long, closed_at_ms long",
        outputMode="append",
        timeMode="ProcessingTime",
    )


def stateful_recent_values(events: DataFrame, k: int = 3) -> DataFrame:
    """Last-``k`` values per key via transformWithState ListState — the
    online feature-store "recent activity" feature (rolling mean of the
    most recent k purchases) maintained incrementally: O(k) state per
    key, no window over stream history. Each batch appends the new
    values in (ts, event_id) order, truncates to the newest k with
    ``put``, and emits (total seen, rounded mean of the retained k).

    API coverage: getListState / get (iterator paging) / put — the
    ListState third of the arbitrary-state surface (ValueState:
    :func:`stateful_user_totals`; timers:
    :func:`stateful_session_timeout`). Same environment notes as those:
    RocksDB provider; protobuf or the vendored stub — list-state reads
    exercise the stub's repeated-bytes response parsing live.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RecentK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._recent = handle.getListState("recent", "value double")
            self._seen = handle.getValueState("seen", "n long")

        def handleInputRows(self, key, rows, timerValues):
            vals = [float(t[0]) for t in self._recent.get()]
            seen = int(self._seen.get()[0]) if self._seen.exists() else 0
            for pdf in rows:
                if not len(pdf):
                    continue
                pdf = pdf.sort_values(["ts", "event_id"])
                for v in pdf["value"]:
                    if pd.notna(v):
                        vals.append(float(v))
                seen += len(pdf)
            vals = vals[-k:]
            self._recent.put([(v,) for v in vals])
            self._seen.update((seen,))
            # floor-scale half-up, NOT round(): the batch twin
            # q_stream_recent and its DuckDB oracle use
            # floor(x*1e4+0.5)/1e4, and exact-halfway means (cent sums /
            # small n) are routine — banker's rounding would diverge.
            mean = (
                math.floor(sum(vals) / len(vals) * 10000.0 + 0.5) / 10000.0
                if vals
                else None
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_seen": [seen],
                    "n_recent": [len(vals)],
                    "recent_mean": [mean],
                }
            )

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RecentK(),
        outputStructType=(
            "user_id long, n_seen long, n_recent long, recent_mean double"
        ),
        outputMode="update",
        timeMode="None",
    )


def stateful_type_profile(events: DataFrame) -> DataFrame:
    """Per-user event-TYPE profile via transformWithState MapState: a
    (event_type -> count) map maintained incrementally per key — the
    online user-profile feature (what mix of views/clicks/purchases is
    this user?) whose key set is data-driven, so neither a ValueState
    tuple (fixed arity) nor a ListState (no keyed lookup) fits: the
    textbook MapState case. Each batch bumps per-type counts with
    getValue/updateValue and emits the current profile snapshot (type
    counts serialized as a deterministic sorted "type:n" string so the
    memory-sink assertion is order-stable).

    API coverage: getMapState / containsKey / getValue / updateValue /
    iterator — the MapState quarter of the arbitrary-state surface
    (ValueState: :func:`stateful_user_totals`; timers:
    :func:`stateful_session_timeout`; ListState:
    :func:`stateful_recent_values`). Same environment notes: RocksDB
    provider, protobuf or the vendored stub — the map iterator drives
    the stub's KeyAndValuePair submessage parsing live.

    Scale: one shuffle on the key; state is O(#distinct types) per key
    (bounded by the event-type vocabulary, not the stream), and each
    batch touches only the types it saw.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                if not len(pdf):
                    continue
                for etype, n in pdf.groupby("event_type").size().items():
                    prev = (
                        int(self._counts.getValue((etype,))[0])
                        if self._counts.containsKey((etype,))
                        else 0
                    )
                    self._counts.updateValue((etype,), (prev + int(n),))
            profile = sorted(
                (k[0], int(v[0])) for k, v in self._counts.iterator()
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_types": [len(profile)],
                    "n_events": [sum(n for _, n in profile)],
                    "profile": [
                        ",".join(f"{t}:{n}" for t, n in profile)
                    ],
                }
            )

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeProfile(),
        outputStructType=(
            "user_id long, n_types long, n_events long, profile string"
        ),
        outputMode="update",
        timeMode="None",
    )


def stream_stream_join(
    purchases: DataFrame,
    signups: DataFrame,
    window: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: purchases matched to same-user signups in the
    preceding ``window``. Both sides carry watermarks and the join
    condition is time-bounded — REQUIRED for streaming: they let the engine
    expire buffered rows, keeping state O(window), not O(stream).

    ``how="left_outer"`` additionally emits unmatched purchases with NULL
    signup columns — but only once the watermark has passed the point
    where a matching signup could still arrive (the engine cannot know a
    purchase is unmatched earlier), so outer results trail the inner ones
    by up to watermark + window. Same state bound; the outer form is how
    an attribution pipeline finds organic (signup-less) purchases without
    a second batch pass."""
    p = purchases.withWatermark("ts", watermark).alias("p")
    s = signups.withWatermark("ts", watermark).alias("s")
    return p.join(
        s,
        (F.col("p.user_id") == F.col("s.user_id"))
        & (F.col("s.ts") <= F.col("p.ts"))
        & (F.col("s.ts") > F.col("p.ts") - F.expr(f"INTERVAL {window}")),
        how,
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("s.event_id").alias("signup_id"),
        F.col("s.ts").alias("signup_ts"),
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static join: every streaming event enriched with its static
    dimension row — the lookup-enrichment stage of any ingest pipeline
    (events x user profile, trades x instrument master).

    No watermark is needed: the static side is bounded, and Spark re-reads
    it per micro-batch, so slowly-updated dimension tables are picked up
    without restarting the query.  ``broadcast`` keeps the stream side
    shuffle-free — each micro-batch is a map-side hash join, which is the
    only shape that holds up when the stream side is unbounded.  The batch
    twin ``q_stream_enrich`` pins the join semantics against the oracle.
    """
    bdim = F.broadcast(dim)
    # drop by column reference: dropping by NAME would remove the stream's
    # key too whenever stream_key == dim_key
    return stream.join(bdim, stream[stream_key] == bdim[dim_key]).drop(
        bdim[dim_key]
    )


# ---------------------------------------------------------------------------
# Batch twins — driver-checkable against the DuckDB oracle
# ---------------------------------------------------------------------------

@register(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, ROUND(value, 4) AS value
    FROM (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user_id, event_type) — the deterministic batch
    twin of ``streaming_dedup`` (streaming keeps the first arrival; batch
    defines "first" by event time with an event_id tiebreaker).

    Scale: one shuffle on the dedup key; WindowGroupLimit prunes to one row
    per key per partition before the exchange.
    """
    events = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "event_id", F.round("value", 4).alias("value")
        )
    )


@register(
    "q_stream_late_drop",
    oracle="""
    WITH marked AS (
      SELECT ts, user_id, value,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS max_ts_so_far
      FROM events
    )
    SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
    FROM marked
    WHERE ts >= max_ts_so_far - INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics as a batch query: drop events more than 1 hour
    behind the running max event time (arrival order = event_id order),
    then window-count the survivors — exactly what
    ``watermarked_tumbling_counts`` computes incrementally.

    Scale note: the unpartitioned arrival-order window funnels the batch
    through one partition — acceptable ONLY because this query exists to
    pin the watermark's semantics for the oracle. The production form IS
    the streaming one, where the watermark is O(1) engine state and never
    a window function."""
    events = tables.load(spark, sf_dir, "events")
    w = W.orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    survivors = events.withColumn("max_ts_so_far", F.max("ts").over(w)).filter(
        F.col("ts") >= F.col("max_ts_so_far") - F.expr("INTERVAL 1 HOUR")
    )
    return (
        survivors.groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "q_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           p.ts       AS purchase_ts,
           s.event_id AS signup_id,
           s.ts       AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id
     AND s.ts <= p.ts
     AND s.ts >  p.ts - INTERVAL 1 HOUR
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`stream_stream_join` — identical join condition
    over the full events table (batch needs no watermark: the interval
    bound alone keeps the equi-join's residual filter cheap; the shuffle
    key is user_id either way)."""
    ev = tables.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup")
    p, s = purchases.alias("p"), signups.alias("s")
    return p.join(
        s,
        (F.col("p.user_id") == F.col("s.user_id"))
        & (F.col("s.ts") <= F.col("p.ts"))
        & (F.col("s.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("s.event_id").alias("signup_id"),
        F.col("s.ts").alias("signup_ts"),
    )


@register(
    "q_stream_running_max",
    oracle="""
    SELECT user_id,
           COUNT(*)             AS n_events,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of ``stateful_running_max`` after the whole stream: the
    batch equivalence that pins the custom stateful operator's semantics
    (the streaming test asserts its last update per key equals this)."""
    events = tables.load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


@register(
    "q_stream_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of ``stateful_user_totals`` after the whole stream — the
    batch equivalence pinning the transformWithState operator's semantics
    (the streaming test asserts its last update per key equals this)."""
    events = tables.load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "q_stream_session",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id
                           ORDER BY ts NULLS FIRST, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 + SUM(CASE WHEN epoch_us(ts) - epoch_us(prev_ts)
                                  > {_SESSION_GAP_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions
    FROM ordered GROUP BY user_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`stateful_sessionize`: per-user session count
    under the same event-time gap rule ({_SESSION_GAP_US} us), expressed
    as a lag-window gap scan — final streaming state per key must equal
    this (the streaming test asserts it), and the oracle pins the gap
    semantics cross-engine, NULL-ts ordering included (NULLS FIRST
    matches Spark's ascending default; a NULL gap is not a break on
    either engine).

    Scale: one shuffle on user_id serves the window and the aggregate
    (same key, no second exchange); the lag scan is per-key sequential
    with per-key parallelism — the module's standard ordered-op shape.
    """
    events = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_first(), "event_id"
    )
    prev = F.lag("ts").over(w)
    # ts is TIMESTAMP_NTZ in the fixtures; the UTC-session cast is
    # value-preserving and unix_micros matches DuckDB's epoch_us
    # (timeseries module convention)
    brk = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(prev.cast("timestamp"))
        > F.lit(_SESSION_GAP_US)
    )
    return (
        events.select(
            "user_id",
            F.when(brk, 1).otherwise(0).alias("brk"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.lit(1) + F.sum("brk")).cast("long").alias("n_sessions"),
        )
    )


#: Recent-window size shared by stateful_recent_values and its twin.
_RECENT_K = 3


@register(
    "q_stream_recent",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC NULLS FIRST,
                                         event_id DESC) AS rdesc
      FROM events WHERE value IS NOT NULL
    ), recent AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_recent,
             CAST(SUM(cents) AS BIGINT) AS recent_cents
      FROM ranked WHERE rdesc <= {_RECENT_K} GROUP BY user_id
    ), seen AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_seen
      FROM events GROUP BY user_id
    )
    SELECT seen.user_id, n_seen,
           COALESCE(n_recent, 0) AS n_recent,
           FLOOR(CAST(recent_cents AS DOUBLE) * 100
                 / NULLIF(CAST(n_recent AS BIGINT), 0) + 0.5) / 10000
             AS recent_mean
    FROM seen LEFT JOIN recent USING (user_id)
    """,
)
def q_stream_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`stateful_recent_values`: per-user mean of the
    {_RECENT_K} NEWEST non-null values under the streaming op's exact
    ordering rule — ascending (ts, event_id) with NULL ts LAST (pandas
    ``na_position='last'``, i.e. NULL-ts values count as newest), keep
    the list tail, count every row in n_seen. Selecting the newest k is
    expressed as ROW_NUMBER over the REVERSED order (desc, NULLS FIRST)
    — same rows, keyed window, no sort of the whole history per row.

    Determinism: values are cent-quantized (exact 2dp in the fixtures,
    lossless) so the recent sum is an exact long, and the mean is one
    floor-scale division of exact integers — the registry's tie-safe
    display form. The streaming op's float mean equals
    recent_cents/(100·n_recent) on exact-representable inputs, which the
    live ListState test uses.

    Scale: one shuffle on user_id serves the window and both aggregates
    (same key); per-key state in the streaming form is O(k), and this
    twin's window is keyed — never a global sort.
    """
    events = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_first(), F.col("event_id").desc()
    )
    ranked = events.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias(
            "cents"
        ),
        F.row_number().over(w).alias("rdesc"),
    )
    recent = (
        ranked.filter(F.col("rdesc") <= _RECENT_K)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_recent"),
            F.sum("cents").cast("long").alias("recent_cents"),
        )
    )
    seen = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_seen")
    )
    return seen.join(recent, "user_id", "left").select(
        "user_id",
        "n_seen",
        F.coalesce(F.col("n_recent"), F.lit(0).cast("long")).alias(
            "n_recent"
        ),
        (
            F.floor(
                F.col("recent_cents").cast("double")
                * 100
                / F.nullif(F.col("n_recent").cast("long"), F.lit(0))
                + F.lit(0.5)
            )
            / 10000
        ).alias("recent_mean"),
    )


@register(
    "q_stream_profile",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(n) AS BIGINT) AS n_events,
           string_agg(event_type || ':' || n, ',' ORDER BY event_type)
             AS profile
    FROM per_type GROUP BY user_id
    """,
)
def q_stream_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`stateful_type_profile`: the per-user
    (event_type -> count) map over the whole stream, serialized exactly
    as the streaming op emits it — "type:n" entries joined by commas in
    ascending type order — so the final MapState per key must equal this
    row (the live test asserts the same serialization).

    Scale: one shuffle for the (user, type) count (map-side combined),
    one for the per-user fold; the collect_list is bounded by the
    event-type vocabulary, the same O(#types) bound as the MapState.
    """
    events = tables.load(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    return per_type.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("n").cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_type", "n"))
                ),
                lambda x: F.concat(
                    x["event_type"], F.lit(":"), x["n"].cast("string")
                ),
            ),
            ",",
        ).alias("profile"),
    )


@register(
    "q_stream_enrich",
    oracle="""
    SELECT event_id, user_id, c_mktsegment AS segment,
           ROUND(value, 4) AS value
    FROM events JOIN customer ON user_id = c_custkey
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`stream_static_enrich` — identical join condition
    and projection over the events fixture joined to the customer dimension,
    so the oracle pins exactly what each micro-batch computes."""
    events = tables.load(spark, sf_dir, "events")
    dim = tables.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return stream_static_enrich(events, dim).select(
        "event_id",
        "user_id",
        F.col("c_mktsegment").alias("segment"),
        F.round("value", 4).alias("value"),
    )


@register(
    "q_stream_anomaly",
    oracle="""
    WITH ordered AS (
      SELECT user_id, value,
             COUNT(*)          OVER w AS n_prior,
             AVG(value)        OVER w AS mean_prior,
             STDDEV_SAMP(value) OVER w AS std_prior
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), flags AS (
      SELECT user_id, value,
             CASE WHEN n_prior >= 5 AND COALESCE(std_prior, 0) > 0
                       AND ROUND(ABS(value - mean_prior)
                                 / NULLIF(std_prior, 0), 4) > 3.0
                  THEN 1 ELSE 0 END AS is_anom
      FROM ordered
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)     AS n_events,
           CAST(SUM(is_anom) AS BIGINT) AS n_anomalies,
           ROUND(AVG(value), 4)         AS mean_value,
           ROUND(STDDEV_SAMP(value), 4) AS std_value
    FROM flags
    GROUP BY user_id
    """,
)
def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`stateful_zscore`: each event scored against the
    cumulative mean / sample std of its user's PRIOR events (ordered by
    ts, event_id — the arrival order the streaming form consumes), flagged
    at |z| > 3 once 5 prior events exist, aggregated to per-user totals
    plus final running statistics.

    The prior-window framing matters: scoring against stats that include
    the current value dilutes every spike by its own weight — the Welford
    operator naturally scores-then-folds, and the ROWS ... 1 PRECEDING
    frame is its exact batch transcription.  Scale: one shuffle on
    user_id serving both the cumulative windows and the final aggregate
    (same key, AQE reuses the exchange); z is rounded before the
    threshold compare on both sides so last-ulp cumulative-moment drift
    can't flip a flag."""
    events = tables.load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    n_prior = F.count("*").over(w)
    mean_prior = F.avg("value").over(w)
    std_prior = F.stddev_samp("value").over(w)
    z = F.round(
        F.abs(F.col("value") - mean_prior) / F.nullif(std_prior, F.lit(0.0)), 4
    )
    is_anom = F.when(
        (n_prior >= 5) & (F.coalesce(std_prior, F.lit(0.0)) > 0) & (z > 3.0),
        1,
    ).otherwise(0)
    return (
        events.select("user_id", "value", is_anom.alias("is_anom"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_anom").cast("long").alias("n_anomalies"),
            F.round(F.avg("value"), 4).alias("mean_value"),
            F.round(F.stddev_samp("value"), 4).alias("std_value"),
        )
    )


@register(
    "q_stream_join_outer",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           p.ts       AS purchase_ts,
           s.event_id AS signup_id,
           s.ts       AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id
     AND s.ts <= p.ts
     AND s.ts >  p.ts - INTERVAL 1 HOUR
    """,
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`stream_stream_join` with ``how="left_outer"``:
    every purchase, joined to in-window signups where they exist, NULL
    signup columns where they don't — in batch the unmatched rows appear
    immediately (no watermark gate to wait out), which is exactly why the
    twin pins the join's row-set semantics while the streaming test pins
    the delayed-emission behavior."""
    ev = tables.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup")
    p, s = purchases.alias("p"), signups.alias("s")
    return p.join(
        s,
        (F.col("p.user_id") == F.col("s.user_id"))
        & (F.col("s.ts") <= F.col("p.ts"))
        & (F.col("s.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("s.event_id").alias("signup_id"),
        F.col("s.ts").alias("signup_ts"),
    )


def stateful_ewma(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Streaming EWMA via ``applyInPandasWithState``: the O(1)
    ValueState form of the recursion y_0 = x_0, y = (1-a)y + a*x that
    the batch twin ``q_ts_ewma`` reconstructs with a cumulative-window
    closed form. This is the operator's PRODUCTION shape at unbounded
    per-key history: the batch closed form's scaling factor (1-a)^(-i)
    overflows past ~10^3 events per key, while the stream carries one
    double per key forever — the same batch-recomputes-what-the-stream-
    carries trade as stateful_zscore.

    Rows are processed in (ts, event_id) order within each batch so a
    re-partitioned microbatch cannot reorder the recursion; state is
    (n, y) — two fields per key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, n_events long, ewma double"
    state_schema = "n long, y double"

    def update(key, pdfs, state: GroupState):
        n, y = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].astype(float):
                y = v if n == 0 else (1 - alpha) * y + alpha * v
                n += 1
        state.update((n, y))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma": [round(y, 4) if n else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
