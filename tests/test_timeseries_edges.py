"""Edge-case pins for the time-series operators, on CONSTRUCTED events
data the driver fixtures never contain:

* a masked gap bracketed by two observations at the SAME timestamp
  (zero interpolation span — ANSI mode would throw DIVIDE_BY_ZERO
  without the guard; semantics must degrade to LOCF on both engines);
* a NULL ``ts`` row (must land in exactly one side of the incremental
  rollup split, preserving rollup(T ∪ Δ) = merge identity).

Each test runs the registered Spark query AND its registered DuckDB
oracle over the same parquet directory — a miniature of the
tools/verify_queries.py harness pointed at adversarial data.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest


def _ts(s: str | None):
    return datetime.fromisoformat(s) if s else None

from ws_to_kafka_spark.operators import QUERIES

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory) -> str:
    """Events with a same-timestamp bracket around a gap, a NULL ts, and
    rows on both sides of the incremental-rollup cutoff."""
    rows = [
        # user 1: obs(10:00)=2.0, gap(10:00), obs(10:00)=4.0  -> zero span
        (1, _ts("2024-01-10 10:00:00"), 1, "view", 2.0, "{}"),
        (2, _ts("2024-01-10 10:00:00"), 1, "error", 99.0, "{}"),
        (3, _ts("2024-01-10 10:00:00"), 1, "view", 4.0, "{}"),
        # user 2: a normal interpolatable gap halfway between observations
        (4, _ts("2024-01-10 10:00:00"), 2, "view", 1.0, "{}"),
        (5, _ts("2024-01-10 10:30:00"), 2, "error", 99.0, "{}"),
        (6, _ts("2024-01-10 11:00:00"), 2, "view", 3.0, "{}"),
        # NULL ts row + rows straddling the 2024-01-15 cutoff
        (7, None, 3, "view", 5.0, "{}"),
        (8, _ts("2024-01-14 23:00:00"), 3, "view", 6.0, "{}"),
        (9, _ts("2024-01-16 01:00:00"), 3, "view", 7.0, "{}"),
    ]
    dst = str(tmp_path_factory.mktemp("sf_edge"))
    spark.createDataFrame(rows, schema=_EVENTS_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/events.parquet"
    )
    return dst


def _oracle(sf_dir: str, name: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, ts, user_id, event_type, "
        f"value, props FROM read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    return con.execute(QUERIES[name].oracle).fetchall()


def test_interpolate_zero_span_degrades_to_locf(spark, edge_sf_dir):
    got = {
        r.event_id: (r.was_gap, r.v_interp)
        for r in QUERIES["q_ts_interpolate"].fn(spark, edge_sf_dir).collect()
    }
    # zero-span gap: LOCF from the same-timestamp predecessor, no crash
    assert got[2] == (True, 2.0)
    # normal gap: halfway between 1.0 and 3.0
    assert got[5] == (True, 2.0)
    # oracle agrees row-for-row
    want = {r[0]: (r[2], r[3]) for r in _oracle(edge_sf_dir, "q_ts_interpolate")}
    assert got == want


def test_incremental_rollup_keeps_null_ts_bucket(spark, edge_sf_dir):
    df = QUERIES["q_rollup_incremental"].fn(spark, edge_sf_dir)
    got = sorted(
        ((r.event_type, r.bucket_start, r.n_events, r.value_sum) for r in df.collect()),
        key=str,
    )
    # the NULL-ts row must survive the stored/delta split as its own bucket
    assert any(b is None and n == 1 for (_, b, n, _) in got)
    want = sorted(_oracle(edge_sf_dir, "q_rollup_incremental"), key=str)
    assert [tuple(r) for r in want] == [tuple(r) for r in got]


def test_acf_constant_series_and_dup_ts(spark, edge_sf_dir):
    """A constant-value series has stddev 0 at every lag: the ACF divide
    must degrade to NULL (not DIVIDE_BY_ZERO) on both engines, and
    duplicate timestamps must not reorder pairs (event_id tiebreak)."""
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.acf)
        for r in QUERIES["q_ts_acf"].fn(spark, edge_sf_dir).collect()
    }
    # 'error' appears twice with the same value 99.0 -> lag-1 pair exists
    # but is constant: acf must be NULL, not a crash.
    assert got[("error", 1)] == (1, None)
    want = {(r[0], r[1]): (r[2], r[3]) for r in _oracle(edge_sf_dir, "q_ts_acf")}
    assert got == want


def test_seq_transitions_dup_ts_tiebreak_and_null_ts(spark, edge_sf_dir):
    """Three same-timestamp rows (user 1) force the (ts, event_id)
    tiebreak to define the step order — without it the LAG order is
    engine-arbitrary; the NULL-ts row must contribute no transition."""
    got = {
        (r.prev_type, r.next_type): (r.cnt, r.prob)
        for r in QUERIES["q_seq_transitions"].fn(spark, edge_sf_dir).collect()
    }
    # user 1 @10:00: view(1) -> error(2) -> view(3) by event_id;
    # user 2: view -> error -> view; user 3: NULL-ts row dropped,
    # then view(8) -> view(9).
    assert got[("view", "error")] == (2, 1.0) or got[("view", "error")][0] == 2
    assert got[("view", "view")][0] == 1
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in _oracle(edge_sf_dir, "q_seq_transitions")
    }
    assert got == want


def test_rolling_median_dup_ts_frame_membership(spark, edge_sf_dir):
    """Three same-timestamp 'view' rows plus user-2 rows interleave into
    one event_type series: frame membership under ROWS BETWEEN depends
    entirely on the (ts, event_id) tiebreak on the duplicated
    timestamps — both engines must agree row for row."""
    got = sorted(
        (r.event_id, r.frame_n, r.rolling_median)
        for r in QUERIES["q_win_rolling_median"].fn(spark, edge_sf_dir).collect()
    )
    want = sorted(
        (r[0], r[4], r[3])
        for r in _oracle(edge_sf_dir, "q_win_rolling_median")
    )
    assert got == want


def test_holt_dup_ts_tiebreak_and_null_value(spark, edge_sf_dir):
    """q_ts_holt on the adversarial corpus: user 1 has three rows at the
    SAME timestamp — the recursion order must fall back to the event_id
    tiebreak identically on both engines (a different order changes every
    downstream level/trend value, so agreement proves the tiebreak) —
    and NULL values are excluded before the recursion. Also pins the
    initialization: first row has level == value, trend == 0."""
    got = sorted(
        (r.event_id, r.user_id, r.value, r.level, r.trend, r.forecast)
        for r in QUERIES["q_ts_holt"].fn(spark, edge_sf_dir).collect()
    )
    want = sorted(_oracle(edge_sf_dir, "q_ts_holt"))
    assert got == want
    by_id = {t[0]: t for t in got}
    # user 1, dup-ts run ordered by event_id: x = 2.0, 99.0, 4.0
    assert by_id[1][3] == 2.0 and by_id[1][4] == 0.0        # init
    assert by_id[2][3] == 50.5 and by_id[2][4] == 24.25     # l=.5*99+.5*2
    # user 3's NULL-ts row sorts deterministically too (pandas NaT/None
    # placement is pinned by the oracle agreement above)
    assert len(got) == 9


def test_stl_empty_interior_and_column_order(spark, edge_sf_dir):
    """q_ts_stl on the 9-row edge corpus: no series has the 25 rows a
    full centered window needs, so the interior frame is EMPTY — the
    query must return zero rows (not throw on the empty groupBy /
    broadcast join), and the oracle must agree."""
    got = QUERIES["q_ts_stl"].fn(spark, edge_sf_dir).collect()
    want = _oracle(edge_sf_dir, "q_ts_stl")
    assert got == [] and want == []


def test_trend_mk_exact_tie_days_and_single_day(spark, edge_sf_dir):
    """q_ts_trend_mk on the edge corpus: 'view' has two days whose daily
    means differ and one pair order; 'error' has two days with DIFFERENT
    means built from single events; the cross-multiplied sign must match
    the oracle exactly, and a series with ONE day (no pairs) must drop
    out of the output rather than divide by zero."""
    got = sorted(
        (r.event_type, r.s_stat, r.n_pairs, r.tau, r.trend)
        for r in QUERIES["q_ts_trend_mk"].fn(spark, edge_sf_dir).collect()
    )
    want = sorted(_oracle(edge_sf_dir, "q_ts_trend_mk"))
    assert got == want
    by_type = {t[0]: t for t in got}
    # 'view': day1 mean (2+4+1+3+5? depends on NULL-ts exclusion) vs later
    # days — whatever the value, s_stat must be an integer within +-n_pairs
    for t, s, n, tau, trend in got:
        assert abs(s) <= n
        assert trend in ("increasing", "decreasing", "flat")


def test_m4_duplicate_timestamps_and_null_bucket(spark, edge_sf_dir):
    """q_ts_m4 on the edge corpus: three same-timestamp rows force the
    first/last selection through the event_id tiebreak, and the NULL-ts
    row must form a NULL bucket identically on both engines."""
    df = QUERIES["q_ts_m4"].fn(spark, edge_sf_dir)
    got = sorted(
        (tuple(r) for r in df.select(sorted(df.columns)).collect()), key=str
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, ts, user_id, event_type, "
        f"value, props FROM read_parquet('{edge_sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(QUERIES["q_ts_m4"].oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = sorted(
        (tuple(r[i] for i in order) for r in cur.fetchall()), key=str
    )
    assert got == want
    # hand pin for the duplicate-timestamp bucket (hour 10:00): five rows,
    # first = event 1 (tiebreak among three 10:00 rows), last = 10:30 row
    by_bucket = {r["bucket"]: r for r in df.collect()}
    b10 = by_bucket[_ts("2024-01-10 10:00:00")]
    assert (b10.n_points, b10.v_min, b10.v_max) == (5, 1.0, 99.0)
    assert (b10.v_first, b10.v_last) == (2.0, 99.0)
    assert by_bucket[None].n_points == 1  # the NULL-ts row


def test_hampel_dup_ts_and_null_ts_rows(spark, edge_sf_dir):
    """Hampel on the edge corpus: duplicate-timestamp frames must pin
    membership through the event_id tiebreak on both engines, the
    NULL-ts row is excluded by the shared filter, and tiny end frames
    (< 5 rows) use the available window identically. The error spike
    (99.0 amid small views... different event_type) must NOT leak across
    series: each event_type is its own partition."""
    df = QUERIES["q_ts_hampel"].fn(spark, edge_sf_dir)
    got = sorted(
        (tuple(r) for r in df.select(sorted(df.columns)).collect()), key=str
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, ts, user_id, event_type, "
        f"value, props FROM read_parquet('{edge_sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(QUERIES["q_ts_hampel"].oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = sorted(
        (tuple(r[i] for i in order) for r in cur.fetchall()), key=str
    )
    assert got == want
    rows = {r.event_id: r for r in df.collect()}
    assert 7 not in rows  # NULL ts excluded
    # 'view' series values are 2,4,1,3,5,6,7 — no outliers among them
    # (MAD-scaled deviations stay under the threshold in 5-row frames)
    assert not any(r.is_outlier for r in rows.values() if r.event_type == "view")
    # repaired == value wherever not flagged
    assert all(
        r.repaired == r.value for r in rows.values() if not r.is_outlier
    )


def test_crosscorr_hour_bucket_edges(spark, edge_sf_dir):
    """Cross-correlation on the edge corpus: the NULL-ts row must drop
    from the hourly frame on BOTH engines (date_trunc(NULL) bucket is
    excluded by the grouped-join shape producing no NULL-hour pair), and
    with no 'click' events at all the pair frame may be empty — both
    engines must return the same (possibly empty) lag rows rather than
    diverge on NULL CDFs."""
    df = QUERIES["q_ts_crosscorr"].fn(spark, edge_sf_dir)
    got = sorted(
        (tuple(r) for r in df.select(sorted(df.columns)).collect()), key=str
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, ts, user_id, event_type, "
        f"value, props FROM read_parquet('{edge_sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(QUERIES["q_ts_crosscorr"].oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = sorted(
        (tuple(r[i] for i in order) for r in cur.fetchall()), key=str
    )
    assert got == want


def test_stream_recent_dup_and_null_ts_ordering(spark, edge_sf_dir):
    """q_stream_recent's newest-k rule under duplicate timestamps
    (event_id tiebreak) and a NULL ts (sorts LAST ascending = counts as
    newest, the stateful_recent_values pandas rule). Engines must agree
    row-for-row, and user 3's recent window must include the NULL-ts
    value."""
    df = QUERIES["q_stream_recent"].fn(spark, edge_sf_dir)
    got = {
        r.user_id: (r.n_seen, r.n_recent, r.recent_mean)
        for r in df.collect()
    }
    # user 3: NULL-ts value 5.0 is part of the newest-3 {5,6,7} -> 6.0
    assert got[3] == (3, 3, 6.0)
    want = {r[0]: (r[1], r[2], r[3]) for r in _oracle(edge_sf_dir, "q_stream_recent")}
    assert got == want


def test_stream_session_null_ts_and_dup_ts(spark, edge_sf_dir):
    """q_stream_session on the edge corpus: same-ts events gap 0 (one
    session), a NULL-ts row counts but never breaks (NULLS FIRST), and
    the 26 h jump for user 3 is the only break -> 2 sessions."""
    df = QUERIES["q_stream_session"].fn(spark, edge_sf_dir)
    got = {r.user_id: (r.n_events, r.n_sessions) for r in df.collect()}
    assert got == {1: (3, 1), 2: (3, 1), 3: (3, 2)}
    want = {r[0]: (r[1], r[2]) for r in _oracle(edge_sf_dir, "q_stream_session")}
    assert got == want
