"""Window functions: ranking, analytic (lag/lead), frames, time windows.

Determinism rules (so the oracle hash matches): every ``ROW_NUMBER``/
``NTILE`` ordering is a total order (unique tiebreaker column appended);
``RANK``/``DENSE_RANK`` may see ties because their outputs are
tie-invariant; RANGE frames are tie-invariant by definition.

Scale: a window partitioned by a key shuffles once on that key; the frame
evaluation is then a local sort + scan. Time-window aggregations
(`window()` / `session_window()`) are ordinary hash aggregates — the same
code runs under Structured Streaming with a watermark (see
``ws_to_kafka_spark.streaming``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .. import tables
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


@register(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           RANK()       OVER (PARTITION BY o_orderstatus ORDER BY CAST(o_orderdate AS DATE)) AS date_rank,
           DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY CAST(o_orderdate AS DATE)) AS date_dense_rank,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS price_rn,
           NTILE(4)     OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS price_quartile
    FROM orders
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions: rank / dense_rank (tie-safe ordering),
    row_number / ntile (total ordering)."""
    orders = _t(spark, sf_dir, "orders")
    by_date = W.partitionBy("o_orderstatus").orderBy(F.col("o_orderdate").cast("date"))
    by_price_desc = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    by_price_asc = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    # long casts: DuckDB's ranking functions all return BIGINT
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(by_date).cast("long").alias("date_rank"),
        F.dense_rank().over(by_date).cast("long").alias("date_dense_rank"),
        F.row_number().over(by_price_desc).cast("long").alias("price_rn"),
        F.ntile(4).over(by_price_asc).cast("long").alias("price_quartile"),
    )


@register(
    "q_win_lag",
    oracle="""
    SELECT event_id,
           user_id,
           ROUND(LAG(value)  OVER w, 4)                        AS prev_value,
           ROUND(LEAD(value) OVER w, 4)                        AS next_value,
           ROUND(FIRST_VALUE(value) OVER w, 4)                 AS first_val,
           ROUND(LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS last_val,
           CAST(date_diff('second', LAG(ts) OVER w, ts) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions lag/lead/first/last over per-user event streams."""
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        F.round(F.first("value").over(w), 4).alias("first_val"),
        F.round(F.last("value").over(w_full), 4).alias("last_val"),
        (F.unix_timestamp(F.col("ts").cast("timestamp"))
         - F.unix_timestamp(prev_ts.cast("timestamp"))).alias("secs_since_prev"),
    )


@register(
    "q_win_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           ROUND(AVG(l_extendedprice) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS sliding_avg_price,
           COUNT(*) OVER (PARTITION BY l_suppkey
                 ORDER BY l_orderkey
                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)          AS n_near_orders
    FROM lineitem
    """,
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: running sum (ROWS unbounded), sliding 3-row average,
    and a numeric RANGE frame (tie-invariant)."""
    li = _t(spark, sf_dir, "lineitem")
    order_cols = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = W.partitionBy("l_suppkey").orderBy(*order_cols)
    w_range = (
        W.partitionBy("l_suppkey").orderBy("l_orderkey").rangeBetween(-100, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_quantity").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_qty"),
        F.round(
            F.avg("l_extendedprice").over(w.rowsBetween(-2, 0)), 4
        ).alias("sliding_avg_price"),
        F.count("*").over(w_range).alias("n_near_orders"),
    )


@register(
    "q_win_tumble",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*)               AS n_events,
           ROUND(SUM(value), 2)   AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_win_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming
    windowed aggregation — identical code runs under readStream+watermark)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_win_slide",
    oracle="""
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM (
      SELECT date_trunc('hour', ts) AS window_start, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, value FROM events
    )
    GROUP BY window_start
    """,
)
def q_win_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): each event lands in 2 windows.
    The oracle expands the assignment explicitly."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_win_session",
    oracle="""
    WITH gapped AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gapped
    )
    SELECT user_id,
           MIN(ts)              AS session_start,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) via ``session_window`` — the same
    operator Structured Streaming uses for streaming sessionization. The
    oracle derives sessions with the classic lag/gap/cumsum recipe; Spark's
    session windows are half-open ``[start, last+gap)``, so an event exactly
    `gap` later starts a NEW session — hence ``>=`` in the oracle's gap test,
    and event_id tie-breaking so assignment is total-ordered on both sides."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select("user_id", "session_start", "n_events", "session_value")
    )


@register(
    "q_win_range_interval",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER w, 4) AS rolling_1h_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS rolling_1h_n
    FROM (SELECT *, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: each event's trailing-1-hour sum/count
    within its user's stream — the true event-time rolling window (ROWS
    frames count rows; RANGE frames measure elapsed time, which is what
    'last hour' means under irregular event spacing).

    Both engines order by FLOORED epoch seconds, so frame membership is
    identical (sub-second events in the same second are RANGE peers and
    aggregate together on both).  Scale: one shuffle + sort on
    (user_id, sec); the running frame is computed in a single pass with
    O(1) state per row."""
    events = tables.load(spark, sf_dir, "events")
    secs = events.withColumn("sec", F.unix_timestamp("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, W.currentRow)
    )
    return secs.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("rolling_1h_sum"),
        F.count("*").over(w).cast("long").alias("rolling_1h_n"),
    )


@register(
    "q_win_locf",
    oracle="""
    SELECT event_id, user_id,
           ROUND(v, 4) AS v_raw,
           ROUND(LAST_VALUE(v IGNORE NULLS) OVER w, 4) AS v_filled,
           (v IS NULL) AS was_gap
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by last-observation-carried-forward: sensor/metric
    streams interpolate missing readings from the latest prior
    observation — ``last(..., ignorenulls)`` over a running ROWS frame
    (gaps derived deterministically: 'error' events carry no reading).

    Leading gaps (no prior observation) stay NULL on both engines.
    Scale: one shuffle + sort on (user_id, ts); the running frame keeps
    O(1) state — this is the form that backfills a 100 TB metrics table
    in one pass."""
    events = tables.load(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(v, 4).alias("v_raw"),
        F.round(F.last(v, ignorenulls=True).over(w), 4).alias("v_filled"),
        v.isNull().alias("was_gap"),
    )


@register(
    "q_win_nth",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_cheapest_key,
           FIRST_VALUE(o_orderkey) OVER w  AS cheapest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nth_value`` / whole-partition ``first_value``: every row sees its
    group's cheapest and second-cheapest order keys — the window analytic
    the lag/lead family can't express (absolute position, not relative
    offset). Total order (price, key) so the nth row is deterministic;
    the UNBOUNDED frame is required — the default RANGE frame would make
    nth_value relative to the current row's peers on both engines.

    Scale: one shuffle + sort on the partition key; the whole-partition
    frame evaluates with two saved values per partition, not a buffer."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest_key"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
    )


@register(
    "q_win_sliding_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER w AS BIGINT)
             AS distinct_types_1h
    FROM (SELECT *, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding distinct cardinality: how many DISTINCT event types each
    user produced in the trailing hour of every event — the diversity/
    breadth signal (distinct pages, distinct endpoints, distinct SKUs)
    that plain rolling counts miss. Frame membership matches
    q_win_range_interval (floored epoch seconds, RANGE peers).

    Spark's window functions cannot evaluate COUNT(DISTINCT) over a
    frame, so the query composes it: ``collect_list`` over the RANGE
    frame -> ``array_distinct`` -> ``size`` — exact, single pass, same
    one shuffle + sort as any frame, but O(window) memory per row while
    the frame's values are gathered. That is fine for bounded windows
    (an hour of one user's events); for wide windows or hot keys the
    scale form trades exactness for mergeability: pre-bucket to minutes
    and merge HLL sketches across the frame (the q_agg_sketch_merge
    pattern), which drops per-row state to a constant-size sketch.
    DuckDB evaluates the same semantics natively (COUNT(DISTINCT) OVER),
    giving an independent implementation to agree with.
    """
    events = tables.load(spark, sf_dir, "events")
    secs = events.withColumn("sec", F.unix_timestamp("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, W.currentRow)
    )
    return secs.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("long")
        .alias("distinct_types_1h"),
    )


@register(
    "q_win_pct_change",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(value) AS total
      FROM events
      WHERE ts IS NOT NULL
      GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day,
           ROUND(total, 4) AS total,
           ROUND(100.0 * (total - LAG(total) OVER w)
                 / NULLIF(LAG(total) OVER w, 0), 4) AS pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def q_win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: day-over-day percent change of each
    series' daily total — the rollup-then-compare composite behind every
    trend dashboard (first period NULL by definition; a zero prior
    period nullif-guards to NULL rather than an ANSI divide error).

    Scale: the window runs over the DAILY frame (types × days rows), not
    raw events — the q_rollup_multires layering rule: aggregate first,
    window over the tiny result. The lag key (event_type, day) is unique
    by construction so no tiebreak is needed; daily sums accumulate in
    engine-specific order; both the totals and the ratio of two such
    sums carry only last-ulp drift, absorbed by the 4dp output rounds.
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("total"))
    w = W.partitionBy("event_type").orderBy("day")
    prev = F.lag("total").over(w)
    return daily.select(
        "event_type",
        "day",
        F.round("total", 4).alias("total"),
        F.round(
            100.0 * (F.col("total") - prev) / F.nullif(prev, F.lit(0.0)), 4
        ).alias("pct_change"),
    )


@register(
    "q_win_rolling_median",
    oracle="""
    SELECT event_id, event_type, ts,
           list_sort(vals)[(len(vals) + 1) // 2] AS rolling_median,
           CAST(len(vals) AS INTEGER) AS frame_n
    FROM (
      SELECT event_id, event_type, ts,
             array_agg(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
             ) AS vals
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    )
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-row median per series — the robust smoother that
    outlier-heavy telemetry needs where a rolling MEAN chases spikes.

    Median by ELEMENT SELECTION, not interpolation: the frame's values
    sort and the lower-median element ((k+1)/2-th) is returned
    verbatim — the winsorize lesson applied up front, since
    interpolated medians ((1-f)*lo+f*hi vs lo+f*(hi-lo)) diverge by an
    ulp between engines while a selected element is the same stored
    double on both. The (ts, event_id) tiebreak pins frame membership
    on duplicate timestamps.

    Scale: one shuffle on event_type + local sort serves the window;
    the frame state is O(5) per row. Wide frames switch to the
    two-heap / skip-list streaming median inside
    applyInPandasWithState (the q_stream_anomaly shape) — but for
    fixed small frames the collect-sort-select expression stays fully
    JVM-side and codegen'd.
    """
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    vals = F.collect_list("value").over(w)
    return (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            "ts",
            F.element_at(
                F.array_sort(vals),
                ((F.size(vals) + 1) / 2).cast("int"),
            ).alias("rolling_median"),
            F.size(vals).alias("frame_n"),
        )
    )
