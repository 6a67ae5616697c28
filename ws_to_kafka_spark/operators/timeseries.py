"""Time-series operators: hierarchical (hypertable-style) rollups and
statistical anomaly detection over the ``events`` stream table.

Continuous-aggregate engines (TimescaleDB hypertables, Druid rollup
segments) maintain coarse aggregates *from finer ones*, never from raw
rows. ``q_rollup_multires`` expresses that Spark-first: the hourly grain
is one hash aggregate over the raw scan; the daily grain re-aggregates
the (tiny) hourly frame, so raw data is read exactly once regardless of
how many grains stack on top. At 100 TB the hourly frame is ~5 rows per
type per hour — kilobytes — so every additional grain is free.

``q_anomaly_zscore`` is the classic per-key standardization. The stats
side (one row per event_type) is aggregated first and broadcast back —
NOT computed as a whole-partition window, which would shuffle the full
table into one partition per type (5 partitions at any scale = the skew
worst case). Aggregate + broadcast join keeps the big side's
partitioning untouched and the second pass is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .. import tables
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


@register(
    "q_rollup_multires",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             date_trunc('hour', ts) AS bucket_start,
             COUNT(*)               AS n_events,
             SUM(value)             AS value_sum,
             MIN(value)             AS value_min,
             MAX(value)             AS value_max
      FROM events
      GROUP BY event_type, date_trunc('hour', ts)
    ),
    daily AS (
      SELECT event_type,
             date_trunc('day', bucket_start) AS bucket_start,
             CAST(SUM(n_events) AS BIGINT)   AS n_events,
             SUM(value_sum)                  AS value_sum,
             MIN(value_min)                  AS value_min,
             MAX(value_max)                  AS value_max
      FROM hourly
      GROUP BY event_type, date_trunc('day', bucket_start)
    )
    SELECT 'hour' AS grain, event_type, bucket_start,
           n_events, ROUND(value_sum, 4) AS value_sum,
           ROUND(value_min, 4) AS value_min, ROUND(value_max, 4) AS value_max
    FROM hourly
    UNION ALL
    SELECT 'day' AS grain, event_type, bucket_start,
           n_events, ROUND(value_sum, 4) AS value_sum,
           ROUND(value_min, 4) AS value_min, ROUND(value_max, 4) AS value_max
    FROM daily
    """,
)
def q_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly aggregates from the
    raw scan, daily aggregates derived FROM the hourly frame (sum of sums,
    min of mins, max of maxes), unioned under a ``grain`` tag.

    Scale: raw events are scanned ONCE (the hourly hash-agg, map-side
    partials on (type, hour)); the daily grain re-aggregates the hourly
    result — at 100 TB that input is ~#types x #hours rows, so each coarser
    grain costs a shuffle of kilobytes. Spark keeps the hourly frame in the
    same job via plan reuse of the unioned subtree. Sums are rounded only
    at the output projection so the daily re-aggregation sees full
    precision on both engines.
    """
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_start")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", "bucket_start").alias("bucket_start")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_sum").alias("value_sum"),
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
    )

    def out(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "event_type",
            "bucket_start",
            "n_events",
            F.round("value_sum", 4).alias("value_sum"),
            F.round("value_min", 4).alias("value_min"),
            F.round("value_max", 4).alias("value_max"),
        )

    return out(hourly, "hour").unionAll(out(daily, "day"))


@register(
    "q_ts_interpolate",
    oracle="""
    WITH masked AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ),
    edges AS (
      SELECT event_id, user_id, ts, v,
             LAST_VALUE(v IGNORE NULLS) OVER back AS prev_v,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
               OVER back AS prev_ts,
             FIRST_VALUE(v IGNORE NULLS) OVER fwd AS next_v,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
               OVER fwd AS next_ts
      FROM masked
      WINDOW back AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fwd  AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           (v IS NULL) AS was_gap,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                  AND epoch_us(next_ts) != epoch_us(prev_ts) THEN
               prev_v + (next_v - prev_v)
                 * (epoch_us(ts) - epoch_us(prev_ts))
                 / (epoch_us(next_ts) - epoch_us(prev_ts))
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v
           END, 4) AS v_interp
    FROM edges
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps: missing readings
    ('error' events carry no value, as in ``q_win_locf``) are filled by
    time-weighted interpolation between the nearest prior and next
    observation; boundary gaps fall back to LOCF (tail) / backfill (head).

    Scale: ONE shuffle + local sort on (user_id, ts) serves both the
    backward and forward frames — Spark evaluates the two running frames
    over the same sorted partition with O(1) state each, exactly like
    ``q_win_locf`` but with the forward pass added. No self-join against
    the observation subset (the naive formulation), which would be a
    second shuffle plus a range probe. Interpolation weights use
    microsecond epochs on both engines; identical double-divide ordering,
    rounded to 4 dp at the output so last-ulp drift cannot split the hash.
    """
    events = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    # ts is TIMESTAMP_NTZ; the session TZ is UTC so the cast to TIMESTAMP
    # is value-preserving and unix_micros matches DuckDB's epoch_us.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    masked = events.select(
        "event_id", "user_id", "ts", v.alias("v"), us.alias("us")
    )
    back = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_us = F.when(F.col("v").isNotNull(), F.col("us"))
    edges = masked.select(
        "event_id",
        "user_id",
        "v",
        "us",
        F.last("v", ignorenulls=True).over(back).alias("prev_v"),
        F.last(obs_us, ignorenulls=True).over(back).alias("prev_us"),
        F.first("v", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(obs_us, ignorenulls=True).over(fwd).alias("next_us"),
    )
    # A gap bracketed by two observations at the SAME timestamp has a zero
    # time span: guard the divide (ANSI mode throws DIVIDE_BY_ZERO) and
    # fall back to LOCF — the oracle carries the identical condition.
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
            & (F.col("next_us") != F.col("prev_us")),
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("us") - F.col("prev_us"))
            / (F.col("next_us") - F.col("prev_us")),
        )
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
    )
    return edges.select(
        "event_id",
        "user_id",
        F.col("v").isNull().alias("was_gap"),
        F.round(interp, 4).alias("v_interp"),
    )


@register(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value)         AS mean_value,
             STDDEV_SAMP(value) AS std_value
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value, 4) AS value,
           ROUND((e.value - s.mean_value) / s.std_value, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE ABS(ROUND((e.value - s.mean_value) / s.std_value, 4)) >= 2.5
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score outlier flagging: events whose ``value`` sits more
    than 2.5 sample standard deviations from their type's mean.

    Scale: two passes, both cheap. Pass 1 aggregates (mean, std) per
    event_type — 5 rows — with map-side partial aggregation. Pass 2
    broadcast-joins those 5 rows back onto the unshuffled events scan and
    filters: a map-only stage, no exchange of the big side. The window
    formulation (``AVG OVER (PARTITION BY event_type)``) would instead
    hash-partition 100 TB into #types partitions — the canonical skew
    trap; this aggregate+broadcast shape is the 100 TB plan. The z-score
    is rounded to 4 dp BEFORE the threshold test on both engines so a
    last-ulp disagreement cannot flip membership at the boundary.
    """
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mean_value"),
        F.stddev_samp("value").alias("std_value"),
    )
    # nullif: a constant-valued type has std 0 — DuckDB yields NULL (row
    # dropped by the threshold filter); Spark's ANSI divide would raise
    z = F.round(
        (F.col("value") - F.col("mean_value"))
        / F.nullif(F.col("std_value"), F.lit(0.0)),
        4,
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            z.alias("zscore"),
        )
        .where(F.abs(F.col("zscore")) >= 2.5)
    )


_INCR_CUTOFF = "2024-01-15 00:00:00"


@register(
    "q_rollup_incremental",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts)        AS bucket_start,
           CAST(COUNT(*) AS BIGINT)      AS n_events,
           ROUND(SUM(value), 4)          AS value_sum
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the stored aggregate (events before
    a cutoff) merged with the delta's partial aggregate (events at/after
    it) by summing partials — and the ORACLE is the full recompute, so
    the oracle match IS the proof of the maintenance identity
    rollup(T ∪ Δ) = merge(rollup(T), rollup(Δ)).

    Scale: this is how a 100 TB continuous aggregate stays fresh — the
    nightly delta is aggregated alone (scan of Δ only) and merged into
    the stored partials by key (shuffle of #groups rows, not a rescan of
    T). COUNT/SUM merge by addition; MIN/MAX by min/max; AVG must be
    carried as (sum, count); exact DISTINCT is NOT mergeable — that's
    what the HLL partials in `q_agg_sketch_merge` are for. The sum is
    rounded only after the merge so both paths see full precision.
    """
    ev = _t(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_start")
        ).agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))

    # NULL ts rows route to the stored side (a bare `ts < cutoff` predicate
    # is NULL for them — they'd fall out of BOTH partials and break the
    # identity; the oracle's full GROUP BY keeps a NULL bucket).
    stored = partial(
        ev.where(F.col("ts").isNull() | (F.col("ts") < _INCR_CUTOFF))
    )
    delta = partial(
        ev.where(F.col("ts").isNotNull() & (F.col("ts") >= _INCR_CUTOFF))
    )
    return (
        stored.unionAll(delta)
        .groupBy("event_type", "bucket_start")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("value_sum"), 4).alias("value_sum"),
        )
    )


_EWMA_ALPHA = 0.5


@register(
    "q_ts_ewma",
    oracle=f"""
    WITH idx AS (
      SELECT event_id, user_id, value,
             ROW_NUMBER() OVER w - 1 AS i,
             FIRST_VALUE(value) OVER w AS x0
      FROM events
      WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seq AS (
      SELECT event_id, user_id, value, i, x0,
             SUM(value * POWER({1 - _EWMA_ALPHA}, -i))
               OVER (PARTITION BY user_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_i
      FROM idx
    )
    SELECT event_id, user_id, value,
           FLOOR(POWER({1 - _EWMA_ALPHA}, i)
                 * ({_EWMA_ALPHA} * (a_i - x0) + x0) * 10000 + 0.5)
             / 10000 AS ewma
    FROM seq
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (the classic
    smoothing signal dashboards and alerting put over raw event values):
    y_0 = x_0, y_i = (1-a)*y_{i-1} + a*x_i over (ts, event_id) order.

    The recursion is sequential, which SQL engines cannot express
    directly — but it has a CLOSED FORM over one cumulative window:
    with p_j = (1-a)^(-j) and A_i = SUM(x_j * p_j) running over the
    partition, y_i = (1-a)^i * (a*(A_i - x_0) + x_0). That is ONE
    shuffle + local sort on (user_id, ts) and pure codegen'd arithmetic.

    a = 0.5 is chosen for cross-engine DETERMINISM, not just smoothing
    taste: p_j = 2^j is exact in ANY IEEE-754 engine (a power-of-two
    scale changes only the exponent field), so both engines sum
    identical doubles in the identical order and every downstream
    multiply/add sees bit-equal inputs. With a generic a (say 0.1),
    pow() last-ulp differences between libm implementations put ~1e-9
    relative divergence into A_i, and over 100k rows a couple of them
    land exactly on a 4dp rounding boundary — observed, not
    hypothetical (2 rows flipped at sf0.1 before the change). The
    tie-free floor rounding (registry convention) then settles the last
    representational difference.

    Scale honesty: p_j doubles per event, so A_i overflows double past
    ~10^3 events per key (and terms older than 52 steps leave the
    mantissa — harmlessly, since their weight is < 2^-52). Beyond that,
    EWMA belongs in the STREAM: an O(1) ValueState carrying y (the
    stateful_* pattern in streaming/ops.py) amortizes the recursion to
    constant work per event with no exponent at all — the same
    batch-recomputes-what-the-stream-carries trade as q_stream_anomaly.
    A batch-only fallback is segmented renormalization (reset p every K
    rows, carry y across segments via one extra join per segment count —
    bounded, not data-dependent, loop).
    """
    alpha = _EWMA_ALPHA
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    idx = F.row_number().over(w) - 1
    seq = ev.select(
        "event_id",
        "user_id",
        "value",
        idx.alias("i"),
        F.first("value").over(cum).alias("x0"),
        F.sum(F.col("value") * F.pow(F.lit(1 - alpha), -idx))
        .over(cum)
        .alias("a_i"),
    )
    ewma = F.pow(F.lit(1 - alpha), F.col("i")) * (
        alpha * (F.col("a_i") - F.col("x0")) + F.col("x0")
    )
    # tie-free rounding (registry convention): round() half-up diverges
    # between the engines when the double lands on a 4dp boundary
    return seq.select(
        "event_id",
        "user_id",
        "value",
        (F.floor(ewma * 10000 + 0.5) / 10000).alias("ewma"),
    )


_TSSIM_QUERY_USERS = 5  # users probing the corpus (like similarity._N_QUERIES)
_TSSIM_TOP_K = 3


@register(
    "q_ts_similarity",
    oracle=f"""
    WITH hod AS (
      SELECT user_id, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
             FLOOR(AVG(value) * 1000000 + 0.5) / 1000000 AS m
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, EXTRACT(hour FROM ts)
    ),
    grid AS (
      SELECT u.user_id, gs.h, COALESCE(hod.m, 0.0) AS m
      FROM (SELECT DISTINCT user_id FROM hod) u
      CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) gs
      LEFT JOIN hod ON hod.user_id = u.user_id AND hod.h = gs.h
    ),
    vec AS (
      SELECT user_id, list(m ORDER BY h) AS v FROM grid GROUP BY user_id
    ),
    scored AS (
      SELECT q.user_id AS query_user, c.user_id AS match_user,
             FLOOR(list_dot_product(q.v, c.v)
                   / NULLIF(SQRT(list_dot_product(q.v, q.v))
                            * SQRT(list_dot_product(c.v, c.v)), 0.0)
                   * 1000000 + 0.5) / 1000000 AS cos_sim
      FROM vec q JOIN vec c ON c.user_id != q.user_id
      WHERE q.user_id < {_TSSIM_QUERY_USERS}
    )
    SELECT query_user, match_user, cos_sim,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_user
        ORDER BY cos_sim DESC NULLS LAST, match_user) AS rk
      FROM scored
    )
    WHERE rk <= {_TSSIM_TOP_K}
    """,
)
def q_ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the distributed streaming-similarity
    problem of EDBT'19, batch form): each query user's activity profile is
    matched to the most similar other users by cosine over a fixed
    24-dimension hour-of-day signature (mean value per hour, zero-filled)
    — the resample-to-aligned-vector step that turns variable-length,
    irregularly sampled series into a comparable space.

    Spark-first shape: the profile build is ONE shuffle (groupBy user,
    hour-of-day) followed by a map-only 24-slot assembly via
    ``map_from_entries`` + ``transform(sequence(0,23))`` — no pivot, no
    second shuffle; the search reuses q_sim_topk's pattern (broadcast the
    bounded query side, one scan of the corpus vectors, WindowGroupLimit
    top-k). Hour means are tie-free-rounded to 6dp BEFORE the dot product
    on both engines so AVG's partial-aggregation order cannot leak into
    the ranking; zero-activity profiles null out under the ANSI nullif
    guard and sort NULLS LAST identically.

    Scale: profiles are 24 doubles per user — a 100 TB event history
    compresses to O(|users|) vectors in one pass, after which even a
    billion-user all-pairs probe is the ANN problem q_sim_ann already
    solves (LSH over these vectors); the brute-force form here is the
    exact baseline, linear in users per query."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hod = ev.groupBy(
        "user_id", F.hour("ts").cast("long").alias("h")
    ).agg(
        (F.floor(F.avg("value") * 1000000 + 0.5) / 1000000).alias("m")
    )
    vec = hod.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("h", "m"))).alias("mm")
    ).select(
        "user_id",
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(23).cast("long")),
            # map lookup by KEY (hours 0-23); try_element_at because ANSI
            # mode makes plain element_at throw on a missing map key
            lambda h: F.coalesce(F.try_element_at("mm", h), F.lit(0.0)),
        ).alias("v"),
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q = vec.filter(F.col("user_id") < _TSSIM_QUERY_USERS).select(
        F.col("user_id").alias("query_user"), F.col("v").alias("qv")
    )
    scored = (
        vec.join(F.broadcast(q), F.col("user_id") != F.col("query_user"))
        .select(
            "query_user",
            F.col("user_id").alias("match_user"),
            (
                F.floor(
                    dot(F.col("qv"), F.col("v"))
                    / F.nullif(
                        F.sqrt(dot(F.col("qv"), F.col("qv")))
                        * F.sqrt(dot(F.col("v"), F.col("v"))),
                        F.lit(0.0),
                    )
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_user").orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col("match_user")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _TSSIM_TOP_K)
        .select("query_user", "match_user", "cos_sim", "rk")
    )


_ACF_MAX_LAG = 3


@register(
    "q_ts_acf",
    oracle=f"""
    WITH ordered AS (
      SELECT event_type, value,
             LAG(value, 1) OVER w AS y1,
             LAG(value, 2) OVER w AS y2,
             LAG(value, 3) OVER w AS y3
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id)
    ), pairs AS (
      SELECT event_type, 1 AS lag, value AS x, y1 AS y FROM ordered WHERE y1 IS NOT NULL
      UNION ALL
      SELECT event_type, 2 AS lag, value AS x, y2 AS y FROM ordered WHERE y2 IS NOT NULL
      UNION ALL
      SELECT event_type, 3 AS lag, value AS x, y3 AS y FROM ordered WHERE y3 IS NOT NULL
    )
    SELECT event_type, CAST(lag AS INT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(COVAR_POP(x, y)
                 / NULLIF(STDDEV_POP(x) * STDDEV_POP(y), 0), 4) AS acf
    FROM pairs
    GROUP BY event_type, lag
    """,
)
def q_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function per series: lag-1..3 Pearson
    correlation of each event_type's value sequence against its own past
    (the paired-observation ACF estimator: moments are taken over the
    n-k aligned pairs, not the full series) — the stationarity /
    seasonality probe that decides a forecasting model's AR order.

    Scale: ONE shuffle + local sort on (event_type, ts) computes all
    three lag columns over the same sorted run; the lag rows then unpivot
    (map-side, 3x fan-out of two doubles, not the event row) into one
    partial-agg shuffle keyed (event_type, lag) whose output is
    series_count x 3 rows. Per-series work is a sequential scan
    — series count, not series length, provides the parallelism (the
    same shape as every per-key ordered op here: q_ts_ewma, q_win_locf).
    A constant series (stddev 0) yields NULL acf on both engines via the
    nullif-guarded divide (ANSI-safe). Moment sums accumulate in
    different orders on the two engines; the 4dp round at the output is
    the registry's standard last-ulp absorber.
    """
    events = _t(spark, sf_dir, "events")
    # Explicit NULLS FIRST: Spark's ascending default; DuckDB's window
    # default is NULLS LAST, so a NULL-ts row would otherwise sit at
    # opposite ends of the series and shift every pair by one.
    w = W.partitionBy("event_type").orderBy(
        F.col("ts").asc_nulls_first(), "event_id"
    )
    ordered = events.select(
        "event_type",
        "value",
        *[F.lag("value", k).over(w).alias(f"y{k}") for k in range(1, _ACF_MAX_LAG + 1)],
    )
    pairs = ordered.select(
        "event_type",
        F.posexplode(F.array(*[F.col(f"y{k}") for k in range(1, _ACF_MAX_LAG + 1)])).alias(
            "lag0", "y"
        ),
        F.col("value").alias("x"),
    ).filter(F.col("y").isNotNull())
    return (
        pairs.groupBy("event_type", (F.col("lag0") + 1).cast("int").alias("lag"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                F.covar_pop("x", "y")
                / F.nullif(F.stddev_pop("x") * F.stddev_pop("y"), F.lit(0.0)),
                4,
            ).alias("acf"),
        )
        .select("event_type", "lag", "n_pairs", "acf")
    )


@register(
    "q_ts_crosscorr",
    oracle="""
    WITH hourly AS (
      SELECT CAST(CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600
                  AS BIGINT) AS h,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ), lags AS (
      SELECT * FROM (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) t(lag)
    ), pairs AS (
      SELECT l.lag, a.x, b.y
      FROM hourly a CROSS JOIN lags l
      JOIN hourly b ON b.h = a.h + l.lag
    ), m AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
           floor((n * sxy - sx * sy)
                 / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 0)
                 * 1000000 + 0.5) / 1000000 AS r
    FROM m
    """,
)
def q_ts_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between two event series: Pearson r of
    hourly click counts against error counts shifted by lag -3..+3 hours
    — the lead/lag detector that tells an ops or feature team WHICH
    series moves first and by how many buckets (q_ts_acf's two-series
    sibling; lag 0 is plain correlation).

    Exactness: the series are integer COUNTS, so all five moment sums
    are exact longs; the Pearson quotient is assembled from them with
    one double division and one sqrt — both IEEE-correctly-rounded, so
    the engines agree bit-for-bit (unlike pow/ln, sqrt is exactly
    specified; module-header convention). The variance factors are cast
    to double BEFORE multiplying (their product overflows long at big
    n), and a constant series nulls out via the nullif guard instead of
    tripping ANSI divide-by-zero.

    Scale: the raw scan collapses to the hourly frame FIRST (map-side
    combine, one shuffle on the hour key — the frame is bounded by the
    time span, not the event count); the 7-lag fan-out replicates only
    that bounded frame and the self-join keys on the shifted hour, which
    Catalyst resolves as a broadcast join at any realistic span. Moments
    partial-aggregate per lag. At 100 TB of events this plan's cost is
    the one scan.
    """
    events = _t(spark, sf_dir, "events")
    hour = (
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600
    ).cast("long")
    hourly = events.groupBy(hour.alias("h")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("long").alias("x"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("long").alias("y"),
    )
    a = hourly.select(
        "h",
        "x",
        F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag"),
    )
    pairs = a.join(
        hourly.select(F.col("h").alias("bh"), "y"),
        F.col("bh") == F.col("h") + F.col("lag"),
    ).select("lag", "x", "y")
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
    )
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        (
            F.floor(
                num / F.nullif(den, F.lit(0.0)) * 1000000 + F.lit(0.5)
            )
            / 1000000
        ).alias("r"),
    )


@register(
    "q_ts_hampel",
    oracle="""
    WITH framed AS (
      SELECT event_id, event_type, ts, value,
             array_agg(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
             ) AS vals
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), med AS (
      SELECT *, list_sort(vals)[(len(vals) + 1) // 2] AS m FROM framed
    ), mad AS (
      SELECT *,
             list_sort(list_transform(vals, v -> abs(v - m)))
               [(len(vals) + 1) // 2] AS d
      FROM med
    )
    SELECT event_id, event_type, ts, value,
           m AS med,
           abs(value - m) > 4.4478 * d AS is_outlier,
           CASE WHEN abs(value - m) > 4.4478 * d THEN m
                ELSE value END AS repaired
    FROM mad
    """,
)
def q_ts_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter: rolling-window robust outlier REPAIR — each point
    is compared to its centered 5-row window median, flagged when the
    absolute deviation exceeds 3 sigma-equivalents of the window MAD
    (3 x 1.4826 = 4.4478, the Gaussian consistency constant as ONE
    literal so both engines multiply identically), and repaired to the
    median — the standard telemetry-cleaning step ahead of model
    features (Pearson/Hampel 1974; q_win_rolling_median smooths, this
    REPLACES only proven outliers and keeps everything else verbatim).

    Determinism: median AND MAD are SELECTED elements of sorted frame
    arrays (never interpolated — module convention), deviations are
    differences of identical stored doubles, and the threshold compare
    is one fixed IEEE expression — bit-identical cross-engine, boundary
    ties included. Edge frames (< 5 rows at series ends) use the
    available window on both engines.

    Scale: one shuffle on event_type + local sort serves the window;
    per-row state is the O(5) frame; the transform/sort/select chain is
    JVM-side codegen. Same shape as every ordered per-key op here.
    """
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    vals = F.collect_list("value").over(w)
    base = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select("event_id", "event_type", "ts", "value", vals.alias("vals"))
    )
    mid = ((F.size("vals") + 1) / 2).cast("int")
    base = base.withColumn(
        "m", F.element_at(F.array_sort("vals"), mid)
    ).withColumn(
        "d",
        F.element_at(
            F.array_sort(
                F.transform(F.col("vals"), lambda v: F.abs(v - F.col("m")))
            ),
            mid,
        ),
    )
    flag = F.abs(F.col("value") - F.col("m")) > 4.4478 * F.col("d")
    return base.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.col("m").alias("med"),
        flag.alias("is_outlier"),
        F.when(flag, F.col("m")).otherwise(F.col("value")).alias("repaired"),
    )


@register(
    "q_ts_changepoint",
    oracle="""
    WITH series AS (
      SELECT event_type, ts, event_id,
             SUM(value) OVER w AS s_k,
             ROW_NUMBER() OVER w AS k
      FROM events
      WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), closed AS (
      SELECT *,
             LAST_VALUE(s_k) OVER wf AS s_n,
             MAX(k) OVER wf AS n
      FROM series
      WINDOW wf AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ), cusum AS (
      SELECT event_type, ts, event_id, k,
             s_k - k * (s_n / n) AS c
      FROM closed
    ), ranked AS (
      SELECT event_type, ts, k AS cp_index,
             ROUND(ABS(c), 6) AS cp_magnitude,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ROUND(ABS(c), 6) DESC,
                                         ts NULLS FIRST, event_id) AS rk
      FROM cusum
    )
    SELECT event_type, ts AS cp_ts, CAST(cp_index AS BIGINT) AS cp_index,
           cp_magnitude
    FROM ranked WHERE rk = 1
    """,
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift changepoint per series: the index maximizing
    |S_k − k·(S_n/n)| (cumulative deviation from the series mean) marks
    the most likely single change in level — Page's CUSUM statistic in
    its offline argmax form.

    Cross-engine exactness by construction: the prefix sums S_k are
    accumulated in the SAME pinned order ((ts NULLS FIRST, event_id), a
    sequential running frame) on both engines, S_n is read as the LAST
    prefix sum rather than re-aggregated, and the series mean enters as
    k·(S_n/n) — every double op then has bit-identical operands on both
    engines, so the cusum values are bit-identical and the argmax cannot
    flip (the q_ts_ewma same-order-arithmetic portability rule; the 6dp
    round on the ranking key is belt-and-braces, not load-bearing).

    Scale: one shuffle + local sort per series serves the running frame,
    the row counter, and the full-frame last-value in a single window
    pass; the argmax is a per-series group-limit (top-1 truncated before
    the exchange). Sequential per key, parallel across keys — the
    standard per-series shape (see q_ts_acf).
    """
    events = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    order = [F.col("ts").asc_nulls_first(), F.col("event_id")]
    w = W.partitionBy("event_type").orderBy(*order)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    series = events.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("value").over(run).alias("s_k"),
        F.row_number().over(w).alias("k"),
    )
    closed = series.select(
        "*",
        F.last("s_k").over(full).alias("s_n"),
        F.max("k").over(full).alias("n"),
    )
    cusum = closed.withColumn(
        "c", F.col("s_k") - F.col("k") * (F.col("s_n") / F.col("n"))
    )
    rk = F.row_number().over(
        w.orderBy(F.round(F.abs("c"), 6).desc(), *order)
    )
    return (
        cusum.withColumn("cp_magnitude", F.round(F.abs("c"), 6))
        .withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("ts").alias("cp_ts"),
            F.col("k").cast("long").alias("cp_index"),
            "cp_magnitude",
        )
    )


@register(
    "q_ts_seasonality",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), hourly AS (
      SELECT event_type, hour_of_day,
             COUNT(*) AS n_events, SUM(cents) AS sum_cents
      FROM base GROUP BY event_type, hour_of_day
    ), totals AS (
      SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS n_all,
             SUM(sum_cents) AS cents_all
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hour_of_day, h.n_events,
      FLOOR(CAST(h.sum_cents AS DOUBLE)
            / CAST(100 * h.n_events AS DOUBLE) * 10000 + 0.5) / 10000
        AS mean_value,
      FLOOR(CAST(h.sum_cents * t.n_all AS DOUBLE)
            / CAST(NULLIF(t.cents_all * h.n_events, 0) AS DOUBLE)
            * 1000000 + 0.5) / 1000000
        AS seasonal_index,
      CASE WHEN ROW_NUMBER() OVER (
             PARTITION BY h.event_type
             ORDER BY CAST(h.sum_cents AS DOUBLE)
                      / CAST(100 * h.n_events AS DOUBLE) DESC,
                      h.hour_of_day
           ) = 1 THEN TRUE ELSE FALSE END AS is_peak
    FROM hourly h JOIN totals t ON t.event_type = h.event_type
    """,
)
def q_ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per series: per-hour mean, the
    seasonal index (hour mean / series mean — the classical
    ratio-to-moving-average decomposition's seasonal component for a
    daily cycle), and a deterministic peak-hour flag.

    Cross-engine floats: means of raw doubles are order-dependent sums,
    so values accumulate as exact integer CENTS (q_agg_money pattern)
    and every ratio is ONE IEEE division of exactly-represented
    integers (sum_cents * n_all < 2^53 through sf100) — bit-identical,
    which also makes the peak-hour ORDER BY mean engine-stable; hour_of_day
    breaks exact mean ties. A zero series total nullif-guards the index.
    Display rounding uses the tie-safe floor(x*10^k+0.5)/10^k form on
    BOTH sides — ROUND() half-way semantics differ between engines and
    exact-fraction means land on half-way points constantly.

    Scale: two stacked hash aggregates (raw -> |types|x24 -> |types|),
    both partial-aggregable map-side; the window and join run on the
    120-row hourly frame. Raw events are scanned once.
    """
    base = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.hour("ts").alias("hour_of_day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    hourly = base.groupBy("event_type", "hour_of_day").agg(
        F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents")
    )
    totals = hourly.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("n_all"),
        F.sum("sum_cents").alias("cents_all"),
    )
    mean_expr = F.col("sum_cents").cast("double") / (
        100 * F.col("n_events")
    ).cast("double")
    w = W.partitionBy("event_type").orderBy(
        mean_expr.desc(), "hour_of_day"
    )
    return (
        hourly.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "hour_of_day",
            "n_events",
            (F.floor(mean_expr * 10000 + F.lit(0.5)) / 10000).alias(
                "mean_value"
            ),
            (
                F.floor(
                    (F.col("sum_cents") * F.col("n_all")).cast("double")
                    / F.nullif(
                        F.col("cents_all") * F.col("n_events"), F.lit(0)
                    ).cast("double")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("seasonal_index"),
            (F.row_number().over(w) == 1).alias("is_peak"),
        )
    )


@register(
    "q_anomaly_iqr",
    oracle="""
    WITH vals AS (
      SELECT event_type, list_sort(list(value)) AS xs,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    ), cuts AS (
      SELECT event_type, n,
             xs[CAST(FLOOR((n - 1) * 0.25) AS BIGINT) + 1] AS q1,
             xs[CAST(FLOOR((n - 1) * 0.75) AS BIGINT) + 1] AS q3
      FROM vals
    ), fences AS (
      SELECT event_type, n, q1, q3,
             q1 - (1.5 * (q3 - q1)) AS lo,
             q3 + (1.5 * (q3 - q1)) AS hi
      FROM cuts
    )
    SELECT f.event_type,
           CAST(f.n AS BIGINT) AS n,
           f.q1 AS q1, f.q3 AS q3,
           CAST(SUM(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high
    FROM events e JOIN fences f ON f.event_type = e.event_type
    WHERE e.value IS NOT NULL
    GROUP BY f.event_type, f.n, f.q1, f.q3
    """,
)
def q_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier detection per series: quartiles, the
    1.5·IQR fences, and the count of rows beyond each fence — the
    robust complement to q_anomaly_zscore (fences from rank statistics
    don't move when the outliers themselves inflate the moments).

    Determinism: quartiles are sorted-array ELEMENT SELECTION with an
    explicitly shared index convention (idx = floor((n-1)·q)+1,
    1-based) — both engines return the same STORED double, sidestepping
    every interpolation-form divergence; the fences are a fixed IEEE
    tree over those two stored values, so the < / > threshold compares
    are engine-identical even on values tied with a fence (the
    winsorize lesson, solved by selection instead of rounding).

    Scale: aggregate-then-broadcast-back (the q_anomaly_zscore rule —
    never a whole-partition window over the fact table); the exact
    sorted-list selection holds to bounded group sizes, and an
    unbounded series swaps in approx_percentile for the cuts with the
    same broadcast shape.
    """
    ev = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    vals = ev.groupBy("event_type").agg(
        F.sort_array(F.collect_list("value")).alias("xs"),
        F.count("*").alias("n"),
    )
    idx = lambda q: (  # noqa: E731
        F.floor((F.col("n") - 1) * q).cast("long") + 1
    ).cast("int")
    cuts = vals.select(
        "event_type",
        "n",
        F.element_at("xs", idx(0.25)).alias("q1"),
        F.element_at("xs", idx(0.75)).alias("q3"),
    )
    fences = cuts.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - (1.5 * (F.col("q3") - F.col("q1")))).alias("lo"),
        (F.col("q3") + (1.5 * (F.col("q3") - F.col("q1")))).alias("hi"),
    )
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("lo"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_low"),
            F.sum(
                F.when(F.col("value") > F.col("hi"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_high"),
        )
        .select("event_type", "n", "q1", "q3", "n_low", "n_high")
    )


_HOLT_ALPHA = 0.5  # level gain — power-of-two for cross-engine exactness
_HOLT_BETA = 0.5   # trend gain — same dyadic-arithmetic rationale as EWMA


@register(
    "q_ts_holt",
    oracle=f"""
    WITH RECURSIVE idx AS (
      SELECT event_id, user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM events WHERE value IS NOT NULL
    ), rec(user_id, i, event_id, value, l, b) AS (
      SELECT user_id, i, event_id, value, value AS l, CAST(0 AS DOUBLE) AS b
      FROM idx WHERE i = 1
      UNION ALL
      SELECT x.user_id, x.i, x.event_id, x.value,
             0.5 * x.value + 0.5 * (r.l + r.b),
             0.5 * ((0.5 * x.value + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      FROM rec r JOIN idx x ON x.user_id = r.user_id AND x.i = r.i + 1
    )
    SELECT event_id, user_id, value,
           floor(l * 10000 + 0.5) / 10000 AS level,
           floor(b * 10000 + 0.5) / 10000 AS trend,
           floor((l + b) * 10000 + 0.5) / 10000 AS forecast
    FROM rec
    """,
)
def q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing per user (level + trend, the
    trend-aware sibling of q_ts_ewma and the classic one-step-ahead
    forecaster): over (ts, event_id) order,

        l_1 = x_1, b_1 = 0
        l_t = a*x_t + (1-a)*(l_{{t-1}} + b_{{t-1}})
        b_t = g*(l_t - l_{{t-1}}) + (1-g)*b_{{t-1}}

    emitting level, trend, and the one-step forecast l_t + b_t.

    Unlike EWMA, the Holt recursion has no single-window closed form
    (the state is a 2-vector, the closed form a matrix power), so this is
    the sanctioned Arrow path: ``applyInPandas`` per user with an exact
    scalar loop. Cross-engine exactness: a = g = 1/2 keeps every
    operation dyadic (multiplying by 0.5 only decrements the exponent
    field), and the Python loop and the oracle's recursive CTE evaluate
    the IDENTICAL expression trees in the identical order, so both
    engines produce bit-equal doubles at every step — the EWMA
    power-of-two rule extended to a 2-state recursion; trend reuses the
    freshly-computed level expression verbatim on both sides. Output
    rounding is the tie-free floor form.

    Scale: one shuffle on user_id + per-group Arrow batches; per-key
    history is bounded in batch context (the q_ts_ewma honesty note) —
    at unbounded history this recursion belongs in the STREAM as an O(1)
    (l, b) ValueState, the stateful_ewma pattern with a 2-field state.
    Groups cannot be salted (the recursion is cross-row sequential), so
    a pathological single-user corpus serializes — the same bound every
    per-key sequential model shares.
    """
    import math

    import pandas as pd

    events = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "ts", "user_id", "value")
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out_l, out_b, out_f = [], [], []
        l = b = None
        for x in pdf["value"]:
            x = float(x)
            if l is None:
                l, b = x, 0.0
            else:
                l_new = 0.5 * x + 0.5 * (l + b)
                b = 0.5 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.5 * b
                l = l_new
            r4 = lambda v: math.floor(v * 10000 + 0.5) / 10000  # noqa: E731
            out_l.append(r4(l))
            out_b.append(r4(b))
            out_f.append(r4(l + b))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value": pdf["value"],
                "level": out_l,
                "trend": out_b,
                "forecast": out_f,
            }
        )

    return events.groupBy("user_id").applyInPandas(
        holt,
        schema=(
            "event_id long, user_id long, value double, "
            "level double, trend double, forecast double"
        ),
    )


_STL_HALF = 12  # centered moving-average half-width -> full window = 25 rows


@register(
    "q_ts_stl",
    oracle=f"""
    WITH base AS (
      SELECT event_type, ts, event_id,
             CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), win AS (
      SELECT event_type, hour_of_day, cents,
             SUM(cents) OVER w AS sum_cents,
             COUNT(*)  OVER w AS cnt
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {_STL_HALF} PRECEDING
                            AND {_STL_HALF} FOLLOWING)
    ), interior AS (
      SELECT event_type, hour_of_day,
             {2 * _STL_HALF + 1} * cents - sum_cents AS num
      FROM win WHERE cnt = {2 * _STL_HALF + 1}
    ), seasonal AS (
      SELECT event_type, hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             SUM(num) AS sum_num
      FROM interior GROUP BY event_type, hour_of_day
    )
    SELECT s.event_type, s.hour_of_day, s.n_obs,
      FLOOR(CAST(s.sum_num AS DOUBLE)
            / CAST({(2 * _STL_HALF + 1) * 100} * s.n_obs AS DOUBLE)
            * 10000 + 0.5) / 10000 AS seasonal,
      FLOOR(MIN(CAST(i.num AS DOUBLE) / {(2 * _STL_HALF + 1) * 100}
                - CAST(s.sum_num AS DOUBLE)
                  / CAST({(2 * _STL_HALF + 1) * 100} * s.n_obs AS DOUBLE))
            * 10000 + 0.5) / 10000 AS min_resid,
      FLOOR(MAX(CAST(i.num AS DOUBLE) / {(2 * _STL_HALF + 1) * 100}
                - CAST(s.sum_num AS DOUBLE)
                  / CAST({(2 * _STL_HALF + 1) * 100} * s.n_obs AS DOUBLE))
            * 10000 + 0.5) / 10000 AS max_resid
    FROM seasonal s
    JOIN interior i ON i.event_type = s.event_type
                   AND i.hour_of_day = s.hour_of_day
    GROUP BY s.event_type, s.hour_of_day, s.n_obs, s.sum_num
    """,
)
def q_ts_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal-trend decomposition per series
    (ratio-free STL sibling of q_ts_seasonality): trend = centered
    25-row moving average, seasonal = per-hour-of-day mean of the
    detrended values, residual envelope = min/max detrended-minus-
    seasonal — the decomposition every capacity-planning / anomaly
    pipeline runs before thresholding.

    Cross-engine exactness: values are integer CENTS; the detrended
    value for FULL windows only (cnt == 25, edges excluded — variable
    edge denominators would make the seasonal sum order-dependent) is
    the exact-integer numerator ``25*cents - sum_cents`` over the
    constant denominator 2500, so the seasonal mean is ONE IEEE
    division of exact integers (sum_num < 2^53 through sf10 per
    (type,hour) group; beyond that, accumulate per-day partials first).
    Residual extremes use MIN/MAX — order-INDEPENDENT, so engine-stable
    where a residual variance (an order-dependent float sum) would not
    be. Display uses the tie-safe floor-scale form on both sides.

    Scale: one window over the raw events (partitioned per series, the
    same sort the per-series rollups share), then two hash aggregates
    on (type, hour) — both partial-aggregable; the seasonal join is a
    broadcast of |types|x24 rows. No Python, no collect.
    """
    full = 2 * _STL_HALF + 1
    base = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            F.hour("ts").alias("hour_of_day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_STL_HALF, _STL_HALF)
    )
    interior = (
        base.withColumn("sum_cents", F.sum("cents").over(w))
        .withColumn("cnt", F.count("*").over(w))
        .filter(F.col("cnt") == full)
        .select(
            "event_type",
            "hour_of_day",
            (F.lit(full) * F.col("cents") - F.col("sum_cents")).alias("num"),
        )
    )
    seasonal = interior.groupBy("event_type", "hour_of_day").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("num").alias("sum_num"),
    )
    seas_mean = F.col("sum_num").cast("double") / (
        F.lit(full * 100) * F.col("n_obs")
    ).cast("double")
    resid = F.col("num").cast("double") / F.lit(full * 100) - seas_mean
    fs = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return (
        interior.join(F.broadcast(seasonal), ["event_type", "hour_of_day"])
        .groupBy("event_type", "hour_of_day", "n_obs", "sum_num")
        .agg(
            fs(F.min(resid)).alias("min_resid"),
            fs(F.max(resid)).alias("max_resid"),
        )
        .select(
            "event_type",
            "hour_of_day",
            "n_obs",
            fs(seas_mean).alias("seasonal"),
            "min_resid",
            "max_resid",
        )
    )


@register(
    "q_ts_trend_mk",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS sum_cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ), pairs AS (
      SELECT a.event_type,
             CASE WHEN b.sum_cents * a.n > a.sum_cents * b.n THEN 1
                  WHEN b.sum_cents * a.n < a.sum_cents * b.n THEN -1
                  ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
    ), agg AS (
      SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY event_type
    )
    SELECT event_type, s_stat, n_pairs,
           FLOOR(CAST(s_stat AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS tau,
           CASE WHEN s_stat > 0 THEN 'increasing'
                WHEN s_stat < 0 THEN 'decreasing'
                ELSE 'flat' END AS trend
    FROM agg
    """,
)
def q_ts_trend_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per series over DAILY means: the
    distribution-free monotone-trend statistic ``S = sum over day
    pairs i<j of sign(mean_j - mean_i)`` with Kendall's tau-a
    normalization — the standard "is this metric drifting" test that
    needs no linearity or normality assumption (q_agg_regr's slope is
    its parametric sibling).

    Integer-exact throughout: daily means are never materialized as
    floats — the sign of ``mean_j - mean_i`` is the sign of the
    CROSS-MULTIPLIED exact integers ``sum_j*n_i - sum_i*n_j``
    (denominators positive; products < 2^53 through sf100 daily
    volumes), so S is an exact integer sum and tau ONE IEEE division,
    floor-scale displayed (exact-ratio half-way class).

    Scale: pair enumeration is quadratic in DAYS PER SERIES, not in
    events (the q_assoc_rules bounded-self-join argument: a year is
    ~66k pairs per series) — the daily pre-aggregate is the
    corpus-sized pass and map-side combines; the pair join runs on the
    tiny daily frame, co-partitioned on event_type.
    """
    daily = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("sum_cents"),
        )
    )
    a = daily.select(
        "event_type",
        F.col("day").alias("day_a"),
        F.col("n").alias("n_a"),
        F.col("sum_cents").alias("s_a"),
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("day_b"),
        F.col("n").alias("n_b"),
        F.col("sum_cents").alias("s_b"),
    )
    diff = F.col("s_b") * F.col("n_a") - F.col("s_a") * F.col("n_b")
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("day_b") > F.col("day_a"))
        .select(
            "event_type",
            F.when(diff > 0, 1).when(diff < 0, -1).otherwise(0).alias("sgn"),
        )
    )
    agg = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    return agg.select(
        "event_type",
        "s_stat",
        "n_pairs",
        (
            F.floor(
                F.col("s_stat").cast("double")
                / F.col("n_pairs").cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("tau"),
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("flat")
        .alias("trend"),
    )


@register(
    "q_ts_m4",
    oracle="""
    WITH marked AS (
      SELECT date_trunc('hour', ts) AS bucket, value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events WHERE value IS NOT NULL
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(MIN(value), 4) AS v_min,
           ROUND(MAX(value), 4) AS v_max,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS v_first,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS v_last
    FROM marked GROUP BY bucket
    """,
)
def q_ts_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per time
    bucket keep min, max, first, and last — the four points that make a
    line-chart rendering of the bucket pixel-exact, and the standard
    lossy downsample a telemetry pipeline stores per resolution tier
    (the sequential-dependency-free alternative to LTTB; each bucket is
    independent, so the whole downsample is one grouped aggregate).

    First/last are selected by the TOTAL (ts, event_id) order via
    bucket-partitioned row_numbers (duplicate timestamps — the
    test_timeseries_edges trap — resolve identically on both engines);
    values are compared, never summed, so doubles pass through verbatim
    with a 4dp display round.

    Scale: two bucket-partitioned windows + one grouped agg, all
    sharded on the bucket key — embarrassingly parallel across time;
    a hot bucket is bounded by the bucket width, not corpus size. At
    100 TB the multi-resolution tiers chain this op (hour from raw, day
    from hour) exactly like q_rollup_multires.
    """
    events = tables.load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    bucket = F.date_trunc("hour", "ts")
    w_a = W.partitionBy(bucket).orderBy("ts", "event_id")
    w_d = W.partitionBy(bucket).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = events.select(
        bucket.alias("bucket"),
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return marked.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
        F.round(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4
        ).alias("v_first"),
        F.round(
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4
        ).alias("v_last"),
    )


@register(
    "q_ts_snaive_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ), scored AS (
      SELECT a.event_type, a.n, b.n AS forecast
      FROM daily a
      JOIN daily b ON b.event_type = a.event_type
                  AND b.day = a.day - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(ABS(n - forecast)) AS BIGINT) AS abs_err_total,
           FLOOR(SUM(ABS(n - forecast)) * 1000000.0 / COUNT(*) + 0.5)
             / 1000000 AS mae,
           FLOOR(SUM(n - forecast) * 1000000.0 / COUNT(*) + 0.5)
             / 1000000 AS bias
    FROM scored GROUP BY event_type
    """,
)
def q_ts_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each (event_type, day)
    count with the count from the SAME WEEKDAY one week earlier, score
    MAE and signed bias per series — the baseline every forecasting
    pipeline must beat, and the evaluation-harness shape (forecast ⋈
    actuals -> error aggregate) any model backtest reuses.

    The lag is by CALENDAR date (equi-join on day-7), never by row
    offset — gap days must break the pairing, not silently shift it
    (the LAG(7 ROWS) formulation is wrong on sparse series). Counts are
    exact integers, so error sums are exact and only the final mean
    divides — floor-scale displayed (integer/integer means land on
    half-way points routinely; bias can be negative, and floor(x+0.5)
    rounds identically on both engines there).

    Scale: one grouped count on (type, day) — map-side combined — and a
    self equi-join on the same key, co-partitioned; output is one row
    per series. Hot series shard by day first (the count), so no key
    sees more than its day-domain rows.
    """
    events = tables.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    prior = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("n").alias("forecast"),
    )
    scored = daily.join(prior, ["event_type", "day"])
    return scored.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.sum(F.abs(F.col("n") - F.col("forecast"))).alias("abs_err_total"),
        (
            F.floor(
                F.sum(F.abs(F.col("n") - F.col("forecast")))
                * F.lit(1000000.0)
                / F.count("*")
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mae"),
        (
            F.floor(
                F.sum(F.col("n") - F.col("forecast"))
                * F.lit(1000000.0)
                / F.count("*")
                + F.lit(0.5)
            )
            / 1000000
        ).alias("bias"),
    )
