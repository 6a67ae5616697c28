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

from pyspark.sql import DataFrame, SparkSession
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
    z = F.round((F.col("value") - F.col("mean_value")) / F.col("std_value"), 4)
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
