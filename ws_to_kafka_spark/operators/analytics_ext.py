"""Extended OLAP surface: percentiles, pivot, distribution windows,
ordered collect, map functions, and the SQL-text API.

These round out the batch surface beyond SURVEY.md §2.3's core rows with
the analytics any warehouse user expects. All JVM built-ins; the SQL-text
query proves the engine's ``spark.sql`` path end-to-end (views registered
by :func:`ws_to_kafka_spark.tables.register_views`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import tables
from .distributed import (
    _track as _track_persisted,
    global_ntile_multi,
    global_row_number,
)
from .registry import register


@register(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4)       AS qty_median,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS price_p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90/p99) per group — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share linear
    interpolation, so values agree to rounding.

    Scale: exact percentiles need the full value multiset per group (sort
    based) — fine on bounded groups like these; an unbounded-cardinality
    rollup at 100 TB switches to ``approx_percentile`` (t-digest sketch,
    mergeable map-side) at the cost of oracle exactness.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("qty_median"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("price_p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("price_p99"),
    )


@register(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6)                  AS qty_stddev,
           ROUND(VAR_POP(l_discount), 6)                      AS disc_var,
           ROUND(CORR(l_extendedprice, l_quantity), 6)        AS price_qty_corr,
           ROUND(COVAR_POP(l_extendedprice, l_quantity), 4)   AS price_qty_covar,
           ROUND(SKEWNESS(l_extendedprice), 6)                AS price_skew
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance/
    skewness per group — single-pass mergeable moment sketches in both
    engines, so partial aggregation applies map-side like any sum.

    Estimator alignment: Spark's ``skewness`` is the population
    coefficient g1 = m3/m2^1.5; DuckDB's is the bias-adjusted SAMPLE
    estimator G1 = g1·√(n(n−1))/(n−2). The √(n(n−1))/(n−2) factor is
    ~1+3/n — invisible at 6 dp for large groups, a reliable mismatch at
    small n — so the conversion is applied explicitly."""
    li = tables.load(spark, sf_dir, "lineitem")
    n = F.count("*")
    sample_adj = F.sqrt(n * (n - 1)) / (n - 2)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_pop("l_discount"), 6).alias("disc_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_pop("l_extendedprice", "l_quantity"), 4).alias(
            "price_qty_covar"
        ),
        # n<=2 would divide by zero (ANSI raise); DuckDB's sample skewness
        # is NULL there, so gate the whole term on n > 2
        F.round(
            F.when(n > 2, F.skewness("l_extendedprice") * sample_adj), 6
        ).alias("price_skew"),
    )


@register(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS status_f,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS status_o,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per priority × status. The pivot
    values are declared explicitly — at scale an implicit pivot runs an
    extra distinct-collect over the data to discover columns."""
    orders = tables.load(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@register(
    "q_win_dist",
    oracle="""
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS price_pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
    """,
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) — both
    tie-invariant, so no tiebreaker column is needed."""
    orders = tables.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(list(s_suppkey)), ',') AS supp_keys,
           COUNT(*)                                         AS n_supps
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect: supplier keys per nation, SORTED then serialized to
    a canonical string (collect_list order is nondeterministic under
    parallelism — sorting makes the collect comparable, and the string form
    is hash-portable across engines' array representations)."""
    nation = tables.load(spark, sf_dir, "nation").select("n_nationkey")
    supp = tables.load(spark, sf_dir, "supplier").select("s_nationkey", "s_suppkey")
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("s_suppkey"))).alias(
                "supp_keys"
            ),
            F.count("*").alias("n_supps"),
        )
    )


@register(
    "q_fn_map",
    oracle="""
    SELECT p_partkey,
           p_brand                   AS brand_val,
           CAST(p_size AS BIGINT)    AS size_val,
           2                         AS n_keys,
           TRUE                      AS has_brand
    FROM part
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: build a map column, then read it back by key /
    cardinality / key-membership. The oracle states the expected values
    directly, so any map-construction or access defect shows."""
    part = tables.load(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("size"), F.col("p_size").cast("string"),
    )
    return part.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "size").cast("long").alias("size_val"),
        F.size(m).alias("n_keys"),
        F.array_contains(F.map_keys(m), "brand").alias("has_brand"),
    )


@register(
    "q_sql_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue query through the SQL-TEXT API
    (``spark.sql`` over registered views) — proving the engine's SQL
    entry point end-to-end, not just the DataFrame builder. The plan is
    identical to the DataFrame form: Catalyst sees one logical plan."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id,
           p.ts AS purchase_ts,
           s.ts AS signup_ts,
           CAST(date_diff('second', s.ts, p.ts) AS BIGINT) AS secs_since_signup
    FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest signup at-or-before
    it, per user — the time-series operator Spark lacks natively (the
    reference lacks everything; this is SURVEY §2.3 custom-operator
    territory, oracle'd against DuckDB's native ASOF JOIN).

    Implemented as the scalable union + window-carry form: tag both sides,
    sort by (ts, side) within the user partition, and carry the last seen
    right-side timestamp forward. ONE shuffle on the join key and a local
    sort — no range join, no per-row probe, state is O(1) per key. This is
    the distributed as-of plan that survives 100 TB; a naive
    range-join/backward-probe formulation is quadratic in events per user.
    The (ts, is_purchase) sort order puts signups first at equal
    timestamps, giving the inclusive ``purchase.ts >= signup.ts`` match.
    """
    ev = tables.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_p")
    )
    u = p.unionByName(s)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    signup_ts = F.last(
        F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        u.withColumn("signup_ts", signup_ts)
        .filter((F.col("is_p") == 1) & F.col("signup_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "signup_ts",
            (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.col("signup_ts").cast("timestamp"))
            ).alias("secs_since_signup"),
        )
    )


@register(
    "q_agg_approx_pct",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile contract check (like q_agg_approx for HLL):
    the sketch estimate must land within 5% of the exact median. The
    sketch (``approx_percentile``) is the 100 TB path — mergeable
    map-side, bounded memory — while exact percentiles sort per group."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias(
                "exact_median"
            ),
            F.approx_percentile(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("approx_median"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            (
                F.abs(F.col("approx_median") - F.col("exact_median"))
                <= 0.05 * F.col("exact_median")
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "q_subquery",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + correlated-EXISTS subqueries through the SQL API. Catalyst
    rewrites the scalar subquery to a broadcast of one row and the EXISTS
    to a left-semi join — no per-row re-execution."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """
    )


@register(
    "q_sql_local_supplier",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_sql_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier-volume query: the 6-table join
    (fact ⋈ fact ⋈ 2 dims ⋈ 2 bounded dims) with a same-nation residual —
    the join-ordering workout of the relational surface.

    Scale: the date filter pushes into the orders scan BEFORE any join;
    lineitem joins the filtered orders (the most selective pair first);
    customer/supplier shuffle on their natural keys with the same-nation
    predicate as a cheap residual; nation/region are bounded (25/5 rows at
    any SF) and broadcast.  Catalyst+AQE own the join order — the
    DataFrame declares exactly the Q5 graph.
    """
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom GROUPING SETS — the grouping variant ROLLUP/CUBE cannot
    express (here: both single-dimension margins plus the full cross, but
    NOT the grand total).  Written through the SQL-text entry point since
    the DataFrame API exposes only rollup/cube; Catalyst expands the sets
    into one Expand + a single hash aggregate.

    Scale: the Expand multiplies input rows by the number of sets (3×)
    BEFORE partial aggregation — still one shuffle, with map-side combine
    collapsing each set's tiny key space; at very high set counts the
    standard rewrite is per-set partial aggs unioned, which Catalyst
    performs automatically when beneficial.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
        """
    )


@register(
    "q_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, v.t_view, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id, v.t_view
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase,
           ROUND((SELECT COUNT(*) FROM c) * 1.0
                 / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): a user
    advances a stage only with an event STRICTLY AFTER their previous
    stage's first event — the product-analytics query (Amplitude/Mixpanel
    funnels) that plain grouped counts cannot express.

    Scale: three narrow per-user aggs, each one shuffle on user_id (AQE
    reuses the partitioning); stage frames carry one row per qualifying
    user, so the joins are dimension-sized.  The final counts collapse to
    a single row."""
    events = tables.load(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # one conditional agg over the tagged union — no 1-row cross joins
    tagged = (
        v.select(F.lit("view").alias("stage"))
        .unionAll(c.select(F.lit("click").alias("stage")))
        .unionAll(p.select(F.lit("purchase").alias("stage")))
    )
    counts = tagged.agg(
        F.count(F.when(F.col("stage") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("stage") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("stage") == "purchase", 1)).alias("n_purchase"),
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        # nullif: a stage with zero events yields NULL rates exactly like
        # the oracle (DuckDB x/0 is NULL; Spark's ANSI divide would raise)
        F.round(
            F.col("n_click").cast("double")
            / F.nullif(F.col("n_view").cast("double"), F.lit(0.0)),
            6,
        ).alias("view_to_click"),
        F.round(
            F.col("n_purchase").cast("double")
            / F.nullif(F.col("n_click").cast("double"), F.lit(0.0)),
            6,
        ).alias("click_to_purchase"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT cohort_day,
           CAST(FLOOR(datediff('day', cohort_day, CAST(ts AS DATE)) / 7)
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first_day f ON e.user_id = f.user_id
    GROUP BY cohort_day, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day, counted
    per whole week of continued activity — the retention triangle behind
    every growth dashboard.

    The offset is days-since-cohort-day / 7 (floored), deliberately
    avoiding calendar-week truncation so the two engines cannot disagree
    on week-start conventions.  Scale: first-touch agg is one shuffle on
    user_id; the join back is user-dimension-sized; the distinct count
    shuffles on the (cohort, offset) key with partial aggregation."""
    events = tables.load(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    return (
        events.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7
            ).alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def _scd2_frame(events: DataFrame) -> DataFrame:
    """Versioned signup intervals shared by q_scd2 (which reports them) and
    q_join_temporal (which probes them): one definition so the tie-break,
    versioning, and rounding cannot drift between producer and consumer."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.round("value", 4).alias("profile_value"),
    )


@register(
    "q_scd2",
    oracle="""
    SELECT user_id,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           ROUND(value, 4) AS value,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 derivation from a change log: each user's 'signup'
    events become versioned dimension rows with [valid_from, valid_to)
    validity, a monotone version number, and an is_current flag — the
    batch upsert-history op warehouses run on every CDC feed (the
    interval-building sibling of q_latest_per_key, which keeps only the
    final version).

    Scale: exactly one shuffle on user_id serving both window functions
    (same partition + order); the (ts, event_id) order is total so
    version numbers are deterministic under timestamp ties."""
    events = tables.load(spark, sf_dir, "events")
    return _scd2_frame(events).select(
        "user_id",
        "valid_from",
        "valid_to",
        "version",
        F.col("profile_value").alias("value"),
        F.col("valid_to").isNull().alias("is_current"),
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           ROUND(l_quantity, 4) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice',
           ROUND(l_extendedprice, 4) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount',
           ROUND(l_discount, 4) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax',
           ROUND(l_tax, 4) FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long, the inverse of q_pivot): the four per-line
    measures melt into (metric, val) rows via the native ``unpivot``
    operator — Catalyst expands it to a generator, so the table is
    scanned ONCE, not once per measure (the UNION ALL oracle is the
    4-scan formulation the operator replaces; at 100 TB that is a 4x
    scan saving).

    The lineitem int column stays out of the value set so the melted
    column keeps one type (double)."""
    lineitem = tables.load(spark, sf_dir, "lineitem")
    melted = lineitem.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return melted.select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("metric", "^l_", "").alias("metric"),
        F.round("val", 4).alias("val"),
    )


@register(
    "q_agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rk = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie-break — native ``mode()``
    leaves ties engine-defined (both Spark's and DuckDB's docs say
    'indeterminate'), so the engine computes it as count + top-1 by
    (count DESC, value ASC): reproducible on any engine.

    Scale: the grouped count gets map-side combine on the
    (status, priority) key; the window runs over at most
    |status| x |priority| rows."""
    orders = tables.load(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


@register(
    "q_sequence_gaps",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), islands AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, anchor, COUNT(*) AS streak_len
      FROM islands GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days via the
    classic date-minus-row_number anchor (rows in one unbroken run share
    an anchor date) — the sessionization-by-calendar op behind streak
    features and engagement scoring.

    Scale: one shuffle on user_id serves the distinct, the window, and
    the grouped count (same key); no self-join, no iteration — the
    anchor trick turns run-detection into plain grouping."""
    events = tables.load(spark, sf_dir, "events")
    days = events.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
    )


@register(
    "q_join_temporal",
    oracle="""
    WITH scd AS (
      SELECT user_id,
             ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS version,
             ROUND(value, 4) AS profile_value
      FROM events WHERE event_type = 'signup'
    )
    SELECT e.event_id, e.user_id, s.version, s.profile_value,
           ROUND(e.value, 4) AS purchase_value
    FROM events e
    JOIN scd s
      ON e.user_id = s.user_id
     AND s.valid_from <= e.ts
     AND (s.valid_to IS NULL OR e.ts < s.valid_to)
    WHERE e.event_type = 'purchase'
    """,
)
def q_join_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-interval) join: each purchase resolved against
    the SCD2 profile version valid AT its event time — the at-time
    attribute lookup every warehouse runs against versioned dimensions
    (q_scd2 builds the intervals; this consumes them).

    Scale: the interval predicate rides on a user_id EQUI join, so this
    is one sort-merge shuffle per side with the range test as a cheap
    post-join filter — never a range-only join.  Intervals per user are
    non-overlapping by construction (lead() partitions time), so each
    purchase matches at most one version and the output size is bounded
    by the purchase count."""
    events = tables.load(spark, sf_dir, "events")
    scd = _scd2_frame(events).withColumnRenamed("user_id", "s_user_id")
    purchases = events.filter(F.col("event_type") == "purchase")
    return (
        purchases.join(
            scd,
            (purchases["user_id"] == scd["s_user_id"])
            & (scd["valid_from"] <= purchases["ts"])
            & (scd["valid_to"].isNull() | (purchases["ts"] < scd["valid_to"])),
        )
        .select(
            "event_id",
            "user_id",
            "version",
            "profile_value",
            F.round("value", 4).alias("purchase_value"),
        )
    )


@register(
    "q_win_ratio",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS price,
           ROUND(o_totalprice / SUM(o_totalprice) OVER
                   (PARTITION BY o_orderstatus), 8) AS share_of_status,
           ROUND(o_totalprice / SUM(o_totalprice) OVER (), 8) AS share_of_total
    FROM orders
    """,
)
def q_win_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its status group and of the
    grand total — the percent-of-total window every BI layer emits.

    The grand total is NOT an unpartitioned window (that funnels every
    row through one reducer): it is a broadcast 1-row aggregate attached
    map-side (q_quantile_buckets' pattern) — identical values, which is
    what the oracle's ``SUM() OVER ()`` checks. Float determinism: the
    broadcast total is one double, and Spark's partial-agg summation
    order vs DuckDB's sequential order could differ in the last ulp —
    but the oracle rounds to 8 dp AFTER a division by a ~1e9-scale
    total, giving ~1e-13 slack, the same tolerance the windowed form
    already relied on (partial aggregation reorders window sums too)."""
    orders = tables.load(spark, sf_dir, "orders")
    w_status = W.partitionBy("o_orderstatus")
    total = orders.agg(F.sum("o_totalprice").alias("_grand_total"))
    return orders.crossJoin(F.broadcast(total)).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
        F.round(
            F.col("o_totalprice") / F.sum("o_totalprice").over(w_status), 8
        ).alias("share_of_status"),
        F.round(
            F.col("o_totalprice") / F.col("_grand_total"), 8
        ).alias("share_of_total"),
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1)            AS all_low_disc,
           bool_or(l_quantity >= 49)              AS any_big_qty,
           CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_high_tax,
           CAST(COUNT(*) AS BIGINT)               AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any/count_if) — the predicate-rollup
    trio behind data-quality dashboards; all three are mergeable partial
    aggs like any sum."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_discount") <= 0.1).alias("all_low_disc"),
        F.some(F.col("l_quantity") >= 49).alias("any_big_qty"),
        F.count_if(F.col("l_tax") > 0.05).cast("long").alias("n_high_tax"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_sql_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: unshipped orders of one
    market segment ranked by outstanding revenue, top 10.

    Scale: both date filters reach their parquet scans (pushdown), the
    segment filter prunes customer before the join, and the two joins
    shuffle on their natural keys with AQE free to broadcast the filtered
    customer side if it fits. The top-10 is a TakeOrderedAndProject —
    partial top-k per partition, only 10 rows ever reach the driver side
    of the exchange. Revenue uses the tie-free cent-rounding convention
    and (revenue DESC, l_orderkey) is a total order, so the LIMIT frontier
    is engine-independent.
    """
    cust = tables.load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tables.load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = tables.load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.floor(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
                    + 0.5
                )
                / 100
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q_agg_sketch_merge",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_users,
           TRUE                      AS merged_within_5pct
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    ``hll_sketch_agg`` / ``hll_union_agg``): partial sketches are built
    per (status, salt) sub-group, then UNIONED per status and estimated —
    the two-level aggregation a 100 TB rollup tree actually runs, where
    per-partition/per-day sketch partials are persisted once and coarser
    grains merge bytes instead of re-scanning raw rows.

    Like ``q_agg_approx``, engines' sketches differ bit-for-bit, so the
    oracle pins the approximation CONTRACT: the merged estimate must land
    within 5% of the exact count (lgConfigK=12 ⇒ rse ≈ 1.6%, so 5% only
    fails if merging is broken — which is exactly what this query guards).

    Scale: level 1 is a hash agg on (status, salt) — 16-way parallel,
    map-side combined, each partial a ~2 KB sketch; level 2 shuffles only
    #status × 16 sketch blobs. The exact side (for the contract check)
    is a standard two-phase distinct; at 100 TB a production pipeline
    drops it and trusts the sketch — the whole point of mergeability.
    """
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey"
    )
    partials = orders.groupBy(
        "o_orderstatus",
        F.pmod(F.hash("o_custkey"), F.lit(16)).alias("salt"),
    ).agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    merged = partials.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users")
    )
    exact = orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("exact_users")
    )
    return exact.join(F.broadcast(merged), "o_orderstatus").select(
        "o_orderstatus",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("merged_within_5pct"),
    )


@register(
    "q_join_overlap",
    oracle="""
    WITH iv AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE)      AS start_d,
             MAX(CAST(l_shipdate AS DATE))  AS end_d
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_custkey, o_orderkey, CAST(o_orderdate AS DATE)
    )
    SELECT a.o_custkey                         AS custkey,
           a.o_orderkey                        AS orderkey_a,
           b.o_orderkey                        AS orderkey_b,
           CAST(date_diff('day',
                GREATEST(a.start_d, b.start_d),
                LEAST(a.end_d, b.end_d)) + 1 AS BIGINT) AS overlap_days
    FROM iv a
    JOIN iv b
      ON  a.o_custkey = b.o_custkey
      AND a.o_orderkey < b.o_orderkey
      AND a.start_d <= b.end_d
      AND b.start_d <= a.end_d
    """,
)
def q_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of orders by the SAME customer
    whose fulfillment intervals [orderdate, last shipdate] overlap, with
    the overlap length in days — the interval-intersection shape behind
    conflict detection, co-occurrence windows, and resource contention.

    Scale: the equi key (custkey) does the heavy lifting — one shuffle
    co-locates each customer's intervals and the overlap predicate runs
    inside the hash-join group, so candidate pairs are bounded by each
    customer's own order count (tens), never all-pairs. The UNKEYED
    variant needs time blocking first — implemented as
    :func:`q_join_overlap_grid` (explode into width-sized grid cells,
    join within cells, keep a pair only in its first shared cell — the
    ownership trick ``q_join_spatial``'s 2-D gridding family uses); same
    bucketed-not-all-pairs structure as the dedup family.
    ``o_orderkey < o_orderkey`` halves the pair space and makes output
    deterministic.
    """
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("start_d"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d"))
    )
    a = iv.alias("a")
    b = iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.start_d") <= F.col("b.end_d"))
            & (F.col("b.start_d") <= F.col("a.end_d")),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            (
                F.datediff(
                    F.least("a.end_d", "b.end_d"),
                    F.greatest("a.start_d", "b.start_d"),
                )
                + 1
            ).cast("long").alias("overlap_days"),
        )
    )


#: Grid-cell width for the unkeyed overlap join, microseconds (1 h) —
#: must be >= the maximum interval length (5 + 55 min) so an interval
#: spans at most 2 cells and the explode fan-out is bounded by 2x.
_OVERLAP_CELL_US = 3_600_000_000


def grid_overlap_pairs(iv: DataFrame, cell_us: int) -> DataFrame:
    """Unkeyed interval-overlap self-join via time-grid blocking over an
    ``(event_id long, s long, e long)`` frame with ``s <= e`` (closed
    intervals, integer coordinates, non-negative).

    Each interval explodes into every ``cell_us``-wide cell it spans,
    both sides equi-join on the cell, the overlap predicate runs inside
    the hash-join group, and a pair is kept only in its FIRST SHARED
    cell — ``greatest(s_a, s_b) div cell_us``, a cell both intervals
    occupy whenever they overlap (max start <= min end) — so the dedup
    is a filter, not a second shuffle. Correct for ANY cell width >= 1
    and any interval length (the width >= max-length choice in
    :func:`q_join_overlap_grid` only bounds the explode fan-out at 2x);
    the cell-boundary cases are pinned property-style against the naive
    all-pairs join in tests/test_randomized_oracle.py.
    """
    cells = iv.select(
        "event_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s div {cell_us}"),
                F.expr(f"e div {cell_us}"),
            )
        ).alias("cell"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .filter(
            F.col("a.cell") == F.expr(f"greatest(a.s, b.s) div {cell_us}")
        )
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).cast("long").alias("overlap_us"),
        )
    )
#: Per-event session length, minutes: 5 + event_id % 56 in [5, 60] —
#: derive-not-synthesize (the q_join_spatial discipline), so the oracle
#: replicates it verbatim and re-executed tasks agree.
_OVERLAP_DUR_SQL = "(5 + event_id % 56) * 60000000"


@register(
    "q_join_overlap_grid",
    oracle=f"""
    WITH iv AS (
      SELECT event_id, epoch_us(ts) AS s,
             epoch_us(ts) + {_OVERLAP_DUR_SQL} AS e
      FROM events
      WHERE event_type = 'purchase' AND value > 50 AND ts IS NOT NULL
    )
    SELECT a.event_id AS event_a,
           b.event_id AS event_b,
           CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT)
             AS overlap_us
    FROM iv a
    JOIN iv b
      ON a.event_id < b.event_id AND a.s <= b.e AND b.s <= a.e
    """,
)
def q_join_overlap_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNKEYED interval-overlap self-join via time-grid blocking — the
    scale path :func:`q_join_overlap`'s docstring promises: pairs of
    high-value purchase sessions (interval [ts, ts + 5..60 min], length
    derived from the event key) that overlap in time, across ALL users —
    no equi key exists, so the naive plan is an all-pairs theta join.

    The grid plan: each interval is exploded into every 1 h cell it
    spans (<= 2, because cell width >= max interval length), both sides
    join on the CELL equi key, the overlap predicate runs inside the
    hash-join group, and a pair is kept only in its FIRST SHARED cell —
    ``floor(greatest(s_a, s_b) / width)``, a cell both intervals provably
    occupy when they overlap — so no pair is emitted twice (the
    ownership trick 2-D gridding uses in :func:`q_join_spatial`'s
    family). The ORACLE runs the naive all-pairs form; agreement proves
    the blocking is exactness-preserving. All arithmetic is integer
    microseconds (unix_micros vs epoch_us, the timeseries convention).

    Scale: work is candidates-only — each cell's occupancy is bounded by
    local temporal density, never the corpus; one shuffle on cell_id
    replaces the unbounded theta join (Spark would otherwise
    BroadcastNestedLoop this). Output (and candidate) count grows with
    density^2 per cell — the honest envelope for UNkeyed overlap under
    the sf1 fixture's density-10x construction is ~100x pairs (measured
    in SF1_BENCH.json) while runtime stays scan-bound until pair volume
    dominates; at production scale `width` is sized so cell occupancy
    stays bounded (narrower cells = more, smaller groups). Skewed hot
    cells would salt exactly like q_dedup_ngram's df cap.
    """
    events = tables.load(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = events.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") > 50)
        & F.col("ts").isNotNull()
    ).select(
        "event_id",
        s.alias("s"),
        (s + (F.lit(5) + F.col("event_id") % 56) * 60_000_000).alias("e"),
    )
    # integer `div` (== floor for the non-negative epoch-us domain), not
    # double /: cell indices stay in exact long arithmetic end to end
    return grid_overlap_pairs(iv, _OVERLAP_CELL_US)


@register(
    "q_agg_grouping_id",
    oracle="""
    SELECT CASE WHEN GROUPING(r_name) = 1 THEN NULL ELSE r_name END AS region_name,
           CASE WHEN GROUPING(n_name) = 1 THEN NULL ELSE n_name END AS nation_name,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT)                                AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with ``grouping_id()`` — the disambiguator q_agg_rollup's
    COALESCE trick cannot provide: a REAL NULL group value and the
    rolled-up subtotal row both print NULL, and only the grouping bitmask
    tells them apart (gid: 0=detail, 1=per-region subtotal, 3=grand
    total). Runs through the SQL-text API; DuckDB spells the bitmask via
    per-column GROUPING() (its GROUPING_ID argument rules differ, the
    arithmetic is identical).

    Scale: same single expand + hash-agg as any ROLLUP — the grouping id
    is a constant per grouping set, free in the aggregate."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name AS region_name,
               n_name AS nation_name,
               CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid,
               COUNT(*)                                    AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        """
    )


@register(
    "q_sql_lateral",
    oracle="""
    SELECT n.n_name AS nation_name,
           t.c_name AS customer_name,
           t.bal    AS acctbal
    FROM nation n,
         LATERAL (
           SELECT c_name, ROUND(c_acctbal, 2) AS bal
           FROM customer
           WHERE c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_name
           LIMIT 2
         ) t
    """,
)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL-text API: the top-2
    customers by balance per nation, expressed as a per-row dependent
    subquery — the SQL shape ORMs and BI tools emit for "top N per
    group" joins.

    Catalyst DECORRELATES this into the same window/top-k plan as
    `q_topk` (DecorrelateInnerQuery + WindowGroupLimit) — no per-nation
    re-execution survives optimization, which is exactly why the lateral
    form is safe at 100 TB. The ORDER BY carries a name tiebreak so the
    LIMIT cutoff is total on both engines."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation_name,
               t.c_name AS customer_name,
               t.bal    AS acctbal
        FROM nation n,
             LATERAL (
               SELECT c_name, ROUND(c_acctbal, 2) AS bal
               FROM customer
               WHERE c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name
               LIMIT 2
             ) t
        """
    )


@register(
    "q_sql_recursive",
    oracle="""
    WITH RECURSIVE days(d) AS (
      SELECT DATE '1998-07-01'
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '1998-07-31'
    )
    SELECT CAST(d AS DATE)            AS day,
           CAST(COALESCE(COUNT(o_orderkey), 0) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2)       AS day_revenue
    FROM days
    LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
    GROUP BY d
    """,
)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4) through the SQL-text API: a
    gap-free calendar dimension generated by recursion, left-joined to
    daily order aggregates so quiet days report ZERO instead of
    vanishing — the classic zero-fill reporting shape, and the smoke
    test that the engine's recursion execution (UnionLoop) works.

    Scale: the recursive member produces one row per day — the loop is
    31 driver-side-planned iterations over kilobytes, and the real data
    is touched ONCE by the join (broadcast: the calendar is tiny). An
    unbounded-frontier recursion (graph closure) instead belongs to the
    iterative DataFrame loop (`q_graph_pagerank`, `q_dedup_clusters`)
    where each round is one shuffle and lineage is checkpointed."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
          SELECT DATE '1998-07-01'
          UNION ALL
          SELECT d + INTERVAL '1' DAY FROM days WHERE d < DATE '1998-07-31'
        )
        SELECT d                                   AS day,
               COUNT(o_orderkey)                   AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS day_revenue
        FROM days
        LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
        GROUP BY d
        """
    )


@register(
    "q_agg_minmax_by",
    oracle="""
    WITH o AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000
               + o_orderkey AS ord
      FROM orders
    )
    SELECT o_orderstatus,
           arg_max(o_orderkey, ord)                     AS priciest_order,
           ROUND(arg_max(o_totalprice, ord), 2)         AS top_price,
           arg_min(o_orderkey, ord)                     AS cheapest_order,
           ROUND(arg_min(o_totalprice, ord), 2)         AS bottom_price
    FROM o
    GROUP BY o_orderstatus
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregates (``min_by`` / ``max_by``): the key of the
    extreme row per group WITHOUT a self-join or window — "which order
    was the priciest per status" in one aggregate.

    Ties: min_by/max_by pick an arbitrary winner among equal ordering
    values, so the ordering key is made TOTAL by packing tie-free integer
    cents with the orderkey into one BIGINT (cents·10^7 + key; both
    engines compute the identical long). Scale: a plain hash aggregate —
    partial min/max of (ord, payload) pairs map-side, one #groups-row
    result; the window/top-k formulation (`q_topk`) shuffles the table,
    this shuffles one row per group per partition."""
    orders = tables.load(spark, sf_dir, "orders")
    ord_col = (
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long") * 10000000
        + F.col("o_orderkey")
    )
    o = orders.select(
        "o_orderstatus", "o_orderkey", "o_totalprice", ord_col.alias("ord")
    )
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", F.col("ord")).alias("priciest_order"),
        F.round(F.max_by("o_totalprice", F.col("ord")), 2).alias("top_price"),
        F.min_by("o_orderkey", F.col("ord")).alias("cheapest_order"),
        F.round(F.min_by("o_totalprice", F.col("ord")), 2).alias(
            "bottom_price"
        ),
    )


@register(
    "q_agg_bitmap",
    oracle="""
    WITH words AS (
      SELECT s_nationkey,
             s_suppkey // 63 AS widx,
             bit_or(CAST(1 AS BIGINT) << CAST(s_suppkey % 63 AS INT)) AS word
      FROM supplier
      GROUP BY s_nationkey, s_suppkey // 63
    )
    SELECT s_nationkey,
           CAST(SUM(bit_count(word)) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT)             AS n_words
    FROM words
    GROUP BY s_nationkey
    """,
)
def q_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct aggregation: supplier ids folded into 63-bit
    bitmap words (``bit_or`` per (nation, word-index)), distinct count =
    popcount sum — the roaring-bitmap/bitmap-index idea as plain longs.
    63-bit words sidestep the sign bit (shifting into bit 63 overflows
    DuckDB and flips sign in two's complement).

    Scale: vs COUNT(DISTINCT), the bitmap form's state is one long per
    64-id range PER GROUP — mergeable by OR (map-side combine does it),
    rebuildable incrementally (OR new day's words in — same pattern as
    `q_agg_sketch_merge` but EXACT), and intersectable across groups by
    AND for distinct-overlap queries. The trade: state is O(id-domain/63)
    per group, so it fits dense surrogate-key domains (dimension ids),
    not sparse 64-bit hashes — those take HLL."""
    supp = tables.load(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_suppkey"
    )
    words = supp.groupBy(
        "s_nationkey",
        F.expr("s_suppkey div 63").alias("widx"),
    ).agg(
        # F.shiftleft only takes a literal shift amount — expr() for the
        # per-row bit position
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(s_suppkey % 63 AS INT))")
        ).alias("word")
    )
    return words.groupBy("s_nationkey").agg(
        F.sum(F.bit_count("word")).alias("n_suppliers"),
        F.count("*").alias("n_words"),
    )


@register(
    "q_agg_regr",
    oracle="""
    SELECT l_returnflag,
           REGR_COUNT(l_extendedprice, l_quantity)               AS n_pairs,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6)     AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(REGR_R2(l_extendedprice, l_quantity), 6)        AS r2,
           ROUND(REGR_AVGX(l_extendedprice, l_quantity), 6)      AS avgx,
           ROUND(REGR_AVGY(l_extendedprice, l_quantity), 4)      AS avgy
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (SQL:2003 REGR_* family): slope,
    intercept, R², per-axis means and pair count of price-on-quantity,
    per return flag.

    Scale: all six are moment sketches (sums of x, y, x², xy and a
    count) — single-pass, mergeable, partial-aggregated map-side like
    any SUM; no second pass over the data. Spark evaluates them
    JVM-side inside whole-stage codegen. DuckDB shares the SQL-standard
    definitions; outputs are rounded on both sides because the moment
    sums accumulate doubles in different orders. REGR_COUNT is BIGINT
    in both engines.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n_pairs"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avgx"),
        F.round(F.regr_avgy(y, x), 4).alias("avgy"),
    )


@register(
    "q_agg_money",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(c) AS BIGINT)                                   AS sum_cents,
           CAST(CAST(SUM(c) AS DECIMAL(20,2)) / 100
                AS DECIMAL(20,2))                                   AS total_price,
           CAST(CAST(MIN(c) AS DECIMAL(20,2)) / 100
                AS DECIMAL(20,2))                                   AS min_price,
           CAST(CAST(MAX(c) AS DECIMAL(20,2)) / 100
                AS DECIMAL(20,2))                                   AS max_price,
           COUNT(*)                                                 AS n
    FROM cents
    GROUP BY l_returnflag
    """,
)
def q_agg_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money aggregation: price totals carried as integer cents
    (BIGINT) and presented as DECIMAL(20,2) — the fixed-point discipline a
    financial pipeline needs at 100 TB, where double SUM drifts with
    partial-aggregation order and decimal columns are the lossless
    interchange type.

    Cents conversion uses the repo's tie-stable ``floor(x*100 + 0.5)`` on
    BOTH sides (module conventions), so the two engines quantize the same
    binary double identically; every aggregate after that is exact integer
    arithmetic, and the decimal presentation divides a <=2-decimal value —
    no rounding anywhere downstream.  Scale: SUM/MIN/MAX/COUNT over a
    single groupBy — partial-aggregated, codegen, one small-key exchange;
    integer cents also make the agg state 8 bytes instead of a 16-byte
    decimal accumulator."""
    li = tables.load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    as_price = lambda c: F.expr(  # noqa: E731 - local presentation helper
        f"CAST(CAST({c} AS DECIMAL(20,2)) / 100 AS DECIMAL(20,2))"
    )
    return (
        li.select("l_returnflag", cents.alias("c"))
        .groupBy("l_returnflag")
        .agg(
            F.sum("c").alias("sum_cents"),
            F.min("c").alias("min_c"),
            F.max("c").alias("max_c"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "sum_cents",
            as_price("sum_cents").alias("total_price"),
            as_price("min_c").alias("min_price"),
            as_price("max_c").alias("max_price"),
            "n",
        )
    )


@register(
    "q_agg_mad",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(MAX(m.med), 4)                                    AS qty_median,
           ROUND(quantile_cont(ABS(l.l_quantity - m.med), 0.5), 4) AS qty_mad
    FROM lineitem l JOIN med m USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion: median absolute deviation of quantity per return
    flag — the outlier-resistant spread statistic (std dev is hostage to
    one bad row; MAD isn't), and the canonical TWO-PASS aggregate: pass 1
    computes each group's exact interpolated median, pass 2 re-scans
    scoring |x - median| and takes the median of that.

    Scale: the per-group median frame is group-cardinality-sized —
    broadcast here (3 groups); at high group cardinality it becomes a
    shuffle join on the group key whose exchange pass 2's groupBy then
    reuses (one effective shuffle).  Exact percentile, not approx: both
    engines interpolate identically, so only presentation rounding is
    needed."""
    li = tables.load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.max("med"), 4).alias("qty_median"),
            F.round(
                F.percentile(F.abs(F.col("l_quantity") - F.col("med")), F.lit(0.5)),
                4,
            ).alias("qty_mad"),
        )
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    pairs AS (
      SELECT p.event_id, p.user_id, p.ts AS purchase_ts, s.ts AS signup_ts,
             ABS(epoch_us(p.ts) - epoch_us(s.ts)) AS adiff
      FROM p JOIN s ON p.user_id = s.user_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_id ORDER BY adiff, signup_ts) AS rn
      FROM pairs
    )
    SELECT event_id, user_id, purchase_ts, signup_ts,
           CAST(epoch_us(purchase_ts) - epoch_us(signup_ts) AS BIGINT)
             AS usecs_offset
    FROM ranked WHERE rn = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: each purchase matched to the signup closest in
    time in EITHER direction (sensor/series alignment semantics — pandas
    ``merge_asof(direction='nearest')``), ties resolved toward the
    earlier (backward) signup.

    Same scalable union form as q_join_asof, now with two O(1)-state
    passes over ONE sorted partition: a running last-signup-at-or-before
    (backward carry) and a running first-signup-after (forward carry) —
    both windows share the (ts, side, event_id) ordering, so Spark plans
    one shuffle and ONE local sort for the pair. The nearest pick is a
    scalar comparison of exact microsecond deltas. The oracle is an
    INDEPENDENT formulation (all purchase x signup pairs per user,
    ROW_NUMBER by |delta| with the same tiebreak) — quadratic per user,
    fine for DuckDB at gate scale, exactly the plan the union-carry form
    exists to avoid at 100 TB.
    """
    ev = tables.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_p")
    )
    u = p.unionByName(s)
    # equal timestamps: signups sort BEFORE purchases, so an equal-ts
    # signup is visible to the backward carry (diff 0, always wins) and
    # excluded from the forward frame — inclusive match, counted once.
    order = ["ts", "is_p", "event_id"]
    wb = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.unboundedPreceding, 0
    )
    wf = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        0, W.unboundedFollowing
    )
    sig_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    carried = (
        u.withColumn("back_ts", F.last(sig_ts, ignorenulls=True).over(wb))
        .withColumn("fwd_ts", F.first(sig_ts, ignorenulls=True).over(wf))
        .filter(F.col("is_p") == 1)
        .filter(F.col("back_ts").isNotNull() | F.col("fwd_ts").isNotNull())
    )
    bd = us(F.col("ts")) - us(F.col("back_ts"))
    fd = us(F.col("fwd_ts")) - us(F.col("ts"))
    nearest = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(fd < bd, F.col("fwd_ts"))
        .otherwise(F.col("back_ts"))  # tie -> earlier (backward) signup
    )
    return carried.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        nearest.alias("signup_ts"),
        (us(F.col("ts")) - us(nearest)).alias("usecs_offset"),
    )


@register(
    "q_feat_winsorize",
    oracle="""
    WITH raw AS (
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.05) AS lo_raw,
             quantile_cont(o_totalprice, 0.95) AS hi_raw
      FROM orders GROUP BY o_orderstatus
    ), cuts AS (
      SELECT o_orderstatus,
             FLOOR(lo_raw * 10000 + 0.5) / 10000 AS lo,
             FLOOR(hi_raw * 10000 + 0.5) / 10000 AS hi
      FROM raw
    )
    SELECT o_orderkey, o.o_orderstatus,
           ROUND(CASE WHEN o_totalprice < lo THEN lo
                      WHEN o_totalprice > hi THEN hi
                      ELSE o_totalprice END, 4) AS price_winsor,
           (o_totalprice < lo OR o_totalprice > hi) AS clipped
    FROM orders o JOIN cuts c ON o.o_orderstatus = c.o_orderstatus
    """,
)
def q_feat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — per-group percentile clipping (values outside
    [p5, p95] snapped to the boundary), the outlier-robust feature
    cleaning every tabular ML pipeline runs before normalization, plus
    a clipped flag for monitoring the tail mass.

    Shape: exact per-group percentiles via ONE aggregate over the scan
    (3-row cutpoint frame), broadcast back, then a map-only clip — the
    same aggregate-then-broadcast pattern as q_anomaly_zscore, never a
    whole-partition window (which would shuffle the table into one
    partition per status: the skew worst case). Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share linear
    interpolation SEMANTICS but not float expression form
    ((1-f)*lo+f*hi vs lo+f*(hi-lo)): on input [21,21,40] DuckDB yields
    21.000000000000004 where Spark yields exactly 21.0, and an
    unrounded cutpoint feeding ``<`` flips ``clipped`` on any value
    tied with the boundary (round-3 verdict item #1; falsified by
    hypothesis in test_randomized_oracle.py). Fix: the cutpoints are
    tie-free-ROUNDED to 4dp (floor(x*1e4+0.5)/1e4) on BOTH engines
    before the compare/clip. 4dp is boundary-safe here: with 2dp
    prices and percentile fractions that are multiples of 0.05, the
    exact cutpoint is a multiple of 0.0005 — never on a 4dp half-ulp
    boundary — so a ~1e-9 cross-engine drift cannot flip the floor.

    Scale: at 100 TB exact percentiles become the bottleneck (they
    gather per-group value multisets); the drop-in is
    ``approx_percentile`` with a bounded error — same plan shape, the
    q_agg_approx_pct contract covers its accuracy.
    """
    orders = tables.load(spark, sf_dir, "orders")
    tf_round = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    cuts = orders.groupBy("o_orderstatus").agg(
        tf_round(F.percentile("o_totalprice", F.lit(0.05))).alias("lo"),
        tf_round(F.percentile("o_totalprice", F.lit(0.95))).alias("hi"),
    )
    joined = orders.join(F.broadcast(cuts), "o_orderstatus")
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return joined.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(clipped, 4).alias("price_winsor"),
        (
            (F.col("o_totalprice") < F.col("lo"))
            | (F.col("o_totalprice") > F.col("hi"))
        ).alias("clipped"),
    )


@register(
    "q_feat_winsorize_approx",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           FLOOR(quantile_cont(o_totalprice, 0.05) * 10000 + 0.5) / 10000
             AS lo_exact,
           FLOOR(quantile_cont(o_totalprice, 0.95) * 10000 + 0.5) / 10000
             AS hi_exact,
           TRUE AS lo_rank_ok,
           TRUE AS hi_rank_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_feat_winsorize_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of q_feat_winsorize: percentile cutpoints from the
    ``approx_percentile`` sketch (mergeable map-side, bounded memory)
    instead of exact ``percentile`` (which gathers per-group value
    multisets — the bottleneck the exact form's docstring warns about).

    Contract-style oracle (the q_agg_approx_pct pattern): DuckDB
    recomputes the EXACT cutpoints and pins the contract booleans TRUE;
    Spark additionally verifies the sketch against the guarantee GK
    actually makes — RANK error ≤ n/accuracy — not a value band: with a
    second conditional-aggregate pass, count(x < approx_lo) must sit
    within ±(n/accuracy + 1) of rank 0.05·n (ditto 0.95 for hi). A
    value-distance contract would flake wherever the tail is spread out
    or a tiny group makes interpolation land between elements; the rank
    bound is the sketch's theorem and holds for every distribution.

    Shape: aggregate → broadcast the 3-row cutpoint frame → one
    conditional re-aggregate; both passes map-side-combine.
    """
    orders = tables.load(spark, sf_dir, "orders")
    acc = 10000
    tf_round = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    cuts = orders.groupBy("o_orderstatus").agg(
        tf_round(F.percentile("o_totalprice", F.lit(0.05))).alias("lo_exact"),
        tf_round(F.percentile("o_totalprice", F.lit(0.95))).alias("hi_exact"),
        F.approx_percentile(
            "o_totalprice", F.lit(0.05), F.lit(acc)
        ).alias("alo"),
        F.approx_percentile(
            "o_totalprice", F.lit(0.95), F.lit(acc)
        ).alias("ahi"),
    )
    x = F.col("o_totalprice")
    ranked = (
        orders.join(F.broadcast(cuts), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.max("lo_exact").alias("lo_exact"),
            F.max("hi_exact").alias("hi_exact"),
            F.sum((x < F.col("alo")).cast("long")).alias("n_lt_alo"),
            F.sum((x <= F.col("alo")).cast("long")).alias("n_le_alo"),
            F.sum((x < F.col("ahi")).cast("long")).alias("n_lt_ahi"),
            F.sum((x <= F.col("ahi")).cast("long")).alias("n_le_ahi"),
        )
    )
    n = F.col("n_rows").cast("double")
    slack = n / acc + 1
    rank_ok = lambda p, lt, le: (
        (F.col(lt) <= p * n + slack) & (F.col(le) >= p * n - slack)
    )
    return ranked.select(
        "o_orderstatus",
        "n_rows",
        "lo_exact",
        "hi_exact",
        rank_ok(0.05, "n_lt_alo", "n_le_alo").alias("lo_rank_ok"),
        rank_ok(0.95, "n_lt_ahi", "n_le_ahi").alias("hi_rank_ok"),
    )


@register(
    "q_agg_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE)   AS n,
             SUM(l_quantity)            AS s1,
             SUM(l_quantity * l_quantity) AS s2,
             SUM(l_quantity * l_quantity * l_quantity) AS s3,
             SUM(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                 / POWER(NULLIF(s2/n - (s1/n)*(s1/n), 0.0), 1.5), 6)
             AS skewness,
           ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                  - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                 / POWER(NULLIF(s2/n - (s1/n)*(s1/n), 0.0), 2) - 3, 6)
             AS kurtosis
    FROM s
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments — population skewness and excess
    kurtosis per return flag — computed from RAW power sums with
    identical algebra on both engines, NOT from the built-ins: Spark's
    ``skewness``/``kurtosis`` are population-form while DuckDB's are
    sample-bias-corrected (Fisher), so the built-ins legitimately
    disagree; the moment algebra (m_k from s_1..s_4) is the portable
    ground truth, and incidentally the MERGEABLE form — power sums add
    across partitions, which is how any distributed engine implements
    these anyway (one map-side-combined aggregate, 3-row result).

    Zero-variance groups NULL out via the ANSI nullif guard on m2.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m1 * m1
    m3 = F.col("s3") / F.col("n") - 3 * m1 * (F.col("s2") / F.col("n")) + 2 * m1 * m1 * m1
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m1 * (F.col("s3") / F.col("n"))
        + 6 * m1 * m1 * (F.col("s2") / F.col("n"))
        - 3 * m1 * m1 * m1 * m1
    )
    guard = F.nullif(m2, F.lit(0.0))
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(m3 / F.pow(guard, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(guard, 2) - 3, 6).alias("kurtosis"),
    )


@register(
    "q_agg_gini",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS i
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR((2.0 * SUM(i * o_totalprice) / (COUNT(*) * SUM(o_totalprice))
                  - (COUNT(*) + 1.0) / COUNT(*)) * 1000000 + 0.5) / 1000000
             AS gini
    FROM ranked
    GROUP BY o_orderstatus
    """,
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per status — the concentration /
    inequality metric (revenue concentration, whale detection) in its
    sorted-rank closed form: G = 2*Sum(i * x_(i)) / (n * Sum(x)) -
    (n+1)/n over values ranked ascending within the group.

    Plan: ONE shuffle + local sort gives the within-group ranks (total
    order via the o_orderkey tiebreak, so both engines weight ties
    identically), then a grouped aggregate over the same partitioning —
    AQE reuses the exchange. The two sums accumulate in the same
    within-group order on both engines, and the output is tie-free
    floor-rounded at 6dp.

    Scale: rank-based Gini needs the per-group sort — at 100 TB that is
    the same cost class as any windowed analytic (one skew-aware
    shuffle); the approximation path is a quantile-sketch Lorenz curve
    (percentile_approx at k points), trading exactness for a
    sketch-merge plan.
    """
    orders = tables.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("i"),
    )
    n = F.count("*")
    gini = (
        2.0 * F.sum(F.col("i") * F.col("o_totalprice")) / (n * F.sum("o_totalprice"))
        - (n + 1.0) / n
    )
    return ranked.groupBy("o_orderstatus").agg(
        n.cast("long").alias("n_orders"),
        (F.floor(gini * 1000000 + 0.5) / 1000000).alias("gini"),
    )


_HIST_BUCKETS = 10


@register(
    "q_agg_histogram",
    oracle=f"""
    WITH rng AS (
      SELECT event_type,
             FLOOR(MIN(value) * 100) / 100   AS lo,
             CEIL(MAX(value) * 100) / 100    AS hi
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), bucketed AS (
      SELECT e.event_type,
             CAST(COALESCE(LEAST({_HIST_BUCKETS} - 1,
               FLOOR((e.value - r.lo) * {_HIST_BUCKETS}
                     / NULLIF(r.hi - r.lo, 0))), 0) AS INT) AS bucket,
             r.lo, r.hi
      FROM events e JOIN rng r USING (event_type)
      WHERE e.value IS NOT NULL
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(lo + bucket * (hi - lo) / {_HIST_BUCKETS}, 6)       AS bucket_lo,
           ROUND(lo + (bucket + 1) * (hi - lo) / {_HIST_BUCKETS}, 6) AS bucket_hi
    FROM bucketed
    GROUP BY event_type, bucket, lo, hi
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per series with DATA-DERIVED edges — the
    profiling primitive behind distribution dashboards and drift inputs
    (q_drift_psi consumes fixed bins; this derives them).

    Engine-computed-threshold discipline (the winsorize bug class): the
    range edges are snapped to integer cents (FLOOR/CEIL of MIN/MAX —
    exact-rounded ops on identical doubles, no summation-order exposure),
    and each bucket index is FLOOR((v − lo)·n / (hi − lo)) where every
    operand is bit-identical on both engines, so a value exactly on a
    bucket boundary bins identically — no rounded-compare needed. A
    constant series (hi = lo) nullif-guards into bucket 0. Max values
    land in the last bucket via LEAST(n−1, ·), the standard closed-top
    convention.

    Scale: two hash aggregates over one scan shape — (type → min/max) is
    a tiny broadcast back onto the big side, bucketing is a map-only
    expression, and the final (type, bucket) agg partial-combines to at
    most types × {_HIST_BUCKETS} rows per partition.
    """
    ev = tables.load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    rng = ev.groupBy("event_type").agg(
        (F.floor(F.min("value") * 100) / 100).alias("lo"),
        (F.ceil(F.max("value") * 100) / 100).alias("hi"),
    )
    n = F.lit(_HIST_BUCKETS)
    bucket = F.coalesce(
        F.least(
            n - 1,
            F.floor(
                (F.col("value") - F.col("lo")) * n
                / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
            ),
        ),
        F.lit(0),
    ).cast("int")
    return (
        ev.join(F.broadcast(rng), "event_type")
        .withColumn("bucket", bucket)
        .groupBy("event_type", "bucket", "lo", "hi")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bucket",
            "n",
            F.round(
                F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / n, 6
            ).alias("bucket_lo"),
            F.round(
                F.col("lo") + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / n,
                6,
            ).alias("bucket_hi"),
        )
    )


@register(
    "q_assoc_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM baskets
    ), brand_cnt AS (
      SELECT p_brand, COUNT(*) AS cnt FROM baskets GROUP BY p_brand
    ), pair_cnt AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             COUNT(*) AS cnt_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
    )
    SELECT p.brand_a, p.brand_b,
           p.cnt_ab AS support_cnt,
           ROUND(CAST(p.cnt_ab AS DOUBLE) / CAST(n.n_baskets AS DOUBLE), 6)
             AS support,
           ROUND(CAST(p.cnt_ab AS DOUBLE) / CAST(ca.cnt AS DOUBLE), 6)
             AS confidence,
           ROUND((CAST(p.cnt_ab AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
                 / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)), 6)
             AS lift
    FROM pair_cnt p
    JOIN brand_cnt ca ON ca.p_brand = p.brand_a
    JOIN brand_cnt cb ON cb.p_brand = p.brand_b
    CROSS JOIN n
    WHERE p.cnt_ab >= 20
    """,
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    brand pair co-occurring in >=20 orders, emit support, confidence of
    the a->b rule, and lift — the classic frequent-itemset surface
    (Agrawal-Srikant a-priori at k=2) behind recommendation features.

    Scale: baskets come from one broadcast join (part is the small dim)
    collapsed straight to per-order sorted brand ARRAYS with a single
    groupBy(l_orderkey) — the ONLY corpus-sized shuffle in the plan. The
    earlier form (distinct pairs + a basket self-join on l_orderkey) paid
    that wide shuffle twice and re-evaluated the basket subtree in four
    plan branches; the array form generates the <=C(7,2) per-order pairs
    with an in-partition nested transform (the data model bounds basket
    width at ~7 brands) and the persisted basket frame feeds all three
    consumers (total, per-brand, per-pair) without recompute. sf0.1:
    2.75 s -> 0.72 s median. Counts shuffle on the (brand_a, brand_b)
    pair key (25 brands -> <=300 groups, map-side combined) and the
    brand/total frames are broadcast back. Cross-engine floats: every
    output is a SINGLE IEEE division of exactly-represented integers
    (products < 2^53), so both engines produce bit-identical doubles and
    the 6dp round is cosmetic, not a tie-breaker.
    """
    from .dedup import _cached_frame

    def build_baskets() -> DataFrame:
        lineitem = tables.load(spark, sf_dir, "lineitem")
        part = tables.load(spark, sf_dir, "part")
        return (
            lineitem.join(
                F.broadcast(part), lineitem.l_partkey == part.p_partkey
            )
            .groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
        )

    baskets = _cached_frame(spark, sf_dir, "assoc_baskets", build_baskets)
    n = baskets.agg(F.count("*").alias("n_baskets"))
    brand_cnt = (
        baskets.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
    )
    pair_structs = F.expr(
        "flatten(transform(brands, (x, i) -> "
        "transform(slice(brands, i + 2, size(brands)), "
        "y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pair_cnt = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count("*").alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= 20)
    )
    ca = brand_cnt.select(
        F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
    )
    cb = brand_cnt.select(
        F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pair_cnt.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("cnt_ab").alias("support_cnt"),
            F.round(d("cnt_ab") / d("n_baskets"), 6).alias("support"),
            F.round(d("cnt_ab") / d("cnt_a"), 6).alias("confidence"),
            F.round(
                (d("cnt_ab") * d("n_baskets")) / (d("cnt_a") * d("cnt_b")), 6
            ).alias("lift"),
        )
    )


@register(
    "q_pareto_frontier",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_day,
             o_totalprice
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT o.o_orderkey, o.order_day, ROUND(o.o_totalprice, 2) AS price
    FROM u o
    WHERE NOT EXISTS (
      SELECT 1 FROM u d
      WHERE d.order_day <= o.order_day
        AND d.o_totalprice >= o.o_totalprice
        AND (d.order_day < o.order_day
             OR d.o_totalprice > o.o_totalprice)
    )
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: urgent orders not dominated by
    any earlier-or-same-day order with >= price — "largest order seen so
    far" frontier, the canonical multi-criteria optimization operator
    (Borzsony et al., ICDE 2001).

    The oracle states the semantics as the O(n^2) NOT EXISTS; the Spark
    plan computes the SAME set in O(n log n) via the 2-D sweep: reduce
    to per-day maxima, then a running max over strictly-earlier days —
    a day's max survives iff it strictly exceeds every prior day's max,
    and within a day only rows tying the day max survive (equal
    (day, price) duplicates never strictly dominate each other, so all
    tied rows are kept by both formulations).

    Scale: the sweep windows over the per-DAY frame (one row per day,
    ~2.4k rows at any SF since the date domain is fixed), not raw
    orders; raw rows are touched only by one grouped max and one final
    broadcast join against the tiny frontier-day frame. No self-join —
    the quadratic form exists only in the oracle. Floats: prices are
    compared and MAX-ed, never arithmetically combined, so doubles are
    engine-identical verbatim.
    """
    u = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_day"),
            "o_totalprice",
        )
    )
    daily = u.groupBy("order_day").agg(F.max("o_totalprice").alias("dmax"))
    w = W.orderBy("order_day").rowsBetween(W.unboundedPreceding, -1)
    frontier_days = daily.withColumn("prev_max", F.max("dmax").over(w)).filter(
        F.col("prev_max").isNull() | (F.col("dmax") > F.col("prev_max"))
    )
    return (
        u.join(F.broadcast(frontier_days), "order_day")
        .filter(F.col("o_totalprice") == F.col("dmax"))
        .select(
            "o_orderkey",
            "order_day",
            F.round("o_totalprice", 2).alias("price"),
        )
    )


@register(
    "q_seq_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events WHERE ts IS NOT NULL
    ), trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, cnt,
           ROUND(CAST(cnt AS DOUBLE)
                 / CAST(SUM(cnt) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS prob
    FROM trans
    """,
)
def q_seq_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    count and normalize (prev_type -> next_type) steps, ordering each
    user's history by (ts, event_id) — the deterministic tiebreak the
    duplicate-timestamp edge corpus mandates — to give the
    next-event-prediction prior behind sessionized behavioral models.

    Scale: one shuffle on user_id serves the LAG; the transition count
    then shuffles on the tiny (prev, next) key (|types|^2 groups,
    map-side combined) and the row-normalizing SUM windows over that
    same tiny frame — raw events are read once. Floats: prob is a single
    IEEE division of exact integer counts (the window SUM of BIGINTs is
    exact), so both engines agree bit-for-bit before the 6dp round.
    """
    events = tables.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("cnt"))
    wp = W.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "cnt",
        F.round(
            F.col("cnt").cast("double")
            / F.sum("cnt").over(wp).cast("double"),
            6,
        ).alias("prob"),
    )


@register(
    "q_orders_rfm",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             COUNT(*) AS frequency,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), anchor AS (
      SELECT MAX(last_day) AS max_day FROM per_cust
    ), rfm AS (
      SELECT p.o_custkey,
             CAST(date_diff('day', p.last_day, a.max_day) AS BIGINT)
               AS recency_days,
             p.frequency, p.monetary_cents
      FROM per_cust p CROSS JOIN anchor a
    ), scored AS (
      SELECT o_custkey, recency_days, frequency,
             FLOOR(CAST(monetary_cents AS DOUBLE) / 100.0 * 100 + 0.5) / 100
               AS monetary,
             CAST(NTILE(5) OVER (ORDER BY recency_days, o_custkey)
                  AS INTEGER) AS r_quintile,
             CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey)
                  AS INTEGER) AS f_quintile,
             CAST(NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey)
                  AS INTEGER) AS m_quintile
      FROM rfm
    )
    SELECT *,
      CASE WHEN r_quintile <= 2 AND f_quintile <= 2 AND m_quintile <= 2
             THEN 'champion'
           WHEN r_quintile >= 4 AND f_quintile <= 2 THEN 'at_risk'
           WHEN r_quintile <= 2 AND f_quintile >= 4 THEN 'new'
           ELSE 'regular' END AS segment
    FROM scored
    """,
)
def q_orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (days since last
    order, anchored to the corpus max date so the query is
    deterministic), frequency, monetary value, NTILE(5) quintile scores
    on each axis, and a rule-based segment label — the classic
    marketing-analytics operator (Hughes 1994).

    Determinism: every NTILE ordering carries o_custkey as the final
    tiebreak (equal recency/frequency/monetary rows would otherwise
    tile in engine-arbitrary order); monetary accumulates exact integer
    cents and recency/frequency are exact integers, so the orderings —
    and therefore the tiles — are engine-identical.

    Scale: the per-customer fold shuffles once on o_custkey; the anchor
    is a broadcast 1-row frame. The quintiles are EXACT NTILE(5)
    semantics (count-balanced tiles, oracle unchanged) but computed
    WITHOUT a single-partition window — and without ANY further
    exchange: all three axes share ``distributed.global_ntile_multi``'s
    sample-and-refine selection (two narrow passes over the persisted
    per-customer frame, driver holds only bounded sample metadata) and
    the quintiles are assigned map-side from the 4 boundary tuples per
    axis. At 100 TB of events the NTILE machinery never moves the
    customer dimension at all. Local constant (sf0.1, measured): ~1.7 s
    — the 0.65 s per-customer fold plus a ~0.3 s Python-worker job
    floor per selection pass; the r5 0.86 s version funneled all three
    rankings through one reducer, which is the disallowed plan.
    """
    orders = tables.load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count("*").alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("monetary_cents"),
    )
    # ONE pass over orders: the anchor (max order date) equals the max of
    # the per-customer last_day, so it reads the PERSISTED per-customer
    # frame instead of re-scanning the fact table (measured 0.2 s of the
    # r6 constant), and rfm derives map-side from the same cache.
    per_cust = per_cust.persist()
    _track_persisted(per_cust)
    anchor = per_cust.agg(F.max("last_day").alias("max_day"))
    rfm = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("max_day", "last_day").cast("long").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    # One persisted per-customer frame feeds all three quintile passes
    # (the r5->r6 regression was range-exchanging an ever-wider chained
    # frame per axis). NTILE only needs the 4 boundary TUPLES per axis —
    # order statistics, i.e. metadata — so ``global_ntile`` exchanges a
    # slim 2-column projection per axis, collects O(parts) counts plus 4
    # boundary rows, and assigns the quintile MAP-SIDE with broadcast
    # comparisons: no global rank, no joins, no window in the final plan.
    ranked = global_ntile_multi(
        rfm,
        [
            ("recency_days", True, "r_quintile"),
            ("frequency", False, "f_quintile"),
            ("monetary_cents", False, "m_quintile"),
        ],
        5,
        tiebreak="o_custkey",
    )
    scored = ranked.select(
        "o_custkey",
        "recency_days",
        "frequency",
        (
            F.floor(
                F.col("monetary_cents").cast("double") / 100.0 * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("monetary"),
        "r_quintile",
        "f_quintile",
        "m_quintile",
    )
    segment = (
        F.when(
            (F.col("r_quintile") <= 2)
            & (F.col("f_quintile") <= 2)
            & (F.col("m_quintile") <= 2),
            F.lit("champion"),
        )
        .when(
            (F.col("r_quintile") >= 4) & (F.col("f_quintile") <= 2),
            F.lit("at_risk"),
        )
        .when(
            (F.col("r_quintile") <= 2) & (F.col("f_quintile") >= 4),
            F.lit("new"),
        )
        .otherwise(F.lit("regular"))
    )
    return scored.select("*", segment.alias("segment"))


@register(
    "q_join_incremental",
    oracle="""
    SELECT o.o_orderpriority, l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           FLOOR(CAST(SUM(CAST(FLOOR(l.l_extendedprice
                                     * (1 - l.l_discount) * 100 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 100 * 100 + 0.5)
             / 100 AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority, l.l_returnflag
    """,
)
def q_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: the oracle states the
    view directly (full orders ⋈ lineitem, aggregated); the Spark plan
    MAINTAINS it incrementally from a base snapshot plus independent
    deltas on both sides, exercising the bilinear delta-join identity

        (A ∪ dA) ⋈ (B ∪ dB) = A⋈B ∪ A⋈dB ∪ dA⋈B ∪ dA⋈dB

    (orders split on o_orderdate, lineitem split independently on
    l_shipdate, so every term is non-empty) followed by the same
    mergeable-aggregate full-outer merge q_rollup_incremental uses.
    Matching the oracle PROVES the maintenance identity end to end.

    Scale: this is the production continuous-view shape — the three
    delta terms touch only delta-proportional rows (at 100 TB the base
    view is a stored table and dA/dB are a day's arrivals; the base
    relations appear only opposite a delta, as here), and the merge is
    a tiny group-key full-outer join. Revenue floors to exact integer
    cents PER ROW (a fixed two-multiply IEEE tree) before summing, so
    partial-aggregation order can't drift the total; counts and cents
    merge associatively by construction.
    """
    cutoff_o = "1995-01-01"
    cutoff_l = "1995-06-01"
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        "l_shipdate",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("rev_cents"),
    )
    a = orders.filter(F.col("o_orderdate") < cutoff_o)
    da = orders.filter(F.col("o_orderdate") >= cutoff_o)
    b = li.filter(F.col("l_shipdate") < cutoff_l)
    db = li.filter(F.col("l_shipdate") >= cutoff_l)

    def view(o_side, l_side):
        return (
            o_side.join(l_side, o_side.o_orderkey == l_side.l_orderkey)
            .groupBy("o_orderpriority", "l_returnflag")
            .agg(
                F.count("*").alias("n_items"),
                F.sum("rev_cents").alias("cents"),
            )
        )

    base = view(a, b)
    delta = (
        view(a, db)
        .unionAll(view(da, b))
        .unionAll(view(da, db))
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.sum("n_items").alias("n_items"),
            F.sum("cents").alias("cents"),
        )
    )
    merged = (
        base.select(
            "o_orderpriority",
            "l_returnflag",
            F.col("n_items").alias("n0"),
            F.col("cents").alias("c0"),
        )
        .join(
            delta.select(
                "o_orderpriority",
                "l_returnflag",
                F.col("n_items").alias("n1"),
                F.col("cents").alias("c1"),
            ),
            ["o_orderpriority", "l_returnflag"],
            "full_outer",
        )
        .select(
            "o_orderpriority",
            "l_returnflag",
            (
                F.coalesce("n0", F.lit(0)) + F.coalesce("n1", F.lit(0))
            ).alias("n_items"),
            (
                F.coalesce("c0", F.lit(0)) + F.coalesce("c1", F.lit(0))
            ).alias("cents"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "l_returnflag",
        "n_items",
        (
            F.floor(F.col("cents").cast("double") / 100 * 100 + F.lit(0.5))
            / 100
        ).alias("revenue"),
    )


@register(
    "q_funnel_latency",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' AND ts IS NOT NULL
      GROUP BY user_id
    ), conv AS (
      SELECT su.user_id, su.s_ts, MIN(e.ts) AS p_ts
      FROM su LEFT JOIN events e
        ON e.user_id = su.user_id
       AND e.event_type = 'purchase' AND e.ts >= su.s_ts
      GROUP BY su.user_id, su.s_ts
    ), gaps AS (
      SELECT CAST(date_trunc('month', s_ts) AS DATE) AS cohort_month,
             CASE WHEN p_ts IS NULL THEN NULL
                  ELSE epoch_us(p_ts) - epoch_us(s_ts) END AS gap_us
      FROM conv
    )
    SELECT cohort_month,
      COUNT(*) AS n_users,
      CAST(COUNT(gap_us) AS BIGINT) AS n_converted,
      FLOOR(CAST(list_sort(list(gap_us) FILTER (WHERE gap_us IS NOT NULL))
                   [(COUNT(gap_us) + 1) // 2] AS DOUBLE)
            / 1000000 * 100 + 0.5) / 100 AS median_gap_sec,
      FLOOR((CAST(SUM(gap_us) AS DOUBLE)
             / CAST(NULLIF(COUNT(gap_us), 0) AS DOUBLE))
            / 1000000 * 100 + 0.5) / 100 AS avg_gap_sec
    FROM gaps GROUP BY cohort_month
    """,
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution per signup cohort: users grouped
    by first-signup month, with conversion count, median, and mean
    signup→first-purchase latency — the time-to-value readout layered
    on the q_funnel / q_cohort_retention family.

    Determinism: latencies are exact BIGINT microsecond differences;
    the median is sorted-list ELEMENT SELECTION (the rolling-median
    rule — never interpolation), and the mean is one division of exact
    integers; both displays use the tie-safe floor-scale. An
    unconverted cohort nullif-guards the mean and selects no median.

    Scale: two shuffles on user_id (first-signup fold, then the
    conditional first-purchase fold — the purchase probe is an equi
    join on user_id with the time bound as residual, never a time-range
    cross product); the cohort aggregate then reduces onto months.
    collect_list holds CONVERTED USERS per cohort-month — at extreme
    cohort sizes the median switches to approx_percentile, same plan.
    """
    ev = tables.load(spark, sf_dir, "events")
    su = (
        ev.filter((F.col("event_type") == "signup") & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("pts")
    )
    conv = (
        su.join(
            pu,
            (su.user_id == pu.p_uid) & (pu.pts >= su.s_ts),
            "left",
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("pts").alias("p_ts"))
    )
    gaps = conv.select(
        F.date_trunc("month", "s_ts").cast("date").alias("cohort_month"),
        (F.unix_micros(F.col("p_ts").cast("timestamp"))
         - F.unix_micros(F.col("s_ts").cast("timestamp"))).alias("gap_us"),
    )
    gl = F.sort_array(F.collect_list("gap_us"))
    n_conv = F.count("gap_us")
    return gaps.groupBy("cohort_month").agg(
        F.count("*").alias("n_users"),
        n_conv.cast("long").alias("n_converted"),
        (
            F.floor(
                F.when(
                    n_conv > 0,
                    F.element_at(gl, ((n_conv + 1) / 2).cast("int")),
                ).cast("double")
                / 1000000
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("median_gap_sec"),
        (
            F.floor(
                (
                    F.sum("gap_us").cast("double")
                    / F.nullif(n_conv, F.lit(0)).cast("double")
                )
                / 1000000
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("avg_gap_sec"),
    )


_PATHS_TOP = 3


@register(
    "q_seq_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS s0,
             LEAD(event_type, 1) OVER w AS s1,
             LEAD(event_type, 2) OVER w AS s2
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT s0, s1, s2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE s1 IS NOT NULL AND s2 IS NOT NULL
      GROUP BY s0, s1, s2
    ), ranked AS (
      SELECT s0, s1, s2, cnt,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY s0 ORDER BY cnt DESC, s1, s2) AS INTEGER) AS rk,
             CAST(SUM(cnt) OVER (PARTITION BY s0) AS BIGINT) AS start_total
      FROM paths
    )
    SELECT s0, s1, s2, cnt, rk,
           FLOOR(CAST(cnt AS DOUBLE) / CAST(start_total AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS share
    FROM ranked WHERE rk <= {_PATHS_TOP}
    """,
)
def q_seq_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the top-{K} most common 3-step event-type paths per
    STARTING type over per-user streams (the clickstream "what do users
    do next-next" report behind funnel design), with each path's share
    of all 3-paths from that start.

    Every user's history is ordered by (ts, event_id) — the
    deterministic duplicate-timestamp tiebreak (q_seq_transitions) —
    and windows never cross users (LEAD within the user partition).
    Ranking is (cnt DESC, s1, s2): total, so the top-{K} cutoff is
    engine-deterministic under count ties; share is one IEEE division
    of exact integer counts, displayed floor-scale (exact-ratio
    half-way class).

    Scale: one shuffle on user_id serves both LEADs (same sort), the
    path count map-side combines into at most |types|^3 groups, and
    ranking windows over that tiny frame. Raw events are scanned once.
    """
    events = tables.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("s0"),
        F.lead("event_type", 1).over(w).alias("s1"),
        F.lead("event_type", 2).over(w).alias("s2"),
    ).filter(F.col("s1").isNotNull() & F.col("s2").isNotNull())
    paths = seq.groupBy("s0", "s1", "s2").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wr = W.partitionBy("s0").orderBy(F.desc("cnt"), "s1", "s2")
    wt = W.partitionBy("s0")
    return (
        paths.select(
            "s0",
            "s1",
            "s2",
            "cnt",
            F.row_number().over(wr).cast("int").alias("rk"),
            F.sum("cnt").over(wt).cast("long").alias("start_total"),
        )
        .filter(F.col("rk") <= _PATHS_TOP)
        .select(
            "s0",
            "s1",
            "s2",
            "cnt",
            "rk",
            (
                F.floor(
                    F.col("cnt").cast("double")
                    / F.col("start_total").cast("double")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("share"),
        )
    )


@register(
    "q_funnel_window",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, v.t_view, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL 1 HOUR
      GROUP BY e.user_id, v.t_view
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_view + INTERVAL 1 HOUR
      GROUP BY e.user_id
    ), staged AS (
      SELECT v.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS max_stage
      FROM v LEFT JOIN c ON c.user_id = v.user_id
             LEFT JOIN p ON p.user_id = v.user_id
    ), hist AS (
      SELECT max_stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM staged
      GROUP BY max_stage
    )
    SELECT max_stage, n_users,
           FLOOR(CAST(n_users AS DOUBLE)
                 / CAST(SUM(n_users) OVER () AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS share
    FROM hist
    """,
)
def q_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel (the ClickHouse ``windowFunnel``
    semantic): a user's click counts only within ONE HOUR of their
    first view, and the purchase must land inside that same
    view-anchored hour — the "did the session convert" question that
    q_funnel's unbounded ordering cannot answer (a purchase a week
    later is retention, not conversion).

    Output is the max-stage histogram (1 = view only, 2 = clicked in
    the window, 3 = purchased in the window) with each stage's share of
    funnel entrants — an exact integer ratio, floor-scale displayed.

    Scale: identical shuffle shape to q_funnel (three narrow per-user
    aggs on user_id, AQE reuses the partitioning; stage frames are one
    row per qualifying user). The interval bound is a filter inside the
    stage aggregates — no extra shuffle; at 100 TB the anchor-window
    predicate also enables event-time partition pruning around each
    anchor day.
    """
    events = tables.load(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    hour = F.expr("INTERVAL 1 HOUR")
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + hour)
        )
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_view") + hour)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    staged = (
        v.select("user_id")
        .join(c.select("user_id", F.lit(1).alias("clicked")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("bought")), "user_id", "left")
        .select(
            F.when(F.col("bought").isNotNull(), 3)
            .when(F.col("clicked").isNotNull(), 2)
            .otherwise(1)
            .alias("max_stage")
        )
    )
    hist = staged.groupBy("max_stage").agg(
        F.count("*").cast("long").alias("n_users")
    )
    share = F.col("n_users").cast("double") / F.sum("n_users").over(
        W.partitionBy()
    ).cast("double")
    return hist.select(
        "max_stage",
        "n_users",
        (F.floor(share * 1000000 + F.lit(0.5)) / 1000000).alias("share"),
    )


@register(
    "q_orders_abc",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, cents,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
             CAST(SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum_cents
      FROM per_cust
      WINDOW w AS (ORDER BY cents DESC, o_custkey)
    ), tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per_cust
    )
    SELECT o_custkey,
           FLOOR(CAST(cents AS DOUBLE) / 100.0 * 100 + 0.5) / 100 AS revenue,
           rnk,
           FLOOR(CAST(cum_cents AS DOUBLE) / total * 1000000 + 0.5)
             / 1000000 AS cum_share,
           CASE WHEN cum_cents * 5 <= total * 4 THEN 'A'
                WHEN cum_cents * 20 <= total * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked CROSS JOIN tot
    """,
)
def q_orders_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis: customers ranked by revenue with cumulative
    revenue share, classified A (first 80% of revenue), B (80-95%), C
    (tail) — the inventory-management classic, and the shape every
    "which sources contribute 80% of my training tokens" corpus report
    takes.

    The global rank AND the running revenue sum both come from ONE
    range exchange via ``distributed.global_row_number(sum_col=...)``
    (per-partition running sums + metadata prefix of partition totals —
    a distributed prefix sum, never a single-partition window; revenue
    accumulates as exact integer cents so the offsets compose without
    float drift). Class boundaries compare exact integers
    (``cum*5 <= total*4`` is share <= 0.80) — no rounding boundary can
    flip a class cross-engine; the displayed share is floor-scale only.

    Scale: one shuffle for the per-customer fold, one range exchange
    for rank+prefix (both entity-level), one broadcast 1-row total.
    """
    orders = tables.load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    ranked = global_row_number(
        per_cust,
        [F.col("cents").desc(), F.col("o_custkey").asc()],
        "rnk",
        sum_col="cents",
        sum_out="cum_cents",
    )
    tot = per_cust.agg(F.sum("cents").alias("total"))
    abc = (
        F.when(F.col("cum_cents") * 5 <= F.col("total") * 4, F.lit("A"))
        .when(F.col("cum_cents") * 20 <= F.col("total") * 19, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        (
            F.floor(F.col("cents").cast("double") / 100.0 * 100 + F.lit(0.5))
            / 100
        ).alias("revenue"),
        "rnk",
        (
            F.floor(
                F.col("cum_cents").cast("double") / F.col("total") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("cum_share"),
        abc.alias("abc_class"),
    )


@register(
    "q_feat_target_encode",
    oracle="""
    WITH obs AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), grp AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM obs GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority, g.n AS category_n,
           FLOOR(CAST(g.s - o.cents AS DOUBLE)
                 / NULLIF(g.n - 1, 0) / 100.0 * 10000 + 0.5) / 10000
             AS target_enc
    FROM obs o JOIN grp g USING (o_orderpriority)
    """,
)
def q_feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each order's priority category is
    replaced by the mean order value of the OTHER members of that
    category — the standard high-cardinality categorical feature
    (Micci-Barreca 2001) with the LOO correction that prevents the row
    leaking its own target into its feature.

    Exactness: targets accumulate as exact integer cents; the LOO mean
    (S - own)/(n - 1) is one division of exact longs, nullif-guarded
    for singleton categories (NULL on both engines — ANSI-safe), then
    floor-scale displayed in dollars.

    Scale: one map-side-combined aggregate over the category key + one
    broadcast-able join back (the category dimension is tiny by
    definition of the encoding — if it weren't, you'd hash it,
    q_feat_hashing). No windows, no per-row state.
    """
    orders = tables.load(spark, sf_dir, "orders")
    obs = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    grp = obs.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").alias("s"),
    )
    loo = (
        (F.col("s") - F.col("cents")).cast("double")
        / F.nullif(F.col("n") - 1, F.lit(0))
        / 100.0
    )
    return obs.join(F.broadcast(grp), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("n").alias("category_n"),
        (F.floor(loo * 10000 + F.lit(0.5)) / 10000).alias("target_enc"),
    )
