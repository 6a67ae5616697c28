"""TPC-H-shaped decorrelation suite: the subquery- and join-graph-heavy
analytics shapes (Q4/Q7/Q8/Q10/Q14/Q15/Q17/Q18/Q19/Q22 analogs, plus a
Q2-style correlated-min) that exercise Catalyst's subquery decorrelation,
disjunctive-predicate pushdown, and multi-fact join ordering.

The fixtures lack ``partsupp`` and a few TPC-H columns (shipmode,
commitdate, phone), so each query keeps the *shape* of its TPC-H
namesake re-expressed over the columns that exist — the decorrelation /
planning workout is the point, not benchmark-kit parity.

Determinism notes (why the oracles hash-match):

* ``l_quantity`` holds integral doubles — sums/avgs of integers ≤ 2^53
  are exact in IEEE double regardless of accumulation order, so
  quantity-derived predicates (``< 0.2*avg``, ``HAVING SUM > 350``)
  cannot flip between Spark's partial aggregation and DuckDB's
  sequential scan.
* Revenue sums use the tie-free cent convention
  ``FLOOR(x*100 + 0.5)/100`` on both sides.
* Ratio outputs round numerator and denominator to cents FIRST, then
  divide — the division of two identical doubles is bit-deterministic.
* ``year(ts)`` is INT in Spark but BIGINT in DuckDB — Spark side casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import tables
from .registry import register


def _cent_floor(col):
    """Tie-free cent rounding: FLOOR(x*100 + 0.5)/100 (identical on both
    engines; ROUND's half-even vs half-up divergence never engages)."""
    return F.floor(col * 100 + F.lit(0.5)) / 100


def _revenue():
    # Built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at import time.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q_sql_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_sql_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders in a year window with
    at least one line shipped >60 days after the order date (the fixture
    has no commit/receipt dates, so "late" is ship-vs-order lag).

    Scale: the correlated EXISTS decorrelates to a LEFT SEMI join on
    ``l_orderkey = o_orderkey`` — one shuffle on the order key, no
    per-row re-execution. The date filter pushes into the orders scan;
    the lag predicate is a residual on the semi join (it references both
    sides, so it cannot push deeper — that is the minimal plan).
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_sql_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def q_sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped volume-shipping: bilateral trade revenue between
    two nations by ship year.

    Scale: both nation joins broadcast (25 rows at any SF) and the
    disjunctive nation-pair predicate applies right after them, so only
    the matching slice of the fact join ever shuffles onward. The date
    filter reaches the lineitem scan. The final agg groups on 3 bounded
    keys (2 nations × years) — partial aggregation collapses it map-side.
    """
    li = tables.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer")
    supp = tables.load(spark, sf_dir, "supplier")
    nation = tables.load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_cent_floor(F.sum(_revenue())).alias("revenue"))
    )


@register(
    "q_sql_market_share",
    oracle="""
    SELECT o_year,
           ROUND(nation_rev / NULLIF(total_rev, 0), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               FLOOR(SUM(CASE WHEN n1.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END) * 100 + 0.5) / 100 AS nation_rev,
               FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
                   AS total_rev
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
        GROUP BY o_year
    ) shares
    """,
)
def q_sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: the fraction of PROMO-part revenue
    sold into ASIA-region customers that NATION_3 suppliers captured,
    per order year.

    Scale: the 8-table join graph keeps every bounded dim (nation ×2,
    region) broadcast; part's type filter prunes before its join; the
    conditional-vs-total sums ride ONE aggregation (no second pass or
    self-join for the denominator). Both sums are cent-floored before
    the divide so the ratio is bit-deterministic; NULLIF guards the
    ANSI divide on an empty year.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = tables.load(spark, sf_dir, "supplier")
    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer")
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    shares = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            _cent_floor(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", _revenue()).otherwise(0))
            ).alias("nation_rev"),
            _cent_floor(F.sum(_revenue())).alias("total_rev"),
        )
    )
    return shares.select(
        "o_year",
        F.round(
            F.col("nation_rev") / F.nullif(F.col("total_rev"), F.lit(0)), 6
        ).alias("mkt_share"),
    )


@register(
    "q_sql_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue,
           ROUND(c_acctbal, 2) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: top-20 customers by revenue
    of returned ('R') lines in one quarter.

    Scale: returnflag + date filters push to their scans; the join
    shuffles on order/customer keys; nation broadcasts. The top-20 is
    TakeOrderedAndProject over (revenue DESC, c_custkey) — a total
    order, so the LIMIT frontier can't differ between engines even if
    two customers tie on cent-floored revenue.
    """
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = tables.load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = tables.load(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_cent_floor(F.sum(_revenue())).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_sql_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * promo_rev / NULLIF(total_rev, 0), 6) AS promo_pct
    FROM (
        SELECT FLOOR(SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END) * 100 + 0.5) / 100 AS promo_rev,
               FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
                   AS total_rev
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    ) t
    """,
)
def q_sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion effect: percentage of one month's
    revenue from PROMO-type parts.

    Scale: one scan of the date-pruned lineitem slice joined to part
    (broadcast-eligible dim); numerator and denominator come from the
    same single aggregation. Cent-floor both sums, then divide — the
    ratio is deterministic; NULLIF guards the empty-month ANSI divide.
    """
    li = tables.load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = tables.load(spark, sf_dir, "part")
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _cent_floor(
                F.sum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0))
            ).alias("promo_rev"),
            _cent_floor(F.sum(_revenue())).alias("total_rev"),
        )
    )
    return agg.select(
        F.round(
            100.0 * F.col("promo_rev") / F.nullif(F.col("total_rev"), F.lit(0)), 6
        ).alias("promo_pct")
    )


@register(
    "q_sql_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the supplier(s) with maximum
    quarterly revenue, via a CTE reused by both the scalar-MAX subquery
    and the join — the view-reuse shape of Q15.

    Scale: Catalyst plans the CTE once per consumer; the scalar MAX is a
    one-row broadcast, not a driver collect. Revenue is cent-floored
    BEFORE the max comparison so the equality frontier is exact — and
    if two suppliers tie at the max, both appear (no LIMIT), identical
    in both engines.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@register(
    "q_sql_small_qty",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q_sql_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: lines of one brand whose
    quantity is below 20% of that part's average order quantity.

    Scale: the correlated scalar AVG decorrelates to a per-partkey
    aggregate joined back — one extra shuffle on ``l_partkey``, not a
    per-row subquery. Determinism: ``l_quantity`` is integral, so
    AVG is exact in IEEE double under any accumulation order and the
    strict ``<`` cannot flip between engines.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT FLOOR(SUM(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "q_sql_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS totalprice,
           SUM(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(l_quantity) > 350)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_sql_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: orders whose total line
    quantity exceeds 350, with the customer and order detail.

    Scale: the IN-subquery decorrelates to a semi join against the
    grouped-HAVING aggregate — the aggregate and the semi join share the
    ``l_orderkey`` shuffle. ``SUM(l_quantity)`` is an exact integer sum
    (integral doubles), so the HAVING frontier is engine-independent.
    (totalprice DESC, o_orderkey) totally orders the LIMIT.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               ROUND(o_totalprice, 2) AS totalprice,
               SUM(l_quantity) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 350)
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 20
        """
    )


@register(
    "q_sql_disjunctive",
    oracle="""
    SELECT FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_sql_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate join: revenue over an
    OR-of-ANDs mixing part attributes and lineitem attributes.

    Scale: Catalyst extracts the single-side implications of the
    disjunction — ``p_brand IN (12,23,34) AND p_size <= 35`` pushes to
    the part scan and ``l_quantity BETWEEN 1 AND 30`` to the lineitem
    scan — so the join sees only candidate rows; the full OR stays as
    the residual. That scan-level pruning is what makes Q19 feasible at
    100 TB; without it the join touches every row.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            _cent_floor(F.sum(_revenue())).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_sql_global_sales",
    oracle="""
    SELECT seg,
           COUNT(*) AS numcust,
           FLOOR(SUM(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
    FROM (
        SELECT SUBSTRING(c_name, 16, 1) AS seg, c_acctbal, c_custkey
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
    ) c
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY seg
    """,
)
def q_sql_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped dormant-high-balance report: customers with an
    above-average (positive) balance and NO orders since 2000, grouped
    by a name-derived segment digit (the fixture has no phone column).

    Scale: the scalar AVG is a one-row broadcast; the NOT EXISTS
    decorrelates to a LEFT ANTI join against the date-pruned orders
    slice (filter pushed below the anti join — the probe side only
    carries post-2000 orders). No per-customer re-scan of orders.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT seg,
               COUNT(*) AS numcust,
               FLOOR(SUM(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
        FROM (
            SELECT SUBSTRING(c_name, 16, 1) AS seg, c_acctbal, c_custkey
            FROM customer
            WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
        ) c
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY seg
        """
    )


@register(
    "q_sql_min_cost_supplier",
    oracle="""
    SELECT p_partkey, p_name, s_suppkey, s_name,
           ROUND(unit_price, 4) AS unit_price
    FROM (
        SELECT p_partkey, p_name, s_suppkey, s_name,
               l_extendedprice / l_quantity AS unit_price
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_size = 10
    ) offers
    WHERE unit_price = (SELECT MIN(l2.l_extendedprice / l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = offers.p_partkey)
    ORDER BY p_partkey, s_suppkey
    """,
)
def q_sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each size-10 part, the
    supplier(s) whose observed unit price (extendedprice/quantity — the
    fixture has no partsupp cost) is that part's minimum.

    Scale: the correlated MIN decorrelates to a per-partkey aggregate
    joined back on ``l_partkey`` — shared shuffle key with the main
    join, no per-part rescans. Determinism: both engines compute the
    SAME IEEE divide on the same operands, so MIN and the equality
    compare identical bit patterns; rounding happens only at output.
    All tied minimum suppliers are returned (no LIMIT), so tie handling
    is engine-independent.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name, s_suppkey, s_name,
               ROUND(unit_price, 4) AS unit_price
        FROM (
            SELECT p_partkey, p_name, s_suppkey, s_name,
                   l_extendedprice / l_quantity AS unit_price
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE p_size = 10
        ) offers
        WHERE unit_price = (SELECT MIN(l2.l_extendedprice / l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = offers.p_partkey)
        ORDER BY p_partkey, s_suppkey
        """
    )


@register(
    "q_sql_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
                           - 0.6 * p_retailprice * l_quantity) * 100 + 0.5)
                    AS BIGINT)) / 100.0 AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    """,
)
def q_sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit: net profit (revenue minus a
    retail-price-derived cost proxy — the fixture has no partsupp
    supplycost) by supplier nation and order year, for parts matching a
    name pattern.

    Scale: the LIKE filter prunes part before its join; nation
    broadcasts; the two fact joins shuffle on partkey/orderkey. The
    profit expression is computed per-row inside the scan projection
    (codegen) — only (nation, year, partial sum) cross the final
    exchange.

    Determinism: profit mixes signs, so a double SUM's accumulation
    error is amplified by cancellation and post-hoc cent-floor rounding
    can straddle a cent edge (observed at sf0.01). Instead each row is
    quantized to integer cents FIRST (identical bits in both engines)
    and summed as BIGINT — exact under any accumulation order.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    supp = tables.load(spark, sf_dir, "supplier")
    orders = tables.load(spark, sf_dir, "orders")
    nation = tables.load(spark, sf_dir, "nation")
    profit = _revenue() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (
                F.sum(F.floor(profit * 100 + F.lit(0.5)).cast("long")) / 100.0
            ).alias("sum_profit")
        )
    )


@register(
    "q_sql_important_stock",
    oracle="""
    SELECT l_suppkey,
           FLOOR(SUM(l_extendedprice) * 100 + 0.5) / 100 AS supp_value
    FROM lineitem
    GROUP BY l_suppkey
    HAVING FLOOR(SUM(l_extendedprice) * 100 + 0.5) / 100 >
           (SELECT FLOOR(1.05 * SUM(l_extendedprice)
                         / COUNT(DISTINCT l_suppkey) * 100 + 0.5) / 100
            FROM lineitem)
    ORDER BY supp_value DESC, l_suppkey
    """,
)
def q_sql_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important stock: suppliers whose shipped value
    exceeds 1.05x the mean per-supplier value — a scalar subquery inside
    HAVING, the Q11 decorrelation shape (no partsupp in the fixture, so
    value = shipped extendedprice).

    Scale: the HAVING scalar is a one-row broadcast joined against the
    grouped aggregate — the fact table is scanned twice (once per
    aggregate); at cluster scale the grouped frame would be persisted
    and both reductions derived from it. The relative threshold keeps
    the result selective at ANY corpus size. Both sides of the compare
    are cent-floored, so the frontier is engine-independent.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_suppkey,
               FLOOR(SUM(l_extendedprice) * 100 + 0.5) / 100 AS supp_value
        FROM lineitem
        GROUP BY l_suppkey
        HAVING FLOOR(SUM(l_extendedprice) * 100 + 0.5) / 100 >
               (SELECT FLOOR(1.05 * SUM(l_extendedprice)
                             / COUNT(DISTINCT l_suppkey) * 100 + 0.5) / 100
                FROM lineitem)
        ORDER BY supp_value DESC, l_suppkey
        """
    )


@register(
    "q_sql_cust_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q_sql_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer distribution: the histogram of orders
    per customer, INCLUDING zero-order customers — the outer-join +
    COUNT(column) NULL-semantics shape (COUNT(o_orderkey) counts only
    non-NULL, so unmatched customers land in bucket 0).

    Scale: one outer-join shuffle on custkey, a per-customer count on
    the same key (partitioning reused), then a tiny histogram aggregate
    — the same two-level shape as q_graph_degrees.
    """
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q_sql_waiting_supplier",
    oracle="""
    WITH order_supp AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM order_supp l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.is_late = 1
      AND EXISTS (SELECT 1 FROM order_supp l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM order_supp l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_sql_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting: suppliers who
    were the SOLE late shipper (>60-day ship lag) on a multi-supplier
    order — the hardest correlation shape in the suite (EXISTS and
    NOT EXISTS against the same derived table, the oracle's form).

    Scale — why this is NOT the literal SQL: Spark inlines WITH, so the
    EXISTS/NOT EXISTS form executes the order_supp aggregate THREE
    times (measured 2.8 s at sf0.1 vs 1.0 s for this plan). Both
    correlations are per-order set conditions, so they fuse into
    per-order window counts over the (order, supplier) frame:
    ``n_supp > 1`` ⇔ the EXISTS, ``n_late = 1`` (given is_late) ⇔ the
    NOT EXISTS. One explicit fact shuffle on ``l_orderkey`` serves the
    grouping AND the window (see inline comment), then a broadcast to
    the bounded supplier dim and a tiny top-20.
    """
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"), 1
    ).otherwise(0)
    order_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # One explicit shuffle on l_orderkey: HashPartitioning(orderkey)
        # satisfies BOTH the (orderkey, suppkey) grouping (subset-key
        # clustering) and the orderkey window below, so neither inserts
        # its own exchange. The alternative (groupBy's natural
        # (ok, sk) shuffle + a second window exchange on ok) ships
        # pre-combined rows but pays two stage barriers — measured 1.7 s
        # vs 1.0 s for this plan at sf0.1.
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = W.partitionBy("l_orderkey")
    flagged = order_supp.select(
        "l_suppkey",
        "is_late",
        F.count("*").over(per_order).alias("n_supp"),
        F.sum("is_late").over(per_order).alias("n_late"),
    )
    return (
        flagged.filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


_Q12_SQL = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
"""


@register("q_sql_ship_priority_counts", oracle=_Q12_SQL)
def q_sql_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-priority audit: per line category (the
    fixture has no shipmode, so l_returnflag stands in), how many lines
    shipped in the window belong to critical-priority orders vs not — the
    join + dual-CASE-counting shape of Q12.

    Scale: the date filter pushes into the lineitem scan; one shuffle
    joins orders (priority column only, 15k rows/SF) to the filtered
    lines; the dual conditional SUM is a single pass with map-side
    partials — Q12's plan is a semi-aggregated join, never two queries.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
          )
    GROUP BY p_brand, p_type, p_size
"""


@register("q_sql_supplier_part_variety", oracle=_Q16_SQL)
def q_sql_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped parts/supplier relationship: distinct suppliers
    per (brand, type, size) over selected sizes, excluding a
    complaint-list of suppliers via NOT IN (the fixture encodes the list
    as a name pattern).

    Scale: NOT IN over a NON-NULLABLE key decorrelates to a null-aware
    anti join against the (tiny, broadcast) supplier exclusion; the
    distinct count shuffles on the (brand, type, size) group key after an
    Expand — the Q16 plan is anti-join-then-distinct-agg, with the part
    predicates pushed to the scan.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT sh.l_suppkey FROM shipped sh
      WHERE sh.qty > 0.3 * (
        SELECT SUM(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = sh.l_partkey
          AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l2.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      )
    )
"""


@register("q_sql_excess_share_supplier", oracle=_Q20_SQL)
def q_sql_excess_share_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped dominant-supplier probe: suppliers who shipped
    more than 30% of some small-part's total windowed volume (the fixture
    has no partsupp.availqty, so the correlated comparison is against the
    part's corpus-wide shipped total — same nesting depth as Q20's
    half-of-availqty).

    Scale: the hard part is the correlated scalar SUM inside the IN
    subquery's predicate — Catalyst decorrelates it to an aggregate
    joined back on l_partkey, so the plan is two aggregations over the
    same filtered scan joined on the part key, then a semi join into
    supplier: no per-row re-execution anywhere.
    """
    tables.register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)
