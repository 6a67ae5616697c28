"""Relational operator surface: scan/project/filter/join/agg/sort/setops.

The reference implements none of these (it is a byte-forwarding connector —
see ``/root/reference/src/main.cpp:48-50``); this is the driver-mandated
batch query surface (SURVEY.md §2.3), expressed declaratively so Catalyst
provides pushdown, pruning, join selection and AQE.

Scale notes (100 TB mindset), applied throughout:

* filters and column selections are written directly against the scan so
  they push into parquet (``PushedFilters`` / pruned ``ReadSchema``);
* dimension tables (region/nation/customer/supplier/part) are broadcast
  explicitly — fact-side shuffles only happen for aggregations on the
  grouping keys themselves;
* aggregations are plain ``groupBy`` so Spark plans partial (map-side)
  aggregation before the exchange;
* no ``collect()``-and-loop anywhere — every operator is a single plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan→filter→project→agg→sort)
# ---------------------------------------------------------------------------

@register(
    "q_flagship_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
      ROUND(AVG(l_discount), 4)                                   AS avg_disc,
      COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter + 8-way aggregate over the fact table.

    Scale: the filter pushes to the parquet scan; the groupBy has tiny key
    cardinality (RF×LS ≈ 6 groups) so partial aggregation collapses nearly
    all rows map-side and the exchange moves only #partitions × #groups rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projection & filter
# ---------------------------------------------------------------------------

@register(
    "q_project",
    oracle="""
    SELECT
      c_custkey,
      UPPER(c_name)                   AS name_upper,
      FLOOR(c_acctbal * 110 + 0.5) / 100 AS bal_adjusted,
      c_mktsegment
    FROM customer
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select / rename / computed columns (pruned scan).

    ``bal_adjusted`` uses the tie-free ``floor(x*110+0.5)/100`` on both
    sides — engines disagree on ROUND's half-cent ties (see q_fn_math)."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        (F.floor(F.col("c_acctbal") * 110 + 0.5) / 100).alias("bal_adjusted"),
        "c_mktsegment",
    )


@register(
    "q_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 25
      AND l_returnflag IN ('R', 'A')
      AND l_linestatus LIKE 'F%'
      AND l_partkey IS NOT NULL
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicates: BETWEEN, IN, LIKE, IS NOT NULL — all pushdownable."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1996-12-31 00:00:00").cast("timestamp_ntz"),
        )
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_quantity") < 25)
        & F.col("l_returnflag").isin("R", "A")
        & F.col("l_linestatus").like("F%")
        & F.col("l_partkey").isNotNull()
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@register(
    "q_join_inner",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join (TPC-H Q5-shaped): revenue per nation.

    Scale: nation/region are bounded dims (25/5 rows at ANY scale factor) —
    broadcast explicitly. customer grows with the fact tables (150k×SF rows),
    so its join strategy is left to size-based selection + AQE: at test scale
    Spark broadcasts it anyway, at 100 TB it becomes a shuffle join instead
    of OOMing every executor on a forced broadcast. lineitem⋈orders is the
    only unavoidable fact-fact shuffle, on the natural key. The region filter
    reaches the region scan before the broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_join_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (TPC-H Q13-shaped)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0)  AS n_cust,
           COALESCE(n_supp, 0)  AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates with COALESCE null-fill."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, cust.c_nk == supp.s_nk, "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0).cast("long")).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0).cast("long")).alias("n_supp"),
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one finished order."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


@register(
    "q_join_range",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) AS n_shipped_60d,
           ROUND(SUM(l_extendedprice), 2) AS value_shipped_60d
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join anchored on an equi key.

    Scale: the equi component (``l_orderkey = o_orderkey``) keeps this a
    hash/sort-merge join with the range as a residual filter — NOT a cross
    product. Pure range joins without an equi anchor should be bucketized
    first (see operators/similarity for that pattern).
    """
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_shipped_60d"),
            F.round(F.sum("l_extendedprice"), 2).alias("value_shipped_60d"),
        )
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name, (r_regionkey = n_regionkey) AS is_home
    FROM region CROSS JOIN nation
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (5 × 25)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

@register(
    "q_agg_group",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*)                               AS n_orders,
           ROUND(SUM(o_totalprice), 2)            AS total_value,
           ROUND(MIN(o_totalprice), 2)            AS min_value,
           ROUND(MAX(o_totalprice), 2)            AS max_value,
           CAST(MIN(o_orderdate) AS DATE)         AS first_date,
           CAST(MAX(o_orderdate) AS DATE)         AS last_date
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hash aggregate with count/sum/min/max over mixed types."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
            F.round(F.min("o_totalprice"), 2).alias("min_value"),
            F.round(F.max("o_totalprice"), 2).alias("max_value"),
            F.min("o_orderdate").cast("date").alias("first_date"),
            F.max("o_orderdate").cast("date").alias("last_date"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-column COUNT(DISTINCT) (expand + two-phase agg)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE                       AS approx_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HyperLogLog++).

    Different engines' HLL sketches never agree exactly, so the oracle checks
    the *approximation contract* instead: the sketch estimate must land
    within 10% of the exact count (default rsd is 5%). The estimate itself is
    deterministic for a given dataset — no RNG in HLL++.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= 0.10 * F.col("exact_orders")
            ).alias("approx_within_10pct"),
        )
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL')  AS region_name,
           COALESCE(n_name, 'ALL')  AS nation_name,
           COUNT(*)                 AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (region → nation → grand total)."""
    cust = _t(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_balance",
        )
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, '*') AS returnflag,
           COALESCE(l_linestatus, '*') AS linestatus,
           ROUND(SUM(l_quantity), 2)   AS sum_qty,
           COUNT(*)                    AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "q_agg_conditional",
    oracle="""
    SELECT o_orderstatus,
           ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice ELSE 0 END), 2) AS urgent_value,
           COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
           ROUND(AVG(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                          THEN o_totalprice END), 4)        AS avg_high_prio
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation via CASE inside the agg."""
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(0.0)
    big = F.when(F.col("o_totalprice") > 100000, F.lit(1))
    high = F.when(
        F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"),
        F.col("o_totalprice"),
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(urgent), 2).alias("urgent_value"),
            F.count(big).alias("n_big"),
            F.round(F.avg(high), 4).alias("avg_high_prio"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k, set operations
# ---------------------------------------------------------------------------

@register(
    "q_topk",
    oracle="""
    SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS price, rk
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 5
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: window row_number + filter.

    Scale: Spark plans this as a partial top-K per partition before the
    shuffle (WindowGroupLimit), so the exchange carries only K rows per
    group per partition, not the whole fact table. The (price, key) order is
    a total order, so ranks are deterministic.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rk",
        )
    )


@register(
    "q_setops",
    oracle="""
    SELECT nk, 'both' AS op FROM
      (SELECT c_nationkey AS nk FROM customer
       INTERSECT
       SELECT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT nk, 'cust_only' AS op FROM
      (SELECT c_nationkey AS nk FROM customer
       EXCEPT
       SELECT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT nk, 'either' AS op FROM
      (SELECT c_nationkey AS nk FROM customer
       UNION
       SELECT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT nk, 'cust_extra' AS op FROM
      (SELECT c_nationkey AS nk FROM customer
       EXCEPT ALL
       SELECT s_nationkey AS nk FROM supplier)
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (set) / EXCEPT ALL (bag) over nation keys."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cust.intersect(supp).withColumn("op", F.lit("both"))
    cust_only = cust.subtract(supp).withColumn("op", F.lit("cust_only"))
    either = cust.union(supp).distinct().withColumn("op", F.lit("either"))
    cust_extra = cust.exceptAll(supp).withColumn("op", F.lit("cust_extra"))
    return both.unionAll(cust_only).unionAll(either).unionAll(cust_extra)
