"""Data-quality operators: dataset profiling and constraint validation —
the Deequ/dbt-test-shaped checks a production training pipeline runs before
and after every transformation stage.

The reference has no notion of data quality (opaque frames in, opaque
records out); this extends the driver-mandated pipeline surface the same
way `pipeline_ops` does.

Scale rules: profiling is ONE scan with all statistics as parallel
aggregate expressions (never a scan per column); constraint checks fold
every row-level predicate into one conditional aggregate pass, with the
referential check as a broadcast-able anti-join — the only check that
inherently needs a second table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from .registry import register

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_oracle() -> str:
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS col_name,"
        f" COUNT(*) - COUNT({c}) AS n_nulls,"
        f" COUNT(DISTINCT {c}) AS n_distinct FROM orders"
        for c in _PROFILE_COLS
    )
    return selects


@register("q_profile_orders", oracle=_profile_oracle())
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling: per-column null and distinct counts over orders —
    the summary a pipeline records per snapshot to catch schema drift and
    degenerate columns before training on them.

    Scale: ONE scan — every statistic is a parallel aggregate expression in
    a single groupBy-less agg (the oracle unions per-column SELECTs only
    because portable SQL lacks ``stack``); the 1-row wide result is then
    unpivoted to rows driver-side-free with ``stack``.  At 100 TB exact
    distinct counts become ``approx_count_distinct`` — same single-scan
    plan, sketch-sized state (the `q_agg_approx` contract query pins that
    sketch's accuracy).
    """
    orders = tables.load(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append((F.count("*") - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "AS (col_name, n_nulls, n_distinct)"
    )


@register(
    "q_quality_checks",
    oracle="""
    WITH row_checks AS (
      SELECT
        COUNT(*) - COUNT(DISTINCT o_orderkey)                  AS uniq_violations,
        COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END)          AS price_violations,
        COUNT(*) - COUNT(o_orderdate)                          AS date_null_violations,
        COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                   THEN 1 END)                                 AS status_violations
      FROM orders
    ), fk AS (
      SELECT COUNT(*) AS fk_violations
      FROM orders o
      WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
      )
    )
    SELECT 'o_orderkey_unique' AS check_name,
           CAST(uniq_violations AS BIGINT) AS n_violations,
           uniq_violations = 0 AS passed FROM row_checks
    UNION ALL
    SELECT 'o_totalprice_positive', CAST(price_violations AS BIGINT),
           price_violations = 0 FROM row_checks
    UNION ALL
    SELECT 'o_orderdate_not_null', CAST(date_null_violations AS BIGINT),
           date_null_violations = 0 FROM row_checks
    UNION ALL
    SELECT 'o_orderstatus_domain', CAST(status_violations AS BIGINT),
           status_violations = 0 FROM row_checks
    UNION ALL
    SELECT 'o_custkey_fk_customer', CAST(fk_violations AS BIGINT),
           fk_violations = 0 FROM fk
    """,
)
def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation: uniqueness, positivity, non-null, value
    domain, and referential integrity over orders — one (check_name,
    n_violations, passed) row per rule, the dbt-test/Deequ report shape a
    pipeline gates promotion on.

    Scale: all four row-level rules fold into ONE conditional-aggregate
    scan; the FK rule is a left-anti join against the customer key column
    (broadcast-able when the dimension is bounded, shuffle otherwise —
    Catalyst's choice).  Nothing is per-check per-scan.
    """
    orders = tables.load(spark, sf_dir, "orders")
    customer = tables.load(spark, sf_dir, "customer")
    row_checks = orders.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("uniq"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("price"),
        (F.count("*") - F.count("o_orderdate")).alias("date_null"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("status"),
    )
    fk = (
        orders.join(
            customer.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("fk"))
    )
    wide = row_checks.crossJoin(F.broadcast(fk))
    stack_args = (
        "'o_orderkey_unique', uniq, "
        "'o_totalprice_positive', price, "
        "'o_orderdate_not_null', date_null, "
        "'o_orderstatus_domain', status, "
        "'o_custkey_fk_customer', fk"
    )
    return wide.selectExpr(
        f"stack(5, {stack_args}) AS (check_name, n_violations)"
    ).select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# PSI epsilon: conventional floor so empty buckets contribute a finite,
# deterministic term instead of +-inf (monitoring practice, not statistics).
_PSI_EPS = 1e-6
_PSI_SPLIT = "1998-01-01"
_PSI_WIDTH = 50000


@register(
    "q_drift_psi",
    oracle=f"""
    WITH b AS (
      SELECT CAST(LEAST(9, floor(o_totalprice / {_PSI_WIDTH})) AS BIGINT) AS bucket,
             o_orderdate < TIMESTAMP '{_PSI_SPLIT}' AS in_a
      FROM orders
    ), counts AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)     AS na,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT)     AS nb
      FROM b GROUP BY bucket
    ), tot AS (
      SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
      FROM counts
    )
    SELECT bucket, na, nb,
           ROUND(na / ta, 6) AS p_a,
           ROUND(nb / tb, 6) AS p_b,
           ROUND((GREATEST(nb / tb, {_PSI_EPS}) - GREATEST(na / ta, {_PSI_EPS}))
                 * LN(GREATEST(nb / tb, {_PSI_EPS})
                      / GREATEST(na / ta, {_PSI_EPS})), 6) AS psi_term
    FROM counts CROSS JOIN tot
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: Population Stability Index of the order
    price distribution between two periods (before/after {split}), over
    fixed price buckets — the check a training-data pipeline runs per
    ingest batch to catch corpus drift before it poisons a model (same
    formula credit-risk monitoring uses for score drift).

    Fixed bucket edges, not quantiles: quantile edges would re-derive from
    the data and move between runs, making drift unmeasurable — the edge
    set is part of the monitor's contract.  Empty buckets are floored at
    eps=1e-6 so PSI stays finite and deterministic.

    Scale: one scan, ten-key aggregate (bucket count is a constant), the
    totals side is a 1-row broadcast — no shuffle beyond the tiny
    bucket agg; this runs as a side-output of any ingest job."""
    orders = tables.load(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(9), F.floor(F.col("o_totalprice") / _PSI_WIDTH)
    ).cast("long")
    in_a = F.col("o_orderdate") < _PSI_SPLIT
    counts = (
        orders.select(bucket.alias("bucket"), in_a.alias("in_a"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("na"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("nb"),
        )
    )
    tot = counts.agg(
        F.sum("na").cast("long").alias("ta"), F.sum("nb").cast("long").alias("tb")
    )
    # An EMPTY period (ta or tb = 0) must yield NULL shares, not a crash:
    # ANSI divide throws where DuckDB's x/0 yields NULL, so the nullif
    # guard makes the engines agree automatically (registry convention).
    # GREATEST skips NULLs on BOTH engines, so the eps floor then kicks in
    # and psi_term stays finite (found by the tie-heavy threshold property
    # in test_randomized_oracle.py, rows=[(0, 0, False)]).
    pa = F.col("na") / F.nullif(F.col("ta"), F.lit(0))
    pb = F.col("nb") / F.nullif(F.col("tb"), F.lit(0))
    ga = F.greatest(pa, F.lit(_PSI_EPS))
    gb = F.greatest(pb, F.lit(_PSI_EPS))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "na",
        "nb",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round((gb - ga) * F.log(gb / ga), 6).alias("psi_term"),
    )


@register(
    "q_drift_ks",
    oracle="""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a,
             CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS b
      FROM orders
    ), g AS (
      SELECT v, CAST(SUM(a) AS BIGINT) AS c1, CAST(SUM(b) AS BIGINT) AS c2
      FROM cents GROUP BY v
    ), c AS (
      SELECT v,
             CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS s1,
             CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS s2
      FROM g
    ), tot AS (
      SELECT MAX(s1) AS n_a, MAX(s2) AS n_b FROM c
    ), gap AS (
      SELECT c.v, abs(c.s1 * tot.n_b - c.s2 * tot.n_a) AS gp,
             tot.n_a AS n_a, tot.n_b AS n_b
      FROM c CROSS JOIN tot
    ), mx AS (SELECT MAX(gp) AS m FROM gap)
    SELECT MAX(n_a) AS n_a,
           MAX(n_b) AS n_b,
           MIN(v) AS ks_at,
           floor(MAX(gp) / NULLIF(MAX(n_a) * MAX(n_b), 0)
                 * 1000000 + 0.5) / 1000000 AS ks_stat
    FROM gap WHERE gp = (SELECT m FROM mx)
    """,
)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test: the exact KS statistic
    (sup-norm CDF gap) between the order-price distributions of finished
    ('F') vs open/pending orders, plus the price point where the gap
    peaks — the sharper companion to q_drift_psi for detecting corpus
    drift between ingest batches (KS localizes WHERE distributions
    diverge; PSI only scores how much).

    Exactness: prices quantize to integer cents; per-value group counts
    and both cumulative counts are exact longs, and the CDF gap is
    compared CROSS-MULTIPLIED (|s1*n_b - s2*n_a|, max ~1e10 at sf1 —
    far inside long range) so the max and its argmin price are decided
    in integer arithmetic on both engines; the single double division
    happens once on the final scalar, floor-scale rounded to 6dp on both
    sides (registry convention). Empty side -> NULL via the nullif
    guard (ANSI divide-by-zero trap).

    Scale: groupBy(v) collapses the scan to distinct price points with
    map-side combine; the two-sample CDF is TWO distributed prefix sums
    riding ONE range exchange (:func:`distributed.global_row_number`
    ``extra_sums`` — per-partition totals collected as metadata, no
    single-partition window, no self-join); totals come free as the
    final cumsums. Everything after the exchange is aggregation over
    the distinct-values frame.
    """
    from .distributed import global_row_number

    orders = tables.load(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    cents = orders.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
        F.when(is_f, F.lit(1)).otherwise(F.lit(0)).alias("a"),
        F.when(is_f, F.lit(0)).otherwise(F.lit(1)).alias("b"),
    )
    g = cents.groupBy("v").agg(
        F.sum("a").cast("long").alias("c1"),
        F.sum("b").cast("long").alias("c2"),
    )
    # Grand totals come back driver-side for FREE from the prefix-sum
    # metadata (totals_out) — they were a broadcast-aggregate job over
    # the ranked frame before, one of five actions this query paid.
    totals: dict = {}
    cum = global_row_number(
        g,
        [F.col("v").asc()],
        out="_rn",
        sum_col="c1",
        sum_out="s1",
        extra_sums=[("c2", "s2")],
        totals_out=totals,
    )
    n_a, n_b = totals["s1"], totals["s2"]
    gap = cum.select(
        "v",
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.abs(
            F.col("s1") * F.lit(n_b) - F.col("s2") * F.lit(n_a)
        ).alias("gp"),
    )
    mx = gap.agg(F.max("gp").alias("m"))
    return (
        gap.crossJoin(F.broadcast(mx))
        .filter(F.col("gp") == F.col("m"))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.min("v").alias("ks_at"),
            F.max("gp").alias("_g"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_at",
            (
                F.floor(
                    F.col("_g")
                    / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("ks_stat"),
        )
    )


# log10(1 + 1/d) for d = 1..9, precomputed to 6dp so the expectation is a
# pure literal on both engines (no libm in the comparison path)
_BENFORD = (0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
            0.066947, 0.057992, 0.051153, 0.045757)


def _benford_case_sql() -> str:
    # CAST each literal: a bare decimal literal makes the whole CASE a
    # DECIMAL in DuckDB while Spark's map lookup yields DOUBLE
    whens = " ".join(
        f"WHEN '{d + 1}' THEN CAST({p} AS DOUBLE)"
        for d, p in enumerate(_BENFORD)
    )
    return f"CASE digit {whens} END"


@register(
    "q_quality_benford",
    oracle=f"""
    WITH d AS (
      SELECT o_orderstatus,
             SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS VARCHAR), 1, 1) AS digit
      FROM orders
      WHERE FLOOR(o_totalprice * 100 + 0.5) > 0
    ),
    c AS (
      SELECT o_orderstatus, digit, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY o_orderstatus) AS BIGINT)
               AS n_total
      FROM d GROUP BY o_orderstatus, digit
    )
    SELECT o_orderstatus, digit, n,
           FLOOR(n * 1.0 / n_total * 1000000 + 0.5) / 1000000 AS obs_freq,
           {_benford_case_sql()} AS exp_freq,
           FLOOR(ABS(n * 1.0 / n_total - {_benford_case_sql()})
                 * 1000000 + 0.5) / 1000000 AS abs_dev
    FROM c
    """,
)
def q_quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance check on the money column: the
    first-significant-digit histogram per order status against the
    log10(1 + 1/d) expectation — the forensic data-quality monitor for
    financial columns (fabricated or truncated amounts shift the digit
    mass; a synthetic-uniform generator fails it loudly, which is
    itself a data-quality finding about the fixture).

    Digit extraction avoids libm entirely: tie-free integer cents, then
    the FIRST CHARACTER of the integer's decimal string — integer
    formatting is exact and identical on both engines, where a
    floor(log10(x)) formulation can misbin at exact powers of ten if
    one engine's log10 lands an ulp low. Expected frequencies are
    precomputed 6dp literals.

    Scale: one scan, a 9-key-per-group aggregate (map-side combined),
    and a per-group total via a window over the TINY aggregated frame
    (54 rows) — never over the raw table.
    """
    from pyspark.sql import Window as W

    orders = tables.load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5)
    d = orders.filter(cents > 0).select(
        "o_orderstatus",
        F.substring(cents.cast("long").cast("string"), 1, 1).alias("digit"),
    )
    c = d.groupBy("o_orderstatus", "digit").agg(F.count("*").alias("n"))
    n_total = F.sum("n").over(W.partitionBy("o_orderstatus"))
    obs = F.col("n") * 1.0 / F.col("n_total")
    exp_map = F.create_map(
        *[x for dd, p in enumerate(_BENFORD) for x in (F.lit(str(dd + 1)), F.lit(p))]
    )
    exp = F.try_element_at(exp_map, F.col("digit"))
    return (
        c.withColumn("n_total", n_total)
        .select(
            "o_orderstatus",
            "digit",
            "n",
            (F.floor(obs * 1000000 + 0.5) / 1000000).alias("obs_freq"),
            exp.alias("exp_freq"),
            (F.floor(F.abs(obs - exp) * 1000000 + 0.5) / 1000000).alias(
                "abs_dev"
            ),
        )
    )


@register(
    "q_ab_lift",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN COALESCE(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END), 0) > 60000
                  THEN 1 ELSE 0 END AS converted
      FROM events
      GROUP BY user_id
    ), v AS (
      SELECT variant, COUNT(*) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM per_user GROUP BY variant
    ), wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n END)    AS n_a,
        MAX(CASE WHEN variant = 'A' THEN conv END) AS conv_a,
        MAX(CASE WHEN variant = 'B' THEN n END)    AS n_b,
        MAX(CASE WHEN variant = 'B' THEN conv END) AS conv_b
      FROM v
    )
    SELECT n_a, conv_a, n_b, conv_b,
      ROUND(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
      ROUND(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
      ROUND((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
            - (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)), 6)
        AS abs_lift,
      ROUND(((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             - (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
            / NULLIF(SQRT(
                (CAST(conv_a + conv_b AS DOUBLE)
                 / CAST(n_a + n_b AS DOUBLE))
                * (1.0 - (CAST(conv_a + conv_b AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE)))
                * ((1.0 / CAST(n_a AS DOUBLE))
                   + (1.0 / CAST(n_b AS DOUBLE)))
              ), 0),
            6) AS z_score
    FROM wide
    """,
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic parity split of users into
    variants, per-user conversion (lifetime purchase value > $600), and
    the two-proportion z-test (pooled standard error) on the conversion
    rates — the ship/no-ship statistic behind every experimentation
    platform.

    Cross-engine floats, the hard part: conversion thresholds a SUM, and
    a raw double SUM is order-dependent (Spark's partial aggregation vs
    DuckDB's row order), so the metric accumulates in exact integer
    CENTS (the q_agg_money pattern) and the threshold compares BIGINTs.
    Every downstream statistic is then a fixed tree of binary IEEE ops
    on exactly-represented integers (divisions, one multiply chain, one
    correctly-rounded sqrt) written with IDENTICAL association on both
    engines — neither engine reassociates float arithmetic, so the
    z-score matches bit-for-bit before the cosmetic 6dp round. The z
    divide is nullif-guarded: a degenerate 0%/100% experiment has zero
    pooled variance — NULL z on both engines, not an ANSI divide error.

    Scale: one shuffle on user_id for the per-user fold, then a 2-group
    aggregate; the variant pivot is a constant-size MAX-CASE frame. A
    z-test at 100 TB is the same two partial-aggregable counts — the
    statistic never needs the raw rows.
    """
    events = tables.load(spark, sf_dir, "events")
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.floor(F.col("value") * 100 + F.lit(0.5)).cast(
                            "long"
                        ),
                    ).otherwise(F.lit(0).cast("long"))
                ),
                F.lit(0).cast("long"),
            ).alias("cents")
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("variant"),
            F.when(F.col("cents") > 60000, F.lit(1))
            .otherwise(F.lit(0))
            .alias("converted"),
        )
    )
    v = per_user.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("conv"))).alias("conv_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    rate_a = d("conv_a") / d("n_a")
    rate_b = d("conv_b") / d("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * ((F.lit(1.0) / d("n_a")) + (F.lit(1.0) / d("n_b")))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(rate_b - rate_a, 6).alias("abs_lift"),
        F.round((rate_b - rate_a) / F.nullif(se, F.lit(0.0)), 6).alias(
            "z_score"
        ),
    )


@register(
    "q_ab_ttest",
    oracle="""
    WITH obs AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ), v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) AS s1, SUM(cents * cents) AS s2
      FROM obs GROUP BY variant
    ), wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n END)  AS n_a,
        MAX(CASE WHEN variant = 'A' THEN s1 END) AS s1_a,
        MAX(CASE WHEN variant = 'A' THEN s2 END) AS s2_a,
        MAX(CASE WHEN variant = 'B' THEN n END)  AS n_b,
        MAX(CASE WHEN variant = 'B' THEN s1 END) AS s1_b,
        MAX(CASE WHEN variant = 'B' THEN s2 END) AS s2_b
      FROM v
    ), stats AS (
      SELECT n_a, n_b,
        CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100 AS mean_a,
        CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100 AS mean_b,
        (CAST(s2_a AS DOUBLE)
         - (CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE))
           / CAST(n_a AS DOUBLE))
        / CAST(n_a - 1 AS DOUBLE) / CAST(n_a AS DOUBLE) AS se2_a,
        (CAST(s2_b AS DOUBLE)
         - (CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE))
           / CAST(n_b AS DOUBLE))
        / CAST(n_b - 1 AS DOUBLE) / CAST(n_b AS DOUBLE) AS se2_b
      FROM wide
    )
    SELECT n_a, n_b,
      ROUND(mean_a, 6) AS mean_a,
      ROUND(mean_b, 6) AS mean_b,
      ROUND((mean_b - mean_a)
            / NULLIF(SQRT(se2_a + se2_b), 0) * 100, 6) AS t_stat,
      ROUND(((se2_a + se2_b) * (se2_a + se2_b))
            / NULLIF((se2_a * se2_a) / CAST(n_a - 1 AS DOUBLE)
                     + (se2_b * se2_b) / CAST(n_b - 1 AS DOUBLE), 0),
            2) AS welch_df
    FROM stats
    """,
)
def q_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on mean purchase value between
    the parity-split experiment variants — the continuous-metric
    companion to q_ab_lift's two-proportion z (revenue-per-event
    experiments read THIS statistic, not a conversion rate).

    Cross-engine floats, the q_ab_lift discipline extended to second
    moments: per-event values enter as exact integer CENTS and only
    (n, sum, sum-of-squares) cross the wire — all exact BIGINTs
    (cents^2 <= 1e10 per row keeps the S2 sum under 2^53 through
    ~1e5 purchase rows per variant at sf0.1; beyond that the sums
    stay exact longs JVM-side and the DuckDB cast order is identical,
    documented bound). Every derived statistic — Welch standard
    errors, t, the Satterthwaite df — is a FIXED TREE of binary IEEE
    ops written with identical association in both engines; inputs
    identical + association identical = bit-identical outputs, no
    reassociation either engine. Degenerate inputs nullif-guard to
    NULL on both sides: zero pooled variance (constant metric) NULLs
    the t ratio, and an n<2 variant NULLs its sample variance (the
    /(n-1) terms in se2 and the Satterthwaite df are nullif-guarded,
    ANSI-safe), so t_stat/welch_df come back NULL on both engines
    instead of Spark throwing DIVIDE_BY_ZERO. Means are
    rescaled cents -> dollars for display; the t ratio multiplies the
    dollar difference back by 100 so numerator and the cent-unit
    standard error cancel into the dimensionless statistic (the df
    ratio's cents^4 factors cancel on their own).

    Scale: one map-side-combinable 2-group aggregate over the fact
    scan; the pivot and statistic operate on a 1-row frame. The raw
    rows never feed the statistic — the same sufficient-statistics
    argument as q_ab_lift, so 100 TB costs one scan.
    """
    events = tables.load(spark, sf_dir, "events")
    obs = events.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("variant"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    v = obs.groupBy("variant").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    wide = v.groupBy().agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("s1"))).alias("s1_a"),
        F.max(F.when(F.col("variant") == "A", F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("s1"))).alias("s1_b"),
        F.max(F.when(F.col("variant") == "B", F.col("s2"))).alias("s2_b"),
    )

    def d(c):
        return F.col(c).cast("double")

    mean_a = d("s1_a") / d("n_a") / 100
    mean_b = d("s1_b") / d("n_b") / 100
    se2_a = (
        (d("s2_a") - (d("s1_a") * d("s1_a")) / d("n_a"))
        / F.nullif(d("n_a") - F.lit(1.0), F.lit(0.0))
        / d("n_a")
    )
    se2_b = (
        (d("s2_b") - (d("s1_b") * d("s1_b")) / d("n_b"))
        / F.nullif(d("n_b") - F.lit(1.0), F.lit(0.0))
        / d("n_b")
    )
    stats = wide.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a_raw"),
        mean_b.alias("mean_b_raw"),
        se2_a.alias("se2_a"),
        se2_b.alias("se2_b"),
    )
    return stats.select(
        "n_a",
        "n_b",
        F.round("mean_a_raw", 6).alias("mean_a"),
        F.round("mean_b_raw", 6).alias("mean_b"),
        F.round(
            (F.col("mean_b_raw") - F.col("mean_a_raw"))
            / F.nullif(
                F.sqrt(F.col("se2_a") + F.col("se2_b")), F.lit(0.0)
            )
            * 100,
            6,
        ).alias("t_stat"),
        F.round(
            (
                (F.col("se2_a") + F.col("se2_b"))
                * (F.col("se2_a") + F.col("se2_b"))
            )
            / F.nullif(
                (F.col("se2_a") * F.col("se2_a"))
                / F.nullif(F.col("n_a").cast("double") - F.lit(1.0), F.lit(0.0))
                + (F.col("se2_b") * F.col("se2_b"))
                / F.nullif(F.col("n_b").cast("double") - F.lit(1.0), F.lit(0.0)),
                F.lit(0.0),
            ),
            2,
        ).alias("welch_df"),
    )


# Bootstrap: B half-sample replicates selected by a MINSTD LCG of the
# event key (deterministic and engine-portable, the q_sample_negative
# discipline); replicate means quantized to 1e-4-cent units by INTEGER
# division so the across-replicate moments are exact longs.
_BOOT_B = 16
_BOOT_A = 48271
_BOOT_M = 2147483647


@register(
    "q_ab_bootstrap",
    oracle=f"""
    WITH obs AS (
      SELECT event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ), rep AS (
      SELECT b.b, obs.cents
      FROM obs CROSS JOIN (
        SELECT UNNEST(range({_BOOT_B})) AS b
      ) b
      WHERE ((obs.event_id * {_BOOT_B} + b.b + 1) * {_BOOT_A})
            % {_BOOT_M} < {_BOOT_M // 2}
    ), means AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(cents) AS BIGINT) * 10000
               // NULLIF(CAST(COUNT(*) AS BIGINT), 0) AS m
      FROM rep GROUP BY b
    ), mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
             CAST(SUM(n_b) AS BIGINT) AS n_draws,
             CAST(SUM(m) AS BIGINT) AS s1,
             CAST(SUM(m * m) AS BIGINT) AS s2
      FROM means
    )
    SELECT n_reps, n_draws,
           floor(CAST(s1 AS DOUBLE) / NULLIF(CAST(n_reps AS DOUBLE), 0)
                 / 1000000 * 1000000 + 0.5) / 1000000 AS boot_mean,
           floor(sqrt(CAST(n_reps * s2 - s1 * s1 AS DOUBLE)
                      / NULLIF(CAST(n_reps * (n_reps - 1) AS DOUBLE), 0))
                 / 1000000 * 1000000 + 0.5) / 1000000 AS boot_se
    FROM mom
    """,
)
def q_ab_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap standard error of the mean purchase value: {_BOOT_B}
    deterministic half-sample replicates (each event joins replicate b
    iff a MINSTD LCG of (event_id, b) lands in the lower half of the
    modulus), each replicate's mean, and the across-replicate mean and
    sample-std — the uncertainty quantification a metrics pipeline
    attaches to every point estimate (q_ab_ttest's model-free sibling:
    no normality assumption, just resampling).

    Determinism (the hard part of resampling cross-engine): the
    "random" inclusions are a pure integer LCG both engines compute
    identically (bounds: event_id*B*A < 2^63 far past 100 TB key
    ranges), and each replicate mean is quantized to 1e-4-cent units by
    integer division that TRUNCATES toward zero on both engines (Spark
    `div`; DuckDB 1.0.0 integer `//` — which truncates, NOT Python-style
    floor; agreement on refund-valued/negative sums is pinned in
    tests/test_randomized_oracle.py) — so the across-replicate moments
    are EXACT longs; the final sqrt/divides are one fixed IEEE tree,
    floor-6 rounded. Empty replicates nullif to NULL rather than
    tripping ANSI division.

    Scale: the {_BOOT_B}x fan-out is map-side (explode of a literal
    range) feeding ONE map-combined aggregate down to {_BOOT_B} rows —
    the classic Poisson-bootstrap-on-MapReduce shape (Kleiner et al.'s
    bag-of-little-bootstraps reduces the same way); the raw scan is
    paid once regardless of B.
    """
    events = tables.load(spark, sf_dir, "events")
    obs = events.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    rep = obs.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "event_id",
    ).filter(
        ((F.col("event_id") * _BOOT_B + F.col("b") + 1) * _BOOT_A)
        % _BOOT_M
        < _BOOT_M // 2
    )
    means = rep.groupBy("b").agg(
        F.count("*").cast("long").alias("n_b"),
        F.expr("CAST(sum(cents) AS BIGINT) * 10000")
        .alias("_s"),
    ).select(
        "b",
        "n_b",
        # Integer division on exact longs: BOTH engines truncate toward
        # zero — Spark `div` by definition, and DuckDB 1.0.0's integer
        # `//` as well (-5 // 2 = -2; verified, and pinned by
        # tests/test_randomized_oracle.py on refund-valued/negative
        # sums). An earlier revision "corrected" Spark toward floor
        # semantics DuckDB does not have, which diverged by 1 unit on
        # any negative-sum replicate — caught by the hypothesis pin,
        # never by fixtures (purchase values are non-negative there).
        # Stays in exact integer arithmetic — no double roundtrip,
        # valid past 2^53.
        F.expr("_s div nullif(n_b, 0)").alias("m"),
    )
    mom = means.agg(
        F.count("*").cast("long").alias("n_reps"),
        F.sum("n_b").cast("long").alias("n_draws"),
        F.sum("m").cast("long").alias("s1"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("s2"),
    )
    return mom.select(
        "n_reps",
        "n_draws",
        (
            F.floor(
                F.col("s1").cast("double")
                / F.nullif(F.col("n_reps").cast("double"), F.lit(0.0))
                / 1000000
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("boot_mean"),
        (
            F.floor(
                F.sqrt(
                    (
                        F.col("n_reps") * F.col("s2")
                        - F.col("s1") * F.col("s1")
                    ).cast("double")
                    / F.nullif(
                        (
                            F.col("n_reps") * (F.col("n_reps") - 1)
                        ).cast("double"),
                        F.lit(0.0),
                    )
                )
                / 1000000
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("boot_se"),
    )


@register(
    "q_ab_chi2",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS status,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ), rows_ AS (
      SELECT pri, CAST(SUM(obs) AS BIGINT) AS r FROM cells GROUP BY pri
    ), cols_ AS (
      SELECT status, CAST(SUM(obs) AS BIGINT) AS c FROM cells
      GROUP BY status
    ), tot AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells
    )
    SELECT cells.pri, cells.status, cells.obs,
           floor(CAST(rows_.r * cols_.c AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS expected,
           floor((CAST(cells.obs AS DOUBLE)
                  - CAST(rows_.r * cols_.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 * (CAST(cells.obs AS DOUBLE)
                    - CAST(rows_.r * cols_.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 / NULLIF(CAST(rows_.r * cols_.c AS DOUBLE)
                          / CAST(tot.n AS DOUBLE), 0)
                 * 1000000 + 0.5) / 1000000 AS chi2_term
    FROM cells
    JOIN rows_ USING (pri) JOIN cols_ USING (status) CROSS JOIN tot
    """,
)
def q_ab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and order
    status: the observed contingency cell counts, the
    independence-expected count r_i*c_j/n, and each cell's chi2
    contribution (obs-exp)^2/exp — the categorical-association monitor
    completing the drift/test family (PSI scores a 1-D shift, KS
    localizes it, chi2 catches CROSS-FIELD dependence drift, e.g. a
    corpus where language and source stop being independent).

    Exactness: cell counts, row/col totals and n are exact longs; exp
    and the chi2 term are FIXED TREES of IEEE double ops written with
    identical association in both engines (the q_ab_ttest discipline),
    floor-scale rounded at 6dp. Cells are enumerated from the observed
    contingency table (a structurally-zero cell contributes no row —
    both engines enumerate the same set). exp > 0 whenever a cell
    exists (its row and column totals are >= obs >= 1); the nullif
    guard is belt-and-braces for the ANSI divide.

    Scale: one conditional-aggregate scan to the contingency table
    (bounded: |priorities| x |statuses| rows), then all totals derive
    from THAT table (never a second fact scan) and join back broadcast
    — the whole statistic is metadata-sized after one pass, the same
    sufficient-statistics argument as q_ab_lift/q_ab_ttest.
    """
    orders = tables.load(spark, sf_dir, "orders")
    from .distributed import _track

    cells = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count("*").cast("long").alias("obs"))
    # persisted so rows_/cols_/tot derive from the 15-row contingency
    # table instead of re-scanning orders once each; released by the
    # harnesses via distributed.release_persisted()
    cells = cells.persist()
    _track(cells)
    rows_ = cells.groupBy("pri").agg(F.sum("obs").cast("long").alias("r"))
    cols_ = cells.groupBy("status").agg(
        F.sum("obs").cast("long").alias("c")
    )
    tot = cells.agg(F.sum("obs").cast("long").alias("n"))
    exp = (F.col("r") * F.col("c")).cast("double") / F.col("n").cast(
        "double"
    )
    diff = F.col("obs").cast("double") - exp
    return (
        cells.join(F.broadcast(rows_), "pri")
        .join(F.broadcast(cols_), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "pri",
            "status",
            "obs",
            (F.floor(exp * 1000000 + F.lit(0.5)) / 1000000).alias(
                "expected"
            ),
            (
                F.floor(
                    diff * diff / F.nullif(exp, F.lit(0.0)) * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("chi2_term"),
        )
    )


@register(
    "q_skew_keys",
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS rn
      FROM per_key
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_events,
           CAST(MAX(cnt) AS BIGINT) AS max_count,
           FLOOR(MAX(cnt) * 1000000.0 / SUM(cnt) + 0.5) / 1000000
             AS top1_share,
           FLOOR((2.0 * SUM(rn * cnt) - (COUNT(*) + 1.0) * SUM(cnt))
                 / (COUNT(*) * 1.0 * SUM(cnt)) * 1000000 + 0.5) / 1000000
             AS gini
    FROM ranked
    """,
)
def q_skew_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report: the pre-flight diagnosis every large join
    or aggregation wants BEFORE picking a strategy — key cardinality,
    hottest-key share, and the Gini coefficient of the key-frequency
    distribution (0 = uniform keys, ->1 = one key owns the traffic).
    top1_share >> 1/n_keys or gini near 1 is the signal to salt
    (q_join_salted) or lean on AQE skew-join.

    The Gini uses the exact rank formulation G = (2*Σ(i*x_i) -
    (n+1)*Σx) / (n*Σx) over counts sorted ascending — ranks come from
    :func:`distributed.global_row_number` (range exchange + parallel
    windows + metadata offsets), NEVER a single-partition window: this
    query's whole purpose is scale hygiene, so its own plan must pass
    the plan_audit window check it motivated. All accumulations are
    exact BIGINTs (bounded by n*total <= 2^53 at any realistic key
    cardinality — documented bound), divided once and floor-scale
    displayed.

    Scale: one hash shuffle for the per-key count (map-side combined),
    one range exchange for the rank, one scalar aggregate. Output is a
    single row.
    """
    from .distributed import global_row_number

    events = tables.load(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("cnt")
    )
    ranked = global_row_number(
        per_key, [F.col("cnt").asc(), F.col("user_id").asc()], "rn"
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cnt").alias("total_events"),
        F.max("cnt").alias("max_count"),
        (
            F.floor(
                F.max("cnt") * F.lit(1000000.0) / F.sum("cnt") + F.lit(0.5)
            )
            / 1000000
        ).alias("top1_share"),
        (
            F.floor(
                (
                    F.lit(2.0) * F.sum(F.col("rn") * F.col("cnt"))
                    - (F.count("*") + F.lit(1.0)) * F.sum("cnt")
                )
                / (F.count("*") * F.lit(1.0) * F.sum("cnt"))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("gini"),
    )
