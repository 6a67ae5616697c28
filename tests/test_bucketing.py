"""Bucketing: pre-partitioned tables make the fact⋈fact join shuffle-free.

The 100 TB playbook move for repeated joins on a stable key: write both
sides bucketed by the join key into the same bucket count, and the
sort-merge join reads co-located buckets with NO exchange. This test pins
that the engine's session/config actually deliver the shuffle-free plan.
"""

from __future__ import annotations

import pytest

from ws_to_kafka_spark import tables

# Plan/scale evidence (shuffle-free bucketed joins), not operator
# correctness; the module fixture writes bucketed tables (~30 s setup on
# the r14 host) — full-gate only (fast-lane budget, VERDICT r13 item 6).
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(d / "li"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(d / "ord"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li_name, ord_name = bucketed
    li, orders = spark.table(li_name), spark.table(ord_name)
    # disable broadcast so the join strategy is the bucket-aware SMJ
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        # and it actually computes the right thing
        n = joined.count()
        pli = tables.load(spark, "/root/testdata/sf0.001", "lineitem")
        por = tables.load(spark, "/root/testdata/sf0.001", "orders")
        plain = pli.join(por, pli.l_orderkey == por.o_orderkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned layout + a date predicate ⇒ the scan reads only
    matching partitions (PartitionFilters in the plan) — the layout that
    turns a 100 TB time-range query into a per-day directory read."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "events_by_day")
    events = tables.load(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    events.write.partitionBy("day").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-01")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200], plan[:1500]
    n_day1 = back.count()
    n_all = spark.read.parquet(out).count()
    assert 0 < n_day1 < n_all


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    li_name, _ = bucketed
    from pyspark.sql import functions as F

    li = spark.table(li_name)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_extendedprice").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed aggregation still shuffles"
    assert agg.count() > 0


def test_aqe_splits_skewed_join_partitions(spark):
    """The 100 TB skew story has two halves: explicit salting
    (q_join_salted) and AQE's runtime skew-join splitting. This pins the
    second: a 95%-hot-key join, with thresholds scaled down to fixture
    size, must execute with SortMergeJoin(skew=true) — the hot partition
    split into advisory-sized reads instead of one straggler task."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        big = spark.range(500_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("payload-payload-payload-"), F.col("id")).alias(
                "payload"
            ),
        )
        right = spark.range(97).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        out = big.join(right, "k").groupBy("name").agg(F.count("*").alias("n"))
        rows = out.collect()
        assert rows == [("dim", 500_000)]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # the AQEShuffleRead split marker
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_overwrite_is_idempotent_backfill(spark, tmp_path):
    """The 100 TB backfill pattern: partitionOverwriteMode=dynamic replaces
    ONLY the partitions present in the write, leaving siblings untouched —
    re-running a day's pipeline is idempotent and cannot clobber the rest
    of the table (static mode would truncate everything first)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    base = spark.range(100).select(
        (F.col("id") % 4).alias("day"), F.col("id").alias("v")
    )
    base.write.partitionBy("day").parquet(path)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # "re-run" day 2 only, with corrected values
        fix = spark.range(10).select(
            F.lit(2).alias("day"), (F.col("id") + 1000).alias("v")
        )
        fix.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    back = spark.read.parquet(path)
    assert back.where("day = 2").count() == 10          # replaced
    assert back.where("day = 2 AND v >= 1000").count() == 10
    assert back.where("day != 2").count() == 75          # untouched
