"""Behavioral pins for the graph / time-series / split operators beyond
their DuckDB oracles: invariants the oracle comparison can't express
(conservation laws, partition totality, statistical shape).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ws_to_kafka_spark.operators import QUERIES


def test_pagerank_mass_conservation(spark, sf_dir):
    """On a symmetric graph (every node has out-edges), total rank mass is
    a fixed point: sum r' = 0.15*n + 0.85*sum r, and from r0 = 1 per node
    the sum stays exactly n at every iteration."""
    ranks = QUERIES["q_graph_pagerank"].fn(spark, sf_dir)
    row = ranks.agg(
        F.count("*").alias("n"), F.sum("pagerank").alias("mass")
    ).collect()[0]
    assert row.n > 0
    assert math.isclose(row.mass, row.n, rel_tol=1e-6), (row.mass, row.n)
    assert ranks.agg(F.min("pagerank")).collect()[0][0] >= 0.15


def test_degree_histogram_accounts_every_customer(spark, sf_dir):
    """The degree histogram must partition the purchasing customers."""
    hist = QUERIES["q_graph_degrees"].fn(spark, sf_dir)
    n_from_hist = hist.agg(F.sum("n_customers")).collect()[0][0]
    from ws_to_kafka_spark import tables

    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    n_direct = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_from_hist == n_direct


def test_rollup_daily_equals_hourly_resum(spark, sf_dir):
    """The daily grain must be exactly the re-aggregation of the hourly
    grain (the continuous-aggregate invariant): equal event totals."""
    out = QUERIES["q_rollup_multires"].fn(spark, sf_dir)
    totals = {
        r.grain: r.n
        for r in out.groupBy("grain").agg(F.sum("n_events").alias("n")).collect()
    }
    assert set(totals) == {"hour", "day"}
    assert totals["hour"] == totals["day"]


def test_anomaly_zscore_flags_are_extreme_and_rare(spark, sf_dir):
    """Every flagged event is >= 2.5 sigma; under any realistic value
    distribution that's a small fraction of the table (< 5%)."""
    out = QUERIES["q_anomaly_zscore"].fn(spark, sf_dir)
    rows = out.collect()
    assert all(abs(r.zscore) >= 2.5 for r in rows)
    from ws_to_kafka_spark import tables

    n_events = tables.load(spark, sf_dir, "events").count()
    assert 0 < len(rows) < 0.05 * n_events


def test_train_split_is_total_and_90_5_5(spark, sf_dir):
    """Split assignment must partition the corpus, and the hash buckets
    must realize ~90/5/5 (exact proportions depend on doc_id coverage;
    allow a generous band at tiny scale)."""
    out = QUERIES["q_train_split"].fn(spark, sf_dir).collect()
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    from ws_to_kafka_spark import tables

    n_docs = tables.load(spark, sf_dir, "documents").count()
    assert sum(by_split.values()) == n_docs
    assert set(by_split) == {"train", "validation", "test"}
    assert 0.80 <= by_split["train"] / n_docs <= 0.97


def test_centroid_confusion_is_total(spark, sf_dir):
    """Every vector lands in exactly one confusion cell, and predictions
    come from the true label vocabulary."""
    out = QUERIES["q_sim_centroid"].fn(spark, sf_dir)
    from ws_to_kafka_spark import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    labels = {r.label for r in emb.select("label").distinct().collect()}
    rows = out.collect()
    assert sum(r.n_vectors for r in rows) == n_vec
    assert {r.predicted for r in rows} <= labels


def test_zorder_buckets_have_tight_envelopes(spark, sf_dir):
    """Aligned z-range buckets of width 2^11 fix x bits 6-7 and y bits
    5-7, so every bucket's envelope is < 64 wide in part and < 32 wide in
    supp — the multi-dimension pruning guarantee a linear sort lacks."""
    rows = QUERIES["q_layout_zorder"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.part_hi - r.part_lo < 64, r
        assert r.supp_hi - r.supp_lo < 32, r
    from ws_to_kafka_spark import tables

    assert sum(r.n_rows for r in rows) == tables.load(
        spark, sf_dir, "lineitem"
    ).count()


def test_perplexity_scores_are_positive_and_total(spark, sf_dir):
    """Every multi-word doc gets a score; self-trained LM => every bigram
    seen => NLL finite and >= 0."""
    out = QUERIES["q_text_perplexity"].fn(spark, sf_dir).collect()
    from ws_to_kafka_spark import tables

    docs = tables.load(spark, sf_dir, "documents")
    import pyspark.sql.functions as F

    n_multi = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    assert len(out) == n_multi
    assert all(r.avg_nll >= 0 for r in out)
