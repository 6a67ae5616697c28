"""Behavioral invariants of the corpus-preparation operators, beyond the
oracle hash checks: coverage/budget properties and the physical-plan shapes
their scale claims depend on."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ws_to_kafka_spark import tables
from ws_to_kafka_spark.operators import QUERIES
from ws_to_kafka_spark.operators.pipeline_ops import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _PACK_BUDGET,
)


def test_doc_chunks_cover_all_tokens(spark, sf_dir):
    """Chunk windows must tile every document: starts advance by the
    stride, the last chunk reaches n_tok, and no chunk exceeds the size."""
    chunks = QUERIES["q_doc_chunks"].fn(spark, sf_dir)
    bad_size = chunks.filter(
        (F.col("end_tok") - F.col("start_tok") > _CHUNK_SIZE)
        | (F.col("end_tok") <= F.col("start_tok"))
    ).count()
    assert bad_size == 0
    bad_stride = chunks.filter(
        F.col("start_tok") != F.col("chunk_idx") * _CHUNK_STRIDE
    ).count()
    assert bad_stride == 0
    # per doc: max end == n_tok (full coverage) given stride <= size
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    uncovered = (
        chunks.groupBy("doc_id").agg(F.max("end_tok").alias("covered"))
        .join(docs, "doc_id")
        .filter(F.col("covered") != F.col("n_tok"))
        .count()
    )
    assert uncovered == 0


def test_pack_tokens_respects_budget(spark, sf_dir):
    """A shard's tokens may exceed the budget only by its final document
    (docs are assigned by the tokens BEFORE them)."""
    packed = QUERIES["q_pack_tokens"].fn(spark, sf_dir)
    over = (
        packed.groupBy("source", "shard")
        .agg(F.sum("n_tok").alias("tok"), F.max("n_tok").alias("biggest"))
        .filter(F.col("tok") > _PACK_BUDGET + F.col("biggest"))
        .count()
    )
    assert over == 0


def test_corpus_filter_partitions_the_corpus(spark, sf_dir):
    """The funnel report's doc counts must sum to the corpus size (every
    doc gets exactly one first-failing reason or 'kept')."""
    report = QUERIES["q_corpus_filter"].fn(spark, sf_dir)
    total = report.agg(F.sum("n_docs")).collect()[0][0]
    n_docs = tables.load(spark, sf_dir, "documents").count()
    assert total == n_docs


def _plan(spark, name, sf_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name].fn(spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_salted_join_stays_a_shuffle_join(spark, sf_dir):
    """q_join_salted exists to exercise the salted-shuffle plan; if the
    planner silently broadcast the replicated dim the demo would be moot."""
    plan = _plan(spark, "q_join_salted", sf_dir)
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_latest_per_key_uses_window_group_limit(spark, sf_dir):
    """The scale claim: one candidate row per key per partition ahead of
    the exchange."""
    assert "WindowGroupLimit" in _plan(spark, "q_latest_per_key", sf_dir)


def test_stratified_sample_filter_is_pushed(spark, sf_dir):
    """The modulo-band filter must reach the scan (no shuffle at all)."""
    plan = _plan(spark, "q_sample_stratified", sf_dir)
    assert "Exchange" not in plan


def test_bloom_prefilter_selective_and_lossless(spark, sf_dir):
    """The bloom prefilter must (a) actually prune the probe side and
    (b) never drop a true match (no false negatives)."""
    from ws_to_kafka_spark.operators.pipeline_ops import _bloom_prefiltered

    build, survivors = _bloom_prefiltered(spark, sf_dir)
    lineitem = tables.load(spark, sf_dir, "lineitem")
    total = lineitem.count()
    kept = survivors.count()
    true_matches = lineitem.join(
        build, lineitem["l_partkey"] == build["p_partkey"]
    ).count()
    # selectivity: the filtered brand is ~1/25 of parts, so the prefilter
    # must cut the probe side hard (allow generous slack for FPs)
    assert kept < total * 0.2, (kept, total)
    # losslessness: every true match survives the prefilter
    surviving_matches = survivors.join(
        build, survivors["l_partkey"] == build["p_partkey"]
    ).count()
    assert surviving_matches == true_matches


def test_vocab_topk_uses_take_ordered(spark, sf_dir):
    """The global top-K must compile to TakeOrderedAndProject (per-partition
    local top-K + driver merge), never a global sort."""
    plan = (
        QUERIES["q_vocab_topk"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_mix_sample_realizes_mix_weights(spark, sf_dir):
    """Per-language keep-rates of the materialized sample must track
    min(1, weight) from q_mix_weights (binomial slack allowed)."""
    kept = (
        QUERIES["q_mix_sample"].fn(spark, sf_dir).groupBy("lang").count().collect()
    )
    weights = {
        r["lang"]: (min(1.0, r["weight"]), r["n_docs"])
        for r in QUERIES["q_mix_weights"].fn(spark, sf_dir).collect()
    }
    for row in kept:
        rate, n_docs = weights[row["lang"]]
        expected = rate * n_docs
        # 6-sigma binomial slack; doc-level sampling at token-level rates
        # adds a little extra variance, so this is a sanity band, not a CI
        sigma = max((expected * (1 - rate)) ** 0.5, 1.0)
        assert abs(row["count"] - expected) < 8 * sigma + 6, (
            row["lang"], row["count"], expected,
        )


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """Exponential-race keys must actually bias selection by weight: the
    mean length of sampled docs exceeds the corpus mean (a fixed-fixture
    determinism pin, not a statistical flake — the sample is a pure
    function of doc_id), and every language contributes exactly k or its
    full doc count."""
    import pyspark.sql.functions as F

    from ws_to_kafka_spark import tables
    from ws_to_kafka_spark.operators import QUERIES

    out = QUERIES["q_sample_weighted"].fn(spark, sf_dir)
    sampled_mean = out.agg(F.avg("weight")).collect()[0][0]
    docs = tables.load(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sampled_mean > corpus_mean, (sampled_mean, corpus_mean)

    per_lang = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    avail = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in per_lang.items():
        assert n == min(3, avail[lang]), (lang, n, avail[lang])


def test_benford_frequencies_partition_unity(spark, sf_dir):
    """Per status, observed digit frequencies must sum to ~1 and digits
    must be a subset of 1..9 (integer-cents extraction can never emit a
    leading zero)."""
    import pyspark.sql.functions as F

    from ws_to_kafka_spark.operators import QUERIES

    rows = QUERIES["q_quality_benford"].fn(spark, sf_dir).collect()
    assert rows
    by_status: dict = {}
    for r in rows:
        assert r.digit in set("123456789"), r
        by_status.setdefault(r.o_orderstatus, 0.0)
        by_status[r.o_orderstatus] += r.obs_freq
    for status, total in by_status.items():
        assert abs(total - 1.0) < 1e-4, (status, total)
