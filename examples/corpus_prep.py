"""End-to-end corpus-preparation walkthrough over the `documents` fixtures:

    profile -> quality gate -> filter funnel -> duplicate clusters ->
    keeper selection -> stratified sample -> token-packed shards

Every step is a registered engine operator (see
`ws_to_kafka_spark/operators/`), so this script is just the composition a
pipeline owner would run; each operator is independently verified against
its DuckDB oracle by `tools/verify_queries.py`.

Usage: ``python examples/corpus_prep.py [sf_dir]`` (default sf0.001).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ws_to_kafka_spark.operators import QUERIES  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("corpus-prep")
    q = {name: QUERIES[name].fn for name in QUERIES}

    print(f"== corpus preparation over {SF_DIR}\n")

    print("-- 1. profile (schema drift / degenerate columns)")
    q["q_profile_orders"](spark, SF_DIR).show(truncate=False)

    print("-- 2. quality gate (promotion blocked if any check fails)")
    checks = q["q_quality_checks"](spark, SF_DIR)
    checks.show(truncate=False)
    failed = checks.filter(~F.col("passed")).count()
    print(f"   {failed} failing checks\n")

    print("-- 3. filter funnel (first failing rule per doc)")
    q["q_corpus_filter"](spark, SF_DIR).orderBy("lang", "reason").show(50)

    print("-- 3b. quality-classifier scores (frozen logistic model)")
    q["q_score_logistic"](spark, SF_DIR).groupBy("keep").count().show()

    print("-- 3c. duplicated-span statistics (ExactSubstr-style)")
    q["q_dedup_substring"](spark, SF_DIR).agg(
        F.count("*").alias("docs"),
        F.sum("dup_spans").alias("total_spans"),
        F.round(F.avg("dup_ratio"), 4).alias("mean_dup_ratio"),
    ).show()

    print("-- 3d. distribution drift vs the reference period (PSI)")
    psi = q["q_drift_psi"](spark, SF_DIR)
    psi.agg(F.round(F.sum("psi_term"), 6).alias("psi_total")).show()

    print("-- 4. duplicate clusters -> keeper per cluster")
    clusters = q["q_dedup_clusters"](spark, SF_DIR)
    n_members = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"   {n_members} docs in {n_clusters} duplicate clusters "
          f"({n_members - n_clusters} docs would be dropped)\n")

    print("-- 5. stratified sample sizes per language")
    q["q_sample_stratified"](spark, SF_DIR).groupBy("lang").count().orderBy(
        "lang"
    ).show()

    print("-- 6. token-packed shards per source (first 10)")
    q["q_pack_tokens"](spark, SF_DIR).groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    ).orderBy("source", "shard").show(10)

    print("-- 7. mixing weights toward the target language shares")
    q["q_mix_weights"](spark, SF_DIR).orderBy("lang").show()

    print("-- 8. the final cleaned corpus (filter ∧ dedup-keeper)")
    final = q["q_corpus_final"](spark, SF_DIR)
    final.groupBy("lang").count().orderBy("lang").show()
    print(f"   final corpus: {final.count()} documents\n")

    print("-- 9. incremental ingest check (today's batch vs the history index)")
    incr = q["q_dedup_incremental"](spark, SF_DIR)
    print(f"   {incr.count()} batch docs already near-present in history\n")

    print("-- 10. tokenizer induction: first BPE merge rules")
    q["q_bpe_merges"](spark, SF_DIR).orderBy("step").show(truncate=False)

    print("-- 11. semantic balance: embedding cluster sizes (Lloyd k-means)")
    q["q_embed_kmeans"](spark, SF_DIR).groupBy("cluster_id").count().orderBy(
        "cluster_id"
    ).show()

    print("-- 12. training order: sharded deterministic shuffle")
    q["q_corpus_shuffle"](spark, SF_DIR).groupBy("shard").count().orderBy(
        "shard"
    ).show(8)


if __name__ == "__main__":
    main()
