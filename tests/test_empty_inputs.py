"""Degenerate-corpus robustness: EVERY registered query must execute on
empty inputs (same schemas, zero rows) without raising.

An engine serving a 100 TB pipeline constantly meets empty slices — a new
partition before data lands, a filter that matches nothing, a backfill of
a quiet day. Operators with seeding/head assumptions (first-k centroid
seeds, head-row broadcasts), divide-by-zero normalizers, or non-converging
iteration guards all break on empty input first, so this is the cheapest
whole-surface robustness gate we can run.
"""

from __future__ import annotations

import pytest

from ws_to_kafka_spark import tables
from ws_to_kafka_spark.operators import QUERIES


@pytest.fixture(scope="session")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for name in tables.TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    return dst


@pytest.mark.heavy  # ~95 s: one planned execution per registry key —
# whole-surface robustness, fast-lane-excluded (VERDICT r10 item 8)
def test_every_query_tolerates_empty_input(spark, empty_sf_dir):
    failures = []
    for qname, spec in sorted(QUERIES.items()):
        try:
            # collect(), NOT count(): count lets Catalyst prune the output
            # projection, silently skipping expressions (e.g. divides) that
            # are exactly what breaks on degenerate input
            spec.fn(spark, empty_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the full list
            failures.append(f"{qname}: {exc!r}")
    assert not failures, "queries crashed on empty input:\n" + "\n".join(failures)
