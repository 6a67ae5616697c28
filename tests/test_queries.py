"""Run EVERY registered query at sf0.001 against its DuckDB oracle —
the in-repo mirror of the driver's correctness gate (row count + column
set + order-insensitive value multiset; rows-only for oracle-less ops)."""

from __future__ import annotations

import pytest

from tools.verify_queries import compare
from ws_to_kafka_spark.operators import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    status = compare(spark, duck, name, sf_dir)
    assert status.startswith(("match", "rows-only")), status


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(QUERIES)
