"""Shared fixtures: one local SparkSession + DuckDB oracle per test run."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ws_to_kafka_spark.session import get_spark  # noqa: E402
from ws_to_kafka_spark.streaming.protostub import ensure_protobuf  # noqa: E402
from ws_to_kafka_spark.tables import TABLE_NAMES  # noqa: E402

# Activate the vendored protobuf stub (no-op when the real package is
# installed) BEFORE any SparkSession exists: the transformWithState
# worker protocol needs google.protobuf in every process of the tree,
# and PYTHONPATH only propagates to JVM-spawned Python workers when set
# before the JVM launches.
PROTOBUF_MODE = ensure_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # 4 shuffle partitions for the TEST session (round 14, VERDICT r13
    # item 6 "trim per-test session work"): the suite runs at sf0.001
    # (500-row fixtures), where exchange cost is pure task-scheduling —
    # 16 reduce tasks of ~nothing per stage across ~470 Spark-bound
    # tests was a large share of the 19:44 fast lane. Nothing in the
    # engine is partition-count dependent (the round-13 session.py
    # note), and the one spark_partition_id use in tests is diagnostic.
    # Bench/driver sessions are untouched — this is the test fixture
    # only.
    # (measured round 14: whole-stage codegen OFF for the test session
    # saved nothing — 301 s vs 300 s over the 263 oracle tests — the
    # suite is job-floor-bound, not Janino-bound; don't revisit)
    spark = get_spark("tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
