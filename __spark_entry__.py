"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in :mod:`ws_to_kafka_spark.operators`: importing the
package populates its registry (one ``QuerySpec`` per operator, pairing the
Spark callable with its DuckDB oracle so the two can never drift), and this
module just exposes that registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ws_to_kafka_spark.operators import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q_flagship_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query; queries
    without an entry here (approximate/stubbed/engine-hash-based ops) get
    the driver's rows-only check, backed by unit tests in ``tests/``."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
