"""Registry mapping query names -> (Spark callable, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) wants two dicts: ``queries()``
(name -> callable(spark, sf_dir) -> DataFrame) and ``oracle_sql()`` (name ->
ANSI SQL DuckDB runs over the same parquet). Keeping them side by side in
one decorator guarantees they never drift, and lets tests iterate the whole
surface mechanically.

Hash-stability conventions (the driver compares row-count + schema +
order-insensitive value hash, with columns sorted by name):

* every computed/aggregate column is aliased identically on both sides;
* double-typed outputs are rounded (ROUND(x, n)) on BOTH sides so partial-
  aggregation order (Spark) vs sequential order (DuckDB) can't flip bits;
* DuckDB's widening aggregates are cast back (SUM(BIGINT) -> HUGEINT must be
  CAST AS BIGINT);
* timestamps in outputs are whole-second or date values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> driver runs a rows-only check
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
