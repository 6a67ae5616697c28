"""Data-layout operators: Z-order (Morton) clustering for multi-column
min/max pruning — the table-maintenance step that makes 100 TB scans
selective on MORE than the partition column.

A linear sort on (a, b) gives perfect pruning on `a` and none on `b`.
Interleaving the bits of both keys (the Morton curve) before
range-bucketing gives every file a small min/max envelope in BOTH
dimensions, so a predicate on either column skips most files. This module
computes the z-value with plain integer arithmetic (one shared Python
loop emits the Spark and DuckDB expressions — no UDF), assigns each row
to a fixed-width z-range bucket (the "file"), and reports each bucket's
min/max envelope per dimension — the stat a scan planner would prune on.

Scale: the z-value is codegen'd scalar math on the scan; bucket
assignment is `zval div width` (NO global sort or NTILE — a total-order
window would funnel the table through one partition; fixed z-ranges keep
it map-only). The real table write is `df.repartitionByRange(N, zval)
.sortWithinPartitions(zval) .write...` — same math, plus one range
shuffle; the envelope report here is what its file footers would contain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from .registry import register

_ZBITS = 8          # low 8 bits of each key -> 16-bit z-value
_ZBUCKETS = 32      # fixed-width z-ranges ("files")
_ZWIDTH = (1 << (2 * _ZBITS)) // _ZBUCKETS


def _z_expr(x: str, y: str, div: str) -> str:
    """Morton interleave of the low _ZBITS of x (even bits) and y (odd
    bits), as a SQL expression string. ``div`` is the integer-division
    operator spelling ('div' for Spark SQL, '//' for DuckDB) — one loop
    emits both dialects so the two engines run the same arithmetic."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(({x} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "q_layout_zorder",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             {_z_expr("(l_partkey % 256)", "(l_suppkey % 256)", "//")} AS zval
      FROM lineitem
    )
    SELECT CAST(zval {"//"} {_ZWIDTH} AS BIGINT)  AS bucket,
           CAST(COUNT(*) AS BIGINT)               AS n_rows,
           MIN(l_partkey % 256)                   AS part_lo,
           MAX(l_partkey % 256)                   AS part_hi,
           MIN(l_suppkey % 256)                   AS supp_lo,
           MAX(l_suppkey % 256)                   AS supp_hi
    FROM z
    GROUP BY bucket
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering report: every lineitem row mapped to its Morton
    z-value over (l_partkey, l_suppkey) low bytes, bucketed into
    ``_ZBUCKETS`` fixed z-ranges, with each bucket's min/max envelope in
    both dimensions — small envelopes on BOTH columns are the whole point
    of Z-ordering (a linear sort would give tight part ranges but
    full-width supp ranges). See the module docstring for the scale shape.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    z = li.select(
        (F.col("l_partkey") % 256).alias("px"),
        (F.col("l_suppkey") % 256).alias("sx"),
        F.expr(_z_expr("(l_partkey % 256)", "(l_suppkey % 256)", "div")).alias("zval"),
    )
    return (
        z.groupBy(F.expr(f"zval div {_ZWIDTH}").alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("px").alias("part_lo"),
            F.max("px").alias("part_hi"),
            F.min("sx").alias("supp_lo"),
            F.max("sx").alias("supp_hi"),
        )
    )
