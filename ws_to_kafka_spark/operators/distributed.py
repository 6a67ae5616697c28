"""Distributed implementations of operators that are trivially expressed
with a GLOBAL (unpartitioned) window but must never run as one.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY compiles to
``Window`` over ``Exchange SinglePartition`` — every row funnels through
one reducer, the canonical scale-killer (flagged by tools/plan_audit.py).
The helpers here produce the SAME answers with TeraSort-shaped plans:

``global_row_number``
    Range-repartition on the total order (parallel, range-balanced
    exchange), rank WITHIN each range partition (parallel windows), then
    add per-partition offsets from a tiny (#partitions-long) count
    vector collected as metadata. Because the order is TOTAL
    (caller must include a unique tiebreak) and range partitions are
    non-overlapping intervals of that order, offset + local position is
    exactly the global position regardless of where Spark draws the
    range boundaries.

This is the same structure Spark's own ``orderBy`` uses for its sort
(RangePartitioner sample -> per-partition sort); we bolt the offset
bookkeeping on top so the RANK, not just the order, distributes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_RANK_PARTS = 32  # range partitions for the rank exchange


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_parts: int = _RANK_PARTS,
    sum_col: str | None = None,
    sum_out: str = "cumsum",
) -> DataFrame:
    """Append ``out`` = 1-based global row_number under ``order_cols``
    (must be a TOTAL order — include a unique tiebreak column) without a
    single-partition window.

    Plan shape: one range exchange + parallel per-partition windows + a
    map-side offset lookup. The per-partition row counts (<= num_parts
    longs — partition METADATA, the same driver-side bookkeeping
    TeraSort's sampler keeps) are collected once and folded into an
    array LITERAL indexed by partition id, so the offset add is pure
    projection: no extra join, no window, no exchange.

    With ``sum_col`` set (must hold exact integers — longs — so the
    collected per-partition totals compose without float drift), the
    same single exchange ALSO emits ``sum_out`` = the global running sum
    of that column over the total order (rows unbounded preceding to
    current): a distributed prefix sum — per-partition running sums plus
    the prefix of partition totals, again collected as metadata.

    The frame is persisted before the count pass: ``spark_partition_id``
    must observe the SAME physical partitioning in the count pass and
    the rank pass, and RangePartitioner re-sampling on recompute is not
    guaranteed to reproduce identical boundaries. The persist is not
    explicitly unpersisted — the ranked output still reads it lazily, so
    the earliest safe release is after the consuming action; Spark's
    ContextCleaner unpersists it once the plan is unreachable (the same
    lifecycle every localCheckpoint in the iterative operators relies
    on), and the cached frame is the slim ranked projection, not the
    source table.
    """
    ranged = df.repartitionByRange(num_parts, *order_cols).withColumn(
        "_rank_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    aggs = [F.count("*").alias("_n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_s"))
    stats = {
        r["_rank_pid"]: r
        for r in ranged.groupBy("_rank_pid").agg(*aggs).collect()
    }
    max_pid = max(stats, default=-1)
    offs, acc = [], 0
    sum_offs, sum_acc = [], 0
    for pid in range(max_pid + 1):
        offs.append(acc)
        acc += stats[pid]["_n"] if pid in stats else 0
        if sum_col is not None:
            sum_offs.append(sum_acc)
            sum_acc += (stats[pid]["_s"] or 0) if pid in stats else 0
    w_pid = W.partitionBy("_rank_pid").orderBy(*order_cols)
    local = F.row_number().over(w_pid)
    offset = F.element_at(
        F.lit(offs or [0]).cast("array<long>"), F.col("_rank_pid") + 1
    )
    result = ranged.withColumn(out, (offset + local).cast("long"))
    if sum_col is not None:
        local_sum = F.sum(sum_col).over(
            w_pid.rowsBetween(W.unboundedPreceding, 0)
        )
        sum_offset = F.element_at(
            F.lit(sum_offs or [0]).cast("array<long>"),
            F.col("_rank_pid") + 1,
        )
        result = result.withColumn(
            sum_out, (sum_offset + local_sum).cast("long")
        )
    return result.drop("_rank_pid")


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division on long Columns: subtract the remainder
    first so the double division's quotient is an exact integer (< 2^53
    -> representable), then cast back. Avoids F.expr string plumbing for
    SQL's ``div``."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, n_total: Column, tiles: int) -> Column:
    """Exact SQL NTILE(tiles) from a global 1-based rank and the total
    row count — the map-side arithmetic twin of the window function.

    SQL NTILE semantics: with n rows, the first ``n % tiles`` tiles get
    ``n div tiles + 1`` rows, the rest ``n div tiles``. For 1-based rank
    r, small = n div tiles, rem = n % tiles, big = small + 1,
    boundary = rem * big:
        r <= boundary  ->  (r - 1) div big + 1
        else           ->  rem + (r - boundary - 1) div small + 1
    The small-quota branch divides by ``small`` which is 0 only when
    n < tiles — but then rem = n, boundary = n, and every rank takes the
    first branch, so the zero divisor is unreachable; it is nullif-
    guarded anyway (ANSI) with CASE's lazy per-row branch evaluation
    keeping the guard dead on real inputs.
    """
    t = F.lit(tiles).cast("long")
    n = n_total.cast("long")
    r = rank.cast("long")
    small = _idiv(n, t)
    rem = n % t
    big = small + 1
    boundary = rem * big
    tile = F.when(r <= boundary, _idiv(r - 1, big) + 1).otherwise(
        rem + _idiv(r - boundary - 1, F.nullif(small, F.lit(0))) + 1
    )
    return tile.cast("int")
