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

#: Every ranged frame persisted by ``global_row_number`` — the rank pass
#: must cache its range exchange (RangePartitioner re-sampling on
#: recompute is not guaranteed to reproduce boundaries), but a session
#: that builds many plans would otherwise accumulate cached copies until
#: ContextCleaner gets to them. Long-running harnesses (verify loop,
#: bench) call :func:`release_persisted` after each consuming action.
_PERSISTED: list[DataFrame] = []


def release_persisted() -> None:
    """Unpersist every ranked frame created by ``global_row_number``.

    Safe to call only AFTER the consuming action (the ranked output
    reads the cache lazily); harmless to call twice or when empty.
    """
    while _PERSISTED:
        frame = _PERSISTED.pop()
        try:
            frame.unpersist()
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_parts: int = _RANK_PARTS,
    sum_col: str | None = None,
    sum_out: str = "cumsum",
    extra_sums: list[tuple[str, str]] | None = None,
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
    ``extra_sums`` adds further ``(column, out_name)`` prefix-sum pairs
    riding the SAME exchange and count pass (the per-partition totals
    vector just grows one long per pair) — a two-sample CDF (q_drift_ks)
    is two prefix sums over one total order, one exchange.

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
    _PERSISTED.append(ranged)
    pairs = ([(sum_col, sum_out)] if sum_col is not None else []) + list(
        extra_sums or []
    )
    aggs = [F.count("*").alias("_n")] + [
        F.sum(c).alias(f"_s{i}") for i, (c, _) in enumerate(pairs)
    ]
    stats = {
        r["_rank_pid"]: r
        for r in ranged.groupBy("_rank_pid").agg(*aggs).collect()
    }
    max_pid = max(stats, default=-1)
    offs, acc = [], 0
    sum_offs = [[] for _ in pairs]
    sum_accs = [0] * len(pairs)
    for pid in range(max_pid + 1):
        offs.append(acc)
        acc += stats[pid]["_n"] if pid in stats else 0
        for i in range(len(pairs)):
            sum_offs[i].append(sum_accs[i])
            if pid in stats:
                sum_accs[i] += stats[pid][f"_s{i}"] or 0
    w_pid = W.partitionBy("_rank_pid").orderBy(*order_cols)
    local = F.row_number().over(w_pid)
    offset = F.element_at(
        F.lit(offs or [0]).cast("array<long>"), F.col("_rank_pid") + 1
    )
    result = ranged.withColumn(out, (offset + local).cast("long"))
    for i, (c, o) in enumerate(pairs):
        local_sum = F.sum(c).over(
            w_pid.rowsBetween(W.unboundedPreceding, 0)
        )
        sum_offset = F.element_at(
            F.lit(sum_offs[i] or [0]).cast("array<long>"),
            F.col("_rank_pid") + 1,
        )
        result = result.withColumn(o, (sum_offset + local_sum).cast("long"))
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


def global_ntile(
    df: DataFrame,
    order_pairs: list[tuple[str, bool]],
    tiles: int,
    out: str,
    num_parts: int = _RANK_PARTS,
) -> DataFrame:
    """Append ``out`` = exact SQL ``NTILE(tiles)`` under the total order
    ``order_pairs`` ([(column, ascending), ...] — the caller MUST include
    a unique tiebreak column) — with NO global rank materialized at all.

    The tile of a row depends only on which side of ``tiles - 1``
    boundary TUPLES it falls — order statistics, i.e. metadata, not a
    per-row rank. So: range-exchange only the slim ordering projection,
    collect the per-partition counts (a #partitions-long vector), locate
    which partition holds each boundary rank, pick the boundary tuples
    with a window over just those partitions (bounded work), and assign
    tiles MAP-SIDE on the full frame as ``1 + #boundaries strictly
    before the row's tuple``. At 100 TB the exchanged projection is a
    few columns of the entity dimension, the collected metadata is
    O(num_parts + tiles), and the assignment adds zero shuffles to the
    caller's plan. Exactness: ranks are 1-based positions in a total
    order; tile t's last rank hi_t is a fixed arithmetic function of n,
    and row.tuple > boundary_t.tuple  <=>  rank(row) > hi_t because the
    order is total (unique tiebreak). NULLs in ordering columns are not
    supported (callers order on non-null aggregates).
    """
    sort_cols = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in order_pairs
    ]
    proj = [c for c, _ in order_pairs]
    ranged = (
        df.select(*proj)
        .repartitionByRange(num_parts, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    _PERSISTED.append(ranged)
    counts = {
        r["_pid"]: r["_n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    }
    n = sum(counts.values())
    if n == 0:
        return df.withColumn(out, F.lit(None).cast("int"))
    small, rem = divmod(n, tiles)
    his, acc = [], 0
    for t in range(1, tiles):
        acc += small + 1 if t <= rem else small
        his.append(acc)
    offs, a = {}, 0
    for pid in range(max(counts, default=-1) + 1):
        offs[pid] = a
        a += counts.get(pid, 0)
    need: dict[int, list[int]] = {}
    for k in his:
        for pid in sorted(counts):
            if offs[pid] < k <= offs[pid] + counts[pid]:
                need.setdefault(pid, []).append(k - offs[pid])
                break
    cond = None
    for pid, lks in need.items():
        c = (F.col("_pid") == pid) & F.col("_lrn").isin(lks)
        cond = c if cond is None else cond | c
    w = W.partitionBy("_pid").orderBy(*sort_cols)
    picked = (
        ranged.filter(F.col("_pid").isin(list(need)))
        .withColumn("_lrn", F.row_number().over(w))
        .filter(cond)
        .withColumn("_grk", F.col("_lrn") + F.element_at(
            F.lit([offs[p] for p in range(max(counts, default=-1) + 1)] or [0])
            .cast("array<long>"),
            F.col("_pid") + 1,
        ))
        .collect()
    )
    by_rank = {r["_grk"]: r for r in picked}
    boundaries = [by_rank[k] for k in his]
    tile = F.lit(1)
    for b in boundaries:
        eq = F.lit(True)
        after = F.lit(False)
        for c, asc in order_pairs:
            col = F.col(c)
            bval = F.lit(b[c])
            gt = (col > bval) if asc else (col < bval)
            after = after | (eq & gt)
            eq = eq & (col == bval)
        tile = tile + after.cast("int")
    return df.withColumn(out, tile.cast("int"))


def global_ntile_multi(
    df: DataFrame,
    axes: list[tuple[str, bool, str]],
    tiles: int,
    tiebreak: str,
    num_parts: int = _RANK_PARTS,
) -> DataFrame:
    """Append one exact ``NTILE(tiles)`` column PER AXIS — sharing a
    single range exchange across all axes.

    ``axes`` is ``[(value_col, ascending, out_col), ...]``; every value
    column and the shared unique ``tiebreak`` must be non-null exact
    integers (longs). Why fused: each :func:`global_ntile` pass costs a
    fixed number of job launches (RangePartitioner sampling, the
    count pass, the boundary pick) that dwarf the per-row work on the
    entity dimension — and at cluster scale three exchanges of the same
    dim triple the shuffle. Encoding trick: a DESCENDING axis negates
    its (long) value, so every axis sorts ascending and the union frame
    ``(axis_id, v_enc, tiebreak)`` range-exchanges ONCE on the composite
    order; per-(partition, axis) counts then give each axis its own
    offsets, one windowed pick job fetches all ``len(axes)*(tiles-1)``
    boundary tuples, and each tile column is assigned map-side as
    ``1 + #boundaries strictly before the row's (v_enc, tiebreak)``.
    Exactness argument as in :func:`global_ntile` (total order per axis;
    negation of longs is order-reversing and lossless).
    """
    structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("_ax"),
                (
                    F.col(c).cast("long")
                    if asc
                    else (-F.col(c).cast("long"))
                ).alias("_v"),
                F.col(tiebreak).cast("long").alias("_k"),
            )
            for i, (c, asc, _) in enumerate(axes)
        ]
    )
    union = df.select(F.explode(structs).alias("_s")).select("_s.*")
    ranged = (
        union.repartitionByRange(num_parts, "_ax", "_v", "_k")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    _PERSISTED.append(ranged)
    counts: dict[tuple[int, int], int] = {
        (r["_pid"], r["_ax"]): r["_n"]
        for r in ranged.groupBy("_pid", "_ax")
        .agg(F.count("*").alias("_n"))
        .collect()
    }
    max_pid = max((p for p, _ in counts), default=-1)
    n_rows = {ax: 0 for ax in range(len(axes))}
    for (_, ax), c in counts.items():
        n_rows[ax] += c
    if all(v == 0 for v in n_rows.values()):
        out = df
        for _, _, name in axes:
            out = out.withColumn(name, F.lit(None).cast("int"))
        return out
    # Per axis: boundary ranks, then (pid, local-rank) coordinates.
    # Boundary ranks may REPEAT (n < tiles gives empty tiles whose hi_t
    # equals the previous tile's) — coords_by_ax keeps one slot per
    # boundary so a deduped picked row still fills every slot.
    need: dict[tuple[int, int], list[int]] = {}
    coords_by_ax: dict[int, list[tuple[int, int]]] = {}
    for ax in range(len(axes)):
        n = n_rows[ax]
        small, rem = divmod(n, tiles)
        his, acc = [], 0
        for t in range(1, tiles):
            acc += small + 1 if t <= rem else small
            his.append(acc)
        off = 0
        bounds = list(his)
        coords: list[tuple[int, int]] = []
        for pid in range(max_pid + 1):
            c = counts.get((pid, ax), 0)
            while bounds and off < bounds[0] <= off + c:
                lrn = bounds.pop(0) - off
                coords.append((pid, lrn))
                need.setdefault((pid, ax), []).append(lrn)
            off += c
        coords_by_ax[ax] = coords
    cond = None
    for (pid, ax), lks in need.items():
        c = (
            (F.col("_pid") == pid)
            & (F.col("_ax") == ax)
            & F.col("_lrn").isin(lks)
        )
        cond = c if cond is None else cond | c
    w = W.partitionBy("_pid", "_ax").orderBy("_v", "_k")
    pick_pids = sorted({pid for pid, _ in need})
    picked = (
        ranged.filter(F.col("_pid").isin(pick_pids))
        .withColumn("_lrn", F.row_number().over(w))
        .filter(cond)
        .collect()
    )
    # Recover each axis's boundaries in rank order via their
    # (pid, local-rank) coordinates — one slot per boundary even when
    # duplicate ranks picked the same physical row.
    by_coord = {(r["_pid"], r["_ax"], r["_lrn"]): r for r in picked}
    out = df
    for ax, (c, asc, name) in enumerate(axes):
        rows = [by_coord[(pid, ax, lrn)] for pid, lrn in coords_by_ax[ax]]
        v_enc = F.col(c).cast("long") if asc else (-F.col(c).cast("long"))
        k_col = F.col(tiebreak).cast("long")
        tile = F.lit(1)
        for b in rows:
            after = (v_enc > F.lit(b["_v"])) | (
                (v_enc == F.lit(b["_v"])) & (k_col > F.lit(b["_k"]))
            )
            tile = tile + after.cast("int")
        out = out.withColumn(name, tile.cast("int"))
    return out
