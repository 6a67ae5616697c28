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

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_RANK_PARTS = 32  # range partitions for the rank exchange

#: Frames persisted by ``global_row_number`` (and the other rank-pass
#: callers) OUTSIDE any :func:`persist_scope` — the rank pass must cache
#: its range exchange (RangePartitioner re-sampling on recompute is not
#: guaranteed to reproduce boundaries), but a session that builds many
#: plans would otherwise accumulate cached copies until ContextCleaner
#: gets to them.
_PERSISTED: list[DataFrame] = []
#: Active persist scopes, innermost last; frames created inside a scope
#: are released when THAT scope exits, never by another query's cleanup.
_SCOPES: list[list[DataFrame]] = []


def _track(frame: DataFrame) -> None:
    """Register a persisted frame with the innermost active
    :func:`persist_scope`, or the session-global list when none is
    active."""
    (_SCOPES[-1] if _SCOPES else _PERSISTED).append(frame)


def _release(frames: list[DataFrame]) -> None:
    while frames:
        frame = frames.pop()
        try:
            frame.unpersist()
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass


@contextmanager
def persist_scope():
    """Scope the rank-pass caches to one query's build+consume.

    ``global_row_number`` persists its range exchange and the ranked
    output reads that cache LAZILY — the cache must survive until the
    consuming action, and dropping it earlier silently re-samples range
    boundaries out from under the already-collected offset metadata.
    The global :func:`release_persisted` releases EVERY tracked frame,
    so a caller interleaving two registry queries (build A, build B,
    consume A, release, consume B) would strip B's cache mid-flight.
    This context manager keys the tracking to the frames created inside
    it::

        with persist_scope():
            df = QUERIES[name].fn(spark, sf_dir)
            df.collect()          # consume INSIDE the scope
        # only this query's caches released; other scopes untouched

    Scopes nest (innermost owns new frames); the verify and bench
    harnesses wrap each query in one.
    """
    frames: list[DataFrame] = []
    _SCOPES.append(frames)
    try:
        yield
    finally:
        # Remove by IDENTITY, not equality: two empty nested scope lists
        # compare equal, so list.remove() could detach the OUTER scope.
        for i in range(len(_SCOPES) - 1, -1, -1):
            if _SCOPES[i] is frames:
                del _SCOPES[i]
                break
        _release(frames)


def release_persisted() -> None:
    """Unpersist every ranked frame tracked OUTSIDE persist_scope()s.

    The harness-global form: safe only AFTER the consuming action of
    every plan built so far (the ranked outputs read their caches
    lazily), so call it between queries, never between building one and
    consuming it — interactive/multi-plan callers should prefer
    :func:`persist_scope`, which cannot touch another query's caches.
    Harmless to call twice or when empty.
    """
    _release(_PERSISTED)


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_parts: int = _RANK_PARTS,
    sum_col: str | None = None,
    sum_out: str = "cumsum",
    extra_sums: list[tuple[str, str]] | None = None,
    totals_out: dict | None = None,
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
    is two prefix sums over one total order, one exchange. Pass a dict
    as ``totals_out`` to receive the GRAND totals driver-side for free
    ({"_n": row count, <sum_out>: sum, ...} — they are the final
    entries of the already-collected per-partition metadata), saving
    callers a broadcast-aggregate job over the ranked frame.

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
    _track(ranged)
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
    if totals_out is not None:
        totals_out["_n"] = acc
        for i, (_, o) in enumerate(pairs):
            totals_out[o] = sum_accs[i]
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


#: Samples per partition per axis for the NTILE selection pass. Driver
#: metadata is <= partitions * samples * axes tuples (a few MB even at a
#: 1B-row dimension over a few hundred 128MB-sized partitions); the
#: refinement window per boundary is <= 2 * n / samples rows.
_NTILE_SAMPLES = 1024


def _boundary_ranks(n: int, tiles: int) -> list[int]:
    """The tiles-1 boundary ranks hi_t (last rank of tile t) for SQL
    NTILE over n rows: the first n % tiles tiles get one extra row.
    Ranks may repeat when n < tiles (empty trailing tiles)."""
    small, rem = divmod(n, tiles)
    his, acc = [], 0
    for t in range(1, tiles):
        acc += small + 1 if t <= rem else small
        his.append(acc)
    return his


def global_ntile_multi(
    df: DataFrame,
    axes: list[tuple[str, bool, str]],
    tiles: int,
    tiebreak: str,
    samples_per_part: int = _NTILE_SAMPLES,
) -> DataFrame:
    """Append one exact ``NTILE(tiles)`` column PER AXIS — with ZERO
    shuffle: two narrow passes over ``df``'s existing partitions.

    ``axes`` is ``[(value_col, ascending, out_col), ...]``; every value
    column and the shared unique ``tiebreak`` must be non-null exact
    integers (longs). A DESCENDING axis negates its value so every axis
    compares ascending on the total order (v_enc, tiebreak).

    NTILE needs only the ``tiles - 1`` boundary TUPLES per axis (order
    statistics); this computes them by distributed selection instead of
    a range exchange — the Munro-Paterson sample-and-refine shape:

    1. **Sample pass** (narrow ``mapInPandas``): each partition sorts
       its tuples per axis (in memory — partitions are byte-bounded by
       the scan) and emits every ceil(cnt/samples)-th tuple WITH its
       local rank, always including first and last, plus its row count.
       The driver merges each axis's samples in tuple order maintaining
       per-partition last-seen/next ranks, which yields exact lower and
       upper bounds on every sample's GLOBAL rank (running sums — O(1)
       per sample). For each boundary rank k it brackets the k-th tuple
       between lo (largest sample whose upper bound < k) and hi
       (smallest sample whose lower bound >= k); at most
       sum_p ceil(cnt_p / samples) ~ n / samples rows can lie between.
    2. **Refine pass** (narrow ``mapInPandas``): per partition, for each
       (axis, boundary): the EXACT count of tuples <= lo plus the
       (bounded) window of tuples in (lo, hi]. The driver sums counts,
       sorts the merged window, and indexes the k-th tuple directly.

    Tile columns are then assigned MAP-SIDE as ``1 + #boundaries
    strictly before the row's (v_enc, tiebreak)`` — no exchange, no
    window, no join anywhere in the final plan. Exactness: ranks are
    1-based positions in a total order (unique tiebreak), the bracket
    bounds are conservative by construction, and the refine pass counts
    and enumerates exactly. At 100 TB the driver holds
    O(partitions * samples + n / samples) tuples of metadata and the
    cluster never moves the dimension at all; measured at sf0.1 this
    replaced a 3-job range-exchange pipeline (sampling job + counts +
    windowed pick, ~1.1 s) with two ~0.15 s cache scans.

    Callers should hand in a PERSISTED (or cheap-to-recompute) frame:
    both passes and the final plan re-read ``df``.
    """
    n_axes = len(axes)
    enc = df.select(
        F.col(tiebreak).cast("long").alias("_k"),
        *[
            (
                F.col(c).cast("long")
                if asc
                else (-F.col(c).cast("long"))
            ).alias(f"_v{i}")
            for i, (c, asc, _) in enumerate(axes)
        ],
    )

    spp = samples_per_part

    def sample_pass(batches):
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = list(batches)
        cnt = int(sum(len(b) for b in pdfs))
        out = {"ax": [-1], "pid": [pid], "lrank": [cnt], "v": [0], "k": [0]}
        if cnt:
            pdf = pd.concat(pdfs, ignore_index=True)
            kk = pdf["_k"].to_numpy(np.int64)
            step = max(1, -(-cnt // spp))
            pos = list(range(0, cnt, step))
            if pos[-1] != cnt - 1:
                pos.append(cnt - 1)
            for ax in range(n_axes):
                v = pdf[f"_v{ax}"].to_numpy(np.int64)
                order = np.lexsort((kk, v))
                for p in pos:
                    out["ax"].append(ax)
                    out["pid"].append(pid)
                    out["lrank"].append(p + 1)
                    out["v"].append(int(v[order[p]]))
                    out["k"].append(int(kk[order[p]]))
        yield pd.DataFrame(out).astype(
            {"ax": "int32", "pid": "int32", "lrank": "int64",
             "v": "int64", "k": "int64"}
        )

    meta = enc.mapInPandas(
        sample_pass, schema="ax int, pid int, lrank long, v long, k long"
    ).collect()
    cnt_by_pid = {r["pid"]: r["lrank"] for r in meta if r["ax"] == -1}
    n = sum(cnt_by_pid.values())
    if n == 0:
        out = df
        for _, _, name in axes:
            out = out.withColumn(name, F.lit(None).cast("int"))
        return out
    his = _boundary_ranks(n, tiles)
    if max(cnt_by_pid.values()) <= spp:
        # Every partition emitted EVERY row (small input): the merged
        # samples are the full sorted axis and boundary ranks index it
        # directly — the refine job would re-derive what we hold. One
        # Python-worker job total on the small-dimension path.
        boundaries = {}
        for ax in range(n_axes):
            samp = sorted(
                (r["v"], r["k"]) for r in meta if r["ax"] == ax
            )
            boundaries[ax] = [samp[k - 1] for k in his]
        return _assign_tiles(df, axes, tiebreak, boundaries)

    # Driver-side bracket computation per axis: walk samples in tuple
    # order keeping, per partition, the last-seen local rank (-> running
    # global LOWER bound) and the next sample's rank (-> running global
    # UPPER bound). For the sample being processed its own partition's
    # count is exact, so gub(t) = U + 1 with U = sum(next_lrank - 1)
    # before advancing. Both bound arrays are nondecreasing -> binary
    # search locates lo/hi per boundary rank.
    import bisect

    # windows[(ax, j)] = (lo_tuple | None, hi_tuple, k)
    windows: dict[tuple[int, int], tuple] = {}
    for ax in range(n_axes):
        samp = sorted(
            ((r["v"], r["k"], r["pid"], r["lrank"]) for r in meta
             if r["ax"] == ax),
        )
        last = dict.fromkeys(cnt_by_pid, 0)
        nxt: dict[int, list[int]] = {p: [] for p in cnt_by_pid}
        for v, k, p, lr in reversed(samp):
            nxt[p].append(lr)  # per-pid ranks, ascending when popped
        U = sum((nxt[p][-1] - 1) if nxt[p] else cnt_by_pid[p]
                for p in cnt_by_pid)
        G = 0
        glbs, gubs = [], []
        for v, k, p, lr in samp:
            G += lr - last[p]
            last[p] = lr
            gubs.append(U + 1)
            glbs.append(G)
            nxt[p].pop()
            new_next = nxt[p][-1] if nxt[p] else cnt_by_pid[p] + 1
            U += (new_next - 1) - (lr - 1)
        for j, k_rank in enumerate(his):
            # lo: largest sample with gub < k  (gubs nondecreasing)
            i_lo = bisect.bisect_left(gubs, k_rank) - 1
            lo = (samp[i_lo][0], samp[i_lo][1]) if i_lo >= 0 else None
            # hi: smallest sample with glb >= k (always exists: the
            # global max sample has glb = n >= k)
            i_hi = bisect.bisect_left(glbs, k_rank)
            hi = (samp[i_hi][0], samp[i_hi][1])
            windows[(ax, j)] = (lo, hi, k_rank)

    wlist = [(ax, j, lo, hi) for (ax, j), (lo, hi, _) in windows.items()]

    def refine_pass(batches):
        import numpy as np
        import pandas as pd

        pdfs = list(batches)
        out = {"ax": [], "j": [], "kind": [], "v": [], "k": [], "c": []}
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            kk = pdf["_k"].to_numpy(np.int64)
            for ax, j, lo, hi in wlist:
                v = pdf[f"_v{ax}"].to_numpy(np.int64)
                if lo is None:
                    le_lo = np.zeros(len(v), dtype=bool)
                else:
                    le_lo = (v < lo[0]) | ((v == lo[0]) & (kk <= lo[1]))
                le_hi = (v < hi[0]) | ((v == hi[0]) & (kk <= hi[1]))
                win = le_hi & ~le_lo
                out["ax"].append(ax)
                out["j"].append(j)
                out["kind"].append(0)
                out["v"].append(0)
                out["k"].append(0)
                out["c"].append(int(le_lo.sum()))
                for wv, wk in zip(v[win], kk[win]):
                    out["ax"].append(ax)
                    out["j"].append(j)
                    out["kind"].append(1)
                    out["v"].append(int(wv))
                    out["k"].append(int(wk))
                    out["c"].append(0)
        yield pd.DataFrame(out).astype(
            {"ax": "int32", "j": "int32", "kind": "int32",
             "v": "int64", "k": "int64", "c": "int64"}
        )

    ref = enc.mapInPandas(
        refine_pass,
        schema="ax int, j int, kind int, v long, k long, c long",
    ).collect()
    boundaries: dict[int, list[tuple[int, int]]] = {
        ax: [None] * len(his) for ax in range(n_axes)
    }
    for ax in range(n_axes):
        for j, k_rank in enumerate(his):
            below = sum(
                r["c"] for r in ref
                if r["ax"] == ax and r["j"] == j and r["kind"] == 0
            )
            win = sorted(
                (r["v"], r["k"]) for r in ref
                if r["ax"] == ax and r["j"] == j and r["kind"] == 1
            )
            boundaries[ax][j] = win[k_rank - below - 1]
    return _assign_tiles(df, axes, tiebreak, boundaries)


def _assign_tiles(
    df: DataFrame,
    axes: list[tuple[str, bool, str]],
    tiebreak: str,
    boundaries: dict[int, list[tuple[int, int]]],
) -> DataFrame:
    """Map-side tile assignment: 1 + #boundary tuples strictly before
    the row's (v_enc, tiebreak) — pure projection, no exchange."""
    out = df
    for ax, (c, asc, name) in enumerate(axes):
        v_enc = F.col(c).cast("long") if asc else (-F.col(c).cast("long"))
        k_col = F.col(tiebreak).cast("long")
        tile = F.lit(1)
        for bv, bk in boundaries[ax]:
            after = (v_enc > F.lit(bv)) | (
                (v_enc == F.lit(bv)) & (k_col > F.lit(bk))
            )
            tile = tile + after.cast("int")
        out = out.withColumn(name, tile.cast("int"))
    return out
