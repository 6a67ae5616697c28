"""Graph operators over the order network: iterative PageRank and degree
statistics, expressed as DataFrame joins (no GraphX/GraphFrames — plain
Catalyst plans).

The graph is the bipartite customer-supplier purchase network: one edge per
distinct (o_custkey, l_suppkey) pair observed in orders x lineitem, made
symmetric so every node has out-degree >= 1 (no dangling-node mass leak).

The iterative pattern is the canonical DataFrame PageRank: ranks(i+1) =
0.15 + 0.85 * sum over in-edges of rank(i)/outdeg(src). Each iteration is
one shuffle (join on src + re-aggregate on dst). The iteration count is
FIXED (5) so the DuckDB oracle can unroll it as five chained CTEs — no
recursion, bit-identical semantics.

Scale notes (100 TB): the per-iteration plan is join + groupBy — both
shuffle on node id, so co-partitioning carries between iterations once AQE
sees the first exchange. Unrolled loops grow plan lineage linearly;
production runs `localCheckpoint()` every ~5 iterations to truncate it
(documented here, not needed at 5). Power-law degree skew (a mega-hub
supplier) is the classic salting case: split hub in-edge sums into salted
partial sums + a second tiny aggregate. Edge dedup is one exact
distinct — the same shuffle shape as q_dedup_exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .. import tables
from .dedup import _cached_frame
from .registry import register

_N_ITER = 5
_DAMP = 0.85


def salted_sum(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 16
) -> DataFrame:
    """Skew-salted grouped SUM — the hub-node treatment this module's
    docstring promises at 100 TB, reusable by any graph aggregate whose
    group key is power-law distributed (a mega-hub supplier's in-edge
    sum, a celebrity node's neighbor count).

    Two-stage shape (the q_join_salted pattern, pipeline_ops.py): rows
    first combine into ``(key, salt)`` partial sums — the hub's rows
    split across ``n_salts`` reducers instead of one straggler — then the
    at-most-``n_salts``-rows-per-key partials combine into the final
    per-key sum. The salt is a deterministic row hash (``xxhash64`` over
    all columns), so re-runs produce identical partials; correctness
    never depends on the salt distribution, only balance does.

    Equality with the unsalted single-stage sum is EXACT for integer
    values; float sums can differ by accumulation-order ulps (the
    q_embed_covariance caveat) — pin tests use integer weights.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value).alias("_psum"))
    )
    return partial.groupBy(*keys).agg(F.sum("_psum").alias(f"sum_{value}"))


def _pagerank_oracle() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _N_ITER + 1):
        iters.append(
            f"""r{i} AS (
      SELECT e.dst AS node,
             0.15 + {_DAMP} * SUM(r.pr / d.outdeg) AS pr
      FROM edges e
      JOIN {prev} r ON e.src = r.node
      JOIN deg d    ON d.node = e.src
      GROUP BY e.dst
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(iters)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    ),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    ),
    r0 AS (SELECT node, 1.0 AS pr FROM deg),
    {chain}
    SELECT node, ROUND(pr, 6) AS pagerank FROM r{_N_ITER}
    """


@register("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 fixed iterations, damping 0.85) on the symmetric
    customer-supplier purchase graph, as pure DataFrame joins.

    The loop builds the unrolled logical plan in Python; Catalyst sees one
    DAG. The edge frame is reused by every iteration, so it is persisted
    once (it is the size of the distinct pair set, not the fact table).
    See the module docstring for the 100 TB iteration/checkpoint story.
    """
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")

    def build_contrib() -> DataFrame:
        # Nodes are LONG-encoded (customer k -> 2k, supplier k -> 2k+1)
        # through every shuffle: 8-byte fixed keys hash/sort ~2x faster than
        # the 'c123' strings, which only appear in the final projection.
        half = (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"),
            )
            .distinct()
        )
        edges = half.unionAll(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("outdeg")
        )
        return (
            edges.join(deg, edges.src == deg.node)
            .select(
                "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("inv_deg")
            )
            # Pre-hash-partition the persisted edge list on the join key:
            # every iteration's join then needs only the O(#nodes) ranks
            # side moved into this fixed partitioning — the O(#edges) side
            # never re-shuffles. At 100 TB that is the difference between
            # moving the graph 5 times and moving it once.
            .repartition("src")
        )

    # contribution edge list: (src, dst, 1/outdeg) — persisted ONCE per
    # (app, corpus) via the shared index cache (same pattern as the shingle
    # index): repeated calls reuse it instead of stacking persisted copies.
    contrib = _cached_frame(spark, sf_dir, "pagerank_contrib", build_contrib)
    deg = contrib.select(F.col("src").alias("node")).distinct()
    ranks = deg.select("node", F.lit(1.0).alias("pr"))
    for _ in range(_N_ITER):
        # Measured note: broadcasting the O(|V|) rank side here looks
        # attractive but is 2x SLOWER end-to-end — every iteration's
        # broadcast build serializes through the driver before the next
        # can start, defeating stage pipelining. The shuffle join keeps
        # all 5 iterations flowing: contrib is pre-partitioned on src,
        # so only the small rank side moves (module docstring).
        ranks = (
            contrib.join(ranks, contrib.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg((0.15 + _DAMP * F.sum(F.col("pr") * F.col("inv_deg"))).alias("pr"))
        )
    node_str = (
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), (F.col("node") / 2).cast("long")),
        )
        .otherwise(F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long")))
        .alias("node")
    )
    return ranks.select(node_str, F.round("pr", 6).alias("pagerank"))


def _build_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared graph index for the triangle family: distinct part
    co-purchase edges, oriented by packed (degree, id) rank."""
    li = tables.load(spark, sf_dir, "lineitem")
    po = li.select("l_orderkey", "l_partkey").distinct()
    a, b = po.alias("a"), po.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("ea"),
            F.col("b.l_partkey").alias("eb"),
        )
        .distinct()
    )
    deg = (
        edges.select(F.explode(F.array("ea", "eb")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # rank = (degree, id); broadcast the O(|V|) degree table on both ends
    da = deg.select(F.col("node").alias("ea"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("eb"), F.col("d").alias("db"))
    ranked = edges.join(F.broadcast(da), "ea").join(F.broadcast(db), "eb")
    fwd = F.struct("da", "ea") < F.struct("db", "eb")
    # The (degree, id) rank is packed into ONE long (degree in the
    # high bits) so the wedge filter — evaluated Σ C(outdeg⁺, 2)
    # times, the hottest expression of the whole plan — is a single
    # long compare instead of a struct compare. Safe while id and
    # degree both fit 31 bits; at a scale where they don't, compare
    # the (degree, id) struct directly and pay the constant.
    pack = lambda d, n: F.shiftleft(F.col(d).cast("long"), 32) + F.col(n)
    return ranked.select(
        F.when(fwd, F.col("ea")).otherwise(F.col("eb")).alias("u"),
        F.when(fwd, F.col("eb")).otherwise(F.col("ea")).alias("v"),
        F.when(fwd, pack("db", "eb")).otherwise(pack("da", "ea")).alias("vr"),
    # The wedge self-join keys on u; persisting the index already
    # hash-partitioned on u lets BOTH sides of that self-join reuse
    # the stored partitioning instead of re-shuffling the edge list
    # twice (the closing join needs (v1, v2) and must shuffle anyway).
    ).repartition("u")


@register(
    "q_graph_triangles",
    oracle="""
    WITH po AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT p1.l_partkey AS a, p2.l_partkey AS b
      FROM po p1 JOIN po p2 ON p1.l_orderkey = p2.l_orderkey
       AND p1.l_partkey < p2.l_partkey
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_count
      FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      )
      GROUP BY node
    )
    SELECT CAST(LENGTH(BIN(tri_count)) AS INT) AS tri_bucket,
           CAST(COUNT(*) AS BIGINT)            AS n_parts,
           CAST(SUM(tri_count) AS BIGINT)      AS sum_node_triangles
    FROM per_node
    GROUP BY tri_bucket
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts are adjacent
    when some order contains both), reported as a log2-bucket histogram of
    per-part triangle participation.

    The enumeration is the degree-ordered "compact-forward" algorithm
    (Latapy 2008; also GraphX's TriangleCount orientation): every
    undirected edge is oriented from the endpoint of LOWER (degree, id)
    rank to the higher one, wedges are built only at an edge's lower-rank
    end, and a wedge (u→v1, u→v2) closes iff the oriented edge v1→v2
    exists. Orientation makes the wedge count Σ C(outdeg⁺, 2) where
    outdeg⁺ is the FORWARD degree — on power-law graphs that is
    O(m^{3/2}) total work instead of the Σ C(deg, 2) of naive wedge
    building, because a hub's edges all point INTO it and generate no
    wedges at the hub. That is the entire 100 TB story: the id-ordered
    oracle enumeration (fine for DuckDB at test scale) would put the
    whole wedge load on whichever side of the hub has the small ids.

    Scale notes: the degree table is O(|V|) and broadcast; the only big
    shuffles are the edge distinct and the two self-joins on edge keys.
    Each triangle is found exactly once (rank-ordered), then exploded to
    its 3 corners for the per-node counts — the same explode + grouped
    count shape as the dedup family. The bucket key uses the integer bit
    length (``length(bin(n))``), not float ``log2``, so both engines
    agree at exact powers of two."""
    # Oriented edge list = the graph index. Persisted ONCE per (app,
    # corpus) via the shared index cache — without it the whole
    # distinct-edge pipeline (the expensive part) re-executes for each of
    # the three references below (o1, o2, closing); Spark does not dedupe
    # common subtrees across self-joins. q_graph_edge_support shares the
    # same cache key, so running both graph queries builds the index once.
    oriented = _cached_frame(
        spark, sf_dir, "triangle_oriented",
        lambda: _build_oriented(spark, sf_dir),
    )
    # Adjacency-intersection enumeration (round-4 rework, ~2x over the
    # wedge-join form): instead of MATERIALIZING the Σ C(outdeg⁺, 2)
    # wedge set and probing a broadcast edge map per wedge row, group the
    # oriented edges into per-node forward-neighbor arrays (reuses the
    # stored u-partitioning — no exchange), broadcast that O(|V|+|E|)
    # adjacency (~10 MB at sf0.1), and compute N⁺(u) ∩ N⁺(v) per EDGE
    # map-side. Same asymptotic work (Σ_e |N⁺(u)|+|N⁺(v)| ~ Σ outdeg⁺²)
    # but done by one vectorized array_intersect per edge inside the JVM,
    # with only ACTUAL triangles ever becoming rows. Each triangle
    # (u<v<w by rank) is found exactly once, at its oriented edge (u,v):
    # w ∈ N⁺(v) forces rank(v) < rank(w). At 100 TB the adjacency
    # outgrows a broadcast; then shuffle-join both adjacency lookups on
    # their keys (the index partitioning already matches the u side) and
    # accept the one exchange on v.
    adj = oriented.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nbrs")
    )
    adj_u = adj.select(F.col("u").alias("au"), F.col("nbrs").alias("nbrs_u"))
    adj_v = adj.select(F.col("u").alias("av"), F.col("nbrs").alias("nbrs_v"))
    base = (
        oriented.join(F.broadcast(adj_u), F.col("u") == F.col("au"))
        # left: a sink node (every edge points INTO it) has no adjacency row
        .join(F.broadcast(adj_v), F.col("v") == F.col("av"), "left")
        .select(
            "u",
            "v",
            F.array_intersect(
                "nbrs_u", F.coalesce("nbrs_v", F.array().cast("array<long>"))
            ).alias("ws"),
        )
        .withColumn("nw", F.size("ws").cast("long"))
        .filter(F.col("nw") > 0)
    )
    # One explode carries all three corners (u and v weighted by the
    # intersection size, each w by 1) so the intersection is computed
    # once per edge; explode_outer per the CLAUDE.md generator-inlining
    # note (a plain explode infers size>0 and re-inlines the array expr).
    corners = F.concat(
        F.array(
            F.struct(F.col("u").alias("node"), F.col("nw").alias("cnt")),
            F.struct(F.col("v").alias("node"), F.col("nw").alias("cnt")),
        ),
        F.transform(
            "ws",
            lambda w: F.struct(
                w.alias("node"), F.lit(1).cast("long").alias("cnt")
            ),
        ),
    )
    per_node = (
        base.select(F.explode_outer(corners).alias("c"))
        .filter(F.col("c").isNotNull())
        .groupBy(F.col("c.node").alias("node"))
        .agg(F.sum("c.cnt").alias("tri_count"))
    )
    return (
        per_node.groupBy(
            F.length(F.bin("tri_count")).cast("int").alias("tri_bucket")
        )
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("tri_count").alias("sum_node_triangles"),
        )
    )


@register(
    "q_graph_degrees",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey, l_suppkey
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    cdeg AS (SELECT o_custkey, COUNT(*) AS deg FROM e0 GROUP BY o_custkey)
    SELECT CAST(deg AS BIGINT)        AS supplier_count,
           CAST(COUNT(*) AS BIGINT)  AS n_customers
    FROM cdeg
    GROUP BY deg
    """,
)
def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution histogram of the purchase graph: how many
    customers bought from exactly k distinct suppliers.

    Scale: distinct pair set (one shuffle), per-customer count (same key —
    AQE reuses the partitioning), then a tiny histogram aggregate. The
    degree histogram is the first diagnostic for join-skew planning: its
    tail tells you whether the PageRank/join path above needs salting.
    """
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("o_custkey")
        .agg(F.count("*").alias("supplier_count"))
        .groupBy("supplier_count")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "q_graph_edge_support",
    oracle="""
    WITH po AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT p1.l_partkey AS a, p2.l_partkey AS b
      FROM po p1 JOIN po p2 ON p1.l_orderkey = p2.l_orderkey
       AND p1.l_partkey < p2.l_partkey
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    sup AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT x AS a, y AS b FROM tri
        UNION ALL SELECT x, z FROM tri
        UNION ALL SELECT y, z FROM tri
      ) GROUP BY a, b
    )
    SELECT s.a, s.b, s.support,
           FLOOR(s.support * 1.0
                 / (da.d + db.d - 2 - s.support) * 1000000 + 0.5)
             / 1000000 AS jaccard
    FROM sup s JOIN deg da ON da.node = s.a JOIN deg db ON db.node = s.b
    """,
)
def q_graph_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge embeddedness (tie strength): for every co-purchase edge that
    closes at least one triangle, its SUPPORT (triangles containing it)
    and neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)\\{a,b}| — the
    link-prediction / community-strength signal (Granovetter ties,
    k-truss peeling starts exactly from this support count).

    Reuses q_graph_triangles' machinery end-to-end: the SAME persisted
    oriented edge index (shared `_cached_frame` key, so running both
    queries builds the graph once), the same rank-ordered wedge
    enumeration finding each triangle once, then each triangle charges
    its three edges (normalized to (min-id, max-id)) and a grouped count
    + two broadcast degree joins produce the metric. Zero-support edges
    are deliberately absent — at web scale the supported-edge set is the
    sparse interesting one; a left join against the edge index restores
    the zeros if a consumer needs them.

    The denominator d(a)+d(b)-2-support is exact set algebra (each
    endpoint's neighborhood includes the other, excluded by the -2), so
    the Jaccard needs no nullif: support >= 1 implies the union is
    nonempty.
    """
    oriented = _cached_frame(
        spark, sf_dir, "triangle_oriented",
        lambda: _build_oriented(spark, sf_dir),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(o2, "u").where(F.col("o1.vr") < F.col("o2.vr"))
    closing = oriented.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    tri = wedges.join(
        F.broadcast(closing),
        (F.col("o1.v") == F.col("cu")) & (F.col("o2.v") == F.col("cv")),
    ).select("u", F.col("o1.v").alias("v1"), F.col("o2.v").alias("v2"))
    pair = lambda x, y: F.struct(
        F.least(F.col(x), F.col(y)).alias("a"),
        F.greatest(F.col(x), F.col(y)).alias("b"),
    )
    sup = (
        tri.select(
            F.explode(
                F.array(pair("u", "v1"), pair("u", "v2"), pair("v1", "v2"))
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
    )
    deg = (
        oriented.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    joined = sup.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    jac = (
        F.col("support")
        * 1.0
        / (F.col("da") + F.col("db") - 2 - F.col("support"))
    )
    return joined.select(
        "a",
        "b",
        "support",
        (F.floor(jac * 1000000 + 0.5) / 1000000).alias("jaccard"),
    )




_TRUSS_PEELS = 2   # fixed peel rounds so the oracle unrolls (like PageRank)
_TRUSS_PSIZE = 12  # part family bound: keeps the id-ordered oracle tractable


def _truss_oracle() -> str:
    """Unrolled median-threshold truss peeling: per round, recompute
    per-edge support on the surviving subgraph, then keep edges at or
    above the round's MEDIAN support (rank-based: the largest support
    level s with |{support >= s}| >= half the edges — exact integer
    logic, no interpolation, so both engines agree at any scale)."""
    parts = [f"""
    WITH po AS (
      SELECT DISTINCT l_orderkey, l_partkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_size <= {_TRUSS_PSIZE}
    ),
    e0 AS (
      SELECT DISTINCT p1.l_partkey AS a, p2.l_partkey AS b
      FROM po p1 JOIN po p2 ON p1.l_orderkey = p2.l_orderkey
       AND p1.l_partkey < p2.l_partkey
    )"""]
    prev = "e0"
    for i in range(1, _TRUSS_PEELS + 1):
        parts.append(f""",
    tri{i} AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM {prev} e1
      JOIN {prev} e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN {prev} e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    sup{i} AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT x AS a, y AS b FROM tri{i}
        UNION ALL SELECT x, z FROM tri{i}
        UNION ALL SELECT y, z FROM tri{i}
      ) GROUP BY a, b
    ),
    cum{i} AS (
      SELECT support,
             SUM(c) OVER (ORDER BY support DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM (SELECT support, COUNT(*) AS c FROM sup{i} GROUP BY support)
    ),
    thr{i} AS (
      SELECT MAX(support) AS t FROM cum{i}
      WHERE 2 * cum >= (SELECT COUNT(*) FROM sup{i})
    ),
    e{i} AS (
      SELECT a, b FROM sup{i}, thr{i} WHERE support >= t
    )""")
        prev = f"e{i}"
    parts.append(f"""
    SELECT s.a, s.b, s.support
    FROM sup{_TRUSS_PEELS} s
    JOIN e{_TRUSS_PEELS} e ON e.a = s.a AND e.b = s.b
    """)
    return "".join(parts)


@register("q_graph_truss", oracle=_truss_oracle())
def q_graph_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truss-style community-core peeling (_TRUSS_PEELS fixed rounds): each round
    recomputes per-edge triangle support on the SURVIVING subgraph and
    drops the weak half — edges below the round's median support — so
    the result is the dense co-purchase core at any data scale (a fixed
    absolute k cannot peel meaningfully at both sf0.001 and sf0.01:
    their support medians differ 4x). Fixed round count so the DuckDB
    oracle unrolls (the PageRank pattern); classic k-truss iterates the
    same plan to fixpoint with an absolute threshold. The graph is the
    SMALL-PARTS family (p_size <= _TRUSS_PSIZE, a broadcast dimension filter):
    the Spark side would happily peel the full graph, but the oracle's
    id-ordered triangle enumeration has no degree orientation and goes
    quadratic-ish on the full co-purchase graph — bounding the family
    keeps the cross-check tractable while exercising the identical
    dataflow.

    The median is computed IN-PLAN with exact integer logic: a tiny
    support histogram (O(max support) rows), a descending cumulative
    count, and the largest level s with 2*cum(s) >= |E| — no collect(),
    no interpolating percentile (whose .5 results would need float
    comparisons), and the 1-row threshold frame broadcasts back like
    q_drift_psi's totals. Per round the subgraph is re-oriented by its
    own (degree, id) rank — degrees change as edges drop, so rank reuse
    across peels is the classic truss bug — and `localCheckpoint`
    truncates the doubling lineage, same as the iterative CC in
    q_dedup_clusters.
    """

    def support_of(edges: DataFrame) -> DataFrame:
        deg = (
            edges.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        da = deg.select(F.col("node").alias("a"), F.col("d").alias("dda"))
        db = deg.select(F.col("node").alias("b"), F.col("d").alias("ddb"))
        ranked = edges.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
        fwd = F.struct("dda", "a") < F.struct("ddb", "b")
        pack = lambda d, n: F.shiftleft(F.col(d).cast("long"), 32) + F.col(n)
        o = ranked.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(fwd, pack("ddb", "b")).otherwise(pack("dda", "a")).alias("vr"),
        ).localCheckpoint(eager=False)
        o1, o2 = o.alias("o1"), o.alias("o2")
        wedges = o1.join(o2, "u").where(F.col("o1.vr") < F.col("o2.vr"))
        closing = o.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
        tri = wedges.join(
            F.broadcast(closing),
            (F.col("o1.v") == F.col("cu")) & (F.col("o2.v") == F.col("cv")),
        ).select("u", F.col("o1.v").alias("v1"), F.col("o2.v").alias("v2"))
        pair = lambda x, y: F.struct(
            F.least(F.col(x), F.col(y)).alias("a"),
            F.greatest(F.col(x), F.col(y)).alias("b"),
        )
        return (
            tri.select(
                F.explode(
                    F.array(pair("u", "v1"), pair("u", "v2"), pair("v1", "v2"))
                ).alias("e")
            )
            .select("e.a", "e.b")
            .groupBy("a", "b")
            .agg(F.count("*").alias("support"))
        )

    def median_keep(sup: DataFrame) -> DataFrame:
        hist = sup.groupBy("support").agg(F.count("*").alias("c"))
        wcum = (
            W.orderBy(F.col("support").desc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        cum = hist.withColumn("cum", F.sum("c").over(wcum))
        tot = hist.agg(F.sum("c").alias("tot"))
        thr = (
            cum.crossJoin(F.broadcast(tot))
            .filter(2 * F.col("cum") >= F.col("tot"))
            .agg(F.max("support").alias("t"))
        )
        return (
            sup.crossJoin(F.broadcast(thr))
            .filter(F.col("support") >= F.col("t"))
            .select("a", "b")
        )

    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").filter(
        F.col("p_size") <= _TRUSS_PSIZE
    ).select("p_partkey")
    po = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pa, pb = po.alias("pa"), po.alias("pb")
    edges = (
        pa.join(pb, "l_orderkey")
        .where(F.col("pa.l_partkey") < F.col("pb.l_partkey"))
        .select(
            F.col("pa.l_partkey").alias("a"), F.col("pb.l_partkey").alias("b")
        )
        .distinct()
    )
    sup = None
    for _ in range(_TRUSS_PEELS):
        sup = support_of(edges)
        edges = median_keep(sup)
    return sup.join(edges, ["a", "b"]).select("a", "b", "support")


_COMP_MIN_COORDERS = 2
_COMP_MAX_ITERS = 40

_COMP_EDGE_SQL = f"""
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_COMP_MIN_COORDERS}
"""


@register(
    "q_graph_components",
    oracle=f"""
    WITH RECURSIVE half AS (
      {_COMP_EDGE_SQL}
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ), nodes AS (
      SELECT DISTINCT u AS v FROM edges
    ), walk(v, r) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT e.u, w.r FROM edges e JOIN walk w ON e.v = w.v
    ), comp AS (
      SELECT v, MIN(r) AS component_id FROM walk GROUP BY v
    )
    SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM comp GROUP BY component_id
    """,
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the part co-purchase graph (parts joined
    when they appear in >= {_COMP_MIN_COORDERS} common orders), reporting
    each component's id (minimum member part) and size — the product-
    affinity clustering shape (and the generic CC every entity-resolution
    / dedup pipeline needs as a standalone graph primitive).

    Algorithm: min-label propagation to a convergence FIXPOINT (checked,
    not assumed — an unconverged exit raises), the same Pregel-on-
    DataFrames loop as q_dedup_clusters but over a graph with a giant
    component (diameter ~10), not near-cliques; the oracle is a DuckDB
    recursive CTE computing min-reachable-vertex, so the driver verifies
    the full iterative computation, threshold filter included.

    Scale: the edge list is built once (distinct + self-join keyed on
    l_orderkey, count-filtered — never quadratic in parts, only in
    per-order basket size) and persisted pre-partitioned on ``u`` via the
    shared index cache, so each round's join moves only the O(|V|) label
    side; labels are localCheckpoint()ed per round to truncate lineage.
    Rounds cost one small shuffle each; count-based convergence telemetry
    scans the checkpointed frame (no extra join).
    """
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
        half = (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= _COMP_MIN_COORDERS)
            .select("u", "v")
        )
        return (
            half.unionAll(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition("u")
        )

    edges = _cached_frame(spark, sf_dir, "coorder_part_edges", build_edges)
    labels = edges.select(F.col("u").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    changed = -1
    for _ in range(_COMP_MAX_ITERS):
        nbr_min = (
            edges.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least("label", F.coalesce("nbr_label", F.col("label")))
        new_labels = (
            labels.join(nbr_min, "v", "left")
            .select("v", new_label.alias("label"),
                    (new_label < F.col("label")).alias("chg"))
            .localCheckpoint()
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("v", "label")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"components did not converge in {_COMP_MAX_ITERS} rounds "
            f"({changed} labels still changing) — rounds needed = diameter"
        )
    return (
        labels.groupBy(F.col("label").alias("component_id"))
        .agg(F.count("*").alias("n_nodes"))
        .select("component_id", "n_nodes")
    )


_LPA_ROUNDS = 3

_LPA_ROUND_SQL = """
    , c{i} AS (
      SELECT e.u AS v, l.lbl, COUNT(*) AS cnt
      FROM edges e JOIN lab{prev} l ON l.v = e.v
      GROUP BY e.u, l.lbl
    ), lab{i} AS (
      SELECT v, lbl FROM (
        SELECT v, lbl,
               ROW_NUMBER() OVER (PARTITION BY v
                                  ORDER BY cnt DESC, lbl ASC) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )
"""


@register(
    "q_graph_label_prop",
    oracle=f"""
    WITH half AS (
      {_COMP_EDGE_SQL}
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ), lab0 AS (
      SELECT DISTINCT u AS v, u AS lbl FROM edges
    )
    {"".join(_LPA_ROUND_SQL.format(i=i, prev=i - 1)
             for i in range(1, _LPA_ROUNDS + 1))}
    SELECT lbl AS community_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM lab{_LPA_ROUNDS} GROUP BY lbl
    """,
)
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the part co-purchase graph: {_LPA_ROUNDS} fixed
    sync rounds where every node adopts the most frequent label among
    its neighbors (ties -> smallest label), then the community-size
    histogram — the cheap community detector whose output
    q_graph_modularity scores.

    Determinism: classic LPA is order-dependent; this is the
    deterministic variant — SYNCHRONOUS updates (all nodes step on the
    round-i labels), a FIXED round count, and a total tie order
    (max count, then min label) — so both engines compute the identical
    labeling and the oracle can unroll the rounds as {_LPA_ROUNDS}
    join+argmax SQL stages (aggregation inside recursion is not legal
    SQL, so the loop unrolls instead).

    Scale: the edge index is the shared persisted `coorder_part_edges`
    frame (pre-partitioned on u — triangles/components/kcore reuse it);
    each round is one join moving only the O(|V|) label side plus a
    per-NODE window (keyed, never global), localCheckpoint()ed to keep
    lineage flat (module convention for iterative ops). Round count is
    a constant, so the whole operator is {_LPA_ROUNDS} bounded shuffles
    regardless of graph size.
    """
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
        half = (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= _COMP_MIN_COORDERS)
            .select("u", "v")
        )
        return (
            half.unionAll(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition("u")
        )

    edges = _cached_frame(spark, sf_dir, "coorder_part_edges", build_edges)
    labels = edges.select(F.col("u").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for _ in range(_LPA_ROUNDS):
        counts = (
            edges.join(
                labels.select(F.col("v").alias("_nv"), "lbl"),
                F.col("_nv") == F.col("v"),
            )
            .groupBy(F.col("u").alias("nv"), "lbl")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(
                W.partitionBy("nv").orderBy(
                    F.col("cnt").desc(), F.col("lbl").asc()
                )
            ))
            .filter(F.col("rn") == 1)
            .select(F.col("nv").alias("v"), "lbl")
            .localCheckpoint()
        )
    return (
        labels.groupBy(F.col("lbl").alias("community_id"))
        .agg(F.count("*").alias("n_nodes"))
        .select("community_id", "n_nodes")
    )


@register(
    "q_graph_jaccard",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), deg AS (
      SELECT supp, COUNT(*) AS deg FROM e GROUP BY supp
    ), common AS (
      SELECT a.supp AS supp_a, b.supp AS supp_b, COUNT(*) AS n_common
      FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY a.supp, b.supp
    )
    SELECT c.supp_a, c.supp_b, c.n_common,
           ROUND(CAST(c.n_common AS DOUBLE)
                 / CAST(da.deg + db.deg - c.n_common AS DOUBLE), 6)
             AS jaccard
    FROM common c
    JOIN deg da ON da.supp = c.supp_a
    JOIN deg db ON db.supp = c.supp_b
    WHERE c.n_common >= 50
    """,
)
def q_graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity between supplier nodes of the
    customer-supplier bipartite graph (suppliers are similar when they
    serve overlapping customer sets) — the structural link-prediction /
    node-similarity score (Liben-Nowell & Kleinberg, 2003).

    Scale: co-neighbor pairs are generated by self-joining the DISTINCT
    edge list on the shared-customer key — quadratic per CUSTOMER degree
    (suppliers-per-customer, bounded by orders-per-customer in this
    model), never an all-pairs supplier product; a hub customer at
    100 TB gets the same df-cap treatment as the PPJoin prefix index
    (drop customers above a degree cap — they contribute near-zero
    Jaccard signal while dominating pair volume). Pair counts shuffle
    on the (supp_a, supp_b) key with map-side combine and the tiny
    per-supplier degree frame is broadcast back twice. Floats: jaccard
    is one IEEE division of exact integers — bit-identical on both
    engines before the cosmetic 6dp round.
    """
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
        )
        .distinct()
    )
    deg = e.groupBy("supp").agg(F.count("*").alias("deg"))
    a = e.alias("a")
    b = e.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.supp") < F.col("b.supp")),
        )
        .groupBy(
            F.col("a.supp").alias("supp_a"), F.col("b.supp").alias("supp_b")
        )
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= 50)
    )
    da = deg.select(F.col("supp").alias("supp_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("supp").alias("supp_b"), F.col("deg").alias("deg_b"))
    return (
        common.join(F.broadcast(da), "supp_a")
        .join(F.broadcast(db), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


_BFS_MAX_HOPS = 6


@register(
    "q_graph_bfs",
    oracle="""
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT src, dst FROM e0
      UNION ALL
      SELECT dst AS src, src AS dst FROM e0
    ), seed AS (
      SELECT 's' || CAST(MIN(l_suppkey) AS VARCHAR) AS node FROM lineitem
    ), reach(node, hop) AS (
      SELECT node, 0 FROM seed
      UNION
      SELECT e.dst, r.hop + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.hop < 6
    )
    SELECT node, CAST(MIN(hop) AS INTEGER) AS hop
    FROM reach GROUP BY node
    """,
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first shortest-path hop counts from a deterministic seed
    (the lowest-id supplier) over the customer-supplier bipartite graph
    — the reachability/radius primitive behind influence propagation and
    graph-distance features. The oracle states BFS as a recursive CTE
    with UNION-dedup; the Spark form is the level-synchronous frontier
    loop (Pregel BFS): expand the CURRENT frontier by one edge join,
    anti-join out already-visited nodes, repeat until the frontier
    empties (bounded at 6 hops on both engines).

    Scale: per level, ONE join keyed on the frontier node plus one
    left-anti against the visited set — each level's work is
    O(frontier-adjacent edges), never the whole graph re-scanned; the
    visited/distance frame is `localCheckpoint()`-ed per level so
    lineage stays flat over iterations (the q_graph_components rule).
    Nodes are LONG-encoded through every shuffle (customer k -> 2k,
    supplier k -> 2k+1, the q_graph_pagerank rule: 8-byte fixed keys
    hash/sort ~2x faster than 'c123' strings); the display strings are
    produced only in the final projection. The edge list is persisted
    pre-`repartition("src")` via the shared index cache, so every
    level's join moves ONLY the small frontier side into the fixed
    edge partitioning — the O(|E|) side never re-shuffles, and the
    cache owner handles unpersist even if an iteration raises.
    The level count is the graph diameter (2-3 on this dense bipartite
    model); the empty-frontier early exit is a driver-side COUNT of a
    checkpointed frame, not a data collect. Hops are exact integers —
    zero float risk.
    """
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        half = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"),
            )
            .distinct()
        )
        return half.unionAll(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition("src")

    edges = _cached_frame(spark, sf_dir, "bfs_edges", build_edges)
    seed = li.agg((F.min("l_suppkey") * 2 + 1).alias("node")).select(
        "node", F.lit(0).alias("hop")
    )
    dist = seed.localCheckpoint()
    frontier = dist.select("node")
    for k in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(k).alias("hop"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionAll(nxt).localCheckpoint()
        frontier = nxt.select("node")
    node_str = (
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), (F.col("node") / 2).cast("long")),
        )
        .otherwise(
            F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long"))
        )
        .alias("node")
    )
    return dist.select(node_str, F.col("hop"))


_KCORE_K = 3
_KCORE_PEELS = 3


def _kcore_oracle() -> str:
    layers = ["a0 AS (SELECT DISTINCT u AS v FROM edges)"]
    prev = "a0"
    for r in range(1, _KCORE_PEELS + 1):
        layers.append(
            f"""a{r} AS (
      SELECT e.u AS v FROM edges e
      JOIN {prev} x ON x.v = e.u
      JOIN {prev} y ON y.v = e.v
      GROUP BY e.u
      HAVING COUNT(*) >= {_KCORE_K}
    )"""
        )
        prev = f"a{r}"
    chain = ",\n    ".join(layers)
    return f"""
    WITH half AS (
      {_COMP_EDGE_SQL}
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ),
    {chain}
    SELECT e.u AS part, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM edges e
    JOIN {prev} x ON x.v = e.u
    JOIN {prev} y ON y.v = e.v
    GROUP BY e.u
    """


@register("q_graph_kcore", oracle=_kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round k-core peel of the part co-purchase graph: {PEELS}
    synchronous rounds of "drop every node with fewer than {K}
    neighbors among survivors", then report each survivor's degree
    WITHIN the surviving set — the dense-subgraph extraction that
    strips low-engagement periphery before community detection (the
    k-core is also the standard seed filter for influence analysis).

    Fixed-round semantics (not loop-to-fixpoint) so the DuckDB oracle
    unrolls as {PEELS} chained CTEs — the q_graph_pagerank convention;
    a fixpoint variant is the q_graph_components-style loop with a
    convergence check, same per-round plan. All values are exact
    integer counts — no float anywhere.

    Scale: the symmetric edge list is the SHARED cached index
    (coorder_part_edges, pre-partitioned on u — triangles/components
    reuse it), so each round joins the O(|E|) side without re-shuffling
    it; only the O(|V|) survivor list moves. Per round: two semi-joins
    (u-side co-partitioned; v-side shuffles the survivor list, not the
    edges) + one count aggregate on u. Degree skew on hub parts is the
    module's salted_sum case; counts here are per-node degrees bounded
    by basket overlap, far from the straggler regime.
    """
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
        half = (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= _COMP_MIN_COORDERS)
            .select("u", "v")
        )
        return (
            half.unionAll(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition("u")
        )

    edges = _cached_frame(spark, sf_dir, "coorder_part_edges", build_edges)
    active = edges.select("u").distinct().select(F.col("u").alias("v"))

    def survivors_degree(act: DataFrame) -> DataFrame:
        x = act.select(F.col("v").alias("u"))
        return (
            edges.join(x, "u")
            .join(act, "v")
            .groupBy("u")
            .agg(F.count("*").alias("deg"))
        )

    for _ in range(_KCORE_PEELS):
        active = (
            survivors_degree(active)
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("u").alias("v"))
        )
    return survivors_degree(active).select(
        F.col("u").alias("part"), F.col("deg").cast("long").alias("core_degree")
    )


_NBHD_TOP = 20


@register(
    "q_graph_neighborhood",
    oracle=f"""
    WITH half AS (
      {_COMP_EDGE_SQL}
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ), two_hop AS (
      SELECT e1.u, e2.v AS w
      FROM edges e1 JOIN edges e2 ON e2.u = e1.v
      WHERE e2.v <> e1.u
      UNION
      SELECT u, v AS w FROM edges
    ), ball AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS ball2 FROM two_hop GROUP BY u
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY u
    )
    SELECT b.u AS part, d.degree, b.ball2,
           CAST(ROW_NUMBER() OVER (ORDER BY b.ball2 DESC, b.u)
                AS BIGINT) AS rk
    FROM ball b JOIN deg d ON d.u = b.u
    ORDER BY rk LIMIT {_NBHD_TOP}
    """,
)
def q_graph_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood size (ball cardinality, self excluded) over
    the part co-purchase graph: for each node the count of DISTINCT
    nodes reachable in <= 2 hops — the cheap closeness-centrality proxy
    (a large 2-ball = structurally central) and the standard expansion
    probe run before committing to an iterative centrality at 100 TB.
    Reports the top-{TOP} by ball size with 1-hop degree alongside.

    All-integer counts, total (ball2 DESC, part) ordering — no floats.

    Scale: one edges-with-edges self-join keyed on the shared vertex —
    both sides are the SAME cached frame, so the edge list is built and
    persisted once, but each side still exchanges onto the join key
    (the u-partitioned cache serves the probe side in principle;
    observed plan: AQE inside the cached relation hides the cached
    partitioning, so both sides re-shuffle — an accepted cost, the
    exchange is O(|E|) either way), then a DISTINCT on (u, w) — the
    second shuffle, bounded by the 2-path count. Hub nodes fan out quadratically in degree: at scale
    the standard mitigations are degree-capped sampling per the HyperBall
    line of work, or replacing the exact DISTINCT with HLL sketches
    (q_agg_sketch_merge shows the mergeable-sketch plan) — documented
    tradeoff, exact here. The final top-{TOP} is TakeOrderedAndProject
    (per-partition local top, no global sort).
    """
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
        half = (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= _COMP_MIN_COORDERS)
            .select("u", "v")
        )
        return (
            half.unionAll(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition("u")
        )

    edges = _cached_frame(spark, sf_dir, "coorder_part_edges", build_edges)
    e2 = edges.select(F.col("u").alias("m"), F.col("v").alias("w"))
    two_hop = (
        edges.join(e2, edges["v"] == e2["m"])
        .filter(F.col("w") != F.col("u"))
        .select("u", "w")
        .unionAll(edges.select("u", F.col("v").alias("w")))
        .distinct()
    )
    ball = two_hop.groupBy("u").agg(F.count("*").cast("long").alias("ball2"))
    deg = edges.groupBy("u").agg(F.count("*").cast("long").alias("degree"))
    # top-N FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # local top + driver merge of N rows — never a global window over all
    # O(|V|) nodes), THEN rank the <= _NBHD_TOP-row result; the tiny
    # window is bounded by the limit, not by the graph.
    top = (
        ball.join(deg, "u")
        .orderBy(F.col("ball2").desc(), "u")
        .limit(_NBHD_TOP)
    )
    wr = W.orderBy(F.col("ball2").desc(), "u")
    return top.select(
        F.col("u").alias("part"),
        "degree",
        "ball2",
        F.row_number().over(wr).cast("long").alias("rk"),
    )


@register(
    "q_graph_assortativity",
    oracle=f"""
    WITH half AS (
      {_COMP_EDGE_SQL}
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ), deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u
    ), pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs
    )
    SELECT m,
      ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / NULLIF(SQRT(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * SQRT(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0),
            6) AS assortativity
    FROM s
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the part co-purchase
    graph: the Pearson correlation of endpoint degrees over the
    DIRECTED edge list (each undirected edge counted in both
    orientations, the standard convention) — positive means hubs link
    to hubs (social-network shape), negative means hub-and-spoke
    (catalog shape); the structural prior that decides whether hub
    salting will even matter at 100 TB.

    Exactness: the statistic needs only the five integer moment sums
    over edge endpoint degrees — all exact BIGINTs — and then one fixed
    tree of binary IEEE ops (the q_ab_ttest discipline), nullif-guarded
    for the regular-graph zero-variance case, 6dp display round.

    Scale: degree count is one map-side-combinable aggregate; attaching
    the two endpoint degrees is two joins keyed on node id against a
    |V|-row frame (broadcastable until |V| outgrows memory, shuffle
    join beyond — both fine, the shuffle is O(|E|) keyed on 8-byte
    ids); the moment reduce collapses to ONE row regardless of scale.
    """
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
        half = (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= _COMP_MIN_COORDERS)
            .select("u", "v")
        )
        return (
            half.unionAll(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition("u")
        )

    edges = _cached_frame(spark, sf_dir, "coorder_part_edges", build_edges)
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    pairs = (
        edges.join(deg.select(F.col("node").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    s = pairs.groupBy().agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def d(c):
        return F.col(c).cast("double")

    num = d("m") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(d("m") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("m") * d("syy") - d("sy") * d("sy")
    )
    return s.select(
        "m",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("assortativity"),
    )


@register(
    "q_graph_clustering",
    oracle=f"""
    WITH half AS (
      {_COMP_EDGE_SQL}
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ), deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM edges GROUP BY u
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM half e1
      JOIN half e2 ON e2.u = e1.v
      JOIN half e3 ON e3.u = e1.u AND e3.v = e2.v
    ), corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ), tcount AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM corners GROUP BY node
    )
    SELECT d.node AS part, d.degree,
           CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
           FLOOR(CASE WHEN d.degree >= 2
                      THEN 2.0 * COALESCE(t.triangles, 0)
                           / (d.degree * (d.degree - 1.0)) END
                 * 1000000 + 0.5) / 1000000 AS clustering
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    """,
)
def q_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node: 2*triangles(v) /
    (deg(v)*(deg(v)-1)) over the co-order part graph — the per-node twin
    of q_graph_triangles' global count (community cores score near 1,
    bridge/hub nodes near 0; the transitivity profile that tells a
    sampling pipeline which neighborhoods are redundant).

    Plan: triangles are LISTED once from the canonical half-edge set
    (u < v) via the two-join closure (e1 ⋈ e2 on the shared middle,
    closed against e3) — each triangle a<b<c appears exactly once, so
    exploding its three corners and counting per node is exact. Degrees
    come from the symmetric cached frame (coorder_part_edges — built
    once per corpus, shared with components/pagerank/bfs/neighborhood).

    Scale: two hash joins on 8-byte node keys + one corner aggregate —
    the same exchange shape as q_graph_truss's support pass. The
    degree-ORIENTED compact-forward in q_graph_triangles cuts the
    wedge count for the global total; listing per-node counts needs the
    closure join either way, and the wedge side stays collision-bounded
    because half-edges are already _COMP_MIN_COORDERS-thresholded.
    Division guards: degree < 2 yields NULL clustering on both engines
    (CASE / F.when, never a bare divide under ANSI).
    """
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
        half = (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= _COMP_MIN_COORDERS)
            .select("u", "v")
        )
        return (
            half.unionAll(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition("u")
        )

    edges = _cached_frame(spark, sf_dir, "coorder_part_edges", build_edges)
    half = edges.filter(F.col("u") < F.col("v"))
    deg = edges.groupBy(F.col("u").alias("part")).agg(
        F.count("*").cast("long").alias("degree")
    )
    e1 = half.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = half.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = half.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("part")
    )
    tcount = corners.groupBy("part").agg(
        F.count("*").cast("long").alias("triangles")
    )
    clustering = F.when(
        F.col("degree") >= 2,
        F.lit(2.0)
        * F.coalesce(F.col("triangles"), F.lit(0))
        / (F.col("degree") * (F.col("degree") - F.lit(1.0))),
    )
    return (
        deg.join(tcount, "part", "left")
        .select(
            "part",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            (F.floor(clustering * 1000000 + F.lit(0.5)) / 1000000).alias(
                "clustering"
            ),
        )
    )


@register(
    "q_graph_modularity",
    oracle=f"""
    WITH RECURSIVE half AS (
      {_COMP_EDGE_SQL}
    ), edges AS (
      SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ), nodes AS (
      SELECT DISTINCT u AS v FROM edges
    ), walk(v, r) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT e.u, w.r FROM edges e JOIN walk w ON e.v = w.v
    ), comp AS (
      SELECT v, MIN(r) AS community FROM walk GROUP BY v
    ), deg AS (
      SELECT u AS v, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u
    ), per_comm AS (
      SELECT c.community,
             CAST(SUM(d.d) AS BIGINT) AS d_c
      FROM comp c JOIN deg d ON d.v = c.v GROUP BY c.community
    ), within AS (
      SELECT cu.community, CAST(COUNT(*) AS BIGINT) AS in_c
      FROM edges e
      JOIN comp cu ON cu.v = e.u
      JOIN comp cv ON cv.v = e.v AND cv.community = cu.community
      GROUP BY cu.community
    ), s AS (
      SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS big_e,
             CAST((SELECT COUNT(*) FROM comp) AS BIGINT) AS n_nodes,
             CAST((SELECT COUNT(*) FROM per_comm) AS BIGINT)
               AS n_communities,
             CAST((SELECT COALESCE(SUM(in_c), 0) FROM within) AS BIGINT)
               AS a_sum,
             CAST((SELECT COALESCE(SUM(d_c * d_c), 0) FROM per_comm)
                  AS BIGINT) AS b_sum
    )
    SELECT n_communities, n_nodes,
           CAST(big_e / 2 AS BIGINT) AS m,
           FLOOR((CAST(big_e AS DOUBLE) * a_sum - b_sum)
                 / (CAST(big_e AS DOUBLE) * big_e) * 1000000 + 0.5)
             / 1000000 AS modularity
    FROM s WHERE big_e > 0
    """,
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the connected-component partition of the
    co-order part graph: Q = Σ_c [in_c/E - (d_c/E)²] over directed edge
    count E = 2m — the community-quality score a clustering pipeline
    reports next to its assignment (here the assignment is the exact CC
    labeling, making the oracle a pure recursive CTE; a Louvain pass
    would OPTIMIZE this same objective).

    Exactness: in_c, d_c, and E are exact BIGINTs; Q reduces to ONE
    fixed IEEE tree (E·Σin_c − Σd_c²) / E² evaluated with identical
    association on both engines from identical integer operands —
    floor-scale displayed. Integer bound: Σd_c² stays exact while
    max(d_c) ≤ 2^26 or so; past that the b_sum accumulates in double —
    documented, irrelevant below ~10^8-degree communities.

    Scale: the label loop is q_graph_components' (frontier label prop
    over the shared pre-partitioned edge cache, localCheckpoint per
    round); the modularity pass adds two label joins keyed on 8-byte
    node ids and three scalar aggregates. Empty graph -> empty result
    on both engines (E > 0 gate).
    """
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
        b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
        half = (
            a.join(b, "k")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("w"))
            .filter(F.col("w") >= _COMP_MIN_COORDERS)
            .select("u", "v")
        )
        return (
            half.unionAll(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition("u")
        )

    edges = _cached_frame(spark, sf_dir, "coorder_part_edges", build_edges)
    labels = edges.select(F.col("u").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    changed = -1
    for _ in range(_COMP_MAX_ITERS):
        nbr_min = (
            edges.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least("label", F.coalesce("nbr_label", F.col("label")))
        new_labels = (
            labels.join(nbr_min, "v", "left")
            .select("v", new_label.alias("label"),
                    (new_label < F.col("label")).alias("chg"))
            .localCheckpoint()
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("v", "label")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"modularity labeling did not converge in {_COMP_MAX_ITERS} rounds"
        )
    deg = edges.groupBy(F.col("u").alias("v")).agg(
        F.count("*").cast("long").alias("d")
    )
    per_comm = (
        labels.join(deg, "v")
        .groupBy(F.col("label").alias("community"))
        .agg(F.sum("d").alias("d_c"))
    )
    lab_u = labels.select(F.col("v").alias("u"), F.col("label").alias("cu"))
    lab_v = labels.select(F.col("v").alias("v"), F.col("label").alias("cv"))
    within = (
        edges.join(lab_u, "u")
        .join(lab_v, "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").cast("long").alias("in_c"))
    )
    e_frame = edges.agg(
        F.count("*").cast("long").alias("big_e"),
    )
    stats = (
        per_comm.join(within, "community", "left")
        .agg(
            F.count("*").cast("long").alias("n_communities"),
            F.sum(F.coalesce("in_c", F.lit(0))).alias("a_sum"),
            F.sum(F.col("d_c") * F.col("d_c")).alias("b_sum"),
        )
    )
    n_frame = labels.agg(F.count("*").cast("long").alias("n_nodes"))
    q = (
        (F.col("big_e").cast("double") * F.col("a_sum") - F.col("b_sum"))
        / (F.col("big_e").cast("double") * F.col("big_e"))
    )
    return (
        stats.crossJoin(F.broadcast(e_frame))
        .crossJoin(F.broadcast(n_frame))
        .filter(F.col("big_e") > 0)
        .select(
            "n_communities",
            "n_nodes",
            (F.col("big_e") / 2).cast("long").alias("m"),
            (F.floor(q * 1000000 + F.lit(0.5)) / 1000000).alias("modularity"),
        )
    )


# Strongly connected components: bounds on the three nested loops.
# Measured fixpoint depths on the fixtures (trim / fwd / bwd rounds):
# sf0.001 = 6/17/14, sf0.01 = 11/23/21, sf0.1 = 15/30/32, outer <= 2 —
# the caps below carry ~2x headroom; an unconverged exit RAISES (the
# q_graph_components rule: convergence is checked, never assumed).
_SCC_MAX_OUTER = 8
_SCC_MAX_INNER = 72

_SCC_EDGE_SQL = """
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey
     AND b.l_linenumber = a.l_linenumber + 1
    WHERE a.l_partkey <> b.l_partkey
      AND a.l_returnflag = 'R' AND b.l_returnflag = 'R'
"""


@register(
    "q_graph_scc",
    oracle=f"""
    WITH RECURSIVE e AS (
      {_SCC_EDGE_SQL}
    ), nodes AS (
      SELECT src AS id FROM e UNION SELECT dst FROM e
    ), reach(a, b) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    ), scc AS (
      SELECT f.a AS node_id, MIN(f.b) AS scc
      FROM reach f JOIN reach r ON f.a = r.b AND f.b = r.a
      GROUP BY f.a
    )
    SELECT CAST(scc AS BIGINT) AS scc_id,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM scc GROUP BY scc
    """,
)
def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the DIRECTED part-transition
    graph (part A -> part B when B is the next line item after A within
    an order, restricted to returned items so the graph keeps the
    classic bow-tie shape: one giant SCC — 1007 of 1877 nodes at
    sf0.01 — plus a DAG fringe of singletons). The directed-graph
    primitive the graph family was missing: components/pagerank/BFS all
    treat edges as symmetric or walk them one way; SCC is the
    mutual-reachability quotient (cycle detection, dependency-knot
    discovery, dead-code/dead-stock analysis).

    Algorithm — trim + forward-backward coloring (the FW-BW-MS family,
    Slota et al.; GraphX's SCC uses the same skeleton), all three loops
    run to a CHECKED fixpoint:

    1. TRIM: nodes with no in-edges or no out-edges in the live
       subgraph are singleton SCCs — peel, repeat (chains peel one
       layer per round).
    2. FORWARD coloring: min-label propagation along edges to fixpoint;
       F(v) = smallest live node with a directed path to v. F(v) <= v
       and only decreases, so inside an SCC all members share F = the
       SCC's minimum member (the canonical id — no tie-break needed).
    3. BACKWARD confirm: from each root (F(v) = v), mark nodes that
       reach their root through SAME-COLOR edges; the marked set of
       color c is exactly SCC(c) (mutual reachability through c).
       Peel marked nodes, drop their edges, repeat from 1 — each pass
       peels at least the SCC of the smallest live node, and the
       bow-tie resolves in <= 2 passes (measured).

    The oracle is closure-based, not round-replaying: a DuckDB
    recursive CTE materializes reachability and takes
    scc(v) = MIN(u : u ->* v AND v ->* u) — SCC is a unique quotient,
    so the two engines agree with no shared iteration schedule; the
    driver verifies the RESULT of the whole iterative computation.

    Scale: edges are built once (self-join keyed on (orderkey,
    linenumber) — linear in line items), cached pre-partitioned on src
    via the shared index cache; every propagation round is one small
    shuffle moving only the O(|V|) label/mark side against the
    stationary edge index, localCheckpoint()ed to keep lineage flat
    (the iterative-op discipline). Round count is O(SCC diameter), the
    known cost of exact distributed SCC; the closure oracle is the
    verification tool, never the execution plan (reach is O(n^2) rows —
    DuckDB-side only, at the sf0.01 gate scale).
    """
    assigned = _scc_assignments(spark, sf_dir)
    return assigned.groupBy("scc_id").agg(F.count("*").alias("n_nodes"))


def _scc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cached directed transition edge index q_graph_scc and
    q_graph_condensation share (one materialization per app+corpus)."""
    li = tables.load(spark, sf_dir, "lineitem")

    def build_edges() -> DataFrame:
        r = li.filter(F.col("l_returnflag") == "R").select(
            "l_orderkey", "l_linenumber", "l_partkey"
        )
        a, b = r.alias("sa"), r.alias("sb")
        return (
            a.join(
                b,
                (F.col("sa.l_orderkey") == F.col("sb.l_orderkey"))
                & (F.col("sb.l_linenumber") == F.col("sa.l_linenumber") + 1),
            )
            .filter(F.col("sa.l_partkey") != F.col("sb.l_partkey"))
            .select(
                F.col("sa.l_partkey").alias("src"),
                F.col("sb.l_partkey").alias("dst"),
            )
            .distinct()
            .repartition("src")
        )

    return _cached_frame(spark, sf_dir, "scc_transition_edges", build_edges)


def _scc_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, scc_id) for every node of the transition graph — the trim +
    FW-BW coloring loops from q_graph_scc's docstring. CACHED per
    (app, corpus) like the edge index: q_graph_scc and
    q_graph_condensation both consume it, and the fixpoint loops are
    the expensive half (measured 22 s at sf0.1) — one materialization,
    not one per consumer."""
    return _cached_frame(
        spark, sf_dir, "scc_assignments", lambda: _scc_assign_build(spark, sf_dir)
    )


def _scc_assign_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges_all = _scc_edges(spark, sf_dir)
    active = (
        edges_all.select(F.col("src").alias("v"))
        .union(edges_all.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    assigned: list[DataFrame] = []
    live = edges_all
    n_active = active.count()
    for _outer in range(_SCC_MAX_OUTER):
        if n_active == 0:
            break
        # --- 1. trim to fixpoint ------------------------------------
        for _ in range(_SCC_MAX_INNER):
            has_out = live.select(F.col("src").alias("v")).distinct()
            has_in = live.select(F.col("dst").alias("v")).distinct()
            keep = has_out.join(has_in, "v")
            dead = active.join(keep, "v", "left_anti").localCheckpoint()
            n_dead = dead.count()
            if n_dead == 0:
                break
            assigned.append(dead.select("v", F.col("v").alias("scc_id")))
            active = active.join(dead, "v", "left_anti").localCheckpoint()
            live = (
                live.join(dead.withColumnRenamed("v", "src"), "src", "left_anti")
                .join(dead.withColumnRenamed("v", "dst"), "dst", "left_anti")
                .repartition("src")
                .localCheckpoint()
            )
            n_active -= n_dead
        if n_active == 0:
            break
        # --- 2. forward min-label coloring to fixpoint ---------------
        lab = active.select("v", F.col("v").alias("lbl")).localCheckpoint()
        changed = -1
        for _ in range(_SCC_MAX_INNER):
            nbr = (
                live.join(
                    lab.select(
                        F.col("v").alias("src"), F.col("lbl").alias("slbl")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("v"))
                .agg(F.min("slbl").alias("m"))
            )
            new_lbl = F.least("lbl", F.coalesce("m", F.col("lbl")))
            new = (
                lab.join(nbr, "v", "left")
                .select(
                    "v",
                    new_lbl.alias("lbl"),
                    (new_lbl < F.col("lbl")).alias("chg"),
                )
                .localCheckpoint()
            )
            changed = new.filter("chg").count()
            lab = new.select("v", "lbl")
            if changed == 0:
                break
        if changed != 0:
            raise RuntimeError(
                f"scc forward coloring did not converge in {_SCC_MAX_INNER} "
                f"rounds ({changed} labels still changing)"
            )
        # --- 3. backward confirm within color, from roots ------------
        same_color = (
            live.join(
                lab.select(F.col("v").alias("src"), F.col("lbl").alias("sl")),
                "src",
            )
            .join(
                lab.select(F.col("v").alias("dst"), F.col("lbl").alias("dl")),
                "dst",
            )
            .filter(F.col("sl") == F.col("dl"))
            .select("src", "dst")
            .repartition("dst")
            .localCheckpoint()
        )
        marked = lab.filter(F.col("v") == F.col("lbl")).select("v").localCheckpoint()
        n_new = -1
        for _ in range(_SCC_MAX_INNER):
            new_marks = (
                same_color.join(marked.withColumnRenamed("v", "dst"), "dst")
                .select(F.col("src").alias("v"))
                .distinct()
                .join(marked, "v", "left_anti")
                .localCheckpoint()
            )
            n_new = new_marks.count()
            if n_new == 0:
                break
            marked = marked.union(new_marks).localCheckpoint()
        if n_new != 0:
            raise RuntimeError(
                f"scc backward confirm did not converge in {_SCC_MAX_INNER} rounds"
            )
        peel = lab.join(marked, "v").select(
            "v", F.col("lbl").alias("scc_id")
        ).localCheckpoint()
        n_peel = peel.count()
        assigned.append(peel)
        active = active.join(marked, "v", "left_anti").localCheckpoint()
        live = (
            live.join(marked.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(marked.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .repartition("src")
            .localCheckpoint()
        )
        n_active -= n_peel
    if n_active != 0:
        raise RuntimeError(
            f"scc did not assign all nodes in {_SCC_MAX_OUTER} passes "
            f"({n_active} still live)"
        )
    if not assigned:  # empty input: no edges -> no nodes -> no SCCs
        return spark.createDataFrame([], "v long, scc_id long")
    out = assigned[0]
    for frame in assigned[1:]:
        out = out.unionAll(frame)
    return out


@register(
    "q_graph_condensation",
    oracle=f"""
    WITH RECURSIVE e AS (
      {_SCC_EDGE_SQL}
    ), nodes AS (
      SELECT src AS id FROM e UNION SELECT dst FROM e
    ), reach(a, b) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    ), scc AS (
      SELECT f.a AS node_id, MIN(f.b) AS scc
      FROM reach f JOIN reach r ON f.a = r.b AND f.b = r.a
      GROUP BY f.a
    ), cedge AS (
      SELECT DISTINCT s1.scc AS u, s2.scc AS v
      FROM e
      JOIN scc s1 ON s1.node_id = e.src
      JOIN scc s2 ON s2.node_id = e.dst
      WHERE s1.scc <> s2.scc
    ), lvl(v, l) AS (
      SELECT DISTINCT scc AS v, 0 AS l FROM scc
      UNION
      SELECT c.v, lvl.l + 1 FROM lvl JOIN cedge c ON c.u = lvl.v
    ), depth AS (
      SELECT v, MAX(l) AS level FROM lvl GROUP BY v
    )
    SELECT CAST(s.scc AS BIGINT) AS scc_id,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(d.level AS BIGINT) AS level
    FROM scc s JOIN depth d ON d.v = s.scc
    GROUP BY s.scc, d.level
    """,
)
def q_graph_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation of the directed transition graph: contract each SCC
    (q_graph_scc's assignment, shared machinery) to one node, then
    compute every component's LONGEST-PATH LEVEL in the resulting DAG —
    the dependency-layering analytic (build stages, pipeline scheduling,
    data-lineage depth): level-0 components have no upstream, level k
    depends on something at k-1, and components on the same level can
    run concurrently.

    The level loop is max-label propagation over the condensation edges
    to a CHECKED fixpoint; a non-converging loop inside the cap would
    mean a cycle in the condensation — impossible if the SCC quotient
    is correct — so the convergence raise doubles as a structural
    invariant check on the SCC stage. The oracle extends the closure
    oracle with a recursive level CTE (UNION-deduped, so path
    multiplicity can't blow up the recursion; levels strictly increase
    along DAG edges, so it terminates at the longest path).

    Scale: the condensation is tiny relative to the graph (one row per
    SCC); the only corpus-scale work is the SCC assignment itself
    (shared, cached) and the two label joins mapping node endpoints to
    component ids. Level rounds move one (component, level) row per
    component — broadcast-sized at any corpus scale.
    """
    assigned = _scc_assignments(spark, sf_dir).localCheckpoint()
    edges = _scc_edges(spark, sf_dir)
    cedge = (
        edges.join(
            assigned.select(F.col("v").alias("src"), F.col("scc_id").alias("u")),
            "src",
        )
        .join(
            assigned.select(F.col("v").alias("dst"), F.col("scc_id").alias("w")),
            "dst",
        )
        .filter(F.col("u") != F.col("w"))
        .select("u", "w")
        .distinct()
        .repartition("u")
        .localCheckpoint()
    )
    lvl = (
        assigned.select(F.col("scc_id").alias("c"))
        .distinct()
        .select("c", F.lit(0).cast("long").alias("l"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(_SCC_MAX_INNER):
        nl = (
            cedge.join(lvl.select(F.col("c").alias("u"), "l"), "u")
            .groupBy(F.col("w").alias("c"))
            .agg(F.max(F.col("l") + F.lit(1).cast("long")).alias("m"))
        )
        new = (
            lvl.join(nl, "c", "left")
            .select(
                "c",
                F.greatest("l", F.coalesce("m", F.col("l"))).alias("l"),
                (F.coalesce("m", F.lit(-1).cast("long")) > F.col("l")).alias(
                    "chg"
                ),
            )
            .localCheckpoint()
        )
        changed = new.filter("chg").count()
        lvl = new.select("c", "l")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"condensation levels did not converge in {_SCC_MAX_INNER} "
            f"rounds — a cycle survived the SCC contraction"
        )
    sizes = assigned.groupBy("scc_id").agg(F.count("*").alias("n_nodes"))
    return sizes.join(
        lvl.select(F.col("c").alias("scc_id"), F.col("l").alias("level")),
        "scc_id",
    )
