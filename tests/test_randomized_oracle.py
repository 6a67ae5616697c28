"""Randomized cross-engine semantics tests: hypothesis-generated tables run
through the SAME logical operation on Spark and DuckDB, results compared.

The fixture-based oracle harness (tools/verify_queries.py) proves every
registered query on the driver's parquet tables; what it cannot reach are
the degenerate inputs those tables never contain — empty tables, all-NULL
groups, duplicate rows, single-row groups, negative keys. Aggregate, window,
join, and set-op semantics all have engine-divergence traps on exactly those
inputs (SUM of no rows, COUNT(col) vs COUNT(*), NULL join keys, bag vs set
EXCEPT), so this file pins them property-style.

Determinism rules mirror the registry's oracle conventions: every ORDER BY
is total (unique `id` tiebreak), comparisons avoid floats (int sums only),
and NULL ordering never matters because ordering keys are non-null.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# The hypothesis sweeps re-plan a Spark query per generated example (6-12
# examples x ~0.5-5 s of job floors each), making this module ~27 of the
# full suite's ~40 minutes (round-11 --durations). The coverage is
# degenerate-INPUT semantics, orthogonal to the operator/oracle gates —
# so the module is the fast lane's main exclusion (VERDICT r10 item 8):
#   python -m pytest tests/ -q -m "not heavy"   # ~13 min verify loop
#   python -m pytest tests/ -q                  # the full gate, unchanged
pytestmark = pytest.mark.heavy

# rows: (k small group key, v nullable int); a unique id is prepended by
# _frames via enumerate()
_row = st.tuples(
    st.integers(min_value=0, max_value=9),          # k: group key
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),  # v
)
_table = st.lists(_row, min_size=0, max_size=30)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_SCHEMA = "id long, k long, v long"


def _frames(spark, rows):
    """Build the same table in both engines: Spark DF + DuckDB relation."""
    rows = [(i, k, v) for i, (k, v) in enumerate(rows)]
    sdf = spark.createDataFrame(rows, schema=_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, k BIGINT, v BIGINT)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return sdf, con


def _nullsafe(rows) -> list[tuple]:
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _rowset(df) -> list[tuple]:
    return _nullsafe(df.collect())


@given(_table)
@_SETTINGS
def test_grouped_agg_null_semantics(spark, rows):
    """SUM/COUNT(col)/COUNT(*)/MIN over NULL-bearing groups: SUM of an
    all-NULL group is NULL (not 0), COUNT(v) skips NULLs, COUNT(*) does
    not — on both engines, for every generated grouping."""
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    got = _rowset(
        sdf.groupBy("k").agg(
            F.sum("v").alias("sum_v"),
            F.count("v").alias("n_v"),
            F.count("*").alias("n_rows"),
            F.min("v").alias("min_v"),
        )
    )
    want = _nullsafe(
        con.execute(
            "SELECT k, CAST(SUM(v) AS BIGINT), COUNT(v), COUNT(*), MIN(v) "
            "FROM t GROUP BY k"
        ).fetchall()
    )
    assert got == want


@given(_table)
@_SETTINGS
def test_window_running_sum_and_row_number(spark, rows):
    """Running SUM + ROW_NUMBER over a total order (unique id tiebreak):
    frame accumulation over NULLs must skip, not zero, on both engines."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    w = (
        W.partitionBy("k")
        .orderBy("id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    got = _rowset(
        sdf.select(
            "id",
            F.sum("v").over(w).alias("run_sum"),
            F.row_number().over(W.partitionBy("k").orderBy("id")).alias("rn"),
        )
    )
    want = _nullsafe(
        con.execute(
            "SELECT id, CAST(SUM(v) OVER w AS BIGINT), "
            "CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY id) AS BIGINT) "
            "FROM t WINDOW w AS (PARTITION BY k ORDER BY id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).fetchall()
    )
    assert got == want


@given(_table, _table)
@_SETTINGS
def test_full_outer_join_on_nullable_key(spark, rows_a, rows_b):
    """FULL OUTER JOIN on the nullable column v: NULL keys must match
    NOTHING (not each other) and still surface via the outer sides —
    the join-semantics trap randomized keys hit constantly."""
    sdf_a, con = _frames(spark, rows_a)
    rows_b = [(i, k, v) for i, (k, v) in enumerate(rows_b)]
    sdf_b = spark.createDataFrame(rows_b, schema=_SCHEMA)
    con.execute("CREATE TABLE u (id BIGINT, k BIGINT, v BIGINT)")
    if rows_b:
        con.executemany("INSERT INTO u VALUES (?, ?, ?)", rows_b)
    got = _rowset(
        sdf_a.alias("a")
        .join(sdf_b.alias("b"), sdf_a.v == sdf_b.v, "full_outer")
        .selectExpr("a.id AS id_a", "b.id AS id_b")
    )
    want = _nullsafe(
        con.execute(
            "SELECT t.id, u.id FROM t FULL OUTER JOIN u ON t.v = u.v"
        ).fetchall()
    )
    assert got == want


@given(_table, _table)
@_SETTINGS
def test_except_all_bag_semantics(spark, rows_a, rows_b):
    """EXCEPT ALL is bag difference (multiplicity-aware), not set minus:
    duplicates generated on both sides must cancel one-for-one."""
    sdf_a, con = _frames(spark, rows_a)
    rows_b = [(i, k, v) for i, (k, v) in enumerate(rows_b)]
    sdf_b = spark.createDataFrame(rows_b, schema=_SCHEMA)
    con.execute("CREATE TABLE u (id BIGINT, k BIGINT, v BIGINT)")
    if rows_b:
        con.executemany("INSERT INTO u VALUES (?, ?, ?)", rows_b)
    got = _rowset(sdf_a.select("k", "v").exceptAll(sdf_b.select("k", "v")))
    want = _nullsafe(
        con.execute(
            "SELECT k, v FROM t EXCEPT ALL SELECT k, v FROM u"
        ).fetchall()
    )
    assert got == want


@given(_table)
@_SETTINGS
def test_quantized_group_mean_integer_division(spark, rows):
    """q_ab_bootstrap's replicate-mean quantization on NEGATIVE sums:
    Spark `div` and DuckDB 1.0.0's integer `//` BOTH truncate toward
    zero (-5 // 2 = -2 — `//` is not Python floor division on integer
    operands), so the registry query uses plain `div` with no remainder
    adjustment. Round 9 caught the opposite belief live: an earlier
    revision "floor-corrected" the Spark side and diverged by one
    quantum on any negative-sum group ((0,0),(0,0),(0,-1) → -3334 vs
    -3333) — invisible to fixtures, whose purchase values are
    non-negative. This pins the plain-div form against DuckDB's native
    `//` for every generated table, refund-valued groups included.
    Mirrors quality.q_ab_bootstrap's `m` expression exactly."""
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    got = _rowset(
        sdf.filter(F.col("v").isNotNull())
        .groupBy("k")
        .agg(
            F.expr("CAST(sum(v) AS BIGINT) * 10000").alias("_s"),
            F.count("v").cast("long").alias("n_b"),
        )
        .select(
            "k",
            F.expr("_s div nullif(n_b, 0)").alias("m"),
        )
    )
    want = _nullsafe(
        con.execute(
            """
            SELECT k, CAST(SUM(v) AS BIGINT) * 10000
                      // NULLIF(CAST(COUNT(v) AS BIGINT), 0) AS m
            FROM t WHERE v IS NOT NULL GROUP BY k
            """
        ).fetchall()
    )
    assert got == want


@given(_table)
@_SETTINGS
def test_distinct_treats_nulls_as_equal(spark, rows):
    """DISTINCT (and GROUP BY) use null-safe grouping — all NULLs collapse
    to one row — unlike join equality where NULL matches nothing; both
    engines must agree on every generated multiset."""
    sdf, con = _frames(spark, rows)
    got = _rowset(sdf.select("k", "v").distinct())
    want = _nullsafe(
        con.execute("SELECT DISTINCT k, v FROM t").fetchall()
    )
    assert got == want


@given(_table)
@_SETTINGS
def test_lag_lead_defaults(spark, rows):
    """lag/lead beyond the partition edge yield the supplied default (lag)
    or NULL (lead) — pinned over a total order so offsets are
    deterministic."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    w = W.partitionBy("k").orderBy("id")
    got = _rowset(
        sdf.select(
            "id",
            F.lag("v", 1, -999).over(w).alias("prev_v"),
            F.lead("v", 2).over(w).alias("next2_v"),
        )
    )
    want = _nullsafe(
        con.execute(
            "SELECT id, LAG(v, 1, -999) OVER w, LEAD(v, 2) OVER w FROM t "
            "WINDOW w AS (PARTITION BY k ORDER BY id)"
        ).fetchall()
    )
    assert got == want


def _two_tables(spark, rows_a, rows_b):
    sdf_a, con = _frames(spark, rows_a)
    rows_b = [(i, k, v) for i, (k, v) in enumerate(rows_b)]
    sdf_b = spark.createDataFrame(rows_b, schema=_SCHEMA)
    con.execute("CREATE TABLE u (id BIGINT, k BIGINT, v BIGINT)")
    if rows_b:
        con.executemany("INSERT INTO u VALUES (?, ?, ?)", rows_b)
    sdf_a.createOrReplaceTempView("rand_t")
    sdf_b.createOrReplaceTempView("rand_u")
    return con


@given(_table, _table)
@_SETTINGS
def test_not_in_null_semantics(spark, rows_a, rows_b):
    """NOT IN against a subquery that may yield NULL: three-valued logic
    makes the whole predicate UNKNOWN for every row once a single NULL is
    in the list (and a NULL probe never passes) — the classic silent-
    wrong-answer trap that fixture data, with its non-null keys, can
    never catch. Both engines must agree on every generated pair."""
    con = _two_tables(spark, rows_a, rows_b)
    q = "SELECT id FROM {t} WHERE v NOT IN (SELECT v FROM {u})"
    got = _rowset(spark.sql(q.format(t="rand_t", u="rand_u")))
    want = _nullsafe(con.execute(q.format(t="t", u="u")).fetchall())
    assert got == want


@given(_table, _table)
@_SETTINGS
def test_correlated_exists_vs_in(spark, rows_a, rows_b):
    """Correlated EXISTS (v = v) and plain IN over the same data: both
    use two-valued matching for the row filter (NULL keys match nothing,
    but the row is simply dropped, not poisoned as with NOT IN), so
    EXISTS and IN must agree with each other AND across engines."""
    con = _two_tables(spark, rows_a, rows_b)
    q_exists = (
        "SELECT id FROM {t} WHERE EXISTS "
        "(SELECT 1 FROM {u} WHERE {u}.v = {t}.v)"
    )
    q_in = "SELECT id FROM {t} WHERE v IN (SELECT v FROM {u})"
    got_exists = _rowset(spark.sql(q_exists.format(t="rand_t", u="rand_u")))
    got_in = _rowset(spark.sql(q_in.format(t="rand_t", u="rand_u")))
    want = _nullsafe(con.execute(q_exists.format(t="t", u="u")).fetchall())
    assert got_exists == want
    assert got_in == want


@given(_table, _table)
@_SETTINGS
def test_correlated_scalar_subquery_empty_group(spark, rows_a, rows_b):
    """A correlated scalar aggregate over an EMPTY correlated slice yields
    NULL (never 0, never a dropped row) — the decorrelation rewrite must
    preserve the left-outer shape; an inner-join rewrite silently loses
    exactly the rows whose group is absent."""
    con = _two_tables(spark, rows_a, rows_b)
    q = (
        "SELECT id, (SELECT MAX(v) FROM {u} WHERE {u}.k = {t}.k) AS mx "
        "FROM {t}"
    )
    got = _rowset(spark.sql(q.format(t="rand_t", u="rand_u")))
    want = _nullsafe(con.execute(q.format(t="t", u="u")).fetchall())
    assert got == want


# --- substring-span dedup: random tiny-vocab corpora -----------------------
#
# q_dedup_substring's gram/island pipeline has order-of-operations traps
# (sub-K docs, whole-doc periodicity, islands that touch at exactly one
# token, within-doc repeats) that constructed fixtures can only sample.
# Generate corpora from a 3-token vocabulary — maximal gram collision
# pressure at K=8 — and require Spark and the registered DuckDB oracle to
# agree on every document's span statistics.

_vocab_doc = st.lists(
    st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=24
)
_corpus = st.lists(_vocab_doc, min_size=1, max_size=5)


@given(_corpus)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_substring_dedup_matches_oracle_on_random_corpus(
    spark, tmp_path_factory, docs
):
    from ws_to_kafka_spark.operators import QUERIES

    rows = [
        (i, " ".join(toks), "en", "web", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_sub"))
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    spec = QUERIES["q_dedup_substring"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(
        tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        for r in sdf.select(sorted(sdf.columns)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(
        tuple(
            round(r[i], 6) if isinstance(r[i], float) else r[i] for i in order
        )
        for r in cur.fetchall()
    )
    assert got == want


# --- as-of join: union + window-carry vs DuckDB's native ASOF JOIN --------
#
# q_join_asof's distributed formulation (tag sides, sort by (ts, side),
# carry the last right-side ts forward) is verified on the fixtures
# against DuckDB's native ASOF JOIN; this property re-derives the same
# comparison on random corpora where the traps live: duplicate
# timestamps within and across sides, equal purchase/signup instants
# (inclusive match), users with no right-side rows, and empty sides.

_ts_row = st.tuples(
    st.integers(min_value=0, max_value=3),   # user
    st.integers(min_value=0, max_value=20),  # ts (int stand-in)
)
_ts_table = st.lists(_ts_row, min_size=0, max_size=25)


@given(_ts_table, _ts_table)
@_SETTINGS
def test_asof_union_carry_matches_native_asof(spark, purchases, signups):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    p_rows = [(i, u, t, 1) for i, (u, t) in enumerate(purchases)]
    s_rows = [(10_000 + i, u, t, 0) for i, (u, t) in enumerate(signups)]
    schema = "event_id long, user_id long, ts long, is_p int"
    u = spark.createDataFrame(p_rows + s_rows, schema=schema)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = F.last(
        F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    got = _rowset(
        u.withColumn("signup_ts", carried)
        .filter((F.col("is_p") == 1) & F.col("signup_ts").isNotNull())
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "signup_ts")
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE p (event_id BIGINT, user_id BIGINT, ts BIGINT)")
    con.execute("CREATE TABLE s (user_id BIGINT, ts BIGINT)")
    if p_rows:
        con.executemany(
            "INSERT INTO p VALUES (?, ?, ?)", [r[:3] for r in p_rows]
        )
    if s_rows:
        con.executemany(
            "INSERT INTO s VALUES (?, ?)", [(r[1], r[2]) for r in s_rows]
        )
    want = _nullsafe(
        con.execute(
            "SELECT p.event_id, p.user_id, p.ts AS purchase_ts, s.ts AS signup_ts "
            "FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts"
        ).fetchall()
    )
    assert got == want


# --- triangle counting: degree-ordered Spark plan vs id-ordered oracle ----
#
# q_graph_triangles enumerates each triangle ONCE via (degree, id)-rank
# edge orientation while the DuckDB oracle enumerates a < b < c by id —
# two independent formulations that must agree on every graph. Random
# incidence lists concentrate the traps: massively TIED degrees (the id
# tiebreak must orient consistently), duplicate (order, part) rows and
# parallel edges from different orders (both collapse in the distinct),
# empty graphs, and edge-only graphs with zero triangles (empty result
# on both engines, not a NULL row).

_inc_row = st.tuples(
    st.integers(min_value=0, max_value=5),   # l_orderkey
    st.integers(min_value=0, max_value=8),   # l_partkey
)
_inc_table = st.lists(_inc_row, min_size=0, max_size=30)


@given(_inc_table)
@_SETTINGS
def test_triangle_count_matches_oracle_on_random_graphs(
    spark, tmp_path_factory, rows
):
    from ws_to_kafka_spark.operators import QUERIES

    sf_dir = str(tmp_path_factory.mktemp("sf_rand_tri"))
    spark.createDataFrame(
        rows or [(None, None)], schema="l_orderkey long, l_partkey long"
    ).filter("l_orderkey IS NOT NULL").coalesce(1).write.parquet(
        f"{sf_dir}/lineitem.parquet"
    )

    spec = QUERIES["q_graph_triangles"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(sdf.select(sorted(sdf.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want


# --- EWMA: closed-form window vs DuckDB, on degenerate event streams ------
#
# q_ts_ewma's scaled-sum closed form is pinned on fixtures; random
# corpora add what fixtures lack: duplicate timestamps WITHIN a user
# (the (ts, event_id) tiebreak must pick the same recursion order in
# both engines), NULL values (excluded from the series, indexes must
# re-compact identically), single-event users (y = x0 exactly), and
# empty tables.

_ev_row = st.tuples(
    st.integers(min_value=0, max_value=3),                    # user
    st.integers(min_value=0, max_value=10),                   # ts bucket
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),  # value
)
_ev_table = st.lists(_ev_row, min_size=0, max_size=30)


@given(_ev_table)
@_SETTINGS
def test_ewma_matches_oracle_on_random_events(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    from ws_to_kafka_spark.operators import QUERIES

    data = [
        (
            i,
            datetime(2024, 1, 1, 0, t, 0),
            u,
            "view",
            float(v) if v is not None else None,
            "{}",
        )
        for i, (u, t, v) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_ewma"))
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    spark.createDataFrame(data or [], schema=schema).coalesce(
        1
    ).write.parquet(f"{sf_dir}/events.parquet")

    spec = QUERIES["q_ts_ewma"]
    got = _nullsafe(spec.fn(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    spark_cols = ["event_id", "user_id", "value", "ewma"]
    order = [cols.index(c) for c in spark_cols]
    want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want


@given(_ts_table, _ts_table)
@_SETTINGS
def test_asof_nearest_matches_allpairs_oracle(
    spark, tmp_path_factory, purchases, signups
):
    """Nearest-direction as-of: the union + two-carry form vs the
    all-pairs ROW_NUMBER oracle, on random corpora where the traps live —
    EQUAL distances before and after (tie must go to the earlier
    signup), purchases with only a forward match, duplicate timestamps
    on either side, users with no signups at all."""
    from datetime import datetime

    from ws_to_kafka_spark.operators import QUERIES

    rows = [
        (i, datetime(2024, 1, 1, 0, t, 0), u, "purchase", 1.0, "{}")
        for i, (u, t) in enumerate(purchases)
    ] + [
        (10_000 + i, datetime(2024, 1, 1, 0, t, 0), u, "signup", 1.0, "{}")
        for i, (u, t) in enumerate(signups)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_asof_near"))
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    spark.createDataFrame(rows or [], schema=schema).coalesce(
        1
    ).write.parquet(f"{sf_dir}/events.parquet")

    spec = QUERIES["q_join_asof_nearest"]
    got = _nullsafe(spec.fn(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    spark_cols = ["event_id", "user_id", "purchase_ts", "signup_ts", "usecs_offset"]
    order = [cols.index(c) for c in spark_cols]
    want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want


# --- feature statistics on degenerate random orders -----------------------
#
# q_agg_gini / q_feat_winsorize / q_agg_moments are pinned on fixtures;
# random mini-tables add the traps fixtures lack: CONSTANT-value groups
# (gini 0, lo == hi so nothing clips, zero variance -> NULL moments via
# the nullif guard), single-row groups, duplicate values (tie weighting
# in the rank-based gini), and tiny n where bias terms dominate.

_ord_row = st.tuples(
    st.integers(min_value=0, max_value=2),          # status bucket
    st.integers(min_value=1, max_value=50),         # price (small ints)
)
_ord_table = st.lists(_ord_row, min_size=1, max_size=25)


@given(_ord_table)
@_SETTINGS
def test_feature_stats_match_oracle_on_random_orders(
    spark, tmp_path_factory, rows
):
    from ws_to_kafka_spark.operators import QUERIES

    data = [
        (i, "NOF"[s], float(v), 0)
        for i, (s, v) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_feat"))
    spark.createDataFrame(
        data,
        schema="o_orderkey long, o_orderstatus string, o_totalprice double,"
               " o_custkey long",
    ).coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    lineitem_cols = "l_returnflag string, l_quantity double"
    spark.createDataFrame(
        [("A", float(v)) for _, v in rows], schema=lineitem_cols
    ).coalesce(1).write.parquet(f"{sf_dir}/lineitem.parquet")

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    for qname in ("q_agg_gini", "q_feat_winsorize", "q_agg_moments"):
        spec = QUERIES[qname]
        sdf = spec.fn(spark, sf_dir)
        got = _nullsafe(sdf.select(sorted(sdf.columns)).collect())
        cur = con.execute(spec.oracle)
        cols = [d[0] for d in cur.description]
        order = [cols.index(c) for c in sorted(cols)]
        want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
        assert got == want, qname


# --- unrounded-threshold bug class: engine-computed float cutpoints --------
#
# Round-3 verdict item #2: any operator comparing raw values against an
# engine-computed float threshold (percentile / mean±k·std cutoffs) can
# flip membership when the threshold lands on a value tie and the two
# engines' float expression forms differ by an ulp. These properties feed
# each family TIE-HEAVY tables (tiny value domains, 2dp prices, constant
# groups) so interpolated cutpoints land exactly ON data values — the
# configuration fixtures never contain (they are duplicate-free by
# design; see CLAUDE.md).

def _run_spec_vs_oracle(spark, con, qname, sf_dir):
    from ws_to_kafka_spark.operators import QUERIES

    spec = QUERIES[qname]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(sdf.select(sorted(sdf.columns)).collect())
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want, qname


# 2dp prices from a small cents domain: decile cutpoints interpolate to
# 0.001-multiples that collide with data values constantly
_price_row = st.tuples(
    st.integers(min_value=0, max_value=2),     # status bucket
    st.integers(min_value=0, max_value=120),   # price in cents (tie-heavy)
    st.booleans(),                             # period A / period B (PSI)
)
_price_table = st.lists(_price_row, min_size=1, max_size=25)


@given(_price_table)
@_SETTINGS
def test_quantile_thresholds_match_oracle_on_tied_prices(
    spark, tmp_path_factory, rows
):
    """q_quantile_buckets + q_feat_winsorize + q_drift_psi on tie-heavy
    2dp prices: decile/percentile cutpoints land exactly on data values,
    so any unrounded (or boundary-unsafe-rounded) threshold compare
    diverges between Spark's (1-f)*lo+f*hi and DuckDB's lo+f*(hi-lo)."""
    from datetime import datetime

    data = [
        (
            i,
            "NOF"[s],
            c / 100.0,
            0,
            datetime(1997, 6, 1) if in_a else datetime(1998, 6, 1),
        )
        for i, (s, c, in_a) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_thresh"))
    spark.createDataFrame(
        data,
        schema="o_orderkey long, o_orderstatus string, o_totalprice double,"
               " o_custkey long, o_orderdate timestamp_ntz",
    ).coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
    )
    for qname in (
        "q_quantile_buckets",
        "q_feat_winsorize",
        "q_drift_psi",
        # KS rides the same table: all-one-status inputs (empty sample ->
        # NULL ks_stat via nullif on both engines), tie-heavy prices (max
        # CDF gap achieved at several values -> min-v argmin must agree)
        "q_drift_ks",
    ):
        _run_spec_vs_oracle(spark, con, qname, sf_dir)


# z-score: values engineered so group std can be RATIONAL (e.g. three
# equal values plus one outlier gives std = x/2 and z exactly 1.5/-0.5),
# putting the rounded-z threshold compare under maximal tie pressure
_ev_val_row = st.tuples(
    st.integers(min_value=0, max_value=1),                    # type bucket
    st.integers(min_value=-40, max_value=40),                 # value
)
_ev_val_table = st.lists(_ev_val_row, min_size=1, max_size=20)


@given(_ev_val_table)
@_SETTINGS
def test_zscore_threshold_matches_oracle_on_tied_values(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    data = [
        (
            i,
            datetime(2024, 1, 1, 0, 0, 0),
            0,
            ("view", "click")[t],
            float(v),
            "{}",
        )
        for i, (t, v) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_z"))
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    spark.createDataFrame(data, schema=schema).coalesce(1).write.parquet(
        f"{sf_dir}/events.parquet"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_anomaly_zscore", sf_dir)


# MAD: 2dp quantities stress BOTH percentile passes (median of the raw
# values, then median of |x - med|), where f=0.5 interpolation forms
# differ by an ulp on non-integer doubles
_qty_row = st.tuples(
    st.integers(min_value=0, max_value=1),     # flag bucket
    st.integers(min_value=0, max_value=80),    # quantity in hundredths
)
_qty_table = st.lists(_qty_row, min_size=1, max_size=20)


@given(_qty_table)
@_SETTINGS
def test_mad_matches_oracle_on_tied_2dp_quantities(
    spark, tmp_path_factory, rows
):
    data = [("AR"[f], q / 100.0) for f, q in rows]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_mad"))
    spark.createDataFrame(
        data, schema="l_returnflag string, l_quantity double"
    ).coalesce(1).write.parquet(f"{sf_dir}/lineitem.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_agg_mad", sf_dir)


# --- ACF: paired-moment estimator on degenerate series ---------------------
#
# q_ts_acf is pinned on fixtures (tie-free, NULL-free); random streams add
# the traps: duplicate timestamps within a type (the (ts, event_id)
# tiebreak must align pairs identically), NULL-ts rows (NULLS FIRST is
# pinned explicitly — engine defaults differ), NULL values (covar/stddev
# skip the pair, COUNT(*) does not), constant runs (stddev 0 -> NULL acf,
# not DIVIDE_BY_ZERO), and series shorter than the lag.

_acf_row = st.tuples(
    st.integers(min_value=0, max_value=1),                    # type
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # ts bucket
    st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),  # value
)
_acf_table = st.lists(_acf_row, min_size=0, max_size=25)


@given(_acf_table)
@_SETTINGS
def test_acf_matches_oracle_on_random_events(spark, tmp_path_factory, rows):
    from datetime import datetime

    from ws_to_kafka_spark.operators import QUERIES

    data = [
        (
            i,
            datetime(2024, 1, 1, 0, t, 0) if t is not None else None,
            0,
            "ab"[ty],
            float(v) if v is not None else None,
            "{}",
        )
        for i, (ty, t, v) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_acf"))
    spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    spec = QUERIES["q_ts_acf"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(
        tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        for r in sdf.select(sorted(sdf.columns)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(
        tuple(
            round(r[i], 6) if isinstance(r[i], float) else r[i] for i in order
        )
        for r in cur.fetchall()
    )
    assert got == want


# --- connected components: fixpoint loop vs recursive CTE ------------------
#
# q_graph_components' driver-side convergence loop is the one registered
# operator whose ROUND COUNT is data-dependent; random order/part tables
# exercise empty edge sets (zero rounds), long chains (many rounds),
# isolated nodes (threshold filters every edge), and multi-component
# splits — each compared against the recursive-CTE oracle.

_li_row = st.tuples(
    st.integers(min_value=0, max_value=7),   # l_orderkey
    st.integers(min_value=0, max_value=9),   # l_partkey
)
_li_table = st.lists(_li_row, min_size=0, max_size=40)


@given(_li_table)
@_SETTINGS
def test_components_match_oracle_on_random_baskets(
    spark, tmp_path_factory, rows
):
    from ws_to_kafka_spark.operators import QUERIES

    sf_dir = str(tmp_path_factory.mktemp("sf_rand_cc"))
    spark.createDataFrame(
        rows or [(None, None)], schema="l_orderkey long, l_partkey long"
    ).filter("l_orderkey IS NOT NULL").coalesce(1).write.parquet(
        f"{sf_dir}/lineitem.parquet"
    )

    spec = QUERIES["q_graph_components"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(sdf.select(sorted(sdf.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want


# --- containment: prefix-filter exactness under gram collisions ------------
#
# The containment prefix filter is exact by theorem; random 3-token-vocab
# corpora maximize shingle collisions and within-doc repetition so the
# (df, shingle) prefix order, the min-shingle floor, and the directional
# a<>b pairing all get stressed against the all-pairs oracle.


@given(_corpus)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_containment_matches_oracle_on_random_corpus(
    spark, tmp_path_factory, docs
):
    from ws_to_kafka_spark.operators import QUERIES

    rows = [
        (i, " ".join(toks), "en", "web", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_cont"))
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    spec = QUERIES["q_dedup_containment"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(
        tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        for r in sdf.select(sorted(sdf.columns)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(
        tuple(
            round(r[i], 6) if isinstance(r[i], float) else r[i] for i in order
        )
        for r in cur.fetchall()
    )
    assert got == want


# --- changepoint: bit-identical cusum argmax ------------------------------
#
# q_ts_changepoint's portability argument is that same-order prefix sums
# make the cusum values bit-identical, so the ARGMAX (a float ranking,
# normally the most fragile cross-engine shape) cannot flip. Random
# streams with duplicate timestamps, NULL ts/values, and constant runs
# (all cusums 0 -> earliest-row tiebreak) put that claim under test.


@given(_acf_table)
@_SETTINGS
def test_changepoint_matches_oracle_on_random_events(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    from ws_to_kafka_spark.operators import QUERIES

    data = [
        (
            i,
            datetime(2024, 1, 1, 0, t, 0) if t is not None else None,
            0,
            "ab"[ty],
            float(v) if v is not None else None,
            "{}",
        )
        for i, (ty, t, v) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_cp"))
    spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    spec = QUERIES["q_ts_changepoint"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(
        tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        for r in sdf.select(sorted(sdf.columns)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(
        tuple(
            round(r[i], 6) if isinstance(r[i], float) else r[i] for i in order
        )
        for r in cur.fetchall()
    )
    assert got == want


# --- histogram: data-derived edges, boundary-exact binning ----------------
#
# q_agg_histogram claims a value exactly ON a bucket edge bins identically
# because every operand of FLOOR((v-lo)*n/(hi-lo)) is bit-identical on
# both engines. Quarter-step values (exact binary doubles) with
# cents-snapped ranges manufacture edge hits constantly; constant series
# exercise the hi=lo nullif path.

_hist_row = st.tuples(
    st.integers(min_value=0, max_value=1),           # type
    st.integers(min_value=-50, max_value=50),        # value quarters
)
_hist_table = st.lists(_hist_row, min_size=1, max_size=25)


@given(_hist_table)
@_SETTINGS
def test_histogram_bins_match_oracle_on_boundary_values(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    from ws_to_kafka_spark.operators import QUERIES

    data = [
        (i, datetime(2024, 1, 1), 0, "ab"[ty], q / 4.0, "{}")
        for i, (ty, q) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_hist"))
    spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    spec = QUERIES["q_agg_histogram"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(
        tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        for r in sdf.select(sorted(sdf.columns)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(
        tuple(
            round(r[i], 6) if isinstance(r[i], float) else r[i] for i in order
        )
        for r in cur.fetchall()
    )
    assert got == want


# Skyline with heavy (day, price) ties: equal prices across days and
# duplicate (day, price) points are exactly where a sweep-based frontier
# can diverge from the NOT-EXISTS domination definition (strict-vs-
# non-strict mistakes keep or drop tied points on one side only).
_sky_row = st.tuples(
    st.integers(min_value=0, max_value=4),   # day offset (tie-heavy)
    st.integers(min_value=0, max_value=5),   # price (tiny domain => ties)
)
_sky_table = st.lists(_sky_row, min_size=1, max_size=25)


@given(_sky_table)
@_SETTINGS
def test_pareto_frontier_matches_domination_oracle_on_ties(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    from ws_to_kafka_spark.operators import QUERIES

    data = [
        (i, 0, "O", float(p), datetime(2024, 1, 1 + d), "1-URGENT")
        for i, (d, p) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_sky"))
    spark.createDataFrame(
        data,
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    ).coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_pareto_frontier", sf_dir)


# A/B z-test degenerate shapes: cents exactly ON the conversion
# threshold (strict >), a missing variant (odd-only or even-only user
# ids => NULL column, NULL stats), and all-convert/none-convert
# experiments (zero pooled variance => z must be NULL, not an ANSI
# divide error).
_ab_row = st.tuples(
    st.integers(min_value=0, max_value=3),            # user_id (ties, parity)
    st.sampled_from([0, 59999, 60000, 60001, 90000]),  # purchase cents
)
_ab_table = st.lists(_ab_row, min_size=1, max_size=12)


@given(_ab_table)
@_SETTINGS
def test_ab_lift_matches_oracle_on_boundary_and_degenerate(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    data = [
        (i, datetime(2024, 1, 1), u, "purchase", c / 100.0, "{}")
        for i, (u, c) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_ab"))
    spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_ab_lift", sf_dir)


# IQR fences from tied integer-ish values: quartile SELECTION indices
# land on duplicated elements and fence compares hit exact ties — the
# selection convention (floor((n-1)q)+1) must match element-for-element
@given(_ev_val_table)
@_SETTINGS
def test_iqr_fences_match_oracle_on_tied_values(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    data = [
        (
            i,
            datetime(2024, 1, 1, 0, 0, 0),
            0,
            ("view", "click")[t],
            float(v) / 4.0,
            "{}",
        )
        for i, (t, v) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_iqr"))
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    spark.createDataFrame(data, schema=schema).coalesce(1).write.parquet(
        f"{sf_dir}/events.parquet"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_anomaly_iqr", sf_dir)


# --- BPE merges: random tiny-vocab corpora --------------------------------
#
# q_bpe_merges' two-pass literal replace has the same class of traps as the
# substring dedup (symbol-overlapping repeats, single-char words, empty
# docs, tie-heavy pair counts on a 2-letter alphabet); random corpora from
# {a, b} words force all of them, and engines must agree on every merge
# rule and the pair counts that selected it.

_bpe_word = st.text(alphabet="ab", min_size=0, max_size=5)
_bpe_doc = st.lists(_bpe_word, min_size=0, max_size=8)
_bpe_corpus = st.lists(_bpe_doc, min_size=1, max_size=4)


@given(_bpe_corpus)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_merges_match_oracle_on_random_corpus(
    spark, tmp_path_factory, docs
):
    from ws_to_kafka_spark.operators import QUERIES

    rows = [
        (i, " ".join(toks), "en", "web", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_bpe"))
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    spec = QUERIES["q_bpe_merges"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(tuple(r) for r in sdf.select(sorted(sdf.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want


# --- Lloyd k-means: degenerate embedding corpora --------------------------
#
# q_embed_kmeans' engine-exactness claim (integer quantization, identical
# distance expansion, 6dp round before argmin) is strongest exactly where
# fixtures are weakest: corpora SMALLER than K (seeds = every vector),
# all-identical vectors (every distance ties -> lowest-cluster-id wins),
# clusters that empty out between updates, and the empty corpus.

_km_vec_params = st.tuples(
    st.integers(min_value=-3, max_value=3), st.integers(min_value=-3, max_value=3)
)
_km_corpus = st.lists(_km_vec_params, min_size=0, max_size=12)


@given(_km_corpus)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kmeans_matches_oracle_on_degenerate_corpora(
    spark, tmp_path_factory, params
):
    from ws_to_kafka_spark.operators import QUERIES

    rows = [
        (i, [((a * j + b) % 7 - 3) / 4.0 for j in range(64)])
        for i, (a, b) in enumerate(params)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_km"))
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    # q_embed_outliers shares the Lloyd chain and adds the per-cluster
    # selection-exact cutoff — same degenerate shapes, one more surface
    for qname in ("q_embed_kmeans", "q_embed_outliers"):
        spec = QUERIES[qname]
        sdf = spec.fn(spark, sf_dir)
        got = _nullsafe(
            tuple(round(x, 6) if isinstance(x, float) else x for x in r)
            for r in sdf.select(sorted(sdf.columns)).collect()
        )
        cur = con.execute(spec.oracle)
        cols = [d[0] for d in cur.description]
        order = [cols.index(c) for c in sorted(cols)]
        want = _nullsafe(
            tuple(
                round(r[i], 6) if isinstance(r[i], float) else r[i]
                for i in order
            )
            for r in cur.fetchall()
        )
        assert got == want, qname


# Welch t-test degenerate shapes (round-5 ADVICE high): an n=1 variant
# makes every /(n-1) term divide by zero — ANSI Spark must NULL the
# t_stat/welch_df via nullif guards exactly where the DuckDB oracle
# yields NULL, never throw. Parity-keyed user ids make 1-row variants
# common in tiny tables; sampled cents hit constant-metric groups too.
_tt_row = st.tuples(
    st.integers(min_value=0, max_value=3),               # user_id (parity)
    st.sampled_from([0, 100, 2500, 2500, 999999]),        # purchase cents
)
_tt_table = st.lists(_tt_row, min_size=1, max_size=10)


@given(_tt_table)
@_SETTINGS
def test_ab_ttest_matches_oracle_on_degenerate_variants(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    data = [
        (i, datetime(2024, 1, 1), u, "purchase", c / 100.0, "{}")
        for i, (u, c) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_tt"))
    spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_ab_ttest", sf_dir)


def test_ab_ttest_single_row_variants_null_not_throw(
    spark, tmp_path_factory
):
    """The exact ADVICE repro: one purchase per variant => n_a=n_b=1,
    sample variance undefined — both engines return one row with NULL
    t_stat/welch_df (previously Spark threw DIVIDE_BY_ZERO)."""
    from datetime import datetime

    data = [
        (1, datetime(2024, 1, 1), 2, "purchase", 10.0, "{}"),
        (2, datetime(2024, 1, 1), 1, "purchase", 6.0, "{}"),
        (3, datetime(2024, 1, 1), 1, "view", 99.0, "{}"),
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_tt_n1"))
    spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_ab_ttest", sf_dir)
    row = __import__("ws_to_kafka_spark.operators", fromlist=["QUERIES"]) \
        .QUERIES["q_ab_ttest"].fn(spark, sf_dir).collect()[0]
    assert row["t_stat"] is None and row["welch_df"] is None


# RRF tie order: duplicate embedding vectors force exactly-equal cosine
# scores (tie -> vec_id order) and symmetric rank pairs force exactly-
# equal fused 1/(k+ra)+1/(k+rb) scores — the fused_rank tiebreak must be
# engine-identical through orderBy().limit() + the tiny rank window.
_rrf_vec = st.sampled_from(
    [(1, 0, 0, 0), (0, 1, 0, 0), (1, 1, 0, 0), (2, 1, 0, 0), (1, 2, 0, 0)]
)
_rrf_table = st.lists(_rrf_vec, min_size=4, max_size=14)


@given(_rrf_table)
@_SETTINGS
def test_sim_rrf_tie_order_matches_oracle(spark, tmp_path_factory, rows):
    rows = [
        (i, [float(x) for x in v], i % 3) for i, v in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_rrf"))
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_sim_rrf", sf_dir)


# Vocab coverage degenerate languages: a language whose every token is
# out-of-vocabulary, single-token docs, and repeated-token docs that
# push a token in/out of the top-K boundary with exact count ties.
_vc_doc = st.tuples(
    st.sampled_from(["en", "xx", "de"]),               # lang (xx = all-OOV)
    st.lists(
        st.sampled_from(["the", "of", "qqq", "zzz", "www"]),
        min_size=1,
        max_size=6,
    ),
)
_vc_table = st.lists(_vc_doc, min_size=1, max_size=12)


@given(_vc_table)
@_SETTINGS
def test_vocab_coverage_degenerate_langs(spark, tmp_path_factory, rows):
    data = [
        (i, " ".join(toks), lang, "web", len(" ".join(toks)))
        for i, (lang, toks) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_vc"))
    spark.createDataFrame(
        data,
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_vocab_coverage", sf_dir)


# Funnel-window stage collisions: view/click/purchase at the SAME
# timestamp (strict > boundaries must agree engine-to-engine) and events
# exactly ON the one-hour window edge (<= boundary).
_fw_ev = st.tuples(
    st.integers(min_value=0, max_value=3),                   # user
    st.sampled_from(["view", "click", "purchase"]),
    st.sampled_from([0, 0, 1800, 3600, 3601, 7200]),          # offset sec
)
_fw_table = st.lists(_fw_ev, min_size=1, max_size=14)


@given(_fw_table)
@_SETTINGS
def test_funnel_window_same_ts_collisions(spark, tmp_path_factory, rows):
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1)
    data = [
        (i, base + timedelta(seconds=off), u, et, 1.0, "{}")
        for i, (u, et, off) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_fw"))
    spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_funnel_window", sf_dir)


# ABC/Pareto class boundaries: identical order totals make cumulative
# shares land EXACTLY on the 80%/95% cut lines (e.g. five equal
# customers -> cum shares 0.2..1.0, and 0.8 is ON the A boundary) —
# the exact-integer compare (cum*5 <= total*4) must agree engine-to-
# engine, as must the rank/prefix-sum under total ties.
_abc_row = st.tuples(
    st.integers(min_value=0, max_value=7),          # customer (collisions)
    st.sampled_from([100, 100, 100, 2000, 12345]),   # cents (tie-heavy)
)
_abc_table = st.lists(_abc_row, min_size=1, max_size=16)


@given(_abc_table)
@_SETTINGS
def test_orders_abc_boundary_ties_match_oracle(spark, tmp_path_factory, rows):
    from datetime import datetime

    data = [
        (i, c, "O", cents / 100.0, datetime(1995, 1, 1), "1-URGENT")
        for i, (c, cents) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_abc"))
    spark.createDataFrame(
        data,
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    ).coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_orders_abc", sf_dir)


# Local clustering coefficient on random small co-order graphs: the
# triangle-listing closure, degree join, and degree<2 NULL guard must
# agree with the oracle on graphs dense enough to have many triangles
# AND sparse corners (isolated edges, degree-1 leaves).
@given(_inc_table)
@_SETTINGS
def test_clustering_coefficient_matches_oracle_on_random_graphs(
    spark, tmp_path_factory, rows
):
    from ws_to_kafka_spark.operators import QUERIES

    sf_dir = str(tmp_path_factory.mktemp("sf_rand_cc"))
    spark.createDataFrame(
        rows or [(None, None)], schema="l_orderkey long, l_partkey long"
    ).filter("l_orderkey IS NOT NULL").coalesce(1).write.parquet(
        f"{sf_dir}/lineitem.parquet"
    )
    spec = QUERIES["q_graph_clustering"]
    sdf = spec.fn(spark, sf_dir)
    got = _nullsafe(
        tuple(round(x, 6) if isinstance(x, float) else x for x in r)
        for r in sdf.select(sorted(sdf.columns)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _nullsafe(
        tuple(
            round(r[i], 6) if isinstance(r[i], float) else r[i]
            for i in order
        )
        for r in cur.fetchall()
    )
    assert got == want


# LOO target encoding degenerate categories: a priority level with
# exactly ONE order has no leave-one-out mean — (S-own)/(n-1) must
# NULL on both engines (ANSI nullif), and tied totals must encode
# identically under any aggregation order (exact integer cents).
_te_row = st.tuples(
    st.integers(min_value=0, max_value=4),               # priority bucket
    st.sampled_from([100, 100, 2550, 999999]),            # cents (ties)
)
_te_table = st.lists(_te_row, min_size=1, max_size=14)


@given(_te_table)
@_SETTINGS
def test_target_encode_singleton_categories_match_oracle(
    spark, tmp_path_factory, rows
):
    from datetime import datetime

    data = [
        (i, i % 3, "O", cents / 100.0, datetime(1995, 1, 1), f"{p}-PRIO")
        for i, (p, cents) in enumerate(rows)
    ]
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_te"))
    spark.createDataFrame(
        data,
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    ).coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
    )
    _run_spec_vs_oracle(spark, con, "q_feat_target_encode", sf_dir)
    # chi2 rides the same table: the FIXED 'O' status makes a degenerate
    # one-column contingency (expected == observed, contribution 0) and
    # tiny priority groups stress the exact integer r*c/n path
    _run_spec_vs_oracle(spark, con, "q_ab_chi2", sf_dir)


# intervals: (start, length) with small coordinates and a cell width
# SMALLER than many interval lengths — intervals spanning 0..8 cells,
# starts/ends landing exactly ON cell boundaries constantly (the cases
# the driver fixtures, with width >= max length, never produce).
_iv_table = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),  # start
        st.integers(min_value=0, max_value=120),  # length (0 = point)
    ),
    min_size=0,
    max_size=40,
)


@given(_iv_table, st.integers(min_value=1, max_value=64))
@_SETTINGS
def test_grid_overlap_join_matches_naive_all_pairs(spark, rows, width):
    """grid_overlap_pairs (explode into width-cells + first-shared-cell
    ownership) must equal the naive all-pairs theta join for EVERY
    corpus and EVERY cell width — including widths far below interval
    lengths (multi-cell spans), point intervals, and boundary-exact
    starts/ends. Pins that the ownership filter emits each overlapping
    pair exactly once."""
    from ws_to_kafka_spark.operators.analytics_ext import grid_overlap_pairs

    data = [(i, s, s + ln) for i, (s, ln) in enumerate(rows)]
    iv = spark.createDataFrame(
        data or [(0, 0, 0)], schema="event_id long, s long, e long"
    )
    if not data:
        iv = iv.limit(0)
    got = _nullsafe(
        tuple(r) for r in grid_overlap_pairs(iv, width).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE iv (event_id BIGINT, s BIGINT, e BIGINT)")
    if data:
        con.executemany("INSERT INTO iv VALUES (?, ?, ?)", data)
    want = _nullsafe(
        con.execute(
            """
            SELECT a.event_id, b.event_id,
                   CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT)
            FROM iv a JOIN iv b
              ON a.event_id < b.event_id AND a.s <= b.e AND b.s <= a.e
            """
        ).fetchall()
    )
    assert got == want


# token multisets over a tiny alphabet: heavy-hitter threshold ties
# (freq * k == n exactly -> excluded by the strict >), single-token
# floods, and empty inputs; k small enough that per-partition
# Misra-Gries compaction actually fires.
_tok_table = st.lists(
    st.sampled_from(list("abcdef")), min_size=0, max_size=80
)


@given(_tok_table, st.integers(min_value=2, max_value=6))
@_SETTINGS
def test_mg_heavy_hitters_exact(spark, toks, k):
    """mg_heavy_hitters (per-partition Misra-Gries candidates + exact
    verify) must equal the plain GROUP BY ... HAVING count*k > n for
    every multiset and every k — the pigeonhole nomination guarantee
    plus the strict-inequality threshold, under forced multi-partition
    summaries (repartition(4)) so compaction and summary merging are
    actually exercised."""
    from ws_to_kafka_spark.operators.pipeline_ops import mg_heavy_hitters

    rows = [(t,) for t in toks]
    df = spark.createDataFrame(rows or [("x",)], schema="token string")
    if not rows:
        df = df.limit(0)
    got = _nullsafe(
        tuple(r) for r in mg_heavy_hitters(df.repartition(4), k).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (token VARCHAR)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?)", rows)
    want = _nullsafe(
        con.execute(
            f"""
            SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
            FROM t GROUP BY token
            HAVING COUNT(*) * {k} > (SELECT COUNT(*) FROM t)
            """
        ).fetchall()
    )
    assert got == want


# --- SCC: trim + FW-BW coloring vs the DuckDB closure oracle --------------
#
# q_graph_scc is pinned on the fixture bow-tie and a constructed topology;
# random digraphs add what those lack: arbitrary cycle nests, self-loops
# (the src<>dst filter must drop them in both engines), mixed returnflags
# (only R->R transitions are edges), orders longer than two lines (chained
# transitions), and graphs whose trim/coloring fixpoints land at odd
# depths. The Spark side iterates to CHECKED fixpoints; the oracle is the
# recursive-CTE closure — agreement means the iterative schedule found the
# unique quotient.

_scc_order = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),        # l_partkey
        st.sampled_from(["R", "N"]),                  # l_returnflag
    ),
    min_size=1,
    max_size=4,
)
_scc_orders = st.lists(_scc_order, min_size=0, max_size=10)

_SCC_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(_scc_orders)
@_SCC_SETTINGS
def test_scc_matches_closure_oracle_on_random_digraphs(
    spark, tmp_path_factory, orders
):
    from ws_to_kafka_spark.operators import QUERIES

    rows = []
    for k, lines in enumerate(orders):
        for ln, (part, flag) in enumerate(lines, start=1):
            rows.append((k, ln, part, flag))
    sf_dir = str(tmp_path_factory.mktemp("sf_rand_scc"))
    spark.createDataFrame(
        rows or [(None, None, None, None)],
        schema="l_orderkey long, l_linenumber int, l_partkey long, "
        "l_returnflag string",
    ).filter("l_orderkey IS NOT NULL").coalesce(1).write.parquet(
        f"{sf_dir}/lineitem.parquet"
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    # condensation reruns the SCC assignment, so one random graph checks
    # both quotient AND longest-path levels against their closure oracles
    try:
        for key in ("q_graph_scc", "q_graph_condensation"):
            spec = QUERIES[key]
            sdf = spec.fn(spark, sf_dir)
            got = _nullsafe(sdf.select(sorted(sdf.columns)).collect())
            cur = con.execute(spec.oracle)
            cols = [d[0] for d in cur.description]
            order = [cols.index(c) for c in sorted(cols)]
            want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
            assert got == want, key
    finally:
        # every example writes a fresh tmp sf_dir, so its cached
        # scc_transition_edges / scc_assignments frames would stay
        # persisted for the whole session without this (round-9 ADVICE)
        from ws_to_kafka_spark.operators.dedup import evict_sf_dir

        evict_sf_dir(sf_dir)


# --- q_dedup_near: digest collapse + expansion vs the exact oracle --------
#
# The round-10 exact-dup collapse runs only when a corpus HAS duplicate
# digests, and its fixtures are duplicate-light; a tiny-vocabulary random
# corpus produces exactly the shapes that stress both halves at once —
# accidental byte-identical docs (collapse + J=1 intra expansion, with
# empty-shingle twins that must stay OUT), high-Jaccard near-dups across
# digest groups (rep-pair cross expansion), and sub-shingle-width docs.

_near_doc = st.lists(
    st.sampled_from(["alpha", "bravo", "charlie", "delta"]),
    min_size=0,
    max_size=6,
).map(" ".join)
_near_corpus = st.lists(_near_doc, min_size=0, max_size=10)


@given(_near_corpus)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_near_collapse_matches_oracle_on_random_dup_corpora(
    spark, tmp_path_factory, texts
):
    from ws_to_kafka_spark.operators import QUERIES
    from ws_to_kafka_spark.operators.dedup import evict_sf_dir

    sf_dir = str(tmp_path_factory.mktemp("sf_rand_near"))
    rows = [
        (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows or [(None, None, None, None, None)],
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).filter("doc_id IS NOT NULL").coalesce(1).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    try:
        spec = QUERIES["q_dedup_near"]
        sdf = spec.fn(spark, sf_dir)
        got = _nullsafe(
            tuple(r) for r in sdf.select(sorted(sdf.columns)).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        cur = con.execute(spec.oracle)
        cols = [d[0] for d in cur.description]
        order = [cols.index(c) for c in sorted(cols)]
        want = _nullsafe(tuple(r[i] for i in order) for r in cur.fetchall())
        assert got == want
    finally:
        evict_sf_dir(sf_dir)
