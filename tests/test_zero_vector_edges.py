"""Zero-norm embedding robustness: cosine similarity is undefined for the
zero vector, and under Spark 4's default ANSI mode an unguarded
``dot/(norm*norm)`` divide RAISES on it (DuckDB quietly yields NULL). The
operators guard the divide with ``nullif`` so both engines agree: zero
vectors drop to NULL cosine and sort out of rankings. Fixture corpora
contain no zero vectors, so this constructs one (an all-zero embedding —
what an empty document produces in real pipelines) and runs the
non-LSH similarity queries AND their registered oracles over it.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ws_to_kafka_spark.operators import QUERIES

_DIM = 64
_QUERIES = [
    "q_sim_topk",
    "q_sim_pairs",
    "q_sim_centroid",
    "q_embed_knn_graph",
    "q_sim_graph_search",
    # round 11: zero-norm vectors must score NULL cosine on both engines
    # (scorer membership mask / oracle NULLIF) and always be KEPT
    "q_dedup_semantic",
]


@pytest.fixture(scope="module")
def zero_sf_dir(spark, tmp_path_factory) -> str:
    rows = []
    for i in range(40):
        vec = [0.0] * _DIM
        vec[i % _DIM] = 1.0
        vec[(i + 1) % _DIM] = 0.5
        rows.append((i, vec, i % 3))
    rows.append((40, [0.0] * _DIM, 0))  # the zero vector
    dst = str(tmp_path_factory.mktemp("sf_zero"))
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{dst}/embeddings.parquet")
    return dst


def _norm(rows) -> list[tuple]:
    return sorted(
        (
            tuple(
                round(x, 6) if isinstance(x, float) and math.isfinite(x) else x
                for x in r
            )
            for r in rows
        ),
        key=str,
    )


@pytest.mark.parametrize("qname", _QUERIES)
def test_similarity_query_tolerates_zero_vector(spark, zero_sf_dir, qname):
    spec = QUERIES[qname]
    df = spec.fn(spark, zero_sf_dir)  # must not raise DIVIDE_BY_ZERO
    got = _norm(tuple(r) for r in df.select(sorted(df.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{zero_sf_dir}/embeddings.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _norm(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want, f"{qname} diverges on a zero-vector corpus"


def test_knn_graph_tree_merge_multiblock(spark, zero_sf_dir, monkeypatch):
    """Force a real multi-block grid on the 41-vector corpus
    (rows_per_cell=8 -> 6x6 cells; fanin=2 -> two tree-merge levels,
    6 -> 3 -> 2 block groups) and require exact oracle agreement — the
    tree merge must be a pure plan-shape change, invisible in results."""
    from ws_to_kafka_spark.operators import similarity

    monkeypatch.setattr(similarity, "_KNN_ROWS_PER_CELL", 8)
    monkeypatch.setattr(similarity, "_KNN_MERGE_FANIN", 2)
    spec = QUERIES["q_embed_knn_graph"]
    df = spec.fn(spark, zero_sf_dir)
    got = _norm(tuple(r) for r in df.select(sorted(df.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{zero_sf_dir}/embeddings.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _norm(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want, "tree merge changed the knn graph"
