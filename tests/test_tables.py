"""Scan-layer tests: parquet type normalization, JSON/CSV readers."""

from __future__ import annotations

from ws_to_kafka_spark import tables


def test_events_ts_normalized_to_timestamp(spark, sf_dir):
    events = tables.load(spark, sf_dir, "events")
    assert dict(events.dtypes)["ts"] == "timestamp_ntz"
    assert events.count() > 0


def test_load_all_names(spark, sf_dir):
    dfs = tables.load_all(spark, sf_dir)
    assert set(dfs) == set(tables.TABLE_NAMES)


def test_read_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "j")
    df = spark.range(5).selectExpr("id", "id * 2 AS dbl")
    df.write.json(p)
    back = tables.read_json(spark, p, schema="id long, dbl long")
    assert back.count() == 5
    assert sorted(r.dbl for r in back.collect()) == [0, 2, 4, 6, 8]


def test_read_orc_roundtrip_with_pushdown(spark, tmp_path):
    p = str(tmp_path / "o")
    spark.range(100).selectExpr("id", "id % 7 AS k").write.orc(p)
    back = tables.read_orc(spark, p).where("k = 3").select("id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 14
    # the filter must reach the ORC scan, same as the parquet path
    assert "PushedFilters: [" in plan and "k" in plan.split("PushedFilters:")[1][:80]


def test_read_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "c")
    spark.range(4).selectExpr("id", "concat('n', id) AS name").write.option(
        "header", "true"
    ).csv(p)
    back = tables.read_csv(spark, p, schema="id long, name string")
    assert sorted(r.name for r in back.collect()) == ["n0", "n1", "n2", "n3"]


def test_read_json_malformed_record_policies(spark, tmp_path):
    """The three malformed-record policies an ingest job chooses between:
    PERMISSIVE quarantines the raw line in the corrupt column, DROPMALFORMED
    silently drops it, FAILFAST raises on materialization."""
    import pytest
    from py4j.protocol import Py4JJavaError

    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "v": 10}\n{broken!!\n{"id": 2, "v": 20}\n')
    path, schema = str(p), "id long, v long, _bad string"

    perm = tables.read_json(spark, path, schema=schema, corrupt_col="_bad")
    rows = {r.id: r for r in perm.collect()}
    assert rows[1].v == 10 and rows[1]._bad is None
    assert rows[2].v == 20
    bad = [r for r in perm.collect() if r.id is None]
    assert len(bad) == 1 and bad[0]._bad == "{broken!!"

    dropped = tables.read_json(
        spark, path, schema="id long, v long", mode="DROPMALFORMED"
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 2]

    with pytest.raises(Py4JJavaError):
        tables.read_json(
            spark, path, schema="id long, v long", mode="FAILFAST"
        ).collect()
