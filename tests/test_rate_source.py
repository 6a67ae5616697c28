"""`rate` source smoke — the last §2.3 source cell (SURVEY lists it as
the broker-less test alternative; the websocket-server fixture covers
the same ground everywhere else, so one adapter test is all it needs):
Spark's built-in rate stream, projected into this repo's
``(value binary, ws_timestamp timestamp)`` contract, drains through a
memory sink — proving any built-in streaming source can stand in for
the websocket feed upstream of the pipeline's transformations.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_rate_source_adapts_to_stream_contract(spark):
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()  # fixed schema: (timestamp timestamp, value long)
    )
    adapted = raw.select(
        F.col("value").cast("string").cast("binary").alias("value"),
        F.col("timestamp").alias("ws_timestamp"),
    )
    assert [(f.name, f.dataType.simpleString()) for f in adapted.schema] == [
        ("value", "binary"),
        ("ws_timestamp", "timestamp"),
    ]
    query = (
        adapted.writeStream.format("memory")
        .queryName("rate_smoke")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT value, ws_timestamp FROM rate_smoke"
            ).collect()
            if len(rows) >= 20:
                break
            time.sleep(0.2)
        assert len(rows) >= 20, f"rate source produced only {len(rows)} rows"
        vals = sorted(int(bytes(r.value)) for r in rows)
        assert vals[0] == 0 and vals[: len(vals)] == list(range(len(vals)))
        assert all(r.ws_timestamp is not None for r in rows)
    finally:
        query.stop()
