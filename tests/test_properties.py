"""Property-based tests (hypothesis) for the hand-rolled components:
the RFC 6455 frame codec and the URI parser — the two places where a
byte-level bug would silently corrupt the stream.
"""

from __future__ import annotations

import socket

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.ws_server import RecordingWsServer
from ws_to_kafka_spark.sources.ws_client import WsClient
from ws_to_kafka_spark.uri import parse_uri


class _CodecHarness:
    """Round-trip: client-side masked encoder → server-side decoder,
    over a real socketpair (no network)."""

    def __init__(self) -> None:
        self.server = RecordingWsServer()

    def roundtrip(self, payloads: list[bytes]) -> list[bytes]:
        a, b = socket.socketpair()
        try:
            client = WsClient("ws://placeholder/")
            client._sock = a
            for p in payloads:
                client.send(p)
            a.shutdown(socket.SHUT_WR)
            buf = bytearray()
            while True:
                chunk = b.recv(65536)
                if not chunk:
                    break
                buf += chunk
            self.server.received.clear()
            rest = self.server._drain_frames(bytes(buf))
            assert rest == b"", "decoder left partial bytes on a complete stream"
            return list(self.server.received)
        finally:
            a.close()
            b.close()
            client._sock = None

    def close(self) -> None:
        self.server.close()


# Sizes straddle the 7-bit (<126), 16-bit (126..65535), 64-bit length forms.
_payloads = st.lists(
    st.binary(min_size=0, max_size=70000),
    min_size=1,
    max_size=4,
)


@settings(max_examples=25, deadline=None)
@given(_payloads)
def test_frame_codec_roundtrip(payloads):
    h = _CodecHarness()
    try:
        assert h.roundtrip(payloads) == payloads
    finally:
        h.close()


_hosts = st.from_regex(r"[a-z][a-z0-9\-]{0,20}(\.[a-z][a-z0-9\-]{0,10}){0,3}", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._~\-]{0,12}){0,4}", fullmatch=True)
_queries = st.from_regex(r"([a-z]{1,8}=[A-Za-z0-9]{0,10}(&[a-z]{1,8}=[A-Za-z0-9]{0,10}){0,3})?", fullmatch=True)


@settings(max_examples=100, deadline=None)
@given(
    proto=st.sampled_from(["ws", "wss", "http", "https"]),
    host=_hosts,
    port=st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
    path=_paths,
    query=_queries,
)
def test_uri_parse_roundtrip(proto, host, port, path, query):
    raw = f"{proto}://{host}"
    if port is not None:
        raw += f":{port}"
    raw += path
    if query:
        raw += f"?{query}"
    u = parse_uri(raw)
    assert u.protocol == proto
    assert u.host == host
    # default ports per the reference's table (src/uri.hpp:72-79)
    expected_port = port if port is not None else {"ws": 80, "http": 80, "wss": 443, "https": 443}[proto]
    assert u.port == expected_port
    assert u.path == (path or "/")
    assert u.query_string == query
    # resource is what goes on the GET line (src/uri.hpp:66-70)
    assert u.resource == (u.path + (f"?{query}" if query else ""))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),  # sort value (ties!)
            st.integers(min_value=0, max_value=10**6),  # unique-ish id
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=2, max_value=7),  # tile count
)
@settings(max_examples=10, deadline=None)
def test_global_row_number_and_ntile_match_window_functions(
    spark, rows, tiles
):
    """operators/distributed.py must reproduce the window functions it
    replaces EXACTLY: global_row_number == row_number() over the total
    order, ntile_from_rank == ntile(n) — including tie groups split
    across range-partition boundaries and n < tiles corner cases."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ws_to_kafka_spark.operators.distributed import (
        global_row_number,
        ntile_from_rank,
    )

    df = spark.createDataFrame(
        rows or [(0, 0)], schema="v long, id long"
    )
    if not rows:
        df = df.filter(F.lit(False))
    order = [F.col("v").asc(), F.col("id").asc()]
    got = global_row_number(
        df, order, "rn", num_parts=5, sum_col="v", sum_out="cs",
        extra_sums=[("id", "cs2")],  # second prefix sum, SAME exchange
    )
    n_total = df.count()
    got_rows = {
        r["id"]: (r["rn"], r["cs"], r["cs2"], r["tile"])
        for r in got.withColumn(
            "tile", ntile_from_rank(F.col("rn"), F.lit(n_total), tiles)
        ).collect()
    }
    w = W.orderBy(*order)
    want_rows = {
        r["id"]: (r["rn"], r["cs"], r["cs2"], r["tile"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("v")
            .over(w.rowsBetween(W.unboundedPreceding, 0))
            .cast("long")
            .alias("cs"),
            F.sum("id")
            .over(w.rowsBetween(W.unboundedPreceding, 0))
            .cast("long")
            .alias("cs2"),
            F.ntile(tiles).over(w).alias("tile"),
        ).collect()
    }
    assert got_rows == want_rows


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),  # sort value (ties!)
            st.integers(min_value=0, max_value=10**6),  # unique-ish id
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=2, max_value=7),  # tile count
    st.booleans(),  # ascending?
)
@settings(max_examples=8, deadline=None)
def test_global_ntile_matches_window_ntile(spark, rows, tiles, asc):
    """Single-axis global_ntile_multi must equal NTILE(t) over the same
    total order — the sample-and-refine selection has sharp corners the
    window version doesn't: boundary ranks that REPEAT when n < tiles,
    tie groups split across partitions, bracket windows that span
    partitions, and the empty-input null column. samples_per_part=2
    forces real bracketing (coarse samples, non-trivial refine windows)
    instead of the every-row-sampled degenerate path."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ws_to_kafka_spark.operators.distributed import (
        global_ntile_multi,
        release_persisted,
    )

    df = spark.createDataFrame(rows or [(0, 0)], schema="v long, id long")
    if not rows:
        df = df.filter(F.lit(False))
    got = {
        r["id"]: r["t"]
        for r in global_ntile_multi(
            df, [("v", asc, "t")], tiles, tiebreak="id", samples_per_part=2
        ).collect()
    }
    release_persisted()
    w = W.orderBy(F.col("v").asc() if asc else F.col("v").desc(), "id")
    want = {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(tiles).over(w).alias("t")).collect()
    }
    assert got == want  # both empty-dict when the input has zero rows


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),  # axis 1 value
            st.integers(min_value=0, max_value=9),  # axis 2 value (dense ties)
            st.integers(min_value=0, max_value=10**6),  # unique-ish id
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[2],
    ),
    st.integers(min_value=2, max_value=6),  # tile count
)
@settings(max_examples=8, deadline=None)
def test_global_ntile_multi_matches_per_axis_window_ntile(spark, rows, tiles):
    """global_ntile_multi computes all axes in the SAME two narrow
    passes; every axis column must still equal its own independent
    NTILE(t) — with a mixed asc/desc axis set exercising the
    negate-to-ascend encoding."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ws_to_kafka_spark.operators.distributed import (
        global_ntile_multi,
        release_persisted,
    )

    df = spark.createDataFrame(
        rows or [(0, 0, 0)], schema="a long, b long, id long"
    )
    if not rows:
        df = df.filter(F.lit(False))
    got = {
        r["id"]: (r["ta"], r["tb"])
        for r in global_ntile_multi(
            df,
            [("a", True, "ta"), ("b", False, "tb")],
            tiles,
            tiebreak="id",
            samples_per_part=2,
        ).collect()
    }
    release_persisted()
    wa = W.orderBy(F.col("a").asc(), F.col("id").asc())
    wb = W.orderBy(F.col("b").desc(), F.col("id").asc())
    want = {
        r["id"]: (r["ta"], r["tb"])
        for r in df.select(
            "id",
            F.ntile(tiles).over(wa).alias("ta"),
            F.ntile(tiles).over(wb).alias("tb"),
        ).collect()
    }
    assert got == want


def test_persist_scope_isolates_interleaved_queries(spark):
    """The ADVICE-flagged misuse: build plan A, build plan B, consume A,
    release A's caches, THEN consume B. With the global
    release_persisted() that stripped B's range-exchange cache before
    its consuming action; persist_scope must release only its own
    frames — B's cache stays persisted and B's ranks stay correct."""
    from pyspark.sql import functions as F

    from ws_to_kafka_spark.operators import distributed
    from ws_to_kafka_spark.operators.distributed import (
        global_row_number,
        persist_scope,
    )

    df = spark.createDataFrame(
        [(i % 7, i) for i in range(200)], schema="v long, id long"
    )

    with persist_scope() as _:
        ranked_a = global_row_number(
            df, [F.col("v").asc(), F.col("id").asc()], "rn"
        )
        # build B INSIDE its own scope that outlives A's
        scope_b = persist_scope()
        scope_b.__enter__()
        try:
            ranked_b = global_row_number(
                df, [F.col("v").desc(), F.col("id").desc()], "rn"
            )
            a_rows = {r["id"]: r["rn"] for r in ranked_a.collect()}
        finally:
            pass
    # A's scope exited -> A's cache released; B's must survive
    try:
        assert not distributed._PERSISTED  # nothing leaked to the global list
        b_rows = {r["id"]: r["rn"] for r in ranked_b.collect()}
    finally:
        scope_b.__exit__(None, None, None)

    # both rankings correct: rn over asc(v,id) and desc(v,id) are mirror
    # images over the same 200 unique ids
    assert sorted(a_rows.values()) == list(range(1, 201))
    assert all(a_rows[i] + b_rows[i] == 201 for i in a_rows)


def test_persist_scope_nested_empty_scopes_exit_by_identity(spark):
    """ADVICE r8: two EMPTY scope lists compare equal, so an
    equality-based _SCOPES.remove() on the inner exit could detach the
    OUTER scope's list — frames tracked afterward would land in the dead
    inner list and the outer exit would raise ValueError. Exit must
    remove by identity."""
    from pyspark.sql import functions as F

    from ws_to_kafka_spark.operators import distributed
    from ws_to_kafka_spark.operators.distributed import (
        global_row_number,
        persist_scope,
    )

    df = spark.createDataFrame(
        [(i, i) for i in range(50)], schema="v long, id long"
    )
    with persist_scope():  # outer, empty at inner-exit time
        with persist_scope():
            pass  # inner exits while BOTH lists are empty and equal
        # outer must still be the live innermost scope
        ranked = global_row_number(df, [F.col("v").asc()], "rn")
        rows = {r["id"]: r["rn"] for r in ranked.collect()}
    # outer exit must not raise, and must have released its own frames
    assert not distributed._SCOPES
    assert not distributed._PERSISTED
    assert sorted(rows.values()) == list(range(1, 51))
