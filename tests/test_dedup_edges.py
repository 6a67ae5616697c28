"""Dedup-family edge pins: the driver fixtures are duplicate-free-ish,
small-vocab synthetic text, so degenerate corpus shapes — documents
shorter than the gram width, exact duplicate pairs, heavy WITHIN-document
repetition, trailing-separator empty tokens — never occur in any gate.
These tests run query AND registered oracle over a constructed corpus
built to hit each of those shapes and require the engines to agree, plus
pin the q_dedup_substring semantics (span merge, within-doc repeats
count) against hand-computed values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ws_to_kafka_spark.operators import QUERIES

# Corpus design (K = 8 tokens for q_dedup_substring):
#  1: 20-token doc, first 10 tokens repeated verbatim in doc 2 -> cross-doc
#     duplicated span of 10 tokens = 3 overlapping 8-grams merging to one
#     island covering positions 1..10 in both docs.
#  2: shares doc 1's 10-token prefix, unique tail.
#  3: a 16-token doc that is one 8-token phrase stated twice -> WITHIN-doc
#     duplication; all 9 grams of the repeated phrase region dup somewhere.
#  4: exactly 7 tokens -> below the gram width, zero grams, zero spans.
#  5: trailing space -> split() yields a final empty token; both engines
#     must tokenize identically.
#  6, 7: byte-identical documents -> exact-dup pair AND full-doc span dup.
_P10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
_PHR = "one two three four five six seven eight"
_DOCS = [
    (1, _P10 + " kilo lima mike november oscar papa quebec romeo sierra tango"),
    (2, _P10 + " uniform victor whiskey xray yankee zulu aa bb cc dd"),
    (3, _PHR + " " + _PHR),
    (4, "just seven little tokens and no more"),
    (5, "trailing separator makes an empty final token here friend "),
    (6, "identical twin document body with enough tokens to gram fully"),
    (7, "identical twin document body with enough tokens to gram fully"),
]
_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_DEDUP_QUERIES = [
    "q_dedup_substring",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_dedup_sentences",
    "q_dedup_fuzzy",
    "q_dedup_url",
]


@pytest.fixture(scope="module")
def dup_sf_dir(spark, tmp_path_factory) -> str:
    rows = [(i, t, "en", "web", len(t)) for (i, t) in _DOCS]
    dst = str(tmp_path_factory.mktemp("sf_dup"))
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    return dst


def _norm(rows) -> list[tuple]:
    out = []
    for r in rows:
        out.append(
            tuple(
                round(x, 6) if isinstance(x, float) and math.isfinite(x) else x
                for x in r
            )
        )
    return sorted(out, key=str)


@pytest.mark.parametrize("qname", _DEDUP_QUERIES)
def test_dedup_query_matches_oracle_on_edge_corpus(spark, dup_sf_dir, qname):
    spec = QUERIES[qname]
    if spec.oracle is None:
        pytest.skip("rows-only query")
    df = spec.fn(spark, dup_sf_dir)
    got = _norm(tuple(r) for r in df.select(sorted(df.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dup_sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = [cols.index(c) for c in sorted(cols)]
    want = _norm(tuple(r[i] for i in order) for r in rows)
    assert got == want, f"{qname} diverges on the dup-edge corpus"


def test_substring_semantics_pinned(spark, dup_sf_dir):
    """Hand-computed expectations for the constructed corpus."""
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["q_dedup_substring"].fn(spark, dup_sf_dir).collect()
    }
    # docs 1 and 2: the shared 10-token prefix -> one merged island of
    # exactly 10 tokens starting at position 1.
    for d in (1, 2):
        assert rows[d]["dup_spans"] == 1, rows[d]
        assert rows[d]["dup_tokens"] == 10, rows[d]
    # doc 3: phrase repeated back-to-back; the only recurring 8-gram is the
    # phrase itself, at positions 1 and 9 -> islands [1,8] and [9,16]: two
    # spans whose union covers the whole doc (interior grams like
    # "two..one" occur once, so the islands don't bridge).
    assert rows[3]["dup_spans"] == 2
    assert rows[3]["dup_tokens"] == rows[3]["n_tokens"] == 16
    # doc 4: shorter than the gram width -> no grams, no spans.
    assert rows[4]["dup_spans"] == 0 and rows[4]["dup_tokens"] == 0
    assert rows[4]["dup_ratio"] == 0.0
    # trailing separator: the empty final token still counts in n_tokens
    # (split semantics, pinned so both engines keep agreeing).
    assert rows[5]["n_tokens"] == 10
    # byte-identical twins: every gram dups -> fully covered docs.
    for d in (6, 7):
        assert rows[d]["dup_tokens"] == rows[d]["n_tokens"]
        assert rows[d]["dup_ratio"] == 1.0


# Containment corpus: an excerpt relation Jaccard can't see. Doc 11 is the
# verbatim 12-token head of doc 10 (containment 11->10 = 1.0, but Jaccard
# ~0.4); doc 12 is unrelated; doc 13 is under the 5-shingle floor and must
# be excluded from BOTH sides even though it is trivially contained.
_HEAD12 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
_CONT_DOCS = [
    (10, _HEAD12 + " mike november oscar papa quebec romeo sierra tango"
         " uniform victor whiskey xray"),
    (11, _HEAD12),
    (12, "wholly different words that overlap with nothing else at all here"),
    (13, "alpha bravo charlie delta"),  # 3 shingles < 5 -> filtered
]


@pytest.fixture(scope="module")
def cont_sf_dir(spark, tmp_path_factory) -> str:
    rows = [(i, t, "en", "web", len(t)) for (i, t) in _CONT_DOCS]
    dst = str(tmp_path_factory.mktemp("sf_cont"))
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    return dst


def test_containment_is_directional_and_floored(spark, cont_sf_dir):
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in QUERIES["q_dedup_containment"].fn(spark, cont_sf_dir).collect()
    }
    # the excerpt is contained in its container, not vice versa, and the
    # sub-floor doc appears on neither side
    assert got == {(11, 10): 1.0}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{cont_sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(QUERIES["q_dedup_containment"].oracle).fetchall()
    }
    assert got == want


def test_containment_survives_high_df_boilerplate(spark, tmp_path_factory):
    """Regression pin for the round-4 ADVICE miss class: an excerpt whose
    ENTIRE shingle set is high-df boilerplate (df > the q_dedup_ngram
    cap of 1000). The formerly-capped prefix index generated ZERO
    candidates for such a doc, silently dropping every (excerpt,
    container) pair the oracle reports. With the cap removed the prefix
    filter's exactness guarantee is unconditional — this corpus (1005
    docs all sharing one boilerplate phrase) would have returned an
    empty result under the capped plan.
    """
    boiler = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [(0, boiler, "en", "web", len(boiler))]  # the pure-boilerplate excerpt
    for i in range(1, 1005):
        t = f"{boiler} tail{i}a tail{i}b tail{i}c"
        rows.append((i, t, "en", "web", len(t)))
    dst = str(tmp_path_factory.mktemp("sf_boiler"))
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in QUERIES["q_dedup_containment"].fn(spark, dst).collect()
    }
    # every boiler shingle has df = 1005 > 1000, yet the excerpt's
    # containment in all 1004 container docs is found
    assert len(got) == 1004
    assert all(a == 0 and c == 1.0 for (a, _b), c in got.items())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dst}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(QUERIES["q_dedup_containment"].oracle).fetchall()
    }
    assert got == want


def test_incremental_dedup_joins_batch_only_against_history(
    spark, tmp_path_factory
):
    """q_dedup_incremental must emit (new, old) pairs ONLY: identical
    batch-side twins (10, 20) never pair with each other, identical
    history twins (3, 7) never pair, and each batch doc pairs with every
    matching history doc. Runs Spark AND the registered oracle."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    other = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    docs = [
        (3, base), (7, base),            # history twins (3%10!=0, 7%10!=0)
        (10, base), (20, base),          # batch twins (both %10==0)
        (11, other),                     # history, unrelated
        (30, other),                     # batch, matches history doc 11
    ]
    dst = str(tmp_path_factory.mktemp("sf_incr"))
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in docs], schema=_SCHEMA
    ).coalesce(1).write.parquet(f"{dst}/documents.parquet")
    got = {
        (r.doc_new, r.doc_old): r.jaccard
        for r in QUERIES["q_dedup_incremental"].fn(spark, dst).collect()
    }
    assert got == {
        (10, 3): 1.0, (10, 7): 1.0,
        (20, 3): 1.0, (20, 7): 1.0,
        (30, 11): 1.0,
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dst}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(QUERIES["q_dedup_incremental"].oracle).fetchall()
    }
    assert got == want


def test_substring_survives_mega_df_gram_skew(spark, tmp_path_factory):
    """Constructed-skew pin (round-5 VERDICT task 6): one boilerplate
    8-gram planted in EVERY document — the mega-df gram whose window
    form funneled every occurrence through one reducer. The aggregate +
    AQE-skew-semi-join form must produce the same answer as the
    registered oracle on exactly this shape (and the hot gh key must
    not change the span accounting: each doc's boilerplate region is
    one merged island)."""
    boiler = "click here to accept all cookies and continue reading"
    docs = [
        (
            i,
            f"unique{i}a unique{i}b unique{i}c {boiler} "
            f"tail{i}x tail{i}y tail{i}z",
        )
        for i in range(400)
    ]
    rows = [(i, t, "en", "web", len(t)) for (i, t) in docs]
    dst = str(tmp_path_factory.mktemp("sf_skew"))
    spark.createDataFrame(rows, schema=_SCHEMA).repartition(8).write.parquet(
        f"{dst}/documents.parquet"
    )
    spec = QUERIES["q_dedup_substring"]
    df = spec.fn(spark, dst)
    got = _norm(tuple(r) for r in df.select(sorted(df.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dst}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    want = _norm(tuple(r[i] for i in order) for r in cur.fetchall())
    assert got == want
    # the 9-token boilerplate yields 2 overlapping 8-grams merging into
    # one island of 9 tokens in every document
    by_id = {r[0]: r for r in got}  # columns sorted: doc_id first
    cols_sorted = sorted(df.columns)
    i_spans = cols_sorted.index("dup_spans")
    i_toks = cols_sorted.index("dup_tokens")
    assert all(r[i_spans] == 1 and r[i_toks] == 9 for r in by_id.values())


# Hot-band corpus for the q_dedup_near occupancy cap: 12 byte-identical
# boilerplate docs (identical MinHash signature -> every one of their 32
# band buckets holds all 12 docs), plus one genuine near-dup pair (30
# tokens, one substitution -> Jaccard 27/31 ~ 0.87) whose buckets hold
# only 2 docs, plus one unrelated doc.
_TEMPLATE = (
    "subscribe to our newsletter terms of service privacy policy all"
    " rights reserved contact us about careers"
)
_LONG_A = (
    "the quick brown fox jumps over the lazy dog while seventeen green"
    " bottles hang quietly on the old stone wall beside a winding river"
    " that flows north"
)
_LONG_B = _LONG_A.rsplit(" ", 1)[0] + " south"
_HOT_DOCS = (
    [(100 + i, _TEMPLATE) for i in range(12)]
    + [(200, _LONG_A), (201, _LONG_B)]
    + [(300, "completely unrelated vocabulary occupying its own band space"
             " with zero shingle overlap anywhere")]
)


@pytest.fixture(scope="module")
def hot_band_sf_dir(spark, tmp_path_factory) -> str:
    rows = [(i, t, "en", "web", len(t)) for (i, t) in _HOT_DOCS]
    dst = str(tmp_path_factory.mktemp("sf_hotband"))
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    return dst


def test_dedup_near_hot_band_cap(spark, hot_band_sf_dir, monkeypatch):
    """The IDENTICAL-text boilerplate clique vs the exact-dup collapse:
    the 12 copies collapse to one representative BEFORE banding, and —
    since round 11 (ADVICE r10 medium) — hot-band occupancy is measured
    on that same rep-filtered frame, so no band bucket is hot on this
    corpus and even a cap far below the clique size drops NOTHING; the
    66 internal pairs come back through the J=1 intra-group expansion.
    (Through round 10 the occupancy came from the FULL banded frame, so
    the lowered cap anti-joined the representative away; this test still
    passed only because the clique pairs returned via the intra-group
    expansion — the real loss, a cross pair to a distinct-digest
    neighbor, is pinned in
    test_dedup_near_hot_band_cap_collapse_cross_pair.  The cap path on
    a collapse-immune corpus is exercised by the DISTINCT-text variant
    below.)"""
    from ws_to_kafka_spark.operators import dedup

    spec = QUERIES["q_dedup_near"]

    # default cap: no bucket exceeds 256 -> oracle agreement holds
    got = {
        (r.doc_a, r.doc_b)
        for r in spec.fn(spark, hot_band_sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hot_band_sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        (a, b)
        for (a, b, _j) in con.execute(spec.oracle).fetchall()
    }
    assert (200, 201) in want  # corpus sanity: the genuine pair qualifies
    assert len(want) == 66 + 1  # 12-clique + the genuine pair
    assert got == want

    # cap below the clique size: the collapse already removed the copy
    # mass from banding, so the oracle agreement SURVIVES the tiny cap
    monkeypatch.setattr(dedup, "_NEAR_BAND_CAP", 8)
    capped = {
        (r.doc_a, r.doc_b)
        for r in spec.fn(spark, hot_band_sf_dir).collect()
    }
    assert capped == want


def test_dedup_near_hot_band_cap_collapse_cross_pair(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10 (medium) regression pin: when the exact-dup collapse
    is active, hot-band occupancy MUST be measured on the rep-filtered
    banded frame.  Corpus: 12 byte-identical copies of the template
    plus ONE distinct-digest near-dup of it (one word substituted,
    J = 14/16 = 0.875).  With the cap below the copy count, the old
    full-frame occupancy marked every template band hot (occ >= 12) and
    anti-joined the representative away — the (copy, near-dup) cross
    pairs vanished while the intra-clique J=1 pairs survived via
    re-expansion, i.e. a silent oracle divergence.  Rep-filtered
    occupancy (2 per shared bucket) keeps every pair."""
    from ws_to_kafka_spark.operators import dedup

    near = _TEMPLATE.rsplit(" ", 1)[0] + " jobs"
    rows = [
        (100 + i, _TEMPLATE, "en", "web", len(_TEMPLATE)) for i in range(12)
    ] + [(400, near, "en", "web", len(near))]
    dst = str(tmp_path / "sf_collapse_cross")
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    spec = QUERIES["q_dedup_near"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dst}/documents.parquet/*.parquet')"
    )
    want = {(a, b) for (a, b, _j) in con.execute(spec.oracle).fetchall()}
    # corpus sanity: 66 intra-clique pairs + 12 cross pairs to the near-dup
    assert len(want) == 66 + 12
    assert (100, 400) in want

    monkeypatch.setattr(dedup, "_NEAR_BAND_CAP", 8)
    got = {(r.doc_a, r.doc_b) for r in spec.fn(spark, dst).collect()}
    assert got == want  # pre-fix: the 12 cross pairs were missing


@pytest.fixture(scope="module")
def hot_band_distinct_sf_dir(spark, tmp_path_factory) -> str:
    """12 DISTINCT near-identical docs (template + unique suffix word):
    distinct digests, so the exact-dup collapse cannot absorb them and
    the hot-band cap is the only quadratic-bucket defense."""
    docs = (
        [(100 + i, f"{_TEMPLATE} variant{i}") for i in range(12)]
        + [(200, _LONG_A), (201, _LONG_B)]
        + [(300, "completely unrelated vocabulary occupying its own band"
                 " space with zero shingle overlap anywhere")]
    )
    rows = [(i, t, "en", "web", len(t)) for (i, t) in docs]
    dst = str(tmp_path_factory.mktemp("sf_hotband_distinct"))
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    return dst


def test_dedup_near_hot_band_cap_distinct_texts(
    spark, hot_band_distinct_sf_dir, monkeypatch
):
    """The cap path on a corpus the collapse CANNOT shrink: 12 distinct
    near-identical docs still share most band buckets.  Default cap:
    exact oracle agreement.  Cap lowered below the cluster size: hot
    buckets appear (band_occupancy_stats must report them), dropped
    candidates only ever REMOVE pairs (subset of the oracle set), and
    the genuine low-occupancy pair (200, 201) always survives."""
    from ws_to_kafka_spark.operators import dedup
    from ws_to_kafka_spark.operators.dedup import band_occupancy_stats

    spec = QUERIES["q_dedup_near"]
    got = {
        (r.doc_a, r.doc_b)
        for r in spec.fn(spark, hot_band_distinct_sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hot_band_distinct_sf_dir}/documents.parquet/"
        "*.parquet')"
    )
    want = {
        (a, b) for (a, b, _j) in con.execute(spec.oracle).fetchall()
    }
    assert (200, 201) in want
    assert len(want) >= 66  # the 12 variants stay mutually near-dup
    assert got == want

    monkeypatch.setattr(dedup, "_NEAR_BAND_CAP", 4)
    stats = band_occupancy_stats(spark, hot_band_distinct_sf_dir).first()
    assert stats.n_hot_buckets > 0  # the cluster's buckets now trip the cap
    capped = {
        (r.doc_a, r.doc_b)
        for r in spec.fn(spark, hot_band_distinct_sf_dir).collect()
    }
    assert capped <= want  # the cap only removes, never invents
    assert (200, 201) in capped  # occupancy-2 buckets are untouched


def test_band_occupancy_stats(spark, hot_band_sf_dir, dup_sf_dir):
    """The band-occupancy diagnostic (VERDICT r7 item 2's 'surface the
    stats' half): on the boilerplate corpus the 12-doc clique makes the
    hottest bucket hold >= 12 docs and join_work reflect the quadratic
    bucket cost; with the cap monkeypatch-free default (256) no bucket
    is hot. On the benign dup-edge corpus max occupancy stays tiny."""
    from ws_to_kafka_spark.operators.dedup import band_occupancy_stats

    hot = band_occupancy_stats(spark, hot_band_sf_dir).first()
    assert hot.max_occ >= 12          # the boilerplate clique's bucket
    assert hot.n_hot_buckets == 0     # but under the 256 default cap
    assert hot.join_work >= 12 * 12   # quadratic bucket cost is visible
    # the exact-dup collapse removes the identical clique from banding:
    # rep-filtered join work drops to near the per-doc floor (round 10)
    assert hot.join_work_rep < hot.join_work / 4

    benign = band_occupancy_stats(spark, dup_sf_dir).first()
    assert benign.max_occ <= 3        # twins only
    assert benign.n_hot_buckets == 0
    assert benign.join_work_rep <= benign.join_work


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_gate_fixtures_have_no_hot_bands(spark, sf_dir):
    """Guard for the _NEAR_BAND_CAP / exact-oracle trade-off (ADVICE r8):
    q_dedup_near's registered oracle is exact Jaccard, so the cap MUST
    drop nothing on the verify-gate fixtures — if a future fixture or
    corpus regeneration crosses the cap, this assertion names the cause
    instead of letting it surface as an opaque row mismatch in verify.
    Also pins that the driver-cached hot list q_dedup_near now consumes
    (`_hot_bands`) is empty here, i.e. the anti-join is skipped on the
    gate path."""
    import os

    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    from ws_to_kafka_spark.operators.dedup import (
        _hot_bands,
        band_occupancy_stats,
    )

    stats = band_occupancy_stats(spark, sf_dir).first()
    assert stats.n_hot_buckets == 0, (
        f"{sf_dir}: {stats.n_hot_buckets} LSH band buckets exceed "
        "_NEAR_BAND_CAP — q_dedup_near's exact-Jaccard oracle would "
        "diverge via the hot-band cap (see dedup.py q_dedup_near "
        "docstring for the trade-off)."
    )
    assert _hot_bands(spark, sf_dir) == []


def test_dedup_near_all_identical_corpus(spark, tmp_path):
    """Degenerate collapse input: FIVE byte-identical docs (one digest
    group, banding sees a single representative) plus one unrelated
    doc.  Output must be exactly the 10 intra-group J=1.0 pairs —
    checked against the registered oracle, which reaches the same set
    through all-pairs shared-shingle Jaccard."""
    text = "the same boilerplate paragraph repeated verbatim in every copy"
    rows = [(i, text, "en", "web", len(text)) for i in range(5)] + [
        (9, "entirely different vocabulary with no overlap at all here",
         "en", "web", 57)
    ]
    dst = str(tmp_path / "sf_allsame")
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    spec = QUERIES["q_dedup_near"]
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in spec.fn(spark, dst).collect()
    }
    expected_pairs = {
        (a, b) for a in range(5) for b in range(5) if a < b
    }
    assert set(got) == expected_pairs
    assert all(j == 1.0 for j in got.values())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dst}/documents.parquet/*.parquet')"
    )
    want = {
        (a, b): j for (a, b, j) in con.execute(spec.oracle).fetchall()
    }
    assert got == want


def test_dedup_near_empty_shingle_twins_not_emitted(spark, tmp_path):
    """Two identical docs whose text yields ZERO shingles (a 2-word
    text has no word-trigram shingles): identical digests, but the
    oracle requires a SHARED SHINGLE, so the pair must NOT appear —
    the intra-group expansion gates on the representative having
    shingles (the ANSI/empty-group discipline: both engines agree by
    construction, not by luck)."""
    rows = [
        (0, "too short", "en", "web", 9),
        (1, "too short", "en", "web", 9),
        (2, "a genuinely long sentence with plenty of words to shingle on",
         "en", "web", 61),
    ]
    dst = str(tmp_path / "sf_emptytwins")
    spark.createDataFrame(rows, schema=_SCHEMA).coalesce(1).write.parquet(
        f"{dst}/documents.parquet"
    )
    spec = QUERIES["q_dedup_near"]
    got = {(r.doc_a, r.doc_b) for r in spec.fn(spark, dst).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dst}/documents.parquet/*.parquet')"
    )
    want = {(a, b) for (a, b, _j) in con.execute(spec.oracle).fetchall()}
    assert got == want
