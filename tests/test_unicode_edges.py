"""Unicode edge pins for the text family: the driver fixtures are pure
ASCII, so a byte-length/char-length divergence between a Spark query and
its DuckDB oracle would pass every gate until real multilingual data hits
it (exactly the class /code-review caught in q_fn_array_hof's first
oracle). These tests run query AND registered oracle over constructed
documents containing multi-byte UTF-8 (accents, CJK, emoji) and require
them to agree.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ws_to_kafka_spark.operators import QUERIES

_DOCS = [
    (1, "café au lait s'il vous plaît", "fr", "web", None),
    (2, "naïve façade jalapeño über straße", "de", "web", None),
    (3, "数据 处理 引擎 的 测试 文本", "zh", "web", None),
    (4, "mixed ascii and café 数据 🚀 tokens here", "en", "web", None),
    (5, "plain ascii control text for comparison", "en", "web", None),
    # decomposed accents (e + COMBINING ACUTE): NFC must compose them
    (6, "cafe\u0301 de\u0301ja\u0300 vu de nouveau ici", "fr", "web", None),
    # control chars and space runs for the normalization pass
    (7, "tab\there and\x01  double  spaces \x1f end", "en", "web", None),
]
_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# text-family queries whose inputs are documents only and whose outputs
# depend on character handling
_TEXT_QUERIES = [
    "q_text_stats",
    "q_text_quality",
    "q_text_tokens",
    "q_fn_array",
    "q_fn_array_hof",
    "q_text_langid",
    "q_text_entropy",
    "q_text_split",
    "q_text_pii",
    "q_text_repetition",
    "q_text_fingerprint",
    # vowel-run/sentence regexes must count CHARS the same way on
    # multi-byte text (a é or CJK char is one non-vowel, not 2-3 bytes)
    "q_text_readability",
    # the UDTF computes len() in PYTHON (chars) — must agree with the
    # oracle's LENGTH (chars) on multi-byte text, not byte counts
    "q_udtf_chunks",
    # two independent Unicode implementations (Python unicodedata vs
    # DuckDB utf8proc) must produce the same NFC composition
    "q_text_normalize",
    "q_text_polarity",
    # '(.)' symbol-splitting: one code point per symbol on both engines
    # (JVM regex code-point '.', RE2 UTF-8 '.') — not bytes, not UTF-16
    # units, or the CJK/emoji docs diverge
    "q_bpe_merges",
    # the apply half additionally rides length(word) (CHARs on both
    # engines, never bytes — n_chars and chars_per_token flip otherwise)
    # and per-(lang, word) counts over the same symbol splitting
    "q_bpe_apply",
    # char-class/word-boundary regex counts and length() must both be
    # CHARacter-based so symbol_density agrees on multi-byte text, and
    # the integer-compare verdict (n_symbols*50 >= n_chars) can't flip
    "q_text_code_detect",
]


def test_bpe_merge_semantics_on_repeat_corpus(spark, tmp_path_factory):
    """Hand-computed BPE pins on symbol-overlapping repeats — the case the
    two-pass replace must get right: 'aaaa' under merge (a,a) becomes
    'aa aa' (both disjoint occurrences merged, the shared-sentinel miss
    repaired by the second pass) and never 'aaa a'-style. Pair counts are
    per-occurrence (overlapping), frequencies weight word TYPES. Runs the
    Spark query, the hand expectation, AND the registered oracle."""
    docs = [(1, "aaaa aaaa ab"), (2, "ab ab cd")]
    dst = str(tmp_path_factory.mktemp("sf_bpe"))
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in docs],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{dst}/documents.parquet")
    got = [
        (r.step, r.sym_a, r.sym_b, r.merged, r.pair_count)
        for r in QUERIES["q_bpe_merges"].fn(spark, dst).orderBy("step").collect()
    ]
    # step1: (a,a) counted 3x per 'aaaa' x freq 2 = 6, beats (a,b)=3
    # step2: 'aaaa' is now 'aa aa'; (a,b)=3 beats (aa,aa)=2
    # step3: (aa,aa)=2 beats (c,d)=1
    assert got == [
        (1, "a", "a", "aa", 6),
        (2, "a", "b", "ab", 3),
        (3, "aa", "aa", "aaaa", 2),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dst}/documents.parquet/*.parquet')"
    )
    want = sorted(con.execute(QUERIES["q_bpe_merges"].oracle).fetchall())
    assert sorted(got) == want


@pytest.fixture(scope="module")
def uni_sf_dir(spark, tmp_path_factory) -> str:
    rows = [
        (i, t, lang, src, len(t)) for (i, t, lang, src, _) in _DOCS
    ]
    dst = str(tmp_path_factory.mktemp("sf_uni"))
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


@pytest.mark.parametrize("qname", _TEXT_QUERIES)
def test_text_query_matches_oracle_on_unicode(spark, uni_sf_dir, qname):
    spec = QUERIES[qname]
    if spec.oracle is None:
        pytest.skip("rows-only query")
    df = spec.fn(spark, uni_sf_dir)
    got = _norm(tuple(r) for r in df.select(sorted(df.columns)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{uni_sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = [cols.index(c) for c in sorted(cols)]
    want = _norm(tuple(r[i] for i in order) for r in rows)
    assert got == want, f"{qname} diverges on unicode input"
