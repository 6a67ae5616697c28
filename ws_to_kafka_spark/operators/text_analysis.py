"""Text analysis for LLM training-data pipelines over ``documents``.

The reference never inspects payload bytes (``/root/reference/src/
wsclient.hpp:59`` forwards frames verbatim); this is the driver-mandated
text surface (SURVEY.md §2.3 "text analysis"): corpus stats, language-ID,
quality scoring, token counting and document fingerprinting.

Everything is JVM-side built-ins / higher-order functions — zero Python in
the hot path, so each query is a single codegen'd scan plus one small-key
aggregation. At 100 TB each of these is scan-bound and embarrassingly
parallel; the only shuffles are on low-cardinality group keys (lang,
source) with map-side partial aggregation.

Portability notes for the DuckDB oracles: token regexes avoid
engine-specific character classes; fingerprints use md5 (hex string — both
engines agree) rather than engine-private hashes; all doubles rounded.
"""

from __future__ import annotations

# module-level so pandas_udf type hints (PEP 563 strings under this
# future import) resolve against module globals
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .. import tables
from .registry import register

# Stopword profiles for the language-ID heuristic. Deterministic word-list
# scoring (the classic n-gram/stopword profile method collapsed to unigrams);
# ties resolve by profile order = alphabetical language code.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}

# BPE-ish tokenizer: word pieces of letters, digit runs, or single symbols.
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


@register(
    "q_text_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*)                                             AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)                         AS total_chars,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 4)               AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)    AS total_words,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_words,
           CAST(MIN(n_chars) AS BIGINT)                         AS min_chars,
           CAST(MAX(n_chars) AS BIGINT)                         AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per (lang, source): doc/char/word counts.

    Scale: one scan, one shuffle on a ~100-key group — partial aggregation
    collapses everything map-side.
    """
    docs = tables.load(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars", F.size(F.split("text", " ")).alias("nw")
    )
    n_words = F.col("nw")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
            F.sum(n_words.cast("long")).alias("total_words"),
            F.round(F.avg(n_words.cast("double")), 4).alias("avg_words"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def _lang_score_spark(words, profile: tuple[str, ...]):
    return F.size(F.filter(words, lambda w: w.isin(*profile)))


def _lang_score_sql(profile: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in profile)
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({in_list})))"


def _langid_case_sql() -> str:
    """CASE picking the first profile (alphabetical) with the max score."""
    scores = {code: _lang_score_sql(p) for code, p in sorted(_LANG_PROFILES.items())}
    greatest = "GREATEST(" + ", ".join(scores.values()) + ")"
    whens = "\n           ".join(
        f"WHEN {expr} = {greatest} THEN '{code}'" for code, expr in scores.items()
    )
    return f"CASE {whens} END"


@register(
    "q_text_langid",
    oracle=f"""
    SELECT doc_id,
           lang AS labeled_lang,
           {_langid_case_sql()} AS predicted_lang,
           CAST({_lang_score_sql(_LANG_PROFILES["en"])} AS BIGINT) AS en_score
    FROM documents
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: unigram stopword-profile scoring, argmax with
    alphabetical tiebreak. The mechanics of n-gram language-ID, expressed as
    pure JVM higher-order functions (one scan, no shuffle)."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("w")
    )
    words = F.col("w")  # materialized once; scores only re-scan the array
    scores = {
        code: _lang_score_spark(words, p) for code, p in sorted(_LANG_PROFILES.items())
    }
    best = F.greatest(*scores.values())
    expr = None
    for code, score in scores.items():  # alphabetical: first max wins
        expr = (
            F.when(score == best, F.lit(code))
            if expr is None
            else expr.when(score == best, F.lit(code))
        )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        expr.alias("predicted_lang"),
        scores["en"].cast("long").alias("en_score"),
    )


@register(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           len(string_split(text, ' ')) AS n_words,
           ROUND(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 4)
               AS avg_word_len,
           ROUND(len(list_filter(string_split(text, ' '),
                                 w -> w IN {_STOPWORDS!r})) * 1.0
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')), 4) AS unique_ratio,
           (n_chars BETWEEN 50 AND 5000
            AND len(string_split(text, ' ')) >= 10
            AND len(list_distinct(string_split(text, ' '))) * 1.0
                / len(string_split(text, ' ')) > 0.2) AS passes_filter
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, mean word length, stopword ratio, lexical
    diversity, and a composite keep/drop gate — the standard pre-training
    corpus filter (C4/Gopher-style rules), one codegen'd scan."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.split("text", " ").alias("w")
    )
    words = F.col("w")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    n_uniq = F.size(F.array_distinct(words))
    uniq_ratio = n_uniq * F.lit(1.0) / n_words
    return docs.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(F.col("n_chars").cast("double") / n_words, 4).alias("avg_word_len"),
        F.round(n_stop * F.lit(1.0) / n_words, 4).alias("stopword_ratio"),
        F.round(uniq_ratio, 4).alias("unique_ratio"),
        (
            F.col("n_chars").between(50, 5000)
            & (n_words >= 10)
            & (uniq_ratio > 0.2)
        ).alias("passes_filter"),
    )


@register(
    "q_text_tokens",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' '))                 AS ws_tokens,
           len(regexp_extract_all(text, '{_TOKEN_RE}')) AS bpe_tokens,
           ROUND(len(regexp_extract_all(text, '{_TOKEN_RE}')) * 1.0
                 / len(string_split(text, ' ')), 4)     AS tokens_per_word
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens vs a BPE-ish regex tokenizer
    (letter runs / digit runs / single symbols) — the token-budget
    accounting every training-data pipeline runs. Pure regexp built-ins."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("nw"),
        # idx=0 (whole match): Spark's default idx is group 1, but the token
        # pattern has no capture groups (DuckDB's default is already group 0).
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0)).alias("nb"),
    )
    ws_tokens = F.col("nw")
    bpe_tokens = F.col("nb")
    return docs.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_tokens.cast("long").alias("bpe_tokens"),
        F.round(bpe_tokens * F.lit(1.0) / ws_tokens, 4).alias("tokens_per_word"),
    )


@register(
    "q_text_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(text), 1, 1) IN ('0')      THEN 'val'
                WHEN substr(md5(text), 1, 1) IN ('1', '2') THEN 'test'
                ELSE 'train' END AS split,
           substr(md5(text), 1, 2) AS bucket
    FROM documents
    """,
)
def q_text_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by CONTENT hash — the reproducible
    held-out-split op every training pipeline needs: membership depends
    only on the text (stable across reshuffles/re-crawls, and exact dups
    always co-locate in one split, preventing trivial leakage).
    val ≈ 1/16, test ≈ 2/16 via the first hex digit of md5."""
    docs = tables.load(spark, sf_dir, "documents")
    first = F.substring(F.md5("text"), 1, 1)
    return docs.select(
        "doc_id",
        F.when(first.isin("0"), "val")
        .when(first.isin("1", "2"), "test")
        .otherwise("train")
        .alias("split"),
        F.substring(F.md5("text"), 1, 2).alias("bucket"),
    )


@register(
    "q_text_contamination",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN substr(md5(text), 1, 1) = '0' THEN 'eval' ELSE 'train' END AS split,
             [array_to_string(w.words[i:i+2], ' ')
              for i in range(1, len(w.words)-1)] AS shingles
      FROM (SELECT doc_id, md5(text) AS h, text, string_split(text, ' ') AS words
            FROM documents) w
    ), fp AS (
      SELECT doc_id, split,
             list_min(list_transform(shingles, s -> md5(s))) AS fingerprint
      FROM sh WHERE len(shingles) > 0
    )
    SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc
    FROM (SELECT * FROM fp WHERE split = 'eval') e
    JOIN (SELECT * FROM fp WHERE split = 'train') t
      ON e.fingerprint = t.fingerprint
    """,
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination check: eval documents whose winnowing
    fingerprint (min-md5 shingle, see q_text_fingerprint) collides with a
    train document — the decontamination sweep run before every eval.

    Scale: the join key is the fingerprint (uniform hash — no skew), each
    side is one row per doc; a full n-gram-overlap sweep would use the
    prefix-filtered index from q_dedup_ngram instead.
    """
    from .dedup import _shingled_docs

    docs = tables.load(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5("text"), 1, 1) == "0", "eval"
    ).otherwise("train")
    tagged = docs.select("doc_id", split.alias("split"))
    # shingles from the shared persisted index (see dedup._shingled_docs);
    # one grouped pass per fingerprint instead of a two-branch self-join —
    # a branch per split would recompute the fingerprint table twice.
    sh = _shingled_docs(spark, sf_dir).join(tagged, "doc_id")
    fp = sh.filter(F.col("n_sh") > 0).select(
        "doc_id",
        "split",
        F.array_min(F.transform(F.col("shingles"), lambda s: F.md5(s))).alias(
            "fingerprint"
        ),
    )
    buckets = (
        fp.groupBy("fingerprint")
        .agg(
            F.collect_list(
                F.when(F.col("split") == "eval", F.col("doc_id"))
            ).alias("evals"),
            F.collect_list(
                F.when(F.col("split") == "train", F.col("doc_id"))
            ).alias("trains"),
        )
        .filter((F.size("evals") > 0) & (F.size("trains") > 0))
    )
    return buckets.select(
        F.explode("evals").alias("eval_doc"), "trains"
    ).select("eval_doc", F.explode("trains").alias("train_doc"))


@register(
    "q_text_fingerprint",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             [array_to_string(w.words[i:i+2], ' ')
              for i in range(1, len(w.words)-1)] AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
    )
    SELECT doc_id,
           CASE WHEN len(shingles) = 0 THEN NULL
                ELSE list_min(list_transform(shingles, s -> md5(s))) END
               AS fingerprint,
           len(list_distinct(shingles)) AS n_shingles
    FROM sh
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-hash-of-shingles winnowing with a
    portable hash (md5 hex). Two docs sharing their rarest shingle collide —
    the 1-permutation MinHash used for cheap pre-clustering. JVM-side only.
    """
    from .dedup import _with_shingles

    docs = tables.load(spark, sf_dir, "documents")
    # Tokenize/shingle via materialized columns (see dedup._shingles_of_words:
    # inline split expressions re-tokenize per element reference).
    sh = _with_shingles(docs)
    return sh.select(
        "doc_id",
        F.array_min(
            F.transform(F.col("shingles"), lambda s: F.md5(s))
        ).alias("fingerprint"),
        F.size(F.array_distinct("shingles")).cast("long").alias("n_shingles"),
    )


# PII patterns shared verbatim by the Spark plan and the oracle SQL (kept
# RE2-compatible: no lookaround, so Java regex and RE2 agree).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{2,4}"
_PII_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

_PII_AUG_SQL = """
    text || ' contact user' || doc_id || '@mail.example.com or call +1-202-555-0'
         || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
         || ' ip 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
"""


@register(
    "q_text_pii",
    oracle=rf"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g') AS clean,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT)    AS n_ip
    FROM aug
    """,
)
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the scrubbing pass every training corpus runs:
    emails, phone numbers, and IP addresses replaced by typed placeholder
    tokens, with per-doc match counts for audit.

    PII is planted deterministically from fixture columns (same derive-not-
    synthesize pattern as q_fn_url), so the oracle can mirror both the
    augmentation and the redaction and any regex-semantics drift between
    engines shows as a value mismatch.  Redaction order (email → phone →
    ip) is part of the contract: counts are taken on the PRE-redaction
    text.  Scale: three regexp_replace passes inside codegen, no shuffle at
    all — this op is scan-bound at any corpus size."""
    docs = tables.load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@mail.example.com or call +1-202-555-0"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        clean.alias("clean"),
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).cast("long").alias("n_phone"),
        F.regexp_count(aug, F.lit(_PII_IP)).cast("long").alias("n_ip"),
    )


@register(
    "q_text_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), tok AS (
      SELECT doc_id, unnest(words) AS t FROM w
    ), tc AS (
      SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), pd AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(MAX(c) AS BIGINT) AS top_cnt
      FROM tc GROUP BY 1
    ), bg AS (
      SELECT doc_id,
             unnest([array_to_string(words[i:i+1], ' ')
                     for i in range(1, len(words))]) AS b
      FROM w WHERE len(words) > 1
    ), bgc AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2
    ), bpd AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bg,
             CAST(COUNT(*) AS BIGINT) AS n_bg_distinct
      FROM bgc GROUP BY 1
    )
    SELECT pd.doc_id AS doc_id,
           pd.n_tokens AS n_tokens,
           ROUND(pd.top_cnt * 1.0 / pd.n_tokens, 6) AS top_tok_frac,
           CASE WHEN bpd.n_bg IS NULL OR bpd.n_bg = 0 THEN 0.0
                ELSE ROUND((bpd.n_bg - bpd.n_bg_distinct) * 1.0 / bpd.n_bg, 6)
           END AS dup_bigram_frac,
           (ROUND(pd.top_cnt * 1.0 / pd.n_tokens, 6) > 0.2
            OR CASE WHEN bpd.n_bg IS NULL OR bpd.n_bg = 0 THEN 0.0
                    ELSE ROUND((bpd.n_bg - bpd.n_bg_distinct) * 1.0 / bpd.n_bg, 6)
               END > 0.5) AS flagged
    FROM pd LEFT JOIN bpd ON pd.doc_id = bpd.doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher/MassiveText repetition
    rules): fraction of tokens that are the single most frequent token, and
    fraction of duplicated bigrams; docs over either threshold are flagged.

    Scale: explode + two grouped aggs (map-side combine on (doc_id, token))
    instead of per-row higher-order folds — the module's documented fast
    path (inline HOF aggregation runs interpreted).  The flag thresholds
    compare ROUNDED fractions so the boolean cannot flip on a last-ulp
    division difference between engines."""
    docs = tables.load(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("words"))
    tok = w.select("doc_id", F.explode("words").alias("t"))
    pd_ = (
        tok.groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("top_cnt"))
    )
    bigrams = F.expr(
        "filter(zip_with(words, slice(words, 2, greatest(size(words) - 1, 0)),"
        " (a, b) -> CASE WHEN b IS NULL THEN NULL ELSE concat(a, ' ', b) END),"
        " x -> x IS NOT NULL)"
    )
    bg = w.select("doc_id", F.explode_outer(bigrams).alias("b")).filter(
        F.col("b").isNotNull()
    )
    bpd = (
        bg.groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bg"), F.count("*").alias("n_bg_distinct"))
    )
    top_frac = F.round(F.col("top_cnt").cast("double") / F.col("n_tokens"), 6)
    dup_frac = F.when(
        F.col("n_bg").isNull() | (F.col("n_bg") == 0), F.lit(0.0)
    ).otherwise(
        F.round(
            (F.col("n_bg") - F.col("n_bg_distinct")).cast("double") / F.col("n_bg"),
            6,
        )
    )
    return (
        pd_.join(bpd, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            top_frac.alias("top_tok_frac"),
            dup_frac.alias("dup_bigram_frac"),
            ((top_frac > 0.2) | (dup_frac > 0.5)).alias("flagged"),
        )
    )


@register(
    "q_text_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), tc AS (
      SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), pd AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             SUM(c * ln(c)) AS sum_clnc
      FROM tc GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_distinct,
           ROUND(ln(n_tokens) - sum_clnc / n_tokens, 6) AS entropy,
           CASE WHEN n_distinct = 1 THEN 0.0
                ELSE ROUND((ln(n_tokens) - sum_clnc / n_tokens)
                           / ln(n_distinct), 6)
           END AS norm_entropy
    FROM pd
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document (plus the
    [0,1]-normalized form): the information-density quality signal —
    machine-generated boilerplate scores low, natural prose high; used
    alongside q_text_repetition in filter cascades.

    Uses the algebraic identity H = ln(N) − Σc·ln(c)/N so the per-group
    work is ONE pass of mergeable sums (no second join against the total) —
    the same partial-agg shape as a plain count.  Division/ln happen once
    per doc on the agg output, rounded 6dp on both engines."""
    docs = tables.load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    pd_ = (
        tok.groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("sum_clnc"),
        )
    )
    entropy = F.log(F.col("n_tokens")) - F.col("sum_clnc") / F.col("n_tokens")
    return pd_.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(entropy, 6).alias("entropy"),
        F.when(F.col("n_distinct") == 1, F.lit(0.0))
        .otherwise(F.round(entropy / F.log(F.col("n_distinct")), 6))
        .alias("norm_entropy"),
    )


@register(
    "q_text_perplexity",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), dbg AS (
      SELECT doc_id, words[i] AS w1, words[i + 1] AS w2, COUNT(*) AS k
      FROM d CROSS JOIN LATERAL (
        SELECT UNNEST(generate_series(1, len(words) - 1)) AS i
      )
      GROUP BY doc_id, w1, w2
    ), c2 AS (
      SELECT w1, w2, SUM(k) AS n_pair FROM dbg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(n_pair) AS n_ctx FROM c2 GROUP BY w1
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           ROUND(SUM(k * -LN(n_pair / CAST(n_ctx AS DOUBLE))) / SUM(k), 4)
               AS avg_nll
    FROM dbg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY doc_id
    """,
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality score (CCNet's filter signal): per-doc
    average negative log-likelihood under the corpus's own bigram LM,
    P(w2|w1) = c(w1,w2)/c(w1·). Docs whose word transitions are unusual
    for the corpus score high — the standard statistical-quality filter
    run between heuristic rules and dedup.

    Self-trained model => every doc bigram has count >= 1: no smoothing
    constant to disagree about. Scale: tokenize once, per-doc bigram
    counts (map-side combine collapses repeats BEFORE the model join),
    model = two small-key aggs over the grouped frame; the scoring join
    shuffles on (w1, w2) — the model frame is vocabulary-sized, not
    corpus-sized. The NLL sum is rounded after the division on both
    engines.
    """
    docs = tables.load(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("words"))
    dbg = (
        d.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("words", 1, F.size("words") - 1),
                    F.slice("words", 2, F.size("words") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("k"))
    )
    c2 = dbg.groupBy("w1", "w2").agg(F.sum("k").alias("n_pair"))
    c1 = c2.groupBy("w1").agg(F.sum("n_pair").alias("n_ctx"))
    nll = F.col("k") * -F.log(F.col("n_pair") / F.col("n_ctx"))
    return (
        dbg.join(c2, ["w1", "w2"]).join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(F.sum(nll) / F.sum("k"), 4).alias("avg_nll"),
        )
    )


# Fixed classifier weights for q_score_logistic: (intercept, n_words/100,
# avg_word_len, stopword_ratio, unique_ratio). Stand-ins for a trained
# quality model's coefficients — fixed constants are part of the scoring
# contract, exactly like the PSI bucket edges.
_LOGIT_W = (-2.0, 0.8, 0.15, 3.0, 2.5)


@register(
    "q_score_logistic",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             len(string_split(text, ' ')) * 1.0               AS n_words,
             len(replace(text, ' ', '')) * 1.0
               / len(string_split(text, ' '))                 AS awl,
             len(list_filter(string_split(text, ' '),
                             w -> w IN {_STOPWORDS!r})) * 1.0
               / len(string_split(text, ' '))                 AS stop_ratio,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' '))                 AS uniq_ratio
      FROM documents
    ), scored AS (
      SELECT doc_id,
             {_LOGIT_W[0]} + {_LOGIT_W[1]} * (n_words / 100)
               + {_LOGIT_W[2]} * awl + {_LOGIT_W[3]} * stop_ratio
               + {_LOGIT_W[4]} * uniq_ratio                   AS z
      FROM feat
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
           ROUND(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
    FROM scored
    """,
)
def q_score_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier scoring at scale: a logistic model with FIXED
    published-style coefficients over cheap text features (length, mean
    word length, stopword ratio, lexical diversity) -> sigmoid score ->
    keep/drop — the fastText-quality-filter stage of a pre-training
    pipeline, reduced to pure columnar math.

    The weights are constants by design (a deployed filter's coefficients
    are frozen artifacts); scoring is therefore one codegen'd scan with no
    shuffle, no UDF, no model runtime — the shape that lets a 100 TB
    corpus be scored as a side effect of its first read.  The keep
    decision compares the ROUNDED score on both engines so a last-ulp
    exp() difference cannot flip a document at the boundary."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("w")
    )
    n_words = F.size("w") * F.lit(1.0)
    awl = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) * F.lit(1.0)
        / F.size("w")
    )
    stop_ratio = (
        F.size(F.filter(F.col("w"), lambda t: t.isin(*_STOPWORDS)))
        * F.lit(1.0)
        / F.size("w")
    )
    uniq_ratio = F.size(F.array_distinct("w")) * F.lit(1.0) / F.size("w")
    z = (
        F.lit(_LOGIT_W[0])
        + F.lit(_LOGIT_W[1]) * (n_words / 100)
        + F.lit(_LOGIT_W[2]) * awl
        + F.lit(_LOGIT_W[3]) * stop_ratio
        + F.lit(_LOGIT_W[4]) * uniq_ratio
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


@register(
    "q_text_normalize",
    oracle=r"""
    WITH c AS (
      SELECT doc_id, text,
             TRIM(REGEXP_REPLACE(REGEXP_REPLACE(nfc_normalize(text),
                  '[\x00-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g')) AS cleaned
      FROM documents
    )
    SELECT doc_id, cleaned,
           (cleaned != text) AS changed,
           CAST(LENGTH(text) - LENGTH(cleaned) AS BIGINT) AS char_delta
    FROM c
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization — the stage every corpus pipeline runs FIRST,
    so downstream hashes/shingles/tokens see one canonical byte form:
    Unicode NFC (composed accents; 'e'+COMBINING ACUTE and U+00E9 must
    dedup as the same document), control characters to spaces, space
    runs collapsed, ends trimmed. Reports the cleaned text, a changed
    flag, and the character delta.

    NFC is the ONLY step that needs Python (Spark has no normalization
    built-in): an Arrow-batched pandas UDF over ``unicodedata`` —
    vectorized transfer, per-string normalize, no JVM round-trips per
    row. Control-strip and whitespace-collapse stay JVM-side
    (``regexp_replace`` in whole-stage codegen) so the slow path is
    exactly one column transform. The DuckDB oracle uses utf8proc's
    ``nfc_normalize`` — two independent Unicode implementations
    agreeing is the point of the check (pinned on decomposed input in
    the unicode edge corpus; ASCII fixtures normalize to themselves).

    Scale: map-only, no shuffle — normalization cost is bounded by the
    Python workers exactly like q_udf_scalar, and at 100 TB this is the
    scan you fuse the cheap JVM filters into rather than running alone.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    docs = tables.load(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(nfc(F.col("text")), "[\\x00-\\x1F\\x7F]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        (cleaned != F.col("text")).alias("changed"),
        (F.length("text") - F.length(cleaned)).cast("long").alias("char_delta"),
    )


_POLAR_POS = ("fast", "small")
_POLAR_NEG = ("slow", "big", "dup")


@register(
    "q_text_polarity",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(len(list_filter(words, x -> x IN {_POLAR_POS!r}))
               AS BIGINT) AS n_pos,
             CAST(len(list_filter(words, x -> x IN {_POLAR_NEG!r}))
               AS BIGINT) AS n_neg,
             CAST(len(words) AS BIGINT) AS n_words
      FROM w
    )
    SELECT doc_id, n_pos, n_neg,
           FLOOR((n_pos - n_neg) * 1.0 / NULLIF(n_words, 0)
                 * 1000000 + 0.5) / 1000000 AS polarity,
           CASE WHEN n_pos > n_neg THEN 'positive'
                WHEN n_neg > n_pos THEN 'negative'
                ELSE 'neutral' END AS label
    FROM c
    """,
)
def q_text_polarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based polarity scoring (the distributed sentiment-analysis
    shape of EDBT'16 Twitter-scale studies): per-document counts of
    positive/negative lexicon hits, a length-normalized polarity score,
    and a three-way label. The fixtures' vocabulary carries a real
    performance polarity (fast/small vs slow/big/dup); production swaps
    the two tuples for a full sentiment lexicon — the dataflow (token
    membership against a broadcast-small dictionary) is identical, and
    at real lexicon sizes the IN-list becomes a broadcast join against
    a lexicon table instead of a literal.

    Scale: map-only single scan — tokenize once, two codegen'd
    ``filter`` HOFs over the words array (bounded lexicon, no shuffle),
    everything fused into the parquet scan's stage. The division is
    NULLIF-guarded (ANSI) and tie-free-rounded: counts-over-counts
    ratios DO land exactly on rounding boundaries (a 128-word doc with
    an odd hit delta is a .5 case at 6dp).
    """
    docs = tables.load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    d = docs.select(
        "doc_id",
        words.alias("w"),
        F.size(words).cast("long").alias("n_words"),
    ).select(
        "doc_id",
        F.size(F.filter(F.col("w"), lambda x: x.isin(*_POLAR_POS)))
        .cast("long")
        .alias("n_pos"),
        F.size(F.filter(F.col("w"), lambda x: x.isin(*_POLAR_NEG)))
        .cast("long")
        .alias("n_neg"),
        "n_words",
    )
    polarity = (
        F.floor(
            (F.col("n_pos") - F.col("n_neg"))
            * 1.0
            / F.nullif(F.col("n_words"), F.lit(0))
            * 1000000
            + 0.5
        )
        / 1000000
    )
    label = (
        F.when(F.col("n_pos") > F.col("n_neg"), F.lit("positive"))
        .when(F.col("n_neg") > F.col("n_pos"), F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )
    return d.select(
        "doc_id", "n_pos", "n_neg", polarity.alias("polarity"), label.alias("label")
    )


@register(
    "q_text_readability",
    oracle="""
    WITH d AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS BIGINT) AS n_words,
        CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
             AS BIGINT) AS n_sentences,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
      FLOOR((206.835
             - (1.015 * (CAST(n_words AS DOUBLE)
                         / CAST(n_sentences AS DOUBLE)))
             - (84.6 * (CAST(n_syllables AS DOUBLE)
                        / CAST(NULLIF(n_words, 0) AS DOUBLE))))
            * 10000 + 0.5) / 10000 AS flesch
    FROM d
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a deterministic
    vowel-group syllable proxy (each maximal [aeiouy]+ run counts one
    syllable — the standard dictionary-free approximation) — the
    readability feature of corpus quality scoring (Flesch 1948;
    Kincaid et al. 1975 for the grade-level variant).

    Cross-engine floats: all three inputs are exact integer counts from
    regex/split (no float accumulation anywhere); the score is a fixed
    tree of binary IEEE ops written with identical association on both
    engines, and the display round is the tie-safe floor-scale form.
    Punctuation-free docs clamp sentences to 1; empty docs nullif to a
    NULL score instead of an ANSI divide error.

    Scale: map-only — three codegen'd regex/array expressions per row,
    no shuffle at all; the score column is a free side-output of
    whatever scan the pipeline is already doing.
    """
    docs = tables.load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        )
        .cast("long")
        .alias("n_words"),
        F.greatest(
            F.regexp_count("text", F.lit("[.!?]+")), F.lit(1)
        )
        .cast("long")
        .alias("n_sentences"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - (
            F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        )
        - (
            F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.nullif(F.col("n_words"), F.lit(0)).cast("double")
            )
        )
    )
    return d.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.floor(flesch * 10000 + F.lit(0.5)) / 10000).alias("flesch"),
    )


_BPE_STEPS = 3  # unrolled merge rounds (DuckDB oracle chains the same 3)


def _bpe_chain_sql() -> str:
    """Unrolled BPE merge chain (the _pagerank_oracle mechanical-unroll
    pattern), shared by the q_bpe_merges and q_bpe_apply oracles. Each
    step: count adjacent symbol pairs over the word-TYPE table, pick
    the global top pair (count desc, then pair text), apply the merge
    with two literal replace() passes (see q_bpe_merges for why two
    passes == greedy left-to-right). The word column rides along so
    the final w{_BPE_STEPS} maps word → merged symbol string."""
    steps = []
    for i in range(1, _BPE_STEPS + 1):
        steps.append(f"""p{i} AS (
      SELECT s[r.i] AS a, s[r.i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT string_split(trim(ws), ' ') AS s, freq FROM w{i - 1}) t,
           UNNEST(range(1, len(s))) AS r(i)
      GROUP BY 1, 2
    ), t{i} AS (
      SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1
    ), w{i} AS (
      SELECT word, replace(replace(ws,
               ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' '),
               ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' ')
               AS ws, freq
      FROM w{i - 1} CROSS JOIN t{i} t
    )""")
    chain = ",\n    ".join(steps)
    return f"""words AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ), w0 AS (
      SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS ws, freq
      FROM words
    ),
    {chain}"""


def _bpe_oracle() -> str:
    out = "\n    UNION ALL ".join(
        f"SELECT {i} AS step, a AS sym_a, b AS sym_b, a || b AS merged, "
        f"cnt AS pair_count FROM t{i}"
        for i in range(1, _BPE_STEPS + 1)
    )
    return f"""
    WITH {_bpe_chain_sql()}
    SELECT CAST(step AS INT) AS step, sym_a, sym_b, merged, pair_count
    FROM ({out})
    """


@register("q_bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding vocabulary induction — the first 3 merge rules a
    BPE tokenizer trainer (Sennrich et al. 2016; the HuggingFace trainer
    shape) learns from the corpus: count adjacent symbol pairs over word
    TYPES weighted by frequency, merge the globally most frequent pair,
    repeat. Output: (step, sym_a, sym_b, merged, pair_count).

    Symbols are encoded as a space-separated string with sentinel spaces
    ( ``' l o w e r '`` ); applying merge (a,b) is a LITERAL
    ``replace(' a b ', ' ab ')`` — applied twice, because adjacent
    occurrences share a sentinel space, so one left-to-right pass merges
    alternate occurrences and the second pass the survivors; the result
    equals greedy leftmost-first BPE, and symbol-overlapping repeats
    (``'a a a'`` under merge (a,a)) merge once, exactly like the
    reference trainers. Both engines' replace() scan left-to-right
    non-overlapping, so the strings stay byte-identical (pinned in
    tests/test_unicode_edges.py on a constructed repeat corpus). Pair
    counts are per-occurrence (overlapping), the HF counting rule.

    Scale: the corpus collapses FIRST to the word-type table (Zipf:
    types ≪ tokens — the one corpus-sized shuffle, a map-side-combining
    count on the word key); every merge round then touches only word
    types: pair counting map-side-combines onto pair keys, the top-1 is
    a TakeOrdered (no full sort), and the merge itself is a narrow map
    under a broadcast single-row rule frame. A production trainer runs
    thousands of rounds — cost is linear in rounds with constant shuffle
    width, and rounds can batch k merges per recount as real trainers do.
    """
    out, _w = _bpe_merge_frames(spark, sf_dir)
    return out


def _bpe_merge_frames(spark: SparkSession, sf_dir: str):
    """Shared BPE trainer plumbing: (steps, w_final) — the induced
    merge table consumed by q_bpe_merges and the word-TYPE table after
    all `_BPE_STEPS` merges (word, ws, freq) consumed by q_bpe_apply."""
    docs = tables.load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    w = words.select(
        "word",
        F.concat(
            F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")
        ).alias("ws"),
        "freq",
    )
    out = None
    for i in range(1, _BPE_STEPS + 1):
        pair_structs = F.expr(
            "CASE WHEN size(s) >= 2 THEN transform(sequence(1, size(s) - 1), "
            "i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b)) "
            "ELSE CAST(array() AS array<struct<a:string,b:string>>) END"
        )
        pairs = (
            w.select(F.split(F.trim("ws"), " ").alias("s"), "freq")
            .select(pair_structs.alias("ps"), "freq")
            .select(F.explode_outer("ps").alias("p"), "freq")
            .filter(F.col("p").isNotNull())
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(1)
        step = top.select(
            F.lit(i).alias("step"),
            F.col("a").alias("sym_a"),
            F.col("b").alias("sym_b"),
            F.concat("a", "b").alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        out = step if out is None else out.unionAll(step)
        pat = F.concat(F.lit(" "), F.col("sym_a"), F.lit(" "), F.col("sym_b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        w = (
            w.crossJoin(
                F.broadcast(
                    step.select("sym_a", "sym_b", "merged")
                )
            )
            .select(
                "word",
                F.replace(F.replace(F.col("ws"), pat, rep), pat, rep).alias("ws"),
                "freq",
            )
        )
    return out, w


@register(
    "q_bpe_apply",
    oracle=f"""
    WITH {_bpe_chain_sql()}, tok AS (
      SELECT word, CAST(len(string_split(trim(ws), ' ')) AS BIGINT) AS n_tok
      FROM w{_BPE_STEPS}
    ), lw AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY lang, word
    ), per AS (
      SELECT lang,
             CAST(SUM(cnt) AS BIGINT) AS n_words,
             CAST(SUM(cnt * length(word)) AS BIGINT) AS n_chars,
             CAST(SUM(cnt * tok.n_tok) AS BIGINT) AS n_tokens
      FROM lw JOIN tok USING (word) GROUP BY lang
    ), nd AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    )
    SELECT nd.lang, nd.n_docs, per.n_words, per.n_chars, per.n_tokens,
           FLOOR(per.n_tokens / NULLIF(per.n_words, 0) * 10000 + 0.5)
             / 10000 AS tokens_per_word,
           FLOOR(per.n_chars / NULLIF(per.n_tokens, 0) * 10000 + 0.5)
             / 10000 AS chars_per_token
    FROM nd LEFT JOIN per USING (lang)
    """,
)
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the induced BPE merges back to the corpus — the missing
    half of the tokenization loop every training pipeline runs (train
    merges, then TOKENIZE the corpus and report budget statistics).
    Per language: document/word/char/token totals, tokens-per-word
    (fertility) and chars-per-token (compression ratio) — the numbers
    a tokenizer evaluation reports per language (round-12 VERDICT
    item 7).

    Semantics: the `_BPE_STEPS` merge rules from q_bpe_merges (same
    shared chain, same greedy two-pass literal replace) are applied in
    induction order to every word TYPE; a word's token count is its
    surviving symbol count, and per-language totals weight each type
    by its (lang, word) occurrence count. Ratios of exact integers
    routinely land ON half-way points, so both engines display-round
    with the floor-scale form (the q_ts_seasonality rule) and guard
    the empty-language division with NULLIF.

    Scale: tokenization cost is per word TYPE (Zipf: types ≪ tokens),
    exactly how production tokenizers cache; the corpus-sized work is
    two map-side-combining counts (word types, (lang, word) pairs) and
    one broadcast-ready join of the per-lang type table against the
    tiny tokenized-type table. No per-token shuffle anywhere.
    """
    _steps, w = _bpe_merge_frames(spark, sf_dir)
    tok = w.select(
        "word", F.size(F.split(F.trim("ws"), " ")).cast("long").alias("n_tok")
    )
    docs = tables.load(spark, sf_dir, "documents")
    lw = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
    )
    per = (
        lw.join(tok, "word")
        .groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.length("word").cast("long")).alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_tok")).alias("n_tokens"),
        )
    )
    nd = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tpw = (
        F.col("n_tokens") / F.nullif(F.col("n_words"), F.lit(0))
    ).cast("double")
    cpt = (
        F.col("n_chars") / F.nullif(F.col("n_tokens"), F.lit(0))
    ).cast("double")
    return nd.join(per, "lang", "left").select(
        "lang",
        "n_docs",
        "n_words",
        "n_chars",
        "n_tokens",
        (F.floor(tpw * 10000 + F.lit(0.5)) / 10000).alias("tokens_per_word"),
        (F.floor(cpt * 10000 + F.lit(0.5)) / 10000).alias("chars_per_token"),
    )


_FH_DIM = 64  # hashed feature-space dimensionality


@register(
    "q_feat_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), hashed AS (
      SELECT doc_id,
             (31 * ascii(w) + 17 * ascii(reverse(w)) + 7 * length(w))
               % {_FH_DIM} AS bucket,
             CASE WHEN (ascii(w) + ascii(reverse(w)) + length(w)) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks WHERE w <> ''
    )
    SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
           CAST(SUM(sgn) AS BIGINT) AS weight
    FROM hashed GROUP BY doc_id, bucket
    HAVING SUM(sgn) <> 0
    """,
)
def q_feat_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the "hashing trick", Weinberger et al., ICML
    2009): every token maps to one of {DIM} buckets via a deterministic
    hash, with a +-1 sign hash making the collision noise zero-mean;
    the per-document sparse feature vector is the signed count per
    bucket (zero-weight buckets dropped) — the fixed-width,
    vocabulary-free featurization that never needs a dictionary build
    or broadcast at 100 TB.

    The hash here is a closed-form combination of first/last code point
    and token length — NOT a production-quality hash (production uses
    murmur/xxhash64; Spark-side that is one builtin call) but one both
    engines compute identically WITHOUT per-character folds, which the
    registry bans from hot paths as interpreted-only. All arithmetic is
    integer-exact; no rounding anywhere.

    Scale: explode + two stacked integer hash aggregates, fully
    map-side combinable; output is bounded by docs x {DIM} rows. The
    modulo keys are tiny ints — no string shuffles after the explode.
    """
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    a = F.ascii("w")
    b = F.ascii(F.reverse(F.col("w")))
    ln = F.length("w")
    hashed = toks.select(
        "doc_id",
        F.pmod(31 * a + 17 * b + 7 * ln, F.lit(_FH_DIM))
        .cast("int")
        .alias("bucket"),
        F.when(F.pmod(a + b + ln, F.lit(2)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


_RAKE_MAX_WORDS = 4
_RAKE_TOP = 10
_RAKE_SPLIT = r"\b(?:the|a|of|and|is|to|in)\b"


@register(
    "q_text_rake",
    oracle=f"""
    WITH frags AS (
      SELECT doc_id, lang,
             trim(unnest(string_split_regex(lower(text),
                                            '{_RAKE_SPLIT}'))) AS phrase
      FROM documents
    ), phrases AS (
      SELECT lang, phrase FROM frags
      WHERE phrase <> ''
        AND len(string_split(phrase, ' ')) <= {_RAKE_MAX_WORDS}
    ), words AS (
      SELECT lang, unnest(string_split(phrase, ' ')) AS w,
             len(string_split(phrase, ' ')) AS plen
      FROM phrases
    ), word_stats AS (
      SELECT lang, w, CAST(SUM(plen) AS BIGINT) AS deg
      FROM words GROUP BY lang, w
    ), pfreq AS (
      SELECT lang, phrase, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM phrases GROUP BY lang, phrase
    ), pwords AS (
      SELECT lang, phrase, unnest(string_split(phrase, ' ')) AS w
      FROM pfreq
    ), score AS (
      SELECT p.lang, p.phrase, CAST(SUM(s.deg) AS BIGINT) AS score
      FROM pwords p JOIN word_stats s ON s.lang = p.lang AND s.w = p.w
      GROUP BY p.lang, p.phrase
    )
    SELECT lang, phrase, n_occ, score, rk FROM (
      SELECT f.lang, f.phrase, f.n_occ, s.score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY f.lang
               ORDER BY s.score DESC, f.n_occ DESC, f.phrase)
               AS INTEGER) AS rk
      FROM pfreq f JOIN score s ON s.lang = f.lang AND s.phrase = f.phrase
    ) WHERE rk <= {_RAKE_TOP}
    """,
)
def q_text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010), degree-scored
    integer variant: candidate phrases are maximal stopword-free runs
    (text split at stopword occurrences, capped at {MAX} words), each
    word gets degree = total length of phrases it occurs in, and a
    phrase scores the sum of its words' degrees — top-{TOP} phrases
    per language. Classic RAKE divides degree by frequency; that makes
    the score an order-dependent SUM of rationals across engines, so
    this variant keeps the pure-integer degree sum (documented
    deviation; ranking quality is similar on short phrases) with
    (score DESC, n_occ DESC, phrase) as the total tie-safe order.

    Scale: the phrase explode is corpus-linear; word stats and phrase
    scores are two map-side-combinable hash aggregates on (lang, word)
    / (lang, phrase); the scoring join streams DISTINCT phrases (not
    occurrences) against word stats. Per-lang top-{TOP} windows over
    the aggregated phrase frame only.
    """
    docs = tables.load(spark, sf_dir, "documents")
    frags = docs.select(
        "lang",
        F.explode(F.split(F.lower("text"), _RAKE_SPLIT)).alias("raw"),
    )
    phrases = frags.select(
        "lang", F.trim("raw").alias("phrase")
    ).filter(
        (F.col("phrase") != "")
        & (F.size(F.split("phrase", " ")) <= _RAKE_MAX_WORDS)
    )
    words = phrases.select(
        "lang",
        F.explode(F.split("phrase", " ")).alias("w"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    word_stats = words.groupBy("lang", "w").agg(
        F.sum("plen").cast("long").alias("deg")
    )
    pfreq = phrases.groupBy("lang", "phrase").agg(
        F.count("*").cast("long").alias("n_occ")
    )
    pwords = pfreq.select(
        "lang", "phrase", F.explode(F.split("phrase", " ")).alias("w")
    )
    score = (
        pwords.join(word_stats, ["lang", "w"])
        .groupBy("lang", "phrase")
        .agg(F.sum("deg").cast("long").alias("score"))
    )
    wr = W.partitionBy("lang").orderBy(
        F.col("score").desc(), F.col("n_occ").desc(), "phrase"
    )
    return (
        pfreq.join(score, ["lang", "phrase"])
        .select(
            "lang",
            "phrase",
            "n_occ",
            "score",
            F.row_number().over(wr).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= _RAKE_TOP)
    )


@register(
    "q_text_code_detect",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[{}();=+*<>]')) AS BIGINT)
             AS n_symbols,
           CAST(len(regexp_extract_all(text,
                '\\b(def|class|return|import|function|var|const|int|void|for|while)\\b'))
             AS BIGINT) AS n_keywords,
           FLOOR(len(regexp_extract_all(text, '[{}();=+*<>]')) * 1000000.0
                 / NULLIF(length(text), 0) + 0.5) / 1000000
             AS symbol_density,
           (len(regexp_extract_all(text, '[{}();=+*<>]')) * 50
              >= length(text)
            OR len(regexp_extract_all(text,
                 '\\b(def|class|return|import|function|var|const|int|void|for|while)\\b'))
               >= 3) AS looks_like_code
    FROM documents
    """,
)
def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection: symbol density (brace/paren/operator
    characters per char) and programming-keyword hits — the cheap
    heuristic gate training pipelines run BEFORE routing documents to a
    code-specific tokenizer/quality model (a learned classifier replaces
    the thresholds at quality time; the plumbing — two regex counters and
    a boolean route — is identical).

    The verdict compares exact INTEGERS (``n_symbols * 50 >= n_chars``
    encodes density >= 0.02 without any float), so the boolean can never
    diverge on a rounding boundary; the reported density is floor-scale
    display only. Both engines run RE2-compatible patterns (word
    boundaries, one character class) — no dialect-divergent syntax.

    Scale: pure map-side projection over the documents scan — no
    shuffle, no UDF, regexp_extract_all stays inside codegen. The regex
    cost is linear in corpus bytes, the same single pass any scan-side
    filter pays.
    """
    docs = tables.load(spark, sf_dir, "documents")
    sym = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[{}();=+*<>]"), F.lit(0))
    ).cast("long")
    kw = F.size(
        F.regexp_extract_all(
            F.col("text"),
            F.lit(
                r"\b(def|class|return|import|function|var|const|int|void|for|while)\b"
            ),
            F.lit(0),
        )
    ).cast("long")
    n_chars = F.length("text").cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        sym.alias("n_symbols"),
        kw.alias("n_keywords"),
        (
            F.floor(
                sym * F.lit(1000000.0) / F.nullif(n_chars, F.lit(0))
                + F.lit(0.5)
            )
            / 1000000
        ).alias("symbol_density"),
        ((sym * 50 >= n_chars) | (kw >= 3)).alias("looks_like_code"),
    )
