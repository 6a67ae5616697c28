"""Training-data pipeline operators: the sampling / bucketing / weighting /
packing / filtering steps a 100 TB corpus-preparation job runs between the
dedup pass and the tokenizer.

The reference forwards opaque frames (``/root/reference/src/main.cpp:48-50``)
and has no batch surface; this module is part of the driver-mandated LLM-data
extension (BASELINE.json north star, SURVEY.md §2.3 "beyond the reference").

Design rules shared by every operator here:

* **No driver materialization** — corpus-wide scalars (doc counts, decile
  cutpoints) are 1-row DataFrames cross-joined back in as broadcasts, never
  ``collect()``ed.
* **Determinism over RNG** — sampling uses arithmetic on the stable key
  (modulo bands, LCG ranks) instead of ``rand()``: reproducible across
  retries/stragglers (a re-executed task must pick the same rows) and
  expressible in the DuckDB oracle verbatim.
* **Exact integer math wherever possible** — token counts, cumulative sums,
  bucket indices are BIGINT on both sides; doubles are rounded per the
  registry conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import tables
from .registry import register

# Per-language sampling rates (percent) for the stratified sample; the CASE
# is generated from this table on both sides so they cannot drift.
_STRATA_RATES = {"en": 10, "zh": 30, "es": 30, "de": 50, "fr": 50}
_STRATA_DEFAULT = 20

_PERGROUP_K = 20
# LCG scramble for deterministic per-group sampling: BIGINT-safe on both
# engines (doc_id < 2^20 here; the product stays far under 2^63).
_LCG_A = 2654435761
_LCG_P = 1000000007

_DECILES = [i / 10.0 for i in range(1, 10)]
_PACK_BUDGET = 2000  # tokens per shard
_TFIDF_TOP_K = 5

_KEEP_LANGS = ("de", "en", "es", "fr")  # zh exercises the lang filter
_MIN_CHARS, _MAX_CHARS = 150, 450
_MAX_MEAN_WORD_LEN = 7.5


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(_STRATA_RATES.items())
    )
    return f"CASE lang {whens} ELSE {_STRATA_DEFAULT} END"


def _rate_case_col():
    col = None
    for lang, rate in sorted(_STRATA_RATES.items()):
        cond = F.col("lang") == lang
        col = F.when(cond, rate) if col is None else col.when(cond, rate)
    return col.otherwise(_STRATA_DEFAULT)


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE doc_id % 100 < {_rate_case_sql()}
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: per-language keep-rates applied as a
    deterministic modulo band on the stable key — the up/down-sampling step
    of corpus mixing (e.g. downweight English, upweight low-resource
    languages).

    Scale: a pure narrow filter — no shuffle, no RNG state, pushed to the
    scan; re-executed tasks pick identical rows (``rand()`` would not
    survive task retries, and its oracle could never match).
    """
    docs = tables.load(spark, sf_dir, "documents")
    return docs.filter(
        (F.col("doc_id") % 100) < _rate_case_col()
    ).select("doc_id", "lang")


@register(
    "q_sample_pergroup",
    oracle=f"""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * {_LCG_A}) % {_LCG_P}, doc_id) AS rk
      FROM documents
    ) WHERE rk <= {_PERGROUP_K}
    """,
)
def q_sample_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-per-group sampling (the distributed stand-in for reservoir
    sampling): rank every doc inside its language by an LCG scramble of the
    stable key and keep the first k — a uniform-without-replacement sample
    that is deterministic, retry-safe, and oracle-expressible.

    Scale: one shuffle on the group key; the window's group-limit keeps k
    rows per group per partition before the exchange, so the shuffle
    carries ~k rows per (group × input partition), not the corpus.
    """
    docs = tables.load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        (F.col("doc_id") * _LCG_A) % _LCG_P, F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _PERGROUP_K)
    )


@register(
    "q_quantile_buckets",
    oracle=f"""
    WITH cut AS (
      SELECT list_transform(
               quantile_cont(o_totalprice, {_DECILES}),
               c -> FLOOR(c * 1000 + 0.5) / 1000) AS cl
      FROM orders
    )
    SELECT CAST(len(list_filter(cl, c -> c < o_totalprice)) AS BIGINT)
             AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders, cut
    GROUP BY bucket
    """,
)
def q_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing: assign every order its global price decile and
    aggregate per bucket — the discretization step of histogram features /
    balanced binning.

    The 100 TB shape: cutpoints are a 1-row aggregate broadcast back into a
    narrow filter-count per row — NO global sort, NO ntile window (a single
    ORDER BY over the corpus is the plan this deliberately avoids).  The
    exact ``percentile`` aggregate (which buffers values per executor) is
    used here because the oracle must reproduce the cutpoints bit-for-bit;
    a production run swaps in ``approx_percentile`` — same plan shape,
    sketch-sized state.  Cutpoints are tie-free-rounded at 3dp on both
    sides: cent-rounding is NOT boundary-safe here because decile
    interpolations of 2dp prices are exact multiples of 0.001, which CAN
    land exactly on a half-cent (X.XX5) where floor(c*100+0.5) sits on
    an integer boundary and a last-ulp cross-engine interpolation
    difference flips the bucket; 0.001-multiples never hit a 3dp
    half-boundary (0.0005 offsets), so floor(c*1000+0.5)/1000 is exact
    on both engines (round-3 unrounded-threshold sweep).
    """
    orders = tables.load(spark, sf_dir, "orders")
    deciles = ", ".join(str(d) for d in _DECILES)
    cuts = orders.agg(
        F.expr(f"percentile(o_totalprice, array({deciles}))").alias("cl")
    ).select(
        F.transform("cl", lambda c: F.floor(c * 1000 + 0.5) / 1000).alias("cl")
    )
    return (
        orders.crossJoin(F.broadcast(cuts))
        .select(
            F.size(
                F.filter("cl", lambda c: c < F.col("o_totalprice"))
            ).cast("long").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "q_text_tfidf",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT doc_id, word, tfidf, rk FROM (
      SELECT tf.doc_id, tf.word,
             ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0), 6)
                        DESC, tf.word) AS rk
      FROM tf JOIN df USING (word) CROSS JOIN n
    ) WHERE rk <= {_TFIDF_TOP_K}
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-5 terms per document by smoothed
    tf·idf (idf = ln((N+1)/(df+1)) + 1, the scikit-learn smoothing) — the
    classic relevance-weighting step of corpus indexing/analysis jobs.

    Scale: two partial-agg shuffles — (doc, word) for tf and (word) for df
    — then a join on word (dictionary-sized right side; hot stopword keys
    are exactly what AQE skew-join splits) and a per-doc window whose
    group-limit truncates to k before the exchange.  The corpus-size scalar
    N is a broadcast 1-row frame, not a driver-side count.  Ordering is on
    the ROUNDED score with a word tiebreak, total on both engines.
    """
    docs = tables.load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    # tf already holds one row per distinct (doc, word): df is a count over
    # it, not a second wide shuffle of the exploded token stream
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    tfidf = F.round(
        F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        6,
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", tfidf)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _TFIDF_TOP_K)
        .select("doc_id", "word", "tfidf", "rk")
    )


@register(
    "q_pack_tokens",
    oracle=f"""
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(FLOOR(
             (CAST(SUM(len(string_split(text, ' '))) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT)
              - len(string_split(text, ' '))) / {_PACK_BUDGET}.0)
           AS BIGINT) AS shard
    FROM documents
    """,
)
def q_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: within each source, docs are laid out in
    stable key order and cut into ~{budget}-token shards (a doc's shard is
    the budget-quotient of the tokens BEFORE it) — the sequence-packing
    step that turns a corpus into fixed-size training shards.

    Scale: one shuffle on source + a running-sum window with O(1) carry
    state; all integer math, exact on both engines.  Source is the natural
    packing unit because shard locality should follow provenance; a salted
    sub-key bounds any single giant source.
    """
    docs = tables.load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        F.floor((F.sum(n_tok).over(w) - n_tok) / float(_PACK_BUDGET))
        .cast("long")
        .alias("shard"),
    )


_SALT_BUCKETS = 8
_CHUNK_SIZE = 50   # tokens per chunk
_CHUNK_STRIDE = 40  # tokens between chunk starts (10-token overlap)


@register(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, ROUND(value, 4) AS value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction (the batch CDC/upsert-resolution
    shape: many updates per key, keep the newest) via a window group-limit.

    Scale: one shuffle on the key; Spark's WindowGroupLimit keeps a single
    candidate row per key per input partition BEFORE the exchange, so the
    shuffle carries ~|keys| rows, not |events|.  The (ts, event_id) order
    is total, so the survivor is deterministic on both engines.
    """
    events = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
        )
    )


@register(
    "q_join_salted",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join: the fact side is salted by a hash of its own
    row key and the dimension side replicated ``SALT`` times, so one hot
    customer key spreads over SALT reducers instead of one straggler — with
    the oracle proving the result is EXACTLY the plain join's.

    Scale: AQE's skew-join split is the first-line tool, but it only
    rebalances post-shuffle partitions of sort-merge joins; manual salting
    is the portable fallback when the skew hides inside one join key (AQE
    can't split a single key's hash bucket in a streaming state store or a
    bucketed join).  The salt widens the dimension shuffle SALT×, a
    deliberate trade of replication for the straggler.
    """
    orders = tables.load(spark, sf_dir, "orders")
    customer = tables.load(spark, sf_dir, "customer")
    salted_fact = orders.withColumn(
        "salt", F.pmod(F.hash("o_orderkey"), F.lit(_SALT_BUCKETS))
    )
    replicated_dim = customer.select(
        "c_custkey",
        "c_nationkey",
        F.explode(F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1))).alias("salt"),
    )
    return (
        salted_fact.join(
            # hint forces the shuffle join: at fixture scale AQE would just
            # broadcast the dim (where salting is moot); the operator exists
            # to exercise the salted-shuffle plan a too-big-to-broadcast dim
            # needs.
            replicated_dim.hint("shuffle_hash"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (salted_fact["salt"] == replicated_dim["salt"]),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q_doc_chunks",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, words, n_tok,
             unnest(generate_series(
               0, CAST(FLOOR((n_tok - 1) / {_CHUNK_STRIDE}.0) AS BIGINT)))
               AS chunk_idx
      FROM d
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * {_CHUNK_STRIDE} AS start_tok,
           LEAST(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n_tok) AS end_tok,
           array_to_string(
             words[chunk_idx * {_CHUNK_STRIDE} + 1
                   : LEAST(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n_tok)],
             ' ') AS chunk_text
    FROM c
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into {size}-token
    chunks with {overlap}-token overlap ({stride}-token stride) and emit
    the chunk text — the sliding-window step that shapes long documents to
    a model's context length.

    Scale: narrow per-row work (tokenize once into an array column, explode
    a per-doc index sequence, slice) — no shuffle at all; output rows ≈
    tokens/stride.  Everything is exact integer/string math on both
    engines.
    """
    docs = tables.load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split("text", " ").alias("words"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    c = d.select(
        "doc_id",
        "words",
        "n_tok",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.col("n_tok") - 1) / float(_CHUNK_STRIDE)),
            )
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _CHUNK_STRIDE
    end = F.least(start + _CHUNK_SIZE, F.col("n_tok"))
    return c.select(
        "doc_id",
        "chunk_idx",
        start.alias("start_tok"),
        end.alias("end_tok"),
        F.array_join(
            F.slice(F.col("words"), start + 1, end - start), " "
        ).alias("chunk_text"),
    )


def _filter_reason_col():
    nw = F.size(F.split("text", " "))
    mean_wl = (F.col("n_chars") - nw + 1) / nw
    return (
        F.when(F.col("n_chars") < _MIN_CHARS, "too_short")
        .when(F.col("n_chars") > _MAX_CHARS, "too_long")
        .when(~F.col("lang").isin(*_KEEP_LANGS), "lang_filtered")
        .when(mean_wl > _MAX_MEAN_WORD_LEN, "long_words")
        .otherwise("kept")
    )


def _filter_reason_sql() -> str:
    langs = ", ".join(f"'{lg}'" for lg in _KEEP_LANGS)
    nw = "len(string_split(text, ' '))"
    return f"""CASE
      WHEN n_chars < {_MIN_CHARS} THEN 'too_short'
      WHEN n_chars > {_MAX_CHARS} THEN 'too_long'
      WHEN lang NOT IN ({langs}) THEN 'lang_filtered'
      WHEN (n_chars - {nw} + 1) / CAST({nw} AS DOUBLE)
           > {_MAX_MEAN_WORD_LEN} THEN 'long_words'
      ELSE 'kept' END"""


@register(
    "q_corpus_filter",
    oracle=f"""
    SELECT lang, {_filter_reason_sql()} AS reason,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, reason
    """,
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel (the C4/Gopher-style rule cascade): every doc
    gets its FIRST failing rule as a drop reason — length bounds, language
    allowlist, mean-word-length gibberish screen — and the output is the
    per-(lang, reason) funnel report a pipeline operator actually monitors.

    Scale: single scan, all-JVM expressions, partial-agg on a tiny key
    space; the same CASE column is the keep-filter of the production job
    (``reason = 'kept'``), so the report and the filter cannot drift.
    """
    docs = tables.load(spark, sf_dir, "documents")
    return (
        docs.withColumn("reason", _filter_reason_col())
        .groupBy("lang", "reason")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_BIGRAM_TOP_K = 3
_MIX_TARGETS = {"en": 30, "zh": 25, "es": 15, "de": 15, "fr": 15}  # percent


@register(
    "q_text_bigrams",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), bg AS (
      SELECT words[i] AS w1, words[i + 1] AS w2
      FROM d CROSS JOIN LATERAL (
        SELECT UNNEST(generate_series(1, len(words) - 1)) AS i
      )
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS n_pair FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, SUM(n_pair) AS n_ctx FROM c2 GROUP BY w1
    )
    SELECT w1, w2, n_pair, p_next, rk FROM (
      SELECT c2.w1, c2.w2, c2.n_pair,
             ROUND(c2.n_pair / CAST(n_ctx AS DOUBLE), 6) AS p_next,
             ROW_NUMBER() OVER (PARTITION BY c2.w1
                                ORDER BY c2.n_pair DESC, c2.w2) AS rk
      FROM c2 JOIN c1 USING (w1)
    ) WHERE rk <= {_BIGRAM_TOP_K}
    """,
)
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: for every context word, the top-3
    next-word continuations with their conditional probability
    P(w2|w1) — the n-gram counting shape of corpus LM analysis (and of
    classic contamination/quality heuristics built on continuation
    entropy).

    Scale: the bigram explode is narrow (tokenize once, zip the array with
    its own tail); counting is two partial-agg shuffles (bigram, then
    context); the ranking window's group-limit truncates to k per context
    before the exchange.  Ranking is on the exact integer count with a
    word tiebreak — no float ordering at all; the probability is
    display-only and rounded on both sides.
    """
    docs = tables.load(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("words"))
    bg = d.select(
        F.explode(
            F.zip_with(
                F.slice("words", 1, F.size("words") - 1),
                F.slice("words", 2, F.size("words") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    c1 = c2.groupBy("w1").agg(F.sum("n_pair").alias("n_ctx"))
    w = W.partitionBy("w1").orderBy(F.col("n_pair").desc(), F.col("w2"))
    return (
        c2.join(c1, "w1")
        .withColumn("p_next", F.round(F.col("n_pair") / F.col("n_ctx"), 6))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _BIGRAM_TOP_K)
        .select("w1", "w2", "n_pair", "p_next", "rk")
    )


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in sorted(_MIX_TARGETS.items())
    )
    return f"CASE lang {whens} ELSE 0 END"


def _mix_case_col():
    col = None
    for lang, pct in sorted(_MIX_TARGETS.items()):
        cond = F.col("lang") == lang
        col = F.when(cond, pct) if col is None else col.when(cond, pct)
    return col.otherwise(0)


@register(
    "q_mix_weights",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per_lang
    )
    SELECT lang, n_docs, n_tokens,
           ROUND(n_tokens / CAST(total_tokens AS DOUBLE), 6) AS actual_share,
           ROUND(({_mix_case_sql()} / 100.0)
                 / (n_tokens / CAST(total_tokens AS DOUBLE)), 6) AS weight
    FROM per_lang, tot
    """,
)
def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-mixing weights: per-language sampling weight =
    target token share / actual token share — the mixture-rebalancing
    computation behind 'upsample low-resource languages to X% of the
    training mix'.  A weight > 1 upsamples, < 1 downsamples; feeding these
    into `q_sample_stratified`-style bands closes the loop.

    Scale: one partial-agg shuffle on the (tiny) language key; the corpus
    token total joins back as a broadcast 1-row frame.
    """
    docs = tables.load(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
    )
    tot = per_lang.agg(F.sum("n_tokens").alias("total_tokens"))
    share = F.col("n_tokens") / F.col("total_tokens").cast("double")
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("actual_share"),
        F.round((_mix_case_col() / F.lit(100.0)) / share, 6).alias("weight"),
    )


@register(
    "q_len_histogram",
    oracle="""
    SELECT lang,
           CAST(FLOOR(LOG2(n_chars)) AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, log2_bucket
    """,
)
def q_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-scale length histogram per language — the size-distribution
    report that drives chunking and packing parameter choices.

    Scale: single scan, partial-agg on a tiny key space.  log2 of a
    positive integer is exact at the bucket boundaries (powers of two are
    representable), so the floor is identical on both engines.
    """
    docs = tables.load(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            F.floor(F.log2("n_chars")).cast("long").alias("log2_bucket"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def _corpus_final_oracle() -> str:
    from .dedup import _cc_ctes

    return f"""
    WITH RECURSIVE {_cc_ctes()}
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    LEFT JOIN clusters c ON c.doc_id = d.doc_id
    WHERE ({_filter_reason_sql()}) = 'kept'
      AND (c.cluster_id IS NULL OR c.cluster_id = d.doc_id)
    """


@register("q_corpus_final", oracle=_corpus_final_oracle())
def q_corpus_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized cleaned corpus — the pipeline's actual end
    artifact: documents that pass the quality-filter cascade AND survive
    deduplication (not in a duplicate cluster, or its canonical keeper =
    the cluster's minimum doc_id).

    Composes `q_corpus_filter`'s rule CASE with `q_dedup_clusters`'
    connected components, and the oracle composes the same recursive-CTE
    clustering with the same CASE — so the driver verifies the whole
    assembly, filter interplay included, end to end.

    Scale: the filter is a narrow scan-side predicate; the cluster table is
    duplicate-members-only (tiny relative to the corpus — duplicates ARE
    the minority) so the left join broadcasts; nothing new shuffles beyond
    what clustering already did.
    """
    from .dedup import q_dedup_clusters

    docs = tables.load(spark, sf_dir, "documents")
    clusters = q_dedup_clusters(spark, sf_dir)
    return (
        docs.withColumn("reason", _filter_reason_col())
        .filter(F.col("reason") == "kept")
        .join(F.broadcast(clusters), "doc_id", "left")
        .filter(
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("doc_id"))
        )
        .select("doc_id", "lang", "source")
    )


# Bloom-filter join prefilter: m bits / k probes sized for the build side
# (|keys| ~ 70-800 across SFs -> m = 2^17 gives < 1% FP at k = 3 up to
# ~10k keys; at 100 TB you size m from the build-side count the same way).
_BLOOM_BITS = 1 << 17
_BLOOM_WORD_COUNT = _BLOOM_BITS // 64
_BLOOM_K = 3
_BLOOM_BRAND = "Brand#23"


def _bloom_positions(key_col):
    """k deterministic bit positions per key: xxhash64 seeded by the probe
    index (the seed rides as a literal first argument)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key_col), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]


@register(
    "q_join_bloom",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
    GROUP BY p_brand
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered join — the runtime-filter ("sideways information
    passing") pattern: build a compact bitset over the (filtered) build-side
    keys, broadcast it, drop probe rows whose key misses the filter BEFORE
    the join, then run the exact join on the survivors.

    Bloom filters have no false negatives, so bloom + exact join ==
    plain join — which is precisely what the oracle asserts (it runs the
    plain join).  The false-positive survivors are eliminated by the join
    itself; the bloom only cuts the probe volume that reaches the
    shuffle/join.

    Scale: this is what Spark's own runtime row-level filtering does for
    sort-merge joins (``spark.sql.optimizer.runtime.bloomFilter.enabled``);
    expressed manually it also covers the cases AQE's version cannot reach
    (probe sides feeding a bucketed join or a stateful stream).  The bitset
    is 2^17 bits = 16 KiB packed into 2048 longs — a broadcast-trivial
    1-row map built with one partial-aggregating shuffle over ~|build keys|
    rows; every per-row check is JVM bit arithmetic inside codegen.
    """
    build, survivors = _bloom_prefiltered(spark, sf_dir)
    return (
        survivors.join(F.broadcast(build), survivors["l_partkey"] == build["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


def _bloom_prefiltered(spark: SparkSession, sf_dir: str):
    """(build side, bloom-surviving probe rows) — split out so the tests can
    measure the prefilter's selectivity and no-false-negative property
    directly."""
    part = tables.load(spark, sf_dir, "part")
    lineitem = tables.load(spark, sf_dir, "lineitem")
    build = part.filter(F.col("p_brand") == _BLOOM_BRAND).select(
        "p_partkey", "p_brand"
    )

    bits = build.select(
        F.explode(F.array(*_bloom_positions(F.col("p_partkey")))).alias("pos")
    )
    # Dense array<long>, not a map: Spark's element_at on a MapType is a
    # LINEAR scan of the entries (3 probes × 2048 entries per row measured
    # ~1.3 s at sf0.1); array element_at is O(1) by index.  The dense
    # expansion runs once on the 1-row frame.
    bloom = (
        bits.select(
            (F.col("pos") / 64).cast("long").alias("widx"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .groupBy()
        .agg(
            F.map_from_entries(F.collect_list(F.struct("widx", "word"))).alias("m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.lit(_BLOOM_WORD_COUNT - 1)),
                lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0)),
            ).alias("bloom")
        )
    )

    probe = lineitem.select("l_partkey", "l_extendedprice", "l_discount").crossJoin(
        F.broadcast(bloom)
    )
    hit = None
    for i, pos in enumerate(_bloom_positions(F.col("l_partkey"))):
        # 1-based array index; widx < _BLOOM_WORD_COUNT by construction
        word = F.element_at(F.col("bloom"), (pos / 64).cast("int") + 1)
        probe = probe.withColumn(f"_w{i}", word).withColumn(f"_p{i}", pos)
        test = F.expr(f"(shiftrightunsigned(_w{i}, cast(_p{i} % 64 AS int)) & 1) = 1")
        hit = test if hit is None else (hit & test)
    survivors = probe.filter(hit).select("l_partkey", "l_extendedprice", "l_discount")
    return build, survivors


# below the fixtures' 31-token vocabulary so the LIMIT cutoff (and its
# (count DESC, token ASC) tie-break) is actually exercised by the oracle
_VOCAB_TOP_K = 10
_U16_HEX = "instr('0123456789abcdef', substr(h, {i}, 1)) - 1"


def _u16_sql() -> str:
    """First 16 bits of md5(text) as a BIGINT, digit-by-digit (DuckDB has
    no base-16 string->int conversion; Spark uses conv())."""
    terms = [
        f"({_U16_HEX.format(i=1)}) * 4096",
        f"({_U16_HEX.format(i=2)}) * 256",
        f"({_U16_HEX.format(i=3)}) * 16",
        f"({_U16_HEX.format(i=4)})",
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "q_mix_sample",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per_lang
    ), rated AS (
      SELECT lang, n_tokens, total_tokens,
             CAST({_mix_case_sql()} AS BIGINT) AS target_pct
      FROM per_lang, tot
    ), hashed AS (
      SELECT doc_id, lang, n_chars, {_u16_sql()} AS u16
      FROM (SELECT doc_id, lang, n_chars, md5(text) AS h FROM documents)
    )
    SELECT doc_id, hashed.lang AS lang, n_chars, u16
    FROM hashed JOIN rated ON hashed.lang = rated.lang
    WHERE CAST(u16 AS HUGEINT) * 100 * n_tokens
          < CAST(target_pct AS HUGEINT) * total_tokens * 65536
    """,
)
def q_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized curriculum mix: the row-level sample that realizes
    q_mix_weights' per-language rates (capped at 1 — upsampling replicates
    instead, see q_join_salted's explode pattern).  A doc is kept iff the
    first 16 bits of md5(text) fall under its language's keep-rate.

    The keep test is EXACT INTEGER arithmetic on both engines —
    ``u16 * 100 * n_tokens < target_pct * total_tokens * 65536`` — the
    float-free form of ``u16/65536 < (target/100)/token_share``, evaluated
    in 128-bit-safe types (decimal(38,0) in Spark, HUGEINT in DuckDB)
    because the right side crosses 2^63 once the corpus passes ~1.4e12
    tokens, i.e. well inside the 100 TB design point.  Membership depends
    only on content + corpus totals: stable across reshuffles, re-crawls,
    and engine versions.

    Scale: one tiny per-language agg broadcast back to the scan; the
    filter is codegen'd scalar math — the same shape DataBricks-style
    mixture jobs run on full corpora."""
    docs = tables.load(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens")
    )
    tot = per_lang.agg(F.sum("n_tokens").alias("total_tokens"))
    rated = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        "total_tokens",
        _mix_case_col().cast("long").alias("target_pct"),
    )
    hashed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long").alias("u16"),
    )
    return (
        hashed.join(F.broadcast(rated), "lang")
        .filter(
            F.col("u16").cast("decimal(38,0)") * 100 * F.col("n_tokens")
            < F.col("target_pct").cast("decimal(38,0)")
            * F.col("total_tokens")
            * 65536
        )
        .select("doc_id", "lang", "n_chars", "u16")
    )


@register(
    "q_vocab_topk",
    oracle=f"""
    SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY n DESC, token
    LIMIT {_VOCAB_TOP_K}
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global vocabulary heavy hitters: the top-{K} tokens by corpus
    frequency — the first step of every tokenizer/vocab build.

    Scale: explode + grouped count gets full map-side combine (each
    partition pre-aggregates its own token histogram before the shuffle),
    and the global orderBy+limit compiles to TakeOrderedAndProject — each
    partition ships only its local top-K, never a global sort.  The
    (count DESC, token ASC) order is total, so the cutoff row is
    deterministic on both engines even under count ties."""
    docs = tables.load(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(_VOCAB_TOP_K)


#: Misra-Gries counter budget: guarantees every token with global
#: frequency > n/_MG_K survives candidate generation (pigeonhole over
#: per-partition summaries — see q_vocab_heavyhitters).
_MG_K = 50


@register(
    "q_vocab_heavyhitters",
    oracle=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    HAVING COUNT(*) * {_MG_K} >
           (SELECT COUNT(*)
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents))
    """,
)
def q_vocab_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (tokens with frequency > n/{_MG_K}) without ever
    shuffling the full vocabulary: per-partition Misra-Gries summaries
    (Misra & Gries 1982; merged batch-at-a-time per Agarwal et al.'s
    mergeable-summaries formulation) nominate ≤ {_MG_K} candidates per
    partition, then ONE aggregation counts only candidate tokens
    exactly. q_agg_countmin answers the same question with a sketch
    ESTIMATE; this is the deterministic-candidates + exact-verify form.

    Soundness (the pigeonhole the plan rests on): an MG summary with
    {_MG_K} counters undercounts any token by at most n_p/(k+1), so a
    token with partition frequency > n_p/(k+1) survives partition p's
    summary. If a token's GLOBAL frequency exceeds n/k = Σ n_p/k,
    then on at least one partition its share exceeds n_p/k >
    n_p/(k+1) — so every global heavy hitter is nominated somewhere,
    and the exact verify discards every false candidate. Compaction
    subtracts the (k+1)-th largest count and drops non-positives —
    the mergeable form, exact over pre-counted batches.

    Scale: this is the URL/IP-cardinality shape — a full groupBy ships
    the entire per-partition vocabulary histogram into the exchange
    (billions of distinct keys at 100 TB), while the summaries ship
    ≤ {k}+1 rows per partition; the verify join broadcasts the tiny
    candidate list and its aggregation shuffles only candidate rows.
    Per-partition totals ride the same summary pass (one NULL-token row
    each), so the threshold needs no extra scan. On the fixtures the
    plain groupBy wins (27k-token vocab); the operator exists for the
    regime where it doesn't.
    """
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    return mg_heavy_hitters(toks, _MG_K)


def mg_heavy_hitters(toks: DataFrame, k: int) -> DataFrame:
    """Exact tokens with frequency STRICTLY greater than n/k over a
    one-column ``(token string)`` frame — the Misra-Gries candidate +
    exact-verify plan :func:`q_vocab_heavyhitters` documents. Extracted
    so the property suite can drive it with adversarial multisets
    (threshold ties, single-token floods, tiny k with forced
    compaction) the fixtures never produce."""
    import pandas as pd

    def mg_partition(batches):
        # Peak memory must stay O(k), not O(distinct tokens per batch):
        # at the billion-key regime one Arrow batch's vocabulary can blow
        # the executor-Python heap if merged wholesale. So fold each
        # batch's value_counts in chunks and compact whenever the summary
        # exceeds a small multiple of k. Soundness is unchanged — each
        # chunk is an exact sub-multiset count, and compaction of a
        # merged summary is the Agarwal et al. mergeable-summary step;
        # total decrement per token stays <= n_part/(k+1) (every
        # compaction removes >= (k+1)x its subtraction in total weight).
        summary: dict = {}
        n_part = 0

        def compact():
            nonlocal summary
            if len(summary) > k:
                kth = sorted(summary.values(), reverse=True)[k]
                summary = {
                    t: c - kth for t, c in summary.items() if c > kth
                }

        chunk_cap = 4 * k
        for pdf in batches:
            n_part += len(pdf)
            for tok, c in pdf["token"].value_counts().items():
                summary[tok] = summary.get(tok, 0) + int(c)
                if len(summary) > chunk_cap:
                    compact()
            compact()
        yield pd.DataFrame(
            {
                "token": list(summary.keys()) + [None],
                "n_part": [0] * len(summary) + [n_part],
            }
        )

    summaries = toks.mapInPandas(
        mg_partition, schema="token string, n_part long"
    )
    # one summary pass feeds BOTH the candidate list and the total-count
    # threshold; persist so the two consumers don't redo the scan
    summaries = summaries.persist()
    from .distributed import _track

    _track(summaries)
    cands = (
        summaries.filter(F.col("token").isNotNull())
        .select("token")
        .distinct()
    )
    total = summaries.agg(F.sum("n_part").cast("long").alias("n_total"))
    freq = (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return (
        freq.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * k > F.col("n_total"))
        .select("token", "freq")
    )



@register(
    "q_merge_upsert",
    oracle="""
    WITH changes AS (
      SELECT user_id AS custkey, SUM(value) AS delta
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT COALESCE(c_custkey, custkey) AS custkey,
           FLOOR((COALESCE(c_acctbal, 0) + COALESCE(delta, 0)) * 100 + 0.5)
             / 100 AS acctbal,
           COALESCE(c_mktsegment, 'NEW') AS segment,
           CASE WHEN custkey IS NULL THEN 'keep'
                WHEN c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS op
    FROM customer FULL OUTER JOIN changes ON c_custkey = custkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert as a batch operator: a change set (per-user
    purchase totals) applied onto the customer dimension — matched keys
    update the balance, unmatched source keys insert, untouched target
    rows pass through tagged 'keep'.  This is ``MERGE INTO`` expressed as
    full-outer-join + coalesce, the portable form when no transactional
    table format (Delta/Iceberg) is underneath.

    Balance arithmetic uses the registry's tie-safe cent rounding
    (``floor(x*100+0.5)/100``) on both engines.  Scale: one shuffle per
    side on the merge key; at 100 TB the target side would be bucketed on
    the key so reruns co-locate, and the output overwrites partitions
    atomically (the lakehouse MERGE's physical plan is this same join)."""
    events = tables.load(spark, sf_dir, "events")
    customer = tables.load(spark, sf_dir, "customer")
    changes = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("custkey"))
        .agg(F.sum("value").alias("delta"))
    )
    tgt = customer.select("c_custkey", "c_acctbal", "c_mktsegment")
    merged = tgt.join(changes, tgt["c_custkey"] == changes["custkey"], "full_outer")
    new_bal = F.coalesce("c_acctbal", F.lit(0.0)) + F.coalesce("delta", F.lit(0.0))
    return merged.select(
        F.coalesce("c_custkey", "custkey").alias("custkey"),
        (F.floor(new_bal * 100 + 0.5) / 100).alias("acctbal"),
        F.coalesce("c_mktsegment", F.lit("NEW")).alias("segment"),
        F.when(F.col("custkey").isNull(), "keep")
        .when(F.col("c_custkey").isNull(), "insert")
        .otherwise("update")
        .alias("op"),
    )


# Spatial blocking: cell size == the match radius, so any pair within the
# radius lies in the same or an adjacent cell (|Δcoord| < r per axis) —
# the 9-cell neighbor join is exactness-preserving.
_GEO_RADIUS = 1.0

_GEO_CUST_SQL = (
    "((c_custkey * 37) % 17000) / 100.0 - 85  AS lat, "
    "((c_custkey * 73) % 36000) / 100.0 - 180 AS lon"
)
_GEO_SUPP_SQL = (
    "((s_suppkey * 41) % 17000) / 100.0 - 85  AS lat, "
    "((s_suppkey * 79) % 36000) / 100.0 - 180 AS lon"
)


@register(
    "q_join_spatial",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, {_GEO_CUST_SQL} FROM customer
    ), s AS (
      SELECT s_suppkey, {_GEO_SUPP_SQL} FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           ROUND(sqrt((c.lat - s.lat) * (c.lat - s.lat)
                    + (c.lon - s.lon) * (c.lon - s.lon)), 6) AS dist
    FROM c JOIN s
      ON (c.lat - s.lat) * (c.lat - s.lat)
       + (c.lon - s.lon) * (c.lon - s.lon) <= {_GEO_RADIUS} * {_GEO_RADIUS}
    """,
)
def q_join_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial distance join: customers matched to suppliers
    within {r} planar degrees.  Points derive deterministically from the
    keys (derive-not-synthesize); the ORACLE runs the naive all-pairs
    distance join, while the Spark plan BLOCKS on grid cells of size r and
    probes only the 3x3 neighborhood — exactness-preserving because a pair
    within r differs by < r per axis, i.e. by at most one cell index.

    Scale: all-pairs is O(|C|·|S|) and dies at 100 TB; the grid join
    shuffles each side once on (cell_lat, cell_lon) — one side replicated
    9x (the explode), candidate pairs bounded by local density, the same
    blocking shape as q_dedup_fuzzy/q_dedup_near.  Planar model (no
    longitude wrap) — a geo deployment swaps in geohash cells + haversine
    verify in the same plan."""
    customer = tables.load(spark, sf_dir, "customer")
    supplier = tables.load(spark, sf_dir, "supplier")
    c = customer.select(
        "c_custkey",
        (((F.col("c_custkey") * 37) % 17000) / 100.0 - 85).alias("lat"),
        (((F.col("c_custkey") * 73) % 36000) / 100.0 - 180).alias("lon"),
    )
    s = supplier.select(
        "s_suppkey",
        (((F.col("s_suppkey") * 41) % 17000) / 100.0 - 85).alias("s_lat"),
        (((F.col("s_suppkey") * 79) % 36000) / 100.0 - 180).alias("s_lon"),
    )
    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    c_cells = (
        c.withColumn("dlat", off)
        .withColumn("dlon", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "c_custkey",
            "lat",
            "lon",
            (F.floor(F.col("lat") / _GEO_RADIUS) + F.col("dlat")).alias("cell_lat"),
            (F.floor(F.col("lon") / _GEO_RADIUS) + F.col("dlon")).alias("cell_lon"),
        )
    )
    s_cells = s.select(
        "s_suppkey",
        "s_lat",
        "s_lon",
        F.floor(F.col("s_lat") / _GEO_RADIUS).alias("cell_lat"),
        F.floor(F.col("s_lon") / _GEO_RADIUS).alias("cell_lon"),
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")
    ) * (F.col("lon") - F.col("s_lon"))
    return (
        c_cells.join(s_cells, ["cell_lat", "cell_lon"])
        .filter(d2 <= _GEO_RADIUS * _GEO_RADIUS)
        .select(
            "c_custkey",
            "s_suppkey",
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
    )


@register(
    "q_train_split",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
             (doc_id * 2654435761) % 1000 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 900 THEN 'train'
                WHEN bucket < 950 THEN 'validation'
                ELSE 'test' END                AS split,
           lang,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)       AS sum_chars,
           ROUND(AVG(n_chars), 4)             AS avg_chars
    FROM assigned
    GROUP BY split, lang
    """,
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test split (90/5/5) by multiplicative
    hashing of the stable document id — the split every training corpus
    needs before packing, with per-(split, lang) coverage stats.

    Hash-based assignment (Knuth's 2654435761 multiplier mod 1000) instead
    of ``rand()``: a re-executed task assigns the same docs to the same
    split (speculative execution / retry safe), new documents never move
    existing ones across splits, and the rule is one integer expression an
    oracle can replicate verbatim. Scale: a map-only projection plus one
    small-key hash aggregate — no shuffle of document text, map-side
    partials on (split, lang).
    """
    docs = tables.load(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000))
    split = (
        F.when(bucket < 900, "train")
        .when(bucket < 950, "validation")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


_CMS_DEPTH = 4      # hash rows (delta = e^-4 ~ 2%)
_CMS_WIDTH = 1024   # buckets per row (eps = e/1024 ~ 0.27% of stream mass)
_CMS_PROBE_K = 10   # heavy hitters probed against the sketch


@register(
    "q_agg_countmin",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM toks GROUP BY token
    )
    SELECT token, exact_n,
           TRUE AS cms_never_under,
           TRUE AS cms_within_bound
    FROM exact
    ORDER BY exact_n DESC, token
    LIMIT {_CMS_PROBE_K}
    """,
)
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimation (Cormode & Muthukrishnan,
    J.Algorithms 2005): token counts folded into a FIXED d×w = 4×1024
    counter grid (xxhash64 row hashes), heavy hitters then estimated as
    the min over rows of their bucket counts.

    Like the HLL queries, sketch internals aren't portable across
    engines, so the oracle pins the CONTRACT on the top-10 exact heavy
    hitters: CMS never underestimates (structural guarantee — every
    occurrence lands in the probed bucket), and overestimates by at most
    1% of total stream mass here (theory: ≤ e/w ≈ 0.27% per row with
    probability 1−e^−d; the fixture evaluation is deterministic, so the
    slack only needs to hold for these corpora, verified at all SFs).

    Scale: the sketch build is explode + groupBy over a key space CAPPED
    at d×w = 4096 buckets — constant memory regardless of corpus size or
    vocabulary, full map-side combine (bucket-wise partial sums ARE the
    sketch-merge operation, so executors combine locally and the shuffle
    moves ≤4096 rows per partition). That's the whole point vs the exact
    vocab count (`q_vocab_topk`), whose key space grows with the corpus.
    The probe side is #probe-keys × d rows joined against the 4096-row
    sketch — both broadcast-sized.
    """
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))

    def buckets(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(r)), F.lit(_CMS_WIDTH)).alias(f"b{r}")
            for r in range(_CMS_DEPTH)
        ]

    # sketch: (row r, bucket) -> count, via posexplode of the d bucket ids
    cms = (
        toks.select(
            F.posexplode(F.array(*buckets(F.col("token")))).alias("r", "bucket")
        )
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("token")).limit(_CMS_PROBE_K)
    total = toks.agg(F.count("*").alias("stream_n"))
    probes = top.select(
        "token",
        "exact_n",
        F.posexplode(F.array(*buckets(F.col("token")))).alias("r", "bucket"),
    )
    est = (
        probes.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "token",
            "exact_n",
            (F.col("cms_est") >= F.col("exact_n")).alias("cms_never_under"),
            (
                F.col("cms_est") - F.col("exact_n")
                <= F.col("stream_n") / F.lit(100)
            ).alias("cms_within_bound"),
        )
        .orderBy(F.desc("exact_n"), F.asc("token"))
    )


_SENT_WORDS = 8          # pseudo-sentence width (fixtures have no newlines)
_SENT_OWNER_PACK = 100000  # owner = doc_id * PACK + sidx (fixture-safe)


@register(
    "q_dedup_sentences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), s AS (
      SELECT doc_id,
             unnest(generate_series(
               0, CAST(FLOOR((n_tok - 1) / {_SENT_WORDS}.0) AS BIGINT))) AS sidx,
             words
      FROM d
    ), sent AS (
      SELECT doc_id, sidx,
             array_to_string(words[(sidx * {_SENT_WORDS} + 1):
                                   (sidx * {_SENT_WORDS} + {_SENT_WORDS})], ' ')
               AS sentence
      FROM s
    ), owner AS (
      SELECT sentence,
             MIN(doc_id * {_SENT_OWNER_PACK} + sidx) AS owner_key
      FROM sent GROUP BY sentence
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(COUNT(*) FILTER (
             WHERE t.doc_id * {_SENT_OWNER_PACK} + t.sidx = o.owner_key
           ) AS BIGINT)             AS n_kept,
           COALESCE(array_to_string(
             list(t.sentence ORDER BY t.sidx) FILTER (
               WHERE t.doc_id * {_SENT_OWNER_PACK} + t.sidx = o.owner_key
             ), ' '), '')           AS cleaned_text
    FROM sent t JOIN owner o USING (sentence)
    GROUP BY t.doc_id
    """,
)
def q_dedup_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-granularity dedup across the corpus (CCNet's paragraph
    dedup, Wenzek et al. 2020): every repeated sentence keeps only its
    FIRST occurrence (min (doc_id, position) — deterministic), and each
    document is reassembled from its surviving sentences. Fixtures have
    no newline structure, so 'sentences' are fixed _SENT_WORDS-word segments —
    real corpora swap the segmenter, the dataflow is identical.

    Scale: segmentation is the q_doc_chunks explode (map-only). The
    keep-first rule is a MIN aggregate per sentence (map-side combinable
    — a boilerplate sentence with 10^9 copies partial-aggregates to one
    row per partition, no skewed window), then an equi-join of segments
    to owners on the sentence key: same key both sides, one shuffle that
    AQE co-partitions. Reassembly is a grouped ordered collect per doc.
    The owner key packs (doc_id, sidx) into one long for a single-column
    MIN; at web scale it becomes struct MIN or a 128-bit pack.
    """
    docs = tables.load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split("text", " ").alias("words"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    sent = (
        d.select(
            "doc_id",
            "words",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("n_tok") - 1) / float(_SENT_WORDS)).cast(
                        "long"
                    ),
                )
            ).alias("sidx"),
        )
        .select(
            "doc_id",
            "sidx",
            F.array_join(
                F.slice(
                    F.col("words"),
                    (F.col("sidx") * _SENT_WORDS + 1).cast("int"),
                    _SENT_WORDS,
                ),
                " ",
            ).alias("sentence"),
        )
    )
    owner = sent.groupBy("sentence").agg(
        F.min(F.col("doc_id") * _SENT_OWNER_PACK + F.col("sidx")).alias(
            "owner_key"
        )
    )
    tagged = sent.join(owner, "sentence").withColumn(
        "is_owner",
        F.col("doc_id") * _SENT_OWNER_PACK + F.col("sidx") == F.col("owner_key"),
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_sentences"),
        F.count(F.when(F.col("is_owner"), 1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_owner"),
                            F.struct("sidx", "sentence"),
                        )
                    )
                ),
                lambda s: s.sentence,
            ),
            " ",
        ).alias("cleaned_text"),
    )


_WEIGHTED_K = 3


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
             FLOOR(-LN((CAST((doc_id * {_LCG_A}) % {_LCG_P} AS DOUBLE) + 1)
                       / {_LCG_P + 1}.0)
                   / NULLIF(CAST(n_chars AS DOUBLE), 0.0)
                   * 1000000000 + 0.5) / 1000000000 AS es_key
      FROM documents
    )
    SELECT doc_id, lang, weight, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY es_key ASC NULLS LAST, doc_id) AS rk
      FROM keyed
    ) WHERE rk <= {_WEIGHTED_K}
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, k per language, by the
    exponential race (A-ES / Efraimidis-Spirakis 2006): each doc gets
    key = -ln(u)/w and the k SMALLEST keys win — inclusion probability
    proportional to weight (here n_chars: longer docs more likely),
    the distributed, single-pass, merge-friendly form of weighted
    reservoir sampling (partial top-k per partition merges to global
    top-k, exactly how Spark's window group-limit executes it).

    Determinism contract: u comes from the registry's multiplicative
    LCG on doc_id — integer arithmetic, bit-identical on both engines —
    and the only libm call (ln of an identical double) can diverge by a
    last ulp, so keys are tie-free-rounded at 9dp with a doc_id
    tiebreak before ranking. Zero weights NULL out (ANSI nullif) and
    sort NULLS LAST on both engines.

    RESIDUAL cross-engine risk (round-3 ADVICE, accepted): the 9dp
    rounding removes ulp-noise everywhere EXCEPT when -ln(u)/w lands
    within an ulp of a 9dp floor boundary, where a JVM-vs-DuckDB libm
    ln() difference could flip the floor and reorder ranks. The inputs
    are LCG residues (effectively uniform), so the per-row probability
    is ~1e-7 at double precision and no fixture or random corpus has
    hit it; if one ever does, the fallback is to ALSO order by the raw
    LCG residue after es_key so a boundary ulp cannot reorder ranks.

    Scale: one scan, one shuffle on lang for the group-limit; no
    sorting of the full table (WindowGroupLimit keeps k per partition
    map-side before the shuffle).
    """
    docs = tables.load(spark, sf_dir, "documents")
    u = (
        (F.pmod(F.col("doc_id") * _LCG_A, F.lit(_LCG_P)).cast("double") + 1)
        / float(_LCG_P + 1)
    )
    es_key = F.floor(
        -F.ln(u)
        / F.nullif(F.col("n_chars").cast("double"), F.lit(0.0))
        * 1000000000
        + 0.5
    ) / 1000000000
    w = W.partitionBy("lang").orderBy(
        F.col("es_key").asc_nulls_last(), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("weight"),
            es_key.alias("es_key"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _WEIGHTED_K)
        .select("doc_id", "lang", "weight", "rk")
    )


@register(
    "q_mix_temperature",
    oracle="""
    WITH per_lang AS (
      SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), scaled AS (
      SELECT lang, n_tokens,
             CAST(FLOOR(SQRT(n_tokens) * 1000000 + 0.5) AS BIGINT) AS s6
      FROM per_lang
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(s6) AS BIGINT) AS z6
      FROM scaled
    )
    SELECT lang, n_tokens,
           FLOOR(n_tokens / CAST(total_tokens AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS actual_share,
           FLOOR(s6 / CAST(z6 AS DOUBLE) * 1000000 + 0.5) / 1000000
             AS sample_share
    FROM scaled, tot
    """,
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling shares (the multilingual
    pre-training standard — mBERT/XLM-R style p_l ∝ n_l^(1/T), here
    T = 2): low-resource languages are upsampled relative to their raw
    token share without the hand-set targets of q_mix_weights. T = 2 is
    not only the common operating point, it makes the scaling an exact
    ``sqrt`` — correctly rounded in IEEE 754 on BOTH engines, unlike a
    generic ``pow(x, 1/T)`` whose libm last-ulp drift is the q_ts_ewma
    lesson.

    The normalizer is summed in INTEGER micro-units, not doubles: a raw
    ``SUM(SQRT(n))`` is an order-dependent float reduction (Spark's
    partial-aggregate order differs from DuckDB's row order), so z could
    drift by an ulp and flip the floor-rounded share on a boundary
    (round-3 ADVICE). Each sqrt is floor-scaled to a BIGINT s6 =
    floor(sqrt(n)*1e6+0.5) first — sqrt is correctly rounded and the
    scaling deterministic on both engines — and integer summation is
    exact and order-free; shares divide the identical s6/z6 integers.

    Scale: one scan + a ~|langs|-row aggregate; the normalizer is a
    1-row frame broadcast back (the q_mix_weights pattern). The shares
    feed the SAME deterministic md5-keep machinery as q_mix_sample for
    the materialized corpus.
    """
    docs = tables.load(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ")))
        .cast("long")
        .alias("n_tokens")
    )
    scaled = per_lang.withColumn(
        "s6",
        F.floor(F.sqrt("n_tokens") * 1000000 + F.lit(0.5)).cast("long"),
    )
    tot = scaled.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("s6").cast("long").alias("z6"),
    )
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000
    return scaled.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        r6(F.col("n_tokens") / F.col("total_tokens").cast("double")).alias(
            "actual_share"
        ),
        r6(F.col("s6") / F.col("z6").cast("double")).alias("sample_share"),
    )


_SHUF_SHARDS = 32  # output shards of the shuffled corpus (files at scale)


@register(
    "q_corpus_shuffle",
    oracle=f"""
    SELECT CAST((doc_id * {_LCG_A}) % {_LCG_P} % {_SHUF_SHARDS} AS INT)
             AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY (doc_id * {_LCG_A}) % {_LCG_P} % {_SHUF_SHARDS}
             ORDER BY (doc_id * {_LCG_A}) % {_LCG_P}, doc_id
           ) AS BIGINT) AS pos,
           doc_id
    FROM documents
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets a
    reproducible (shard, pos) address — the corpus-reordering step before
    sequence packing (training loaders must not see documents in crawl
    order, and ``rand()`` re-rolls on task retry; the LCG scramble of the
    stable id does not).

    The permutation is TWO-LEVEL on purpose: a global ``ROW_NUMBER`` over
    the scrambled key would funnel the whole corpus through one window
    partition — the classic driver-shaped bottleneck. Instead the
    scrambled key picks one of 32 shards and the position is
    ranked WITHIN the shard (parallel windows, one shuffle on the shard
    key); consumers read shards in order — exactly how sharded training
    corpora are laid out on disk. The reader-visible order (shard, pos)
    is a deterministic permutation: position ties are broken by doc_id
    under the scrambled-key ordering.

    Scale: one hash shuffle on an 8-byte shard key + per-shard sort;
    at 100 TB this is a TeraSort-shaped exchange (range-balanced by the
    LCG's uniformity), never a single-partition window. Only ids move —
    text joins back by doc_id at write time.

    Domain bound (documented, not silent): ``doc_id * _LCG_A`` is an
    int64 multiply, so ids must stay below 2^63 / 2654435761 ≈ 3.47e9
    or ANSI Spark (and DuckDB) raise an overflow error — fail-loud, no
    cross-engine divergence. A corpus with wider ids should scramble
    with an overflow-free mix instead (e.g. ``pmod(xxhash64(doc_id),
    _LCG_P)``); that form has no DuckDB-matching oracle (xxhash64 seed
    parity), which is why the oracle-checked registry entry keeps the
    exact-integer LCG with the stated bound.
    """
    docs = tables.load(spark, sf_dir, "documents")
    key = (F.col("doc_id") * _LCG_A) % _LCG_P
    shard = (key % _SHUF_SHARDS).cast("int")
    w = W.partitionBy("shard").orderBy("key", "doc_id")
    return (
        docs.select("doc_id", key.alias("key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("shard", "pos", "doc_id")
    )


_COVERAGE_VOCAB_K = 500


@register(
    "q_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ), vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS n FROM toks GROUP BY token
        ORDER BY n DESC, token LIMIT {_COVERAGE_VOCAB_K}
      )
    ), per_lang AS (
      SELECT t.lang,
             CAST(COUNT(*) AS BIGINT) AS total_occ,
             CAST(COUNT(v.token) AS BIGINT) AS covered_occ,
             CAST(COUNT(DISTINCT t.token) AS BIGINT) AS n_types,
             CAST(COUNT(DISTINCT v.token) AS BIGINT) AS covered_types
      FROM toks t LEFT JOIN vocab v ON v.token = t.token
      GROUP BY t.lang
    )
    SELECT lang, total_occ, covered_occ, n_types, covered_types,
           FLOOR((1.0 - CAST(covered_occ AS DOUBLE)
                        / CAST(total_occ AS DOUBLE)) * 1000000 + 0.5)
             / 1000000 AS oov_rate
    FROM per_lang
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV-rate report per language: build the
    top-{K} global token vocabulary (count DESC, token ASC — a total
    order, so the cutoff is engine-deterministic under ties), then
    measure, per language, what fraction of token OCCURRENCES and of
    distinct token TYPES the vocab covers — the tokenizer-fit check run
    before committing a vocab to a multilingual training mix (a lang
    with high OOV under a shared vocab gets byte-fallback explosion).

    oov_rate is an exact integer ratio — displayed with the tie-safe
    floor-scale form on both sides (the ROUND half-way class).

    Scale: token histogram gets full map-side combine; the vocab is
    LIMIT {K} = broadcast-sized by construction, so the coverage join
    is a broadcast hash join — no shuffle of the token stream; the
    per-lang aggregate is a |langs|-row reduce. The two COUNT(DISTINCT)
    expand-and-dedup on (lang, token) — one extra shuffle, bounded by
    the type space, not the occurrence count.
    """
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(_COVERAGE_VOCAB_K)
        .select(F.col("token").alias("vtoken"))
    )
    joined = toks.join(
        F.broadcast(vocab), toks["token"] == vocab["vtoken"], "left"
    )
    per_lang = joined.groupBy("lang").agg(
        F.count("*").cast("long").alias("total_occ"),
        F.count("vtoken").cast("long").alias("covered_occ"),
        F.countDistinct("token").cast("long").alias("n_types"),
        F.countDistinct("vtoken").cast("long").alias("covered_types"),
    )
    oov = F.lit(1.0) - F.col("covered_occ").cast("double") / F.col(
        "total_occ"
    ).cast("double")
    return per_lang.select(
        "lang",
        "total_occ",
        "covered_occ",
        "n_types",
        "covered_types",
        (F.floor(oov * 1000000 + F.lit(0.5)) / 1000000).alias("oov_rate"),
    )


_NEG_K = 3           # negatives per order
_NEG_A = 48271       # MINSTD multiplier: o*A fits int64 for o < 1.9e14
_NEG_B = 16807
_NEG_P = 2147483647  # 2^31 - 1


@register(
    "q_sample_negative",
    oracle=f"""
    WITH mx AS (
      SELECT CAST(MAX(p_partkey) AS BIGINT) AS max_pk FROM part
    ), cand AS (
      SELECT o.o_orderkey,
             CAST((o.o_orderkey * {_NEG_A} + t.i * {_NEG_B})
                  % {_NEG_P} % mx.max_pk + 1 AS BIGINT) AS neg_partkey,
             CAST(t.i AS BIGINT) AS slot
      FROM orders o
      CROSS JOIN mx
      CROSS JOIN UNNEST(range(1, {_NEG_K + 1})) AS t(i)
    )
    SELECT c.o_orderkey, c.slot, c.neg_partkey
    FROM cand c
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = c.o_orderkey AND l.l_partkey = c.neg_partkey
    )
    """,
)
def q_sample_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: for every order, {k} candidate
    parts drawn by an LCG of (orderkey, slot), keeping only candidates
    the order did NOT purchase — the contrastive-pair generation step of
    every two-tower / recsys / embedding training pipeline, with the
    q_corpus_shuffle determinism argument (``rand()`` re-rolls on task
    retry; the LCG of stable keys never does; collisions with true
    positives drop by the same verified rule on both engines, so the
    effective negative count per order is data-dependent and exact).

    Integer bounds: MINSTD constants keep ``o_orderkey * A`` exact in
    int64 for keys < 1.9e14 (vs the corpus-shuffle Knuth multiplier's
    3.5e9 bound — chosen smaller here precisely because orderkeys grow
    faster than doc ids; ANSI overflow fails loud past it).

    Scale: candidates are generated map-side (explode of a {k}-literal
    sequence — no shuffle); the verification is ONE left-anti join
    keyed (orderkey, partkey) — co-partitioned with the fact table's
    natural layout, the same exchange any order-grain join pays. The
    1-row max-partkey frame broadcasts.
    """
    orders = tables.load(spark, sf_dir, "orders").select("o_orderkey")
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    mx = tables.load(spark, sf_dir, "part").agg(
        F.max("p_partkey").cast("long").alias("max_pk")
    )
    cand = (
        orders.crossJoin(F.broadcast(mx))
        .select(
            "o_orderkey",
            F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))).alias("slot"),
            "max_pk",
        )
        .select(
            "o_orderkey",
            F.col("slot").cast("long").alias("slot"),
            (
                (F.col("o_orderkey") * _NEG_A + F.col("slot") * _NEG_B)
                % _NEG_P
                % F.col("max_pk")
                + 1
            ).alias("neg_partkey"),
        )
    )
    return cand.join(
        li,
        (cand["o_orderkey"] == li["l_orderkey"])
        & (cand["neg_partkey"] == li["l_partkey"]),
        "left_anti",
    ).select("o_orderkey", "slot", "neg_partkey")


_MANIFEST_SHARDS = 16


@register(
    "q_corpus_manifest",
    oracle=f"""
    SELECT doc_id % {_MANIFEST_SHARDS} AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
           MIN(md5(text)) AS min_md5,
           MAX(md5(text)) AS max_md5
    FROM documents GROUP BY 1
    """,
)
def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-publishing manifest: the per-shard summary a pipeline
    writes NEXT TO the dataset it ships — deterministic shard assignment
    (doc_id mod {_MANIFEST_SHARDS}), document and byte totals, and
    order-insensitive content anchors (min/max md5 of the text) that a
    consumer re-derives to detect truncation, reordering-with-loss, or
    silent corruption without re-reading counts from the producer.

    Portability: md5 hex is the one content hash both engines spell
    identically (the q_text_fingerprint choice); min/max over the hex
    strings are order-insensitive and NULL-skipping on both, so the
    manifest is reproducible from the data alone on any engine.

    Scale: one scan, {_MANIFEST_SHARDS}-key partial-agg — the manifest
    costs what a count(*) costs. Real shard files would be written with
    ``partitionBy(shard)`` from the same projection; the manifest
    aggregate IS the verification artifact for that layout.
    """
    docs = tables.load(spark, sf_dir, "documents")
    return (
        docs.select(
            (F.col("doc_id") % _MANIFEST_SHARDS).alias("shard"),
            "n_chars",
            F.md5(F.col("text")).alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
            F.min("h").alias("min_md5"),
            F.max("h").alias("max_md5"),
        )
    )
