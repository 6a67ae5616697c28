"""Deduplication operators for LLM training-data pipelines.

Four strategies over ``documents``:

* **exact** — hash-groupBy on ``sha2(text)``: one shuffle keyed by digest,
  arbitrarily scalable, the first pass any 100 TB dedup runs.
* **MinHash + LSH** — 64 permutations over 3-word shingles, banded 32×2, a
  self-join on (band, key) to propose candidates, then an exact Jaccard
  verify. Candidate generation is linear in corpus size + quadratic only
  inside a bucket; the verify re-reads only candidate pairs.
* **n-gram Jaccard (exact)** — inverted-index self-join on shingles
  (explode → join → count common), never a crossJoin: only pairs sharing at
  least one shingle are materialized. This is the exact counterpart the LSH
  path approximates.
* **SimHash** — 64-bit signature from per-word hash bit-votes; Hamming-
  distance blocking on 4×16-bit bands (a pair within distance 3 must agree
  on at least one band). Spark-only hash (xxhash64) → rows-only check.

All hashing is JVM-side (``xxhash64`` / ``sha2``) — no Python in the hot
path. Everything is deterministic: fixed permutation constants, no RNG.

Scale notes: at 100 TB, exact-dedup FIRST (collapse identical texts to one
representative) so LSH buckets don't go quadratic on exact-duplicate
clusters; the band join is a plain shuffle on (band_idx, band_key) and AQE
splits skewed buckets. The fixtures have no exact dups, so semantics here
are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from .registry import register

# MinHash parameters — fixed, deterministic. Universal-hash family
# h_i(x) = (a_i * x + b_i) mod P over x in [0, 2^32).
_P = 4294967311  # prime > 2^32
_N_PERM = 64
_BANDS = 32  # 2 rows per band
# Deterministic constants from a small LCG (seed 42), odd a_i in [1, 2^30).
def _perm_constants() -> list[tuple[int, int]]:
    out, state = [], 42
    for _ in range(_N_PERM):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % ((1 << 30) - 1)) | 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        out.append((a, b))
    return out


_PERMS = _perm_constants()

_NEAR_DUP_THRESHOLD = 0.8
_NGRAM_THRESHOLD = 0.5


def _shingles(text_col: str = "text"):
    """Distinct 3-word shingles of a space-tokenized document (JVM-side)."""
    words = F.split(F.col(text_col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i),
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
            ),
        )
    )


def _shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id", _shingles().alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))


def _exact_jaccard_pairs(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Verify candidate (doc_a, doc_b) pairs with exact shingle Jaccard."""
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (F.col("na") + F.col("nb") - common).cast("double")
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_NGRAM_ORACLE_TEMPLATE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w.words[i:i+2], ' ')
                            for i in range(1, len(w.words)-1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
    ), inv AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS n_common
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b,
           ROUND(n_common * 1.0 / (na + nb - n_common), 4) AS jaccard
    FROM common
    WHERE ROUND(n_common * 1.0 / (na + nb - n_common), 4) >= {threshold}
"""


@register(
    "q_dedup_exact",
    oracle="""
    SELECT sha256(text)          AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           COUNT(*)              AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the lowest doc_id.

    Scale: the shuffle key is the 256-bit digest (uniform — no skew); the
    text column itself never crosses the wire, only (digest, doc_id).
    """
    docs = tables.load(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@register(
    "q_dedup_near",
    oracle=_NGRAM_ORACLE_TEMPLATE.format(threshold=_NEAR_DUP_THRESHOLD),
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: MinHash (64 perms) → LSH banding (32×2) →
    exact-Jaccard verify at 0.8.

    With 32 bands of 2 rows, a true 0.8-Jaccard pair is missed with
    probability (1 - 0.8²)³² ≈ 6e-15 — the oracle (exact all-pairs-sharing-
    a-shingle Jaccard) and this approximate plan agree on real data.
    Scale: candidates come from a shuffle on (band_idx, band_key); nothing
    is quadratic in the corpus, only in bucket occupancy.
    """
    sh = _shingled_docs(spark, sf_dir)

    h32 = F.transform(
        F.col("shingles"), lambda s: F.xxhash64(s).bitwiseAND(F.lit(4294967295))
    )
    sig_cols = [
        F.array_min(
            F.transform(F.col("h32"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_P))
        )
        for (a, b) in _PERMS
    ]
    signed = sh.withColumn("h32", h32).select(
        "doc_id", F.array(*sig_cols).alias("sig")
    )
    band_keys = F.array(
        *[
            F.xxhash64(
                F.element_at("sig", 2 * j + 1), F.element_at("sig", 2 * j + 2)
            )
            for j in range(_BANDS)
        ]
    )
    banded = signed.select(
        "doc_id", F.posexplode(band_keys).alias("band_idx", "band_key")
    )
    left = banded.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_key"
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_key"
    )
    cands = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _exact_jaccard_pairs(cands, sh, _NEAR_DUP_THRESHOLD)


@register(
    "q_dedup_ngram",
    oracle=_NGRAM_ORACLE_TEMPLATE.format(threshold=_NGRAM_THRESHOLD),
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted index.

    explode(shingles) → self-join on the shingle → count common shingles per
    pair → Jaccard from the precomputed set sizes. Only pairs sharing ≥1
    shingle ever materialize — no crossJoin. Scale: join key is the shingle
    string; frequency-skewed shingles are the hazard, so a production run
    drops stop-shingles (document frequency cap) first — at this corpus the
    skew is harmless and AQE handles it.
    """
    sh = _shingled_docs(spark, sf_dir)
    inv = sh.select(
        "doc_id", "n_sh", F.explode("shingles").alias("shingle")
    )
    a = inv.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = inv.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    ).cast("double")
    return (
        common.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


@register("q_dedup_simhash", oracle=None)  # xxhash64-based → rows-only check
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signature = sign of per-bit votes from word
    hashes; pairs within Hamming distance 3, blocked on 4×16-bit bands
    (pigeonhole: distance ≤3 ⇒ ≥1 of 4 bands identical).

    Deterministic (xxhash64) but not oracle-expressible in portable SQL →
    rows-only check; the unit tests assert it finds the same pairs as the
    exact Jaccard join at high threshold.
    """
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.array_distinct(F.split(F.col("text"), " "))
    hashes = F.transform(words, F.xxhash64)

    # bit b vote: count of words with bit set minus words with bit clear >0
    def bit(h, b):
        return F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))

    sig = None
    votes = docs.select("doc_id", hashes.alias("hs"), F.size(words).alias("nw"))
    bit_cols = []
    for b in range(64):
        ones = F.aggregate(
            F.col("hs"), F.lit(0), lambda acc, h: acc + bit(h, b).cast("int")
        )
        bit_cols.append((2 * ones > F.col("nw")).cast("long") * F.lit(1 << b if b < 63 else -(1 << 63)))
    sig = votes.select(
        "doc_id",
        sum(bit_cols[1:], bit_cols[0]).alias("simhash"),
    )
    band_keys = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), 16 * j).bitwiseAND(F.lit(0xFFFF))
            for j in range(4)
        ]
    )
    banded = sig.select(
        "doc_id", "simhash", F.posexplode(band_keys).alias("band_idx", "band_key")
    )
    left = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
        "band_idx", "band_key",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
        "band_idx", "band_key",
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
