"""Scalar expression library: string / date / math / array / json / url.

All JVM-side built-ins (``pyspark.sql.functions``) — no Python in the hot
path, so every one of these stays inside whole-stage codegen and scales
linearly with input splits.

JSON parity note: the reference never parses payload JSON (frames are opaque
bytes, ``/root/reference/src/wsclient.hpp:59``); parsing is an extension the
batch surface adds (SURVEY.md §1.4). URL parsing parity: the reference's
``Uri::Parse`` (``/root/reference/src/uri.hpp:13-81``) maps to the engine's
``parse_url`` usage here, and to ``ws_to_kafka_spark.uri`` at the source
level. The oracle *constructs* host/path/query independently from the same
components, so it genuinely checks the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           LOWER(p_type)                                    AS type_lower,
           LENGTH(p_name)                                   AS name_len,
           SUBSTRING(p_name, 1, 8)                          AS name_prefix,
           CONCAT(p_brand, ':', p_type)                     AS brand_type,
           REPLACE(p_type, ' ', '_')                        AS type_snake,
           regexp_extract(p_name, '^([a-zA-Z]+)', 1)        AS first_word,
           split_part(p_type, ' ', 1)                       AS type_head,
           CONTAINS(p_name, 'a')                            AS has_a,
           TRIM(LPAD(p_brand, 12, ' '))                     AS brand_trim
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, length, substring, concat, replace, regexp,
    split, contains, pad/trim."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_name", r"^([a-zA-Z]+)", 1).alias("first_word"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.col("p_name").contains("a").alias("has_a"),
        F.trim(F.lpad("p_brand", 12, " ")).alias("brand_trim"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)                    AS order_year,
           EXTRACT(month FROM o_orderdate)                   AS order_month,
           EXTRACT(day FROM o_orderdate)                     AS order_day,
           EXTRACT(quarter FROM o_orderdate)                 AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE)    AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
                                                             AS days_to_eoy,
           CAST(o_orderdate AS DATE) + 30                    AS due_date,
           last_day(CAST(o_orderdate AS DATE))               AS month_end
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions: extract, trunc, diff, add, last_day."""
    orders = _t(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), odate).alias("days_to_eoy"),
        F.date_add(odate, 30).alias("due_date"),
        F.last_day(odate).alias("month_end"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_price,
           ABS(l_discount - 0.05)                            AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT)                  AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT)                 AS qty_floor,
           ROUND(SQRT(l_extendedprice), 6)                   AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6)                 AS price_ln,
           ROUND(POWER(1 + l_tax, 2), 6)                     AS tax_sq,
           CAST(l_orderkey % 7 AS BIGINT)                    AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE)           AS disc_sign,
           GREATEST(l_quantity, 10.0)                        AS qty_floor10,
           LEAST(l_discount, l_tax)                          AS min_rate
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: round/abs/ceil/floor/sqrt/ln/power/mod/sign/
    greatest/least. Transcendentals are rounded to 6dp — libm vs JVM can
    differ in the last ulp. ``net_price`` uses the tie-free formula
    ``floor(x*100 + 0.5)/100`` on BOTH sides: engines disagree on ROUND's
    half-way ties (HALF_UP on decimal repr vs round-half-even on double),
    but this formula is the same float ops in the same order everywhere."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5) / 100
        ).alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_quantity", F.lit(10.0)).alias("qty_floor10"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                          AS n_words,
           len(list_distinct(string_split(text, ' ')))           AS n_unique_words,
           list_contains(string_split(text, ' '), 'data')        AS mentions_data,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
                                                                 AS first3_sorted,
           string_split(text, ' ')[1]                            AS head_word
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: split/size/distinct/contains/sort/slice/element_at —
    all JVM higher-order functions, no UDF."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    words = F.col("w")  # materialized once — inline split would re-tokenize
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_unique_words"),
        F.array_contains(words, "data").alias("mentions_data"),
        F.concat_ws(",", F.slice(F.sort_array(F.array_distinct(words)), 1, 3)).alias(
            "first3_sorted"
        ),
        F.element_at(words, 1).alias("head_word"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                  AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_int,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_gt_50
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the opaque ``props`` payload — the batch-side
    analogue of parsing the reference's opaque WS frames (which the reference
    itself never does: /root/reference/src/wsclient.hpp:59)."""
    events = _t(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    return events.select(
        "event_id",
        k_str.alias("k_str"),
        k_str.cast("long").alias("k_int"),
        (k_str.cast("long") > 50).alias("k_gt_50"),
    )


@register(
    "q_fn_url",
    oracle="""
    SELECT doc_id,
           source || '.example.com'                      AS host,
           '/docs/' || lang                              AS path,
           'id=' || doc_id || '&src=' || source          AS query,
           CAST(doc_id AS VARCHAR)                       AS qparam_id
    FROM documents
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing parity with the reference's Uri::Parse
    (/root/reference/src/uri.hpp:13-81): build a URL from fixture columns,
    then parse host/path/query back out with ``parse_url``. The oracle
    constructs the expected pieces directly, so any parser defect shows."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("?id="),
        F.col("doc_id"),
        F.lit("&src="),
        F.col("source"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("qparam_id"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255                         AS key_and,
           p_partkey | 4096                        AS key_or,
           xor(p_partkey, CAST(p_size AS BIGINT))  AS key_xor,
           CAST(p_size AS BIGINT) << 3             AS size_shl,
           p_partkey >> 2                          AS key_shr,
           CAST(bit_count(p_partkey) AS BIGINT)    AS key_bits,
           (p_partkey >> 4) & 1                    AS bit4,
           hex(p_partkey)                          AS key_hex
    FROM part
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise functions: and/or/xor, shifts, popcount, bit probe, hex.

    The engine's hash/LSH family (dedup.py, similarity.py) is built on
    exactly these primitives — this query pins their scalar semantics
    against the oracle on their own.  All JVM built-ins; hex() agrees
    across engines for the non-negative key domain (both print uppercase,
    no leading zeros)."""
    part = _t(spark, sf_dir, "part")
    key = F.col("p_partkey")
    size_l = F.col("p_size").cast("long")
    return part.select(
        "p_partkey",
        key.bitwiseAND(F.lit(255)).alias("key_and"),
        key.bitwiseOR(F.lit(4096)).alias("key_or"),
        key.bitwiseXOR(size_l).alias("key_xor"),
        F.expr("shiftleft(cast(p_size AS bigint), 3)").alias("size_shl"),
        F.expr("shiftright(p_partkey, 2)").alias("key_shr"),
        F.bit_count(key).cast("long").alias("key_bits"),
        F.expr("(p_partkey >> 4) & 1").alias("bit4"),
        F.hex(key).alias("key_hex"),
    )


@register(
    "q_fn_struct",
    oracle="""
    SELECT p_partkey,
           p_brand                                      AS brand,
           CAST(p_size AS BIGINT)                       AS size,
           UPPER(p_type)                                AS typ_upper,
           split_part(p_type, ' ', 1)                   AS head_w,
           CAST(1 AS BIGINT)                            AS head_n,
           words[-1]                                    AS tail_w,
           CAST(len(words) AS BIGINT)                   AS tail_n,
           to_json(struct_pack(brand := p_brand,
                               size := p_size))          AS s_json
    FROM (SELECT *, string_split(p_type, ' ') AS words FROM part)
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested/struct data handling: build structs, nest them, read fields
    back through the dotted path, zip an array into array<struct>, index it
    from both ends, and serialize a struct to JSON.

    The oracle computes every output from the flat columns directly, so any
    defect in the struct plumbing (field order, nested access, struct
    transform lambdas) surfaces as a value mismatch.  Catalyst flattens all
    of this back to column references — structs are a logical-plan
    convenience with zero physical cost, which is why the engine can use
    them freely in operator internals (e.g. max(struct(...)) argmax)."""
    part = _t(spark, sf_dir, "part")
    s = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
    nested = F.struct(s.alias("dims"), F.col("p_type").alias("typ"))
    words = F.split("p_type", " ")
    pairs = F.transform(
        words,
        lambda w, i: F.struct(w.alias("w"), (i + F.lit(1)).cast("long").alias("n")),
    )
    head = F.element_at(pairs, 1)
    tail = F.element_at(pairs, -1)
    return part.select(
        "p_partkey",
        nested["dims"]["brand"].alias("brand"),
        nested["dims"]["size"].cast("long").alias("size"),
        F.upper(nested["typ"]).alias("typ_upper"),
        head["w"].alias("head_w"),
        head["n"].alias("head_n"),
        tail["w"].alias("tail_w"),
        tail["n"].alias("tail_n"),
        F.to_json(s).alias("s_json"),
    )


_JSON_AUG_SQL = """
    CASE WHEN event_id % 10 = 9
         THEN '{"id": ' || event_id || ', "tags": ["' || event_type
         ELSE '{"id": ' || event_id || ', "tags": ["' || event_type
              || '", "t' || (user_id % 5) || '"], "geo": {"lat": '
              || (user_id % 180) - 90 || ', "lon": ' || (user_id % 360) - 180
              || '}}'
    END
"""


@register(
    "q_fn_json_schema",
    oracle=f"""
    WITH aug AS (
      SELECT event_id, {_JSON_AUG_SQL} AS j FROM events
    )
    SELECT event_id,
           CASE WHEN json_valid(j)
                THEN CAST(json_extract_string(j, '$.id') AS BIGINT) END
             AS id_parsed,
           CASE WHEN json_valid(j)
                THEN json_extract_string(j, '$.tags[0]') END AS tag0,
           CASE WHEN json_valid(j)
                THEN CAST(json_array_length(j, '$.tags') AS BIGINT) END
             AS n_tags,
           CASE WHEN json_valid(j)
                THEN CAST(json_extract_string(j, '$.geo.lat') AS BIGINT) END
             AS lat,
           NOT json_valid(j) AS corrupt
    FROM aug
    """,
)
def q_fn_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON: ``from_json`` with a TYPED nested schema
    (struct + array + nested struct) instead of per-path string extraction
    (q_fn_json) — one parse per row serving every field, with malformed
    rows (every 10th payload is truncated, derived deterministically)
    yielding a NULL struct that downstream logic must handle.

    Scale: typed parse is the right form when several fields are read —
    ``get_json_object`` re-parses the payload per path; ``from_json``
    parses once into Tungsten structs and the field reads are free."""
    events = _t(spark, sf_dir, "events")
    good = F.concat(
        F.lit('{"id": '),
        F.col("event_id"),
        F.lit(', "tags": ["'),
        F.col("event_type"),
        F.lit('", "t'),
        F.col("user_id") % 5,
        F.lit('"], "geo": {"lat": '),
        (F.col("user_id") % 180) - 90,
        F.lit(', "lon": '),
        (F.col("user_id") % 360) - 180,
        F.lit("}}"),
    )
    corrupt = F.concat(
        F.lit('{"id": '), F.col("event_id"), F.lit(', "tags": ["'),
        F.col("event_type"),
    )
    j = F.when(F.col("event_id") % 10 == 9, corrupt).otherwise(good)
    schema = "id BIGINT, tags ARRAY<STRING>, geo STRUCT<lat: BIGINT, lon: BIGINT>"
    parsed = F.from_json(j, schema)
    return events.select(
        "event_id",
        parsed["id"].alias("id_parsed"),
        F.element_at(parsed["tags"], 1).alias("tag0"),
        F.size(parsed["tags"]).cast("long").alias("n_tags"),
        parsed["geo"]["lat"].alias("lat"),
        parsed["id"].isNull().alias("corrupt"),
    )


@register(
    "q_fn_regex",
    oracle=r"""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT) AS n_long_words,
           regexp_extract(text, 's([a-z]+)', 1)                       AS first_s_stem,
           regexp_replace(SUBSTRING(text, 1, 40), '[aeiou]', '', 'g') AS head_devoweled,
           regexp_matches(text, 'spark\s+(scan|join|merge)')          AS spark_op_mention
    FROM documents
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: extract-all + count, group extraction,
    global replace, and pattern test — the text-wrangling quartet.

    Semantics aligned across engines: both return '' (not NULL) for a
    non-matching extract; DuckDB needs the 'g' flag to match Spark's
    replace-all default. All four run inside whole-stage codegen on a
    pruned (doc_id, text) scan — regexes compile once per task, so at
    100 TB this is a map-only pass at scan speed.
    """
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]{6,}"), 0))
        .cast("long")
        .alias("n_long_words"),
        F.regexp_extract("text", r"s([a-z]+)", 1).alias("first_s_stem"),
        F.regexp_replace(F.substring("text", 1, 40), r"[aeiou]", "").alias(
            "head_devoweled"
        ),
        F.col("text").rlike(r"spark\s+(scan|join|merge)").alias("spark_op_mention"),
    )


@register(
    "q_fn_array_hof",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT)
                                                           AS total_chars,
           CAST(len(list_filter(words, x -> length(x) > 6)) AS BIGINT)
                                                           AS n_long_words,
           list_has_any(words, ['the', 'a'])               AS has_article,
           CAST(list_max(list_transform(words, x -> length(x))) AS BIGINT)
                                                           AS max_word_len
    FROM w
    """,
)
def q_fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order functions — ``transform`` / ``filter`` /
    ``aggregate`` (fold) / ``exists`` — the array-processing surface that
    replaces per-row Python UDFs with codegen'd JVM lambdas.

    The fold accumulates LONG (int arithmetic — hash-safe, no float
    drift). Scale: HOFs evaluate per row inside the scan projection —
    map-only, no shuffle, no Python worker; this is the form every
    "loop over the array column" request should take before reaching for
    ``explode`` (one output row per element, a generator) or a pandas UDF
    (Arrow transfer). The words array is materialized ONCE in a prior
    projection — an inline split() per HOF reference would re-tokenize
    per expression (the perf gotcha q_fn_array documents).
    """
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("words"),
    ).select(
        "doc_id",
        "words",
        # lengths materialized ONCE — total_chars and max_word_len both
        # read it; two inline transform() calls would build it twice/row
        F.transform(F.col("words"), lambda x: F.length(x).cast("long")).alias(
            "lens"
        ),
    )
    words = F.col("words")
    return docs.select(
        "doc_id",
        F.aggregate(
            F.col("lens"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_chars"),
        F.size(F.filter(words, lambda x: F.length(x) > 6))
        .cast("long")
        .alias("n_long_words"),
        F.exists(words, lambda x: (x == "the") | (x == "a")).alias(
            "has_article"
        ),
        F.array_max(F.col("lens")).alias("max_word_len"),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           CAST(NULL AS BIGINT)                              AS missing_path,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0)
                                                             AS k_mod10
    FROM events
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured handling (new in Spark 4): ``parse_json``
    into the binary VARIANT encoding once, then typed ``variant_get``
    path extraction — the schema-on-read form that replaces repeated
    string re-parsing of a JSON column (`q_fn_json`) with one decode
    whose paths are lazily navigated. ``try_variant_get`` on an absent
    path yields NULL instead of raising — the lenient probe an evolving
    event schema needs. The oracle states the same values via DuckDB's
    JSON path functions.

    Scale: VARIANT columns shred/prune like any binary column; the
    parse is per-row scan work (codegen), no shuffle. At 100 TB the win
    over string JSON is parsing ONCE per row for any number of path
    reads."""
    ev = _t(spark, sf_dir, "events").select("event_id", "props")
    v = F.parse_json(F.col("props"))
    parsed = ev.select("event_id", v.alias("v"))
    k = F.expr("variant_get(v, '$.k', 'long')")
    return parsed.select(
        "event_id",
        k.alias("k_typed"),
        F.expr("try_variant_get(v, '$.absent.path', 'long')").alias(
            "missing_path"
        ),
        (k % 10 == 0).alias("k_mod10"),
    )


@register(
    "q_fn_collation",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)  AS n_ci_match,
           TRUE                      AS matched_case_insensitively
    FROM orders
    WHERE lower(o_orderpriority) IN ('1-urgent', '2-high')
    GROUP BY o_orderpriority
    """,
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (new in Spark 4): comparisons under
    ``UTF8_LCASE`` match case-insensitively at the COMPARISON level — the
    stored bytes are untouched (the oracle mirrors with ``lower()``,
    which is the pre-collation workaround that loses the original case;
    collation keeps it, as the un-lowered group key in the output
    shows).

    Scale: collation-aware equality is scan-level work and collated
    grouping keys hash consistently — no extra pass, unlike the
    lower()-projection workaround which doubles the string column in
    flight."""
    orders = _t(spark, sf_dir, "orders")
    pri_ci = F.collate(F.col("o_orderpriority"), "UTF8_LCASE")
    return (
        orders.where(pri_ci.isin("1-urgent", "2-high"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_ci_match"))
        .select(
            "o_orderpriority",
            "n_ci_match",
            F.lit(True).alias("matched_case_insensitively"),
        )
    )


@register(
    "q_fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                           AS bal_band,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                                                          AS is_building,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'masked')
                                                          AS segment_masked,
           CASE WHEN NULLIF(c_mktsegment, 'MACHINERY') IS NOT NULL
                THEN 'kept' ELSE 'was-machinery' END      AS nvl2_segment,
           ROUND(GREATEST(c_acctbal, 0.0), 2)             AS bal_clamped
    FROM customer
    """,
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: multi-branch CASE, IF, NULLIF+COALESCE
    masking, NVL2 presence dispatch, and clamping — the expressions every
    derived-column layer is built from. All codegen'd branches inside the
    scan projection; short-circuit evaluation means no branch cost beyond
    the taken one."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .cast("int")
        .alias("is_building"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")),
            F.lit("masked"),
        ).alias("segment_masked"),
        F.nvl2(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")),
            F.lit("kept"),
            F.lit("was-machinery"),
        ).alias("nvl2_segment"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias(
            "bal_clamped"
        ),
    )


@register(
    "q_fn_map_hof",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS doubled_half,
           CAST(CASE WHEN o_totalprice > 1000 THEN 1 ELSE 0 END
              + CASE WHEN o_totalprice / 2 > 1000 THEN 1 ELSE 0 END
              AS BIGINT)          AS n_over_1000,
           ROUND(o_totalprice + 1.0, 2) AS zipped_base,
           'BASE,HALF'           AS upper_keys
    FROM orders
    """,
)
def q_fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — ``transform_values``, ``map_filter``,
    ``map_zip_with``, ``transform_keys`` — with an oracle that states each
    expected value from first principles (the lambdas are chosen so the
    float round-trips are exact: x/2*2 == x in IEEE).

    Scale: like the array HOFs, map lambdas run per-row inside the scan
    projection — map-only, no shuffle, no UDF; this is the form keyed
    per-row state takes before reaching for explode or Python.
    """
    orders = tables.load(spark, sf_dir, "orders")
    m1 = F.create_map(
        F.lit("base"), F.col("o_totalprice"),
        F.lit("half"), F.col("o_totalprice") / 2,
    )
    m2 = F.create_map(F.lit("base"), F.lit(1.0), F.lit("half"), F.lit(2.0))
    doubled = F.transform_values(m1, lambda k, v: v * 2)
    filtered = F.map_filter(m1, lambda k, v: v > 1000)
    zipped = F.map_zip_with(m1, m2, lambda k, v1, v2: v1 + v2)
    upper = F.transform_keys(m1, lambda k, v: F.upper(k))
    return orders.select(
        "o_orderkey",
        F.round(F.element_at(doubled, "half"), 2).alias("doubled_half"),
        F.size(filtered).cast("long").alias("n_over_1000"),
        F.round(F.element_at(zipped, "base"), 2).alias("zipped_base"),
        F.array_join(F.array_sort(F.map_keys(upper)), ",").alias("upper_keys"),
    )


@register(
    "q_fn_string_extra",
    oracle="""
    SELECT p_partkey,
           translate(p_brand, '#B', '_b')                    AS brand_translated,
           repeat(p_brand, 2)                                AS brand_twice,
           reverse(p_name)                                   AS name_rev,
           CAST(strpos(p_name, 'a') AS INT)                  AS a_pos,
           to_base64(CAST(p_brand AS BLOB))                  AS brand_b64,
           lower(hex(p_brand))                               AS brand_hex,
           CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT)   AS brand_editdist,
           md5(p_name)                                       AS name_md5,
           sha256(p_name)                                    AS name_sha256
    FROM part
    """,
)
def q_fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: translate / repeat / reverse / position /
    base64 / hex / Levenshtein edit distance / md5 / sha-256.

    Alignment notes: hex case differs across engines (lower() both
    sides); Spark's ``instr`` is 1-based like DuckDB ``strpos`` but
    returns INT vs BIGINT (cast the oracle); ``sha2(x, 256)`` (Spark)
    and ``sha256`` (DuckDB) both return lowercase hex strings directly.
    All JVM built-ins, codegen'd, map-only."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.translate("p_brand", "#B", "_b").alias("brand_translated"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.instr(F.col("p_name"), "a").alias("a_pos"),
        F.base64(F.encode("p_brand", "UTF-8")).alias("brand_b64"),
        F.lower(F.hex(F.col("p_brand"))).alias("brand_hex"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).cast("long").alias(
            "brand_editdist"
        ),
        F.md5(F.col("p_name")).alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
    )


@register(
    "q_fn_datetime_extra",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m / %d')                    AS fmt,
           CAST(isodow(o_orderdate) AS BIGINT)                    AS iso_weekday,
           CAST(weekofyear(o_orderdate) AS BIGINT)                AS iso_week,
           CAST(epoch(o_orderdate) AS BIGINT)                     AS unix_sec,
           make_date(CAST(EXTRACT(year FROM o_orderdate) AS INT), 12, 31)
                                                                  AS year_end,
           CAST((2001 - EXTRACT(year FROM o_orderdate)) * 12
                + (8 - EXTRACT(month FROM o_orderdate)) AS BIGINT)
                                                                  AS whole_months_to_ref
    FROM orders
    """,
)
def q_fn_datetime_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended datetime family: format patterns, ISO weekday/week,
    Unix epoch seconds, date construction, and whole-month distance.

    Alignment notes: Spark ``dayofweek`` is 1=Sunday vs DuckDB 0=Sunday
    — the ISO forms (Spark ``weekday``+1 == DuckDB ``isodow``) are the
    portable pair. ``months_between`` is fractional in Spark but
    boundary-counting in DuckDB, so whole-month distance is expressed
    as explicit (year, month) arithmetic — identical by construction.
    Epoch seconds: the session TZ is pinned UTC so TIMESTAMP_NTZ
    converts identically."""
    orders = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(od, "yyyy-MM / dd").alias("fmt"),
        (F.weekday(od) + 1).cast("long").alias("iso_weekday"),
        F.weekofyear(od).cast("long").alias("iso_week"),
        F.unix_timestamp(od).alias("unix_sec"),
        F.make_date(F.year(od), F.lit(12), F.lit(31)).alias("year_end"),
        ((2001 - F.year(od)) * 12 + (8 - F.month(od))).cast("long").alias(
            "whole_months_to_ref"
        ),
    )


@register(
    "q_fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice / NULLIF(l_quantity - 25, 0) * 10000
                 + 0.5) / 10000                                   AS safe_div,
           TRY_CAST(l_returnflag AS INTEGER)                      AS flag_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER)     AS line_rt,
           TRY_CAST('2024-13-45' AS TIMESTAMP)                    AS bad_ts,
           [l_quantity, l_extendedprice][3]                       AS beyond,
           CASE WHEN l_orderkey = 0 THEN 9223372036854775807
                ELSE CAST(NULL AS BIGINT) END                     AS add_ovf
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safe arithmetic: the ``try_*`` family returns NULL where
    plain operators under Spark 4's default ANSI mode would raise (divide
    by zero, overflow, malformed cast) — the error-tolerance contract an
    ingest pipeline needs when it cannot crash on one bad record.

    Oracle mapping: ``try_divide`` == ``x / NULLIF(y, 0)`` (tie-stable
    floor-based cent rounding — the quotient lands on .xxxx5 for some
    rows, where the engines' ROUND disagree); ``try_cast`` ==
    DuckDB ``TRY_CAST``; ``try_element_at`` beyond the array == DuckDB's
    native out-of-range list index (NULL); ``try_add`` at BIGINT max
    overflows to NULL for every key >= 1 (key 0 alone survives at the
    max), so the oracle pins that case split directly.  Scale: pure codegen'd row expressions, no shuffle —
    the point of try_* over UDF guards is staying JVM-side."""
    li = tables.load(spark, sf_dir, "lineitem").filter("l_orderkey <= 100")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)
                * 10000
                + 0.5
            )
            / 10000
        ).alias("safe_div"),
        F.expr("try_cast(l_returnflag AS int)").alias("flag_int"),
        F.expr("try_cast(CAST(l_linenumber AS string) AS int)").alias("line_rt"),
        F.try_to_timestamp(F.lit("2024-13-45")).alias("bad_ts"),
        F.try_element_at(
            F.array("l_quantity", "l_extendedprice"), F.lit(3)
        ).alias("beyond"),
        F.try_add(F.lit(9223372036854775807), F.col("l_orderkey")).alias(
            "add_ovf"
        ),
    )


@register(
    "q_fn_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 1 MONTH AS DATE)  AS next_month,
           CAST(o_orderdate + INTERVAL 18 MONTH AS DATE) AS plus_18m,
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL 36 HOUR AS plus_36h,
           CAST(date_diff('day', o_orderdate, DATE '1998-12-01') AS BIGINT)
             AS days_to_ref,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
    FROM orders
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/calendar arithmetic: month addition with END-OF-MONTH
    CLAMPING (Jan 31 + 1 month = Feb 28 — both engines clamp, the corner
    every billing/retention job hits), exact hour intervals on
    timestamps, day distance to a reference date, and quarter
    truncation. Month DIFFERENCES are deliberately absent here: Spark's
    ``timestamp_diff(MONTH)`` counts full elapsed months while DuckDB's
    ``date_diff('month')`` counts boundary crossings (Jan 31 -> Feb 28
    is 0 vs 1), so portable month distances must be computed from
    year*12+month arithmetic — q_fn_datetime_extra does exactly that.

    Scale: map-only scalar projection, fused into the scan.
    """
    orders = tables.load(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return orders.select(
        "o_orderkey",
        F.add_months("o_orderdate", 1).alias("next_month"),
        F.add_months("o_orderdate", 18).alias("plus_18m"),
        F.timestamp_add("HOUR", F.lit(36), ts).alias("plus_36h"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_ref"),
        F.trunc("o_orderdate", "quarter").alias("quarter_start"),
    )
