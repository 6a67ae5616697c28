"""Materialize a ~sf1 corpus by deterministic 10x scale-up of the driver's
sf0.1 parquet (the driver ships no sf1; round-5 VERDICT task 5 wants the
100x scaling arguments validated empirically, not just argued).

Scale-up rules (copy index c = 0..9), chosen so per-copy structure matches
the original while cross-copy artifacts don't distort the algorithms:

* lineitem + orders: all keys (orderkey shared-shift so the join stays
  aligned; part/supp/cust keys independently) shifted by c * (max+1) —
  the co-order part graph and customer-supplier graph become 10 disjoint
  isomorphic components, so triangle/BFS work scales linearly in edges
  exactly like a 10x corpus would.
* documents: doc_id shifted; text prefixed with a copy token ``c<i>`` so
  k-grams/shingles differ across copies — near-dup candidate counts scale
  linearly instead of every doc gaining 9 exact twins.
* embeddings: vec_id shifted; first component nudged by c/1024 so vectors
  are distinct but the cluster geometry is preserved.

Usage: python tools/make_sf1.py [out_dir]   (default _scale/sf1, gitignored)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ws_to_kafka_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
# default 10x; override with --copies N for further decades (sf3 ~ 30x)
COPIES = 10


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "_scale/sf1"
    n_copies = COPIES
    if "--copies" in sys.argv:
        n_copies = int(sys.argv[sys.argv.index("--copies") + 1])
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-sf1")
    copies = spark.range(n_copies).select(F.col("id").alias("_c"))

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    # one shared orderkey shift so the orders ⋈ lineitem join stays aligned
    customer = spark.read.parquet(f"{SRC}/customer.parquet")
    supplier = spark.read.parquet(f"{SRC}/supplier.parquet")
    part = spark.read.parquet(f"{SRC}/part.parquet")
    mx_ok = orders.agg(F.max("o_orderkey")).first()[0] + 1
    # key shifts shared between fact and dim so every FK stays aligned
    # across copies (round-6 ADVICE: part/customer/supplier were never
    # scaled, silently limiting which queries sf1 could validate)
    mx_pk = max(
        li.agg(F.max("l_partkey")).first()[0],
        part.agg(F.max("p_partkey")).first()[0],
    ) + 1
    mx_sk = max(
        li.agg(F.max("l_suppkey")).first()[0],
        supplier.agg(F.max("s_suppkey")).first()[0],
    ) + 1
    mx_ck = max(
        orders.agg(F.max("o_custkey")).first()[0],
        customer.agg(F.max("c_custkey")).first()[0],
    ) + 1
    li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("_c") * mx_ok).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("_c") * mx_pk).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("_c") * mx_sk).alias("l_suppkey"),
        *[
            c
            for c in li.columns
            if c not in ("l_orderkey", "l_partkey", "l_suppkey")
        ],
    ).repartition(64).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    orders.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("_c") * mx_ok).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_c") * mx_ck).alias("o_custkey"),
        *[
            c
            for c in orders.columns
            if c not in ("o_orderkey", "o_custkey")
        ],
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )

    events = spark.read.parquet(f"{SRC}/events.parquet")
    mx_ev = events.agg(F.max("event_id")).first()[0] + 1
    mx_uid = events.agg(F.max("user_id")).first()[0] + 1
    events.crossJoin(copies).select(
        (F.col("event_id") + F.col("_c") * mx_ev).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_c") * mx_uid).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    mx_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("_c") * mx_doc).alias("doc_id"),
        F.concat(F.lit("c"), F.col("_c").cast("string"), F.lit(" "), "text")
        .alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 3).alias("n_chars"),
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    mx_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("_c") * mx_vec).alias("vec_id"),
        F.concat(
            F.array(
                (
                    F.element_at("embedding", 1)
                    + F.col("_c").cast("float") / F.lit(1024.0)
                ).cast("float")
            ),
            F.slice("embedding", 2, 10_000),
        ).alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    customer.crossJoin(copies).select(
        (F.col("c_custkey") + F.col("_c") * mx_ck).alias("c_custkey"),
        *[c for c in customer.columns if c != "c_custkey"],
    ).repartition(8).write.mode("overwrite").parquet(
        f"{out}/customer.parquet"
    )
    supplier.crossJoin(copies).select(
        (F.col("s_suppkey") + F.col("_c") * mx_sk).alias("s_suppkey"),
        *[c for c in supplier.columns if c != "s_suppkey"],
    ).repartition(4).write.mode("overwrite").parquet(
        f"{out}/supplier.parquet"
    )
    part.crossJoin(copies).select(
        (F.col("p_partkey") + F.col("_c") * mx_pk).alias("p_partkey"),
        *[c for c in part.columns if c != "p_partkey"],
    ).repartition(8).write.mode("overwrite").parquet(
        f"{out}/part.parquet"
    )
    # nation/region are fixed reference dims: copy verbatim
    for dim in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/{dim}.parquet")

    for t in (
        "lineitem", "orders", "events", "documents", "embeddings",
        "customer", "supplier", "part", "nation", "region",
    ):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
