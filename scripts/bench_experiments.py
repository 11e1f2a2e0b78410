"""Scratch harness: A/B alternative physical formulations of headline
queries at sf0.1 before committing them to queries/. Not part of the
driver contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import registry
from filesystemagent_spark.session import get_spark


def _dec(c):
    return c.cast("decimal(18,6)")


def top_customers_preagg(spark, sf_dir):
    """Partial-agg pushdown: collapse lineitem to order grain before the
    fact-fact join (decimal sums are associative, so the result is
    bit-identical)."""
    cat = Catalog(spark, sf_dir)
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    li_agg = cat.lineitem.groupBy("l_orderkey").agg(
        F.sum(revenue).alias("rev"), F.count("*").alias("n")
    )
    return (
        li_agg.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(Catalog(spark, sf_dir).customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


def regional_revenue_preagg(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    li_agg = cat.lineitem.groupBy("l_orderkey").agg(
        F.sum(revenue).alias("rev"), F.count("*").alias("n")
    )
    return (
        li_agg.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cat.customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .orderBy("region_name", "nation_name")
    )


def time_fn(fn, spark, sf_dir, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-experiments")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    # warm
    reg["pricing_summary"].fn(spark, sf_dir).count()

    pairs = [
        ("top_customers_by_revenue", reg["top_customers_by_revenue"].fn, top_customers_preagg),
        ("regional_revenue", reg["regional_revenue"].fn, regional_revenue_preagg),
    ]
    for name, cur, alt in pairs:
        t_cur = time_fn(cur, spark, sf_dir)
        t_alt = time_fn(alt, spark, sf_dir)
        # equality check
        a = sorted(map(tuple, cur(spark, sf_dir).collect()))
        b = sorted(map(tuple, alt(spark, sf_dir).collect()))
        print(f"{name}: current={t_cur:.3f}s preagg={t_alt:.3f}s equal={a == b}")


if __name__ == "__main__":
    main()


def jaccard_grouped(spark, sf_dir):
    """Pair generation via groupBy(shingle)+collect_list instead of the
    inverted-index self-join: one exchange of the inverted index, pairs
    expanded as an array comprehension."""
    from filesystemagent_spark.functions import text as T
    from pyspark import StorageLevel

    docs = (
        Catalog(spark, sf_dir).documents.select(
            F.col("doc_id").alias("_id"),
            F.array_distinct(T.shingles(F.col("text"), 3)).alias("_sh"),
        )
        .filter(F.size("_sh") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = docs.select("_id", F.size("_sh").alias("_n"))
    inv = docs.select("_id", F.explode("_sh").alias("s")).select(
        F.xxhash64("s").alias("s"), "_id"
    )
    ids = F.sort_array(F.collect_list("_id"))
    pairs = (
        inv.groupBy("s").agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda a, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size("ids")),
                            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.4)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )
    return out


def main2():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-experiments")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    reg["pricing_summary"].fn(spark, sf_dir).count()
    cur = reg["doc_near_dup_jaccard"].fn
    t_cur = time_fn(cur, spark, sf_dir)
    t_alt = time_fn(jaccard_grouped, spark, sf_dir)
    a = sorted(map(tuple, cur(spark, sf_dir).collect()))
    b = sorted(map(tuple, jaccard_grouped(spark, sf_dir).collect()))
    print(f"doc_near_dup_jaccard: current={t_cur:.3f}s grouped={t_alt:.3f}s equal={a == b}")
