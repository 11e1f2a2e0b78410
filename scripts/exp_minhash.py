"""A/B: does materializing the md5 base-hash array in its own
projection (so the 16 per-permutation array_min/transform passes read a
column ref instead of re-evaluating the md5 transform subtree) speed up
doc_minhash_pairs_checkable at sf0.1?"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from filesystemagent_spark.functions import hashing as H
from filesystemagent_spark.functions import text as T
from filesystemagent_spark.queries import registry
from filesystemagent_spark.queries.documents import _doc_text_rebalanced
from filesystemagent_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variant_hv_materialized(spark, sf_dir):
    docs = (
        _doc_text_rebalanced(spark, sf_dir)
        .select(
            F.col("doc_id").alias("_id"),
            F.array_distinct(T.shingles(F.col("text"), 3)).alias("_shingles"),
        )
        .filter(F.size("_shingles") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    num_hashes, bands, seed = 16, 4, 42
    rows_per_band = num_hashes // bands
    hv = docs.select("_id", "_shingles", H.shingle_hashes_md5(F.col("_shingles")).alias("_hv"))

    def perm(a, b):
        return lambda h: F.pmod(a * h + b, F.lit(H.MINHASH_PRIME))

    mins = [
        F.array_min(F.transform(F.col("_hv"), perm(a, b)))
        for a, b in H.perm_params(num_hashes, seed)
    ]
    signed = hv.select("_id", F.array(*mins).alias("_sig"))
    bands_col = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("_sig"), i * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                ).alias("band_hash"),
            )
            for i in range(bands)
        ]
    )
    banded = signed.select("_id", F.explode(bands_col).alias("bk")).select(
        "_id", "bk.band", "bk.band_hash"
    )
    bucket_sizes = banded.groupBy("band", "band_hash").agg(F.count("*").alias("_bsz"))
    banded = banded.join(
        bucket_sizes.filter(F.col("_bsz") <= 1000).drop("_bsz"),
        ["band", "band_hash"],
        "inner",
    )
    left, right = banded.alias("l"), banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    a = docs.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("sh_a"))
    b = docs.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("sh_b"))
    jac = F.round(
        F.col("_inter").cast("double")
        / (F.size("sh_a") + F.size("sh_b") - F.col("_inter")).cast("double"),
        6,
    )
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.4)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def timeit(fn, spark, n=3):
    best = float("inf")
    rows = None
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = fn(spark, SF)
        rows = df.count()
        best = min(best, time.monotonic() - t0)
    return best, rows


def main():
    spark = get_spark()
    cur = registry()["doc_minhash_pairs_checkable"].fn
    # warmup
    cur(spark, SF).count()
    t_cur, n_cur = timeit(cur, spark)
    t_new, n_new = timeit(variant_hv_materialized, spark)
    print(f"current:      {t_cur:.3f}s rows={n_cur}")
    print(f"hv-material:  {t_new:.3f}s rows={n_new}")


if __name__ == "__main__":
    main()
