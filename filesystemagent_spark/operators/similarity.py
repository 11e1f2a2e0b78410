"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the verifiable baseline, and a
random-hyperplane (sign-LSH) bucketed variant as the scale path —
at 100 TB the cross join is impossible; LSH makes candidate
generation a bucket equi-join.

Everything stays in JVM expressions (functions/vectors.py); the
hyperplanes are deterministic literals, broadcast implicitly as part
of the plan.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filesystemagent_spark.functions import vectors as V
from filesystemagent_spark.operators.relational import grouped_top_k


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query. The corpus is scanned once, never shuffled;
    the only shuffle is the per-query rank window on query_id.

    Returns (query_id, neighbor_id, cosine, rnk).
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", V.cosine(F.col("_qv"), F.col("_cv")))
        .drop("_qv", "_cv")
    )
    return grouped_top_k(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank=True,
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def sign_lsh_bucket(df: DataFrame, *, vec_col: str, dim: int, n_planes: int = 8, seed: int = 42):
    """Attach a sign-LSH bucket id: bit i = sign(vec · plane_i).
    Cosine-similar vectors collide with high probability."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        lit_plane = F.array(*[F.lit(x).cast("double") for x in plane])
        bit = F.when(V.dot(F.col(vec_col), lit_plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return df.withColumn("bucket", bucket)


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Trades recall for a bucket equi-join instead of a cross join —
    the candidate set shrinks by ~2^n_planes. Recall is tunable via
    n_planes (fewer planes → bigger buckets → higher recall) or, at
    scale, multiple hash tables unioned before the rank.
    """
    q = sign_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        vec_col="_qv",
        dim=dim,
        n_planes=n_planes,
        seed=seed,
    )
    c = sign_lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        vec_col="_cv",
        dim=dim,
        n_planes=n_planes,
        seed=seed,
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", V.cosine(F.col("_qv"), F.col("_cv")))
        .drop("_qv", "_cv", "bucket")
    )
    return grouped_top_k(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        keep_rank=True,
    )
