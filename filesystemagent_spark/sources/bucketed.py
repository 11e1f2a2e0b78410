"""Bucketed table layout — co-located joins without a runtime shuffle.

At 100 TB the dominant cost of a repeated big-big equi-join is the
shuffle of both sides on every run. Bucketing pays that shuffle ONCE
at write time: both tables hash-partitioned into the same number of
buckets on the join key, bucket files aligned, so later joins read
matching buckets directly — the physical plan has no Exchange on
either side (and with sortBy, no Sort either: pure merge-join).

This is the Spark-native answer to the reference's SQLite secondary
indexes (file_indexing_system.py:92-96): layout, not lookup
structures. Pair with partitionBy(date) for pruning + bucketBy(key)
for join locality on the `files` / `findings` backbone tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    *,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) managed table.
    `n_buckets` must match between tables that will join — choose once
    per keyspace (files: file_hash; findings: target) and size so one
    bucket ≈ one task's memory (128-256 MB at target scale)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def shuffle_free_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. Correct for
    any tables; shuffle-free exactly when both were written by
    `write_bucketed` with identical keys and n_buckets — asserted in
    tests by inspecting the physical plan for Exchange nodes."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
