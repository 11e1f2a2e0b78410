"""Partitioned table layout — partition pruning and compaction.

The reference's answer to selective access is SQLite B-tree indexes
(/root/reference/src/file_indexing_system.py:92-96). The Spark-native
answer is physical layout: hive-style `partitionBy` directories so a
partition-key predicate prunes whole directories at planning time
(zero I/O for excluded partitions), plus in-file ordering
(`sortWithinPartitions`) so parquet row-group min/max stats skip
pages within the files that survive pruning.

At 100 TB the partition column choice is the single biggest scan
lever: date/type columns with bounded cardinality (10²-10⁴
partitions) prune; high-cardinality keys (user_id) must NOT be
partition columns — they belong in bucket/sort order instead
(sources/bucketed.py).

Compaction is layout hygiene: streaming/incremental writers leave
many small files; `compact` rewrites a table directory to
target-sized files so scans pay one task per ~128 MB instead of one
per tiny file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    *,
    sort_within: list[str] | str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write `df` hive-partitioned by `partition_cols`.

    `sort_within` orders rows inside each output file so parquet
    min/max stats become selective for those columns (the data-
    skipping complement to directory pruning)."""
    partition_cols = (
        [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    )
    if sort_within is not None:
        sort_within = (
            [sort_within] if isinstance(sort_within, str) else list(sort_within)
        )
        df = df.repartition(*partition_cols).sortWithinPartitions(*sort_within)
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned table; partition-key filters applied by the
    caller prune directories before any file is opened."""
    return spark.read.format(fmt).load(path)


def compact(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite `path` (non-partitioned dir or a single partition dir)
    into ~`target_file_mb`-sized files; returns the file count written.

    Sized from actual bytes, not file count, so it is idempotent and
    safe to run on already-compacted data. Writes to a temp sibling
    then swaps, so a failed compaction never destroys the source."""
    import math
    import os
    import shutil

    df = spark.read.format(fmt).load(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "._compact_tmp"
    df.coalesce(n_files).write.format(fmt).mode("overwrite").save(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_sharded(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    n_shards: int = 64,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Export a dataset as N deterministic hash shards
    (`shard=00..N-1` hive dirs) — the layout a training job consumes:
    shard membership depends only on the key (md5, not Spark's
    internal hash), so re-exports, engine swaps, and corpus growth
    never move an existing row to a different shard, and any subset of
    shards is a valid reproducible sample. One file per shard
    (repartition by the shard key) so the consumer's reader sees
    N equal-ish sequential streams."""
    from pyspark.sql import functions as F

    shard = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    out = df.withColumn("shard", F.format_string("%02d", shard.cast("int")))
    out.repartition("shard").write.format(fmt).mode(mode).partitionBy(
        "shard"
    ).save(path)


def expire_partitions(
    path: str,
    *,
    keep: int,
) -> list[str]:
    """Table-level retention: keep the newest `keep` hive partition
    directories of `path` (lexicographic order — date-formatted keys
    sort correctly), delete the rest. The reference's ring buffers
    (monitoring.py:57-158, last-1000 rows) become this at table scale:
    retention is a metadata operation on partition directories, never
    a row-level delete-and-rewrite. Returns the removed directory
    names (empty when nothing expires); idempotent."""
    import os
    import shutil

    parts = sorted(
        d
        for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    )
    doomed = parts[:-keep] if keep > 0 else parts
    for d in doomed:
        shutil.rmtree(os.path.join(path, d))
    return doomed


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Attach `_zkey`: the Z-order (Morton) interleaving of the rank
    quantiles of `cols` — Delta's OPTIMIZE ZORDER technique for
    multi-dimensional data skipping.

    A linear sort bounds min/max file statistics on ONE column; bit-
    interleaving the per-column quantile ranks gives every output file
    a narrow range on EVERY z-ordered column, so predicate pushdown
    prunes files/row-groups for filters on any of them. Quantile rank
    (percent_rank) rather than raw values makes the curve robust to
    skewed distributions.

    Cost shape: one window per column to rank (at 100 TB you'd swap
    percent_rank for approx-quantile bucket literals to avoid global
    sorts — same key, sampled boundaries), then pure bit expressions.
    """
    out = df
    for i, c in enumerate(cols):
        w = Window.orderBy(F.col(c))
        out = out.withColumn(
            f"_q{i}",
            F.least(
                (F.percent_rank().over(w) * (1 << bits)).cast("long"),
                F.lit((1 << bits) - 1),
            ),
        )
    # interleave: output bit (b*len+i) takes bit b of column i's rank
    n = len(cols)
    terms = []
    for b in range(bits):
        for i in range(n):
            src = F.shiftright(F.col(f"_q{i}"), b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(src, b * n + i))
    key = terms[0]
    for t in terms[1:]:
        key = key.bitwiseOR(t)
    return out.withColumn("_zkey", key).drop(*[f"_q{i}" for i in range(n)])


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, bits: int = 12
) -> None:
    """Write parquet clustered on the Z-order curve of `cols`:
    range-partition by `_zkey` into `n_files` files, sort within each,
    drop the key. Every file then carries tight min/max stats on every
    z-ordered column (tested against footer statistics in
    tests/test_layout_zorder.py)."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
