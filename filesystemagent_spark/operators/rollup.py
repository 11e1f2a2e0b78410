"""Hypertable-style continuous aggregates: time-bucketed rollups that
re-aggregate losslessly to coarser buckets.

The scale pattern for a 100 TB events table: queries never scan raw
rows for dashboard-grade aggregates — a fine-grained rollup (5 min)
is maintained incrementally (in streaming: the watermarked windowed
aggregate writing to the rollup sink), and every coarser resolution
(1 h, 1 d) derives from it by RE-aggregating partials. The invariant
that makes this sound: store only mergeable partials —
(count, sum, min, max) merge exactly; avg/stddev derive at read time
from sum/count (never store an avg: averages of averages are wrong
with uneven buckets).

`events_rollup_reagg` proves the invariant against DuckDB: 1 h from
the 5-min rollup hash-equals 1 h computed directly from raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filesystemagent_spark.functions.tscompat import epoch_whole_seconds


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Floor a timestamp to its bucket start (timescale `time_bucket`).
    Integer math on epoch seconds — works for any width, not just the
    calendar units `date_trunc` knows. Accepts TIMESTAMP or
    TIMESTAMP_NTZ; returns TIMESTAMP_NTZ (naive, UTC-pinned) so bucket
    values hash identically to a naive-timestamp oracle."""
    secs = epoch_whole_seconds(ts)
    return F.timestamp_seconds((secs - (secs % width_seconds))).cast("timestamp_ntz")


def continuous_aggregate(
    events: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """The fine-grained rollup: one row per (bucket, groups) holding
    mergeable partials only. In batch this is a plain groupBy; under
    Structured Streaming the identical expressions run with
    withWatermark + window() into an append sink."""
    return (
        events.groupBy(
            time_bucket(F.col(ts_col), bucket_seconds).alias("bucket"), *group_cols
        )
        .agg(
            F.count("*").alias("n"),
            # exact decimal partial: the re-aggregated sum is then
            # bit-identical to the direct sum under ANY merge order —
            # a double partial here would make coarser rollups drift
            # by summation order.
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_v"),
            F.min(F.col(value_col).cast("double")).alias("min_v"),
            F.max(F.col(value_col).cast("double")).alias("max_v"),
        )
    )


def reaggregate(
    rollup: DataFrame,
    *,
    group_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """Merge fine buckets into coarser ones from partials alone — no
    raw-row access. `bucket_seconds` must be a multiple of the
    rollup's width for exact results (bucket boundaries nest)."""
    return (
        rollup.groupBy(
            time_bucket(F.col("bucket"), bucket_seconds).alias("bucket"), *group_cols
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def with_derived_stats(rollup: DataFrame) -> Column | DataFrame:
    """Read-time derivations from partials: the average is sum/count
    computed at query time (never stored)."""
    return rollup.withColumn("avg_v", F.col("sum_v") / F.col("n"))
