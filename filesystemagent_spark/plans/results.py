"""Run-result persistence and job metrics.

Replaces the reference's timestamped-JSON result store and in-memory
job counters (/root/reference/src/audit/pipeline.py:320-363,
/root/reference/src/monitoring.py:108-130) with ts-partitioned JSON
and one conditional-aggregation query.

Partitioning by `run_ts` means "load newest N" prunes partitions at
scan time instead of listing-and-sorting the whole store — the same
query works unchanged when the store holds years of runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_result(df: DataFrame, base_dir: str, run_ts: str) -> None:
    """Persist one run's result rows under `base_dir/run_ts=<ts>/`.

    `run_ts` is caller-supplied (sortable, e.g. ISO basic
    `20260813T120000`) so replays are deterministic and idempotent:
    re-saving the same run overwrites only its own partition.
    """
    (
        df.withColumn("run_ts", F.lit(run_ts))
        .repartition(1)  # run results are small metadata tables
        .write.mode("overwrite")
        # dynamic: overwrite only the run_ts partition being written,
        # not the whole store (static mode would truncate base_dir)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_ts")
        .json(base_dir)
    )


def load_results(spark: SparkSession, base_dir: str, limit: int | None = None) -> DataFrame:
    """Newest-first run results (W4). With `limit`, only the newest N
    distinct runs are kept — the partition column comparison pushes to
    the file listing, so old partitions are never read."""
    df = spark.read.json(base_dir)
    if limit is not None:
        newest = (
            df.select("run_ts").distinct().orderBy(F.col("run_ts").desc()).limit(limit)
        )
        df = df.join(F.broadcast(newest), "run_ts")
    return df.orderBy(F.col("run_ts").desc())


def job_metrics(jobs: DataFrame) -> DataFrame:
    """Job rollup (A6): totals per status plus average duration of
    completed jobs — one pass, conditional aggregates, no self-joins.

    Expects columns (job_id, status, duration_seconds); statuses follow
    the reference's JobStatus enum (pending/running/completed/failed).
    """
    return jobs.agg(
        F.count("*").alias("total_jobs"),
        F.count_if(F.col("status") == "running").alias("running"),
        F.count_if(F.col("status") == "completed").alias("completed"),
        F.count_if(F.col("status") == "failed").alias("failed"),
        F.avg(
            F.when(F.col("status") == "completed", F.col("duration_seconds"))
        ).alias("avg_duration_completed"),
    )


def status_counters(results: DataFrame, status_col: str = "status") -> DataFrame:
    """Migration-style progress counters (A10): per-status row and byte
    totals from the per-file result table, replacing the reference's
    mutated-in-place counters (file_migration_template.py:136-159).
    Computed post-hoc from data, so retries/replays can't drift the
    counts the way incremented state does."""
    has_bytes = "file_size" in results.columns
    aggs = [F.count("*").alias("n_files")]
    if has_bytes:
        aggs.append(F.sum("file_size").alias("total_bytes"))
    return results.groupBy(status_col).agg(*aggs).orderBy(status_col)
