"""Zero-cost pipeline counters via DataFrame.observe().

The reference counts migration progress with mutable counters updated
per file (/root/reference/src/file_migration_template.py:136-159,
230-258). The Spark-native equivalent is `observe`: named aggregate
expressions evaluated ON the rows as they flow through the single
job — processed/matched/bytes counters cost no second scan and no
extra shuffle, and they arrive atomically with the action's result.

At 100 TB this is the difference between "write the curated corpus"
and "write it, then re-scan it to count what you wrote".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to `df`. The returned
    Observation yields `.get` after the FIRST action on the returned
    frame (e.g. the write); metrics see rows exactly once per action."""
    obs = Observation()
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def funnel_counters(df: DataFrame, keep: Column) -> tuple[DataFrame, Observation]:
    """The migration-progress shape: rows seen / rows kept / kept
    bytes-ish proxy, piggybacked on whatever action the caller runs.
    `keep` is the predicate the pipeline filters by; callers filter on
    the SAME column so observed and written rows agree."""
    from pyspark.sql import functions as F

    flagged = df.withColumn("_keep", keep)
    obs = Observation()
    return (
        flagged.observe(
            obs,
            F.count(F.lit(1)).alias("n_seen"),
            F.count_if(F.col("_keep")).alias("n_kept"),
        ).filter(F.col("_keep")).drop("_keep"),
        obs,
    )
