"""SparkSession factory with scale-oriented defaults.

The reference engine hand-tunes thread pools and batch sizes
(/root/reference/config.yaml:8-10, src/agent.py:29-32); in Spark the
equivalent knobs are shuffle partitioning, AQE, and Arrow batching —
set once here so every entry point (tests, bench, driver contract)
gets the same execution profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the harness box (local[32], 128 GiB). On a real
# cluster the same code runs unchanged: master/shuffle-partitions are
# env-overridable and AQE re-coalesces at runtime anyway.
_DEFAULTS = {
    # Runtime re-planning: partition coalescing, skew-join splitting,
    # dynamic broadcast — the engine's answer to data skew at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas-UDF surface (transform shim, perceptual
    # hashes): batch columnar transfer, not per-row pickling.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamp semantics for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    # Parquet pushdown & pruning are on by default; pinned here as
    # documentation that the engine relies on them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "filesystemagent-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` sizes local parallelism; on a cluster pass an
    explicit ``master`` or let spark-submit provide one.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # In local mode the driver IS the executor: the 1g default heap is
    # the first thing to fall over under 32 concurrent tasks. Applied
    # only when this factory launches the JVM (getOrCreate on a live
    # session ignores it — e.g. under the round driver's own session).
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
