"""Streaming sinks with exactly-once file semantics via foreachBatch.

Structured Streaming's checkpoint guarantees each micro-batch id is
processed at least once; making the WRITE idempotent upgrades that to
exactly-once. The file-sink pattern here: every batch writes to a
deterministic `batch_id=<id>` directory with mode=overwrite, so a
replayed batch overwrites its own previous (possibly partial) output
instead of appending duplicates. Readers see the union of batch dirs;
layout.compact handles the small-file tail.

This is the parquet-only stand-in for a transactional MERGE sink
(Delta/Iceberg); the keyed-upsert view on top resolves multiple
versions of a key to the newest batch — the same last-writer-wins
contract as sources/listing.merge_catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def start_idempotent_file_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    available_now: bool = True,
    output_mode: str | None = None,
):
    """Write each micro-batch to `<path>/batch_id=<n>/` with overwrite —
    replay-safe: a batch re-run after a crash rewrites its own dir.
    `output_mode="update"` turns a stateful aggregation upstream into
    an incremental materialization: each batch emits only the groups
    it changed (with their full new values), and `read_upserted`
    resolves every key to its newest version."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(path, f"batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if output_mode:
        writer = writer.outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_upserted(
    spark: SparkSession, path: str, keys: list[str] | str
) -> DataFrame:
    """Resolve the batch-dir union to one row per key: the version
    from the highest batch_id wins (last-writer-wins upsert view).
    `basePath` keeps the partition column available as `batch_id`."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    df = spark.read.option("basePath", path).parquet(path)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("batch_id").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch_id")
    )


def start_txtable_merge_sink(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str] | str,
    *,
    available_now: bool = True,
    output_mode: str | None = None,
):
    """Streaming MERGE: each micro-batch upserts into a TxTable
    (sources/txtable.py) — the transactional upgrade of the batch-dir
    union sink above. Exactly-once comes from two layers:

    - foreachBatch applies batches in order under the checkpoint, so a
      batch can only ever be REPLAYED (crash between commit and
      checkpoint), never reordered;
    - the sink stamps every commit with its batch_id in the manifest's
      app metadata and skips batches at-or-below the last applied id —
      a replayed batch observes its own prior commit and becomes a
      no-op instead of re-merging.

    Readers get snapshot-isolated views of the keyed table at any
    moment (no batch-dir unioning, no last-writer-wins window), and a
    concurrent BATCH writer merging the same table retries through the
    same CAS rather than losing updates.
    """
    from filesystemagent_spark.sources.txtable import TxTable

    key_list = [keys] if isinstance(keys, str) else list(keys)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        t = TxTable(table_path)
        if t.latest_app().get("batch_id", -1) >= batch_id:
            return  # replayed batch: already committed
        t.merge_into(batch_df, key_list, app={"batch_id": batch_id})

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if output_mode:
        writer = writer.outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
