"""transformWithState surface — skip-gated: the worker protocol needs
google.protobuf, absent in this container. On an environment that has
it, this proves the new-API running totals equal the batch aggregate
(same contract as the legacy-API gate queries)."""

from __future__ import annotations

import os
import tempfile

import pytest


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _protobuf_ok(), reason="google.protobuf unavailable")
def test_transform_with_state_running_totals(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.streaming.events import read_events_stream
    from filesystemagent_spark.streaming.state import running_user_totals

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stage = tempfile.mkdtemp(prefix="events_state_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(stage, "events.parquet")
    )
    q = (
        running_user_totals(read_events_stream(spark, stage))
        .writeStream.format("memory")
        .queryName("tws_sink")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(stage, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, r.max_value)
        for r in spark.table("tws_sink").collect()
    }
    expected = {
        r.user_id: (r.n, r.mx)
        for r in Catalog(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max(F.col("value").cast("double")).alias("mx"))
        .collect()
    }
    assert got == expected


def test_processor_module_imports_without_protobuf():
    """The module itself must import cleanly everywhere — only the
    runtime worker needs protobuf."""
    from filesystemagent_spark.streaming.state import (  # noqa: F401
        OUTPUT_SCHEMA,
        RunningUserTotals,
        running_user_totals,
    )

    assert "user_id" in OUTPUT_SCHEMA
