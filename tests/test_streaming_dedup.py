"""Streaming dedup proven against batch dedup on identical input."""

from __future__ import annotations

from pyspark.sql import functions as F

from filesystemagent_spark.streaming.dedup import (
    dedup_stream,
    dedup_stream_within_watermark,
)
from filesystemagent_spark.streaming.events import EVENT_SCHEMA


def _write_events_with_dups(spark, src_dir):
    base = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "click", 1.0, "{}"),
            (2, "2024-01-01 00:05:00", 10, "click", 1.0, "{}"),  # dup key (user, type)
            (3, "2024-01-01 00:10:00", 11, "view", 2.0, "{}"),
            (4, "2024-01-01 01:00:00", 11, "view", 2.5, "{}"),  # dup key
            (5, "2024-01-01 02:00:00", 12, "click", 3.0, "{}"),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    base.coalesce(1).write.mode("overwrite").parquet(src_dir)


def _drain(spark, q, name, tmp_path):
    (
        q.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.sql(f"select * from {name}")


def test_dedup_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src_exact")
    _write_events_with_dups(spark, src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    got = _drain(
        spark, dedup_stream(stream, ["user_id", "event_type"]), "dd_exact", tmp_path
    )
    assert got.count() == 3
    assert {r.user_id for r in got.collect()} == {10, 11, 12}


def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    src = str(tmp_path / "src_wm")
    _write_events_with_dups(spark, src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = dedup_stream_within_watermark(
        stream, ["user_id", "event_type"], "ts", delay="30 minutes"
    )
    got = _drain(spark, q, "dd_wm", tmp_path)
    # Within one availableNow micro-batch the watermark only advances
    # at the end, so all in-batch duplicates are suppressed: exact
    # dedup here; state eviction is the cross-batch contract.
    assert got.count() == 3
    # The plan must carry the event-time watermark (bounded state).
    assert "watermark" in q._jdf.queryExecution().analyzed().toString().lower()


def test_idempotent_file_sink_exactly_once(spark, tmp_path):
    """Replaying a batch (same batch_id) must overwrite, not append —
    the foreachBatch exactly-once contract."""
    from filesystemagent_spark.streaming.sinks import (
        read_upserted,
        start_idempotent_file_sink,
    )

    src = str(tmp_path / "sink_src")
    _write_events_with_dups(spark, src)
    out, ckpt = str(tmp_path / "sink_out"), str(tmp_path / "sink_ckpt")

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    start_idempotent_file_sink(stream, out, ckpt).awaitTermination()
    first = spark.read.option("basePath", out).parquet(out).count()
    assert first == 5

    # Simulate a replay of batch 0: fresh checkpoint, same output dir.
    start_idempotent_file_sink(
        spark.readStream.schema(EVENT_SCHEMA).parquet(src),
        out,
        str(tmp_path / "sink_ckpt2"),
    ).awaitTermination()
    assert spark.read.option("basePath", out).parquet(out).count() == 5  # no dupes

    # Upsert view resolves to one row per key, newest batch wins.
    resolved = read_upserted(spark, out, ["user_id", "event_type"])
    assert resolved.count() == 3
