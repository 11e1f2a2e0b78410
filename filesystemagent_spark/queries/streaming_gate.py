"""Driver-gate query that exercises the REAL Structured Streaming path
(readStream → watermark → tumbling window agg → availableNow drain)
and cross-checks the result against a batch SQL oracle — the unified-
model guarantee made into a correctness gate."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.queries import register


@register(
    "events_stream_tumbling",
    tags=("streaming", "window", "watermark"),
    oracle="""
SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs an actual streaming query over the events table (staged
    behind a symlink dir — file sources need directories), drains with
    availableNow into a memory sink, and returns the sink contents.
    Counts only: integer results are stream/batch/oracle exact."""
    from filesystemagent_spark.streaming.events import read_events_stream, windowed_counts

    stage = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(stage, "events.parquet")
    )
    sink = f"events_stream_sink_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts(read_events_stream(spark, stage), window="1 hour")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(stage, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )
