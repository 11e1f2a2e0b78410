"""Driver-action count per maintenance-sink micro-batch (round 11,
VERDICT item 5): drive the BM25 / IVF / PQ feed sinks over a seeded
DML sequence with the event log on, and report Spark JOBS per applied
batch plus drain wall time. Run against two checkouts (git worktree of
the pre-change HEAD vs the working tree) for the before/after.

    python scripts/exp_sink_actions.py [sf_dir] [bm25|ivf|pq]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

LOGDIR = "/tmp/r11_sinkactions"


def _count_jobs(logdir: str, app_id: str, windows: list[tuple[float, float]]):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_headliner_profile import _log_lines

    starts = []
    for line in _log_lines(os.path.join(logdir, app_id)):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            starts.append(ev["Submission Time"])
    return [
        sum(1 for s in starts if t0 * 1000 <= s <= t1 * 1000)
        for t0, t1 in windows
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    which = sys.argv[2] if len(sys.argv) > 2 else "bm25"
    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import TxTable

    shutil.rmtree(LOGDIR, ignore_errors=True)
    os.makedirs(LOGDIR, exist_ok=True)
    spark = get_spark(
        f"exp-sink-actions-{uuid.uuid4().hex[:6]}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOGDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    stage = tempfile.mkdtemp(prefix=f"sinkact_{which}_")
    src, idx, ckpt = (os.path.join(stage, d) for d in ("src", "idx", "ckpt"))

    if which == "bm25":
        from filesystemagent_spark.operators.invindex import (
            start_bm25_index_sink,
        )

        data = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        key = "doc_id"
        start = lambda: start_bm25_index_sink(spark, src, idx, ckpt)  # noqa: E731
    elif which == "ivf":
        from filesystemagent_spark.operators import similarity as S
        from filesystemagent_spark.operators.similarity import (
            start_ivf_index_sink,
        )

        emb = Catalog(spark, sf_dir).embeddings
        data = emb.select("vec_id", "embedding")
        key = "vec_id"
        dim = len(emb.select("embedding").first()[0])
        TxTable(os.path.join(idx, "centroids")).init(
            S.centroids_from_labels(
                emb, label_col="label", vec_col="embedding", dim=dim
            )
        )
        start = lambda: start_ivf_index_sink(spark, src, idx, ckpt)  # noqa: E731
    else:
        raise SystemExit(f"unknown sink {which}")

    t = TxTable(src)
    t.init(data.filter(F.col(key) % 2 == 0))
    windows = []
    n_batches = 6
    for i in range(n_batches):
        batch = data.filter(F.col(key) % n_batches == i).select(
            (F.col(key) + (i + 1) * 1_000_000).alias(key),
            *[c for c in data.columns if c != key],
        )
        t.merge_into(batch, [key], change_feed=True)
        if i % 3 == 2:
            t.delete_keys(
                batch.limit(3).select(key), [key], change_feed=True
            )
        w0 = time.time()
        start().awaitTermination()
        windows.append((w0, time.time()))

    app_id = spark.sparkContext.applicationId
    spark.stop()
    jobs = _count_jobs(LOGDIR, app_id, windows)
    walls = [round(b - a, 3) for a, b in windows]
    print(
        json.dumps(
            {
                "sink": which,
                "jobs_per_drain": jobs,
                "wall_per_drain_s": walls,
                "jobs_total": sum(jobs),
                "wall_total_s": round(sum(walls), 3),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
