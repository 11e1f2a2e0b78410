"""Measure MoR read amplification vs stacked tombstone depth at sf0.1
— the SCALE.md evidence behind the maintenance policy thresholds
(__main__ table --materialize-tombstones --max-tombstone-depth /
--max-covered-frac).

Protocol: init a TxTable from the sf0.1 events table (~600k rows,
repartitioned to 8 files), stack K merge-on-read deletes (each a
1000-key predicate slice over event_id — every file covered, the
worst case), then time a full-scan aggregate at each depth, plus the
same read after materialize_tombstones(). Prints a markdown table.

Run:  python scripts/exp_tombstone_depth.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filesystemagent_spark.sources.txtable import TxTable  # noqa: E402


def timed_read(t, spark):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        t.read(spark).agg(F.count("*"), F.sum("value")).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from filesystemagent_spark.session import get_spark

    spark = get_spark("exp_tombstone_depth")
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base = events.repartition(8)

    with tempfile.TemporaryDirectory() as d:
        t = TxTable(os.path.join(d, "tbl"))
        t.init(base)
        n0 = t.read(spark).count()
        rows = []
        t0 = timed_read(t, spark)
        rows.append((0, 0, n0, t0))
        depth = 0
        for k in (1, 2, 4, 8, 16, 32):
            while depth < k:
                lo = depth * 1000
                t.delete_where(
                    spark,
                    [("event_id", ">=", lo), ("event_id", "<", lo + 1000)],
                    mode="mor",
                )
                depth += 1
            info = t.tombstone_info()
            sec = timed_read(t, spark)
            rows.append((k, info["covered_files"], t.read(spark).count(), sec))
        tm0 = time.perf_counter()
        t.materialize_tombstones(spark)
        mat_sec = time.perf_counter() - tm0
        sec = timed_read(t, spark)
        rows.append(("32→materialized", 0, t.read(spark).count(), sec))

    print("\n| depth | covered files | rows | full-scan agg (best of 3, s) |")
    print("|---|---|---|---|")
    for k, cov, n, sec in rows:
        print(f"| {k} | {cov} | {n} | {sec:.3f} |")
    print(f"\nmaterialize_tombstones wall: {mat_sec:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
