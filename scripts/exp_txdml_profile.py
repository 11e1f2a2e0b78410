"""Attribute events_txtable_dml's cost to its lifecycle phases
(round 9, verdict item 7).

The bench headliner drifted 1.996s (r7) -> 2.31-2.36s (r8 driver +
two adjudication runs) and back to ~2.0s on this round's quiet host —
this script splits the lifecycle into its commit-path phases and
times each over `n` repetitions so any future drift can be attributed
to a phase instead of re-profiled from scratch:

  init      600k-row snapshot write (parquet staging + footer stats)
  merge     file-granular MERGE (probe, anti-join rewrite, feed stage)
  delete    stats-pruned DELETE WHERE (rewrite covered files only)
  snap_agg  final-snapshot rollup (read + groupBy)
  feed_agg  change-feed replay rollup (table_changes(1..) + groupBy)

Run: python scripts/exp_txdml_profile.py [sf_dir] [n]
Output: per-phase median seconds + the bench-equivalent total.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.queries.txdml import _agg
    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import TxTable

    spark = get_spark()
    ev = Catalog(spark, sf_dir).events
    ev.count()  # warm the scan

    phases: dict[str, list[float]] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        phases.setdefault(name, []).append(time.monotonic() - t0)
        return out

    for _ in range(n):
        stage = tempfile.mkdtemp(prefix="txdml_prof_")
        t = TxTable(os.path.join(stage, "tbl"))
        timed("init", lambda: t.init(ev))
        ups = (
            ev.where(
                (F.col("event_type") == "click") & (F.col("event_id") % 7 == 0)
            )
            .withColumn("value", F.col("value") * 2)
            .withColumn("props", F.lit("updated"))
        )
        ins = (
            ev.where(F.col("event_id") % 997 == 0)
            .withColumn("event_id", F.col("event_id") + F.lit(100000000))
            .withColumn("event_type", F.lit("synthetic"))
        )
        timed(
            "merge",
            lambda: t.merge_into(
                ups.unionByName(ins), ["event_id"], change_feed=True
            ),
        )
        timed(
            "delete",
            lambda: t.delete_where(
                spark, [("event_type", "=", "error")], change_feed=True
            ),
        )
        timed(
            "snap_agg",
            lambda: t.read(spark)
            .groupBy(F.col("event_type").alias("key"))
            .agg(*_agg())
            .collect(),
        )
        timed(
            "feed_agg",
            lambda: t.table_changes(spark, 1)
            .groupBy(F.col("_change_type").alias("key"))
            .agg(*_agg())
            .collect(),
        )

    print(f"\nphase medians over {n} runs (sf={sf_dir}):")
    total = 0.0
    for name, ts in phases.items():
        med = statistics.median(ts)
        total += med
        print(f"  {name:9s} {med:6.3f}s   runs={[round(x,3) for x in ts]}")
    print(f"  {'total':9s} {total:6.3f}s (bench runs the same phases once)")


if __name__ == "__main__":
    main()
