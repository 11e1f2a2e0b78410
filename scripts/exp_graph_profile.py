"""Phase profile of the iterative graph family (round 11, VERDICT
item 4): attribute parts_copurchase_pagerank / part_reach_3hops wall
time to edge build vs degree/persist vs per-iteration work, so the
optimization targets the real cost.

    python scripts/exp_graph_profile.py [sf_dir] [iters]

Replicates pagerank_int's phases inline (read-only experiment — the
operator itself is untouched) and times each action.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from filesystemagent_spark.catalog import Catalog  # noqa: E402
from filesystemagent_spark.operators import graph as G  # noqa: E402
from filesystemagent_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("exp-graph-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out: dict[str, float] = {}

    def timed(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        r = fn()
        out[label] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return r

    cat = Catalog(spark, sf_dir)
    edges = G.copurchase_edges(cat.lineitem)
    timed("0_edge_build_count", lambda: edges.count())

    par = sc.defaultParallelism
    ed = (
        edges.repartition(par, "src")
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    timed("1_degree_persist", lambda: ed.count())

    ranks = timed(
        "2_init_ranks_checkpoint",
        lambda: edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("rank", F.lit(1_000_000).cast("long"))
        .localCheckpoint(eager=True),
    )
    teleport = 15 * 1_000_000 // 100
    for i in range(iters):
        rside = F.broadcast(ranks)
        contribs = ed.join(rside, ed["src"] == rside["node"]).select(
            F.col("dst"), F.expr("rank div deg").alias("c")
        )
        nxt = contribs.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(teleport) + F.expr("(85 * sum(c)) div 100"))
            .cast("long")
            .alias("rank")
        )
        prev = ranks
        ranks = timed(f"3_iter_{i}", lambda n=nxt: n.localCheckpoint(eager=True))
        # Convergence census (decides VERDICT item 4's delta-iteration
        # question): how many nodes' EXACT integer rank changed this
        # iteration? If ~all keep changing in micro-units, pruning
        # converged vertices buys nothing at 5 iterations.
        changed = (
            ranks.join(
                prev.withColumnsRenamed({"rank": "prev_rank"}), "node"
            )
            .filter(F.col("rank") != F.col("prev_rank"))
            .count()
        )
        out[f"3_iter_{i}_changed_nodes"] = changed
    ed.unpersist()

    # the full registered queries, end to end, for reference
    from filesystemagent_spark.queries import registry

    qs = registry()
    for q in ("parts_copurchase_pagerank", "part_reach_3hops",
              "parts_copurchase_triangles"):
        timed(f"4_full_{q}", lambda q=q: qs[q].fn(spark, sf_dir).count())
        from filesystemagent_spark.caching import release_tracked_caches

        release_tracked_caches()

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
