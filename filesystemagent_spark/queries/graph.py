"""Iterative graph queries over the co-purchase part graph.

Capability extension beyond the reference (its only graph op is the
greedy near-dup clustering, /root/reference/src/media_fingerprinting.py:278-310,
generalized in operators/dedup.near_dup_clusters): link-analysis
ranking and bounded-hop reachability, both expressed so a DuckDB
oracle replays them bit-for-bit — PageRank in exact integer arithmetic
(unrolled iterations in SQL), BFS as the same WITH RECURSIVE text both
engines execute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.operators import graph as G
from filesystemagent_spark.queries import register

_ITERS = 5

# Shared oracle prologue: distinct (order, part) -> symmetric distinct
# edge list -> out-degrees. Mirrors operators/graph.copurchase_edges.
_EDGES_SQL = """
lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ow AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM lp a JOIN lp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
ow2 AS (SELECT DISTINCT src, dst FROM ow),
edges AS (SELECT src, dst FROM ow2 UNION ALL SELECT dst AS src, src AS dst FROM ow2),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
"""


def _pagerank_oracle(iters: int) -> str:
    # Unrolled exact-integer iterations: r_{i+1}(v) =
    # 150000 + (85 * Σ r_i(u) // deg(u)) // 100 over in-neighbors u.
    # `//` is BIGINT floor division in DuckDB = Spark's `div` on the
    # same non-negative values.
    steps = ["r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg)"]
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
    SELECT e.dst AS node,
           CAST(150000 + (85 * SUM(r.pr // d.d)) // 100 AS BIGINT) AS pr
    FROM edges e
    JOIN r{i - 1} r ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
)"""
        )
    return f"""
WITH {_EDGES_SQL.strip().rstrip()},
{",".join(steps)}
SELECT r.node AS part_id, p.p_name, r.pr AS rank_micro
FROM r{iters} r JOIN part p ON p.p_partkey = r.node
ORDER BY rank_micro DESC, part_id ASC
LIMIT 20
"""


@register(
    "parts_copurchase_pagerank",
    tags=("graph", "iterative", "join", "agg"),
    oracle=_pagerank_oracle(_ITERS),
)
def parts_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph, 5 exact-integer
    iterations — the iterative-algorithm capability (influence ranking
    / graph centrality for curation) as a pure DataFrame loop.

    Scale notes: the edge list is built by bounded within-order pair
    expansion (one shuffle of lineitem), persisted so each iteration's
    src-side join reuses the same scan+partitions; per-iteration data
    in motion is one edges⋈ranks join plus a node-cardinality
    re-aggregation. Integer micro-unit ranks make the result
    partition-order independent — the oracle replays the exact
    arithmetic, not an approximation of it.
    """
    cat = Catalog(spark, sf_dir)
    edges = G.copurchase_edges(cat.lineitem)
    # pagerank_int persists the degree-annotated edges for its loop and
    # releases them before returning lineage-free (checkpointed) ranks.
    ranks = G.pagerank_int(edges, iterations=_ITERS)
    part = cat.part.select(F.col("p_partkey").alias("part_id"), "p_name")
    return (
        ranks.select(F.col("node").alias("part_id"), F.col("rank").alias("rank_micro"))
        .join(F.broadcast(part), "part_id")
        .select("part_id", "p_name", "rank_micro")
        .orderBy(F.col("rank_micro").desc(), F.col("part_id").asc())
        .limit(20)
    )


_REACH_SQL = f"""
WITH RECURSIVE {_EDGES_SQL.strip().rstrip()},
frontier(node, dist) AS (
    SELECT CAST(p_partkey AS BIGINT) AS node, 0 AS dist
    FROM part WHERE p_size = 50
    UNION ALL
    SELECT DISTINCT e.dst AS node, f.dist + 1 AS dist
    FROM frontier f JOIN edges e ON e.src = f.node
    WHERE f.dist < 3
)
SELECT node AS part_id, MIN(dist) AS hops
FROM frontier
GROUP BY node
ORDER BY hops ASC, part_id ASC
"""


@register(
    "part_reach_3hops",
    tags=("graph", "recursive-cte", "bfs"),
    oracle=_REACH_SQL,
)
def part_reach_3hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-hop reachability from the p_size=50 seed parts through
    the co-purchase graph — Spark 4's WITH RECURSIVE executing the
    SAME SQL text the DuckDB oracle runs (declarative distributed
    BFS). The recursive step is DISTINCT-bounded: every frontier is at
    most node-cardinality, so depth-3 never goes multiplicative even
    on this dense graph (avg degree ~115).
    """
    cat = Catalog(spark, sf_dir)
    cat.register_views(("lineitem", "part"))
    return spark.sql(_REACH_SQL)


@register(
    "parts_copurchase_triangles",
    tags=("graph", "triangles", "degree-orientation"),
    oracle=f"""
WITH {_EDGES_SQL.strip().rstrip()},
tri AS (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM ow2 e1
    JOIN ow2 e2 ON e2.src = e1.dst
    JOIN ow2 e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
members AS (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
),
cnt AS (SELECT node, COUNT(*) AS n_triangles FROM members GROUP BY node)
SELECT c.node AS part_id, p.p_name, c.n_triangles
FROM cnt c JOIN part p ON p.p_partkey = c.node
ORDER BY n_triangles DESC, part_id ASC
LIMIT 20
""",
)
def parts_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the co-purchase graph (graph-analytics
    class beyond ranking/reachability): parts that co-occur pairwise
    in three-way cliques are strong bundle candidates. Spark side uses
    degree-ordered orientation (operators/graph.triangle_counts —
    out-neighborhoods bounded by O(sqrt(m)), wedge join + closure
    join, no per-node loops); the oracle counts the same
    orientation-invariant triangle set with a plain id-ordered 3-way
    self-join. Top-20 parts by triangle participation, id tie-break,
    dimension joined AFTER the top-k cut."""
    cat = Catalog(spark, sf_dir)
    edges = G.copurchase_edges(cat.lineitem).where(F.col("src") < F.col("dst"))
    counts = G.triangle_counts(edges)
    top = counts.orderBy(F.desc("n_triangles"), F.asc("node")).limit(20)
    part = cat.part.select(
        F.col("p_partkey").alias("node"), "p_name"
    )
    return (
        top.join(F.broadcast(part), "node")
        .select(F.col("node").alias("part_id"), "p_name", "n_triangles")
        .orderBy(F.desc("n_triangles"), F.asc("part_id"))
    )
