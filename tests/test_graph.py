"""Operator-semantics tests for the iterative graph module.

The oracle parity test already hash-checks the full queries at sf0.001;
these pin the operator invariants on a graph small enough to verify by
hand: symmetry of the edge builder, rank-mass conservation and
partition-order determinism of integer PageRank, and BFS distance
correctness of the recursive-CTE reach.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filesystemagent_spark.operators import graph as G

# Path graph 1-2-3-4 plus a hub 5 connected to everything: degrees
# (1:2, 2:3, 3:3, 4:2, 5:4) — small enough to reason about exactly.
_EDGES = [
    (1, 2), (2, 3), (3, 4),
    (5, 1), (5, 2), (5, 3), (5, 4),
]


def _edges_df(spark):
    one_way = spark.createDataFrame(_EDGES, "src long, dst long")
    return one_way.unionAll(
        one_way.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_copurchase_edges_symmetric_and_bounded(spark):
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 2), (11, 3), (12, 7), (12, 7)],
        "l_orderkey long, l_partkey long",
    )
    edges = G.copurchase_edges(li)
    rows = {(r.src, r.dst) for r in edges.collect()}
    # order 10 → 3 undirected pairs, order 11 adds only (2,3) again
    # (deduped), order 12 has a single distinct item → no self-edge.
    assert rows == {
        (1, 2), (1, 3), (2, 3),
        (2, 1), (3, 1), (3, 2),
    }
    # symmetric by construction
    assert {(d, s) for s, d in rows} == rows


def test_pagerank_mass_and_ordering(spark):
    edges = _edges_df(spark)
    ranks = {r.node: r["rank"] for r in G.pagerank_int(edges, iterations=5).collect()}
    assert set(ranks) == {1, 2, 3, 4, 5}
    # Total mass stays within integer-truncation slack of n * scale
    # (each `div` can lose < 1 micro-unit per edge per iteration).
    total = sum(ranks.values())
    assert 0.95 * 5_000_000 < total <= 5_000_000
    # The hub (degree 4) must outrank the path endpoints (degree 2).
    assert ranks[5] > ranks[1]
    assert ranks[5] > ranks[4]


def test_pagerank_partitioning_invariant(spark):
    """Integer arithmetic ⇒ bit-identical ranks under any layout."""
    edges = _edges_df(spark)
    a = sorted((r.node, r["rank"]) for r in G.pagerank_int(edges, 3).collect())
    b = sorted(
        (r.node, r["rank"])
        for r in G.pagerank_int(edges.repartition(7, "dst"), 3).collect()
    )
    assert a == b


def test_reach_min_hops_distances(spark):
    edges = _edges_df(spark)
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in G.reach_min_hops(spark, edges, seeds, 3).collect()}
    # 1 —0→ {2,5} —1→ ... shortest paths: 2:1, 5:1, 3:2, 4:2
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}


def test_reach_respects_hop_bound(spark):
    # chain 1→2→3→4→5 directed; from 1 with max_hops=2 node 4,5 absent
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in G.reach_min_hops(spark, chain, seeds, 2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_triangle_counts_known_graph(spark):
    from itertools import combinations

    # K4 on 1-4 (each node in 3 triangles) + pendant + disjoint triangle
    edges = [(a, b) for a, b in combinations([1, 2, 3, 4], 2)] + [
        (4, 5), (6, 7), (6, 8), (7, 8),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in G.triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}


def test_triangle_counts_matches_bruteforce(spark):
    import random
    from itertools import combinations

    random.seed(17)
    nodes = list(range(24))
    es = sorted({tuple(sorted(random.sample(nodes, 2))) for _ in range(90)})
    df = spark.createDataFrame(es, "src long, dst long")
    got = {r.node: r.n_triangles for r in G.triangle_counts(df).collect()}
    eset = set(es)
    want = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want
