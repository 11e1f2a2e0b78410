"""Constructed-graph tests for the near-dup operators: Hamming band
recall at distance 1-2, and connected-components label propagation on
topologies the gate oracle can't reach (chains, multi-hop merges)."""

from __future__ import annotations

from filesystemagent_spark.operators.dedup import (
    hamming_near_dup_pairs,
    near_dup_clusters,
)


def _i64(v: int) -> int:
    """Two's-complement wrap to signed 64-bit (LongType)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def test_hamming_banding_finds_small_distances(spark):
    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base ^ 0x1),                # distance 1
        (3, base ^ 0x3),                # distance 2 from base, 1 from id 2
        (4, _i64(base ^ (1 << 63))),    # distance 1 (high bit, different band)
        (5, 0x7EDCBA9876543210),        # far away
    ]
    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in hamming_near_dup_pairs(df, "id", "h", max_distance=2).collect()
    }
    assert (1, 2, 1) in got
    assert (1, 3, 2) in got
    assert (2, 3, 1) in got
    assert (1, 4, 1) in got
    assert not any(5 in (a, b) for a, b, _ in got)


def test_hamming_banding_excludes_beyond_threshold(spark):
    base = 0
    rows = [(1, base), (2, base ^ 0x7)]  # distance 3 > max 2
    df = spark.createDataFrame(rows, "id long, h long")
    assert hamming_near_dup_pairs(df, "id", "h", max_distance=2).count() == 0


def test_clusters_chain_topology(spark):
    """a-b and b-c edges, no a-c: one component labeled min(id)."""
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 50]], "id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in near_dup_clusters(ids, pairs, id_col="id").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (50, 50)}


def test_clusters_multi_hop_merge(spark):
    """A long path needs several propagation rounds to converge."""
    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels = near_dup_clusters(ids, pairs, id_col="id").collect()
    assert {r["cluster_id"] for r in labels} == {0}
    assert len(labels) == n


def test_minhash_recall_vs_exact(spark, sf_dir):
    """MinHash+LSH output is a subset of the exact pair set (verify
    step computes true Jaccard) and banding recall is ~1 for
    high-similarity pairs: P(candidate) = 1-(1-J^rows)^bands ~ 0.9998
    at J=0.8 with 16 bands x 4 rows."""
    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = Catalog(spark, sf_dir).documents
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.4
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.4
        ).collect()
    }
    assert set(got) <= set(exact)
    for pair, j in got.items():
        assert j == exact[pair]  # verify recomputes true jaccard
    high = {p for p, j in exact.items() if j >= 0.8}
    assert high, "fixture should contain high-similarity pairs"
    found_high = high & set(got)
    assert len(found_high) / len(high) >= 0.95, "banding missed high-sim pairs"


def test_ngram_jaccard_max_doc_freq_bounds_hot_shingles(spark):
    """The hot-shingle cap: a boilerplate shingle shared by every doc
    must not explode the self-join. With the cap, (a) the hot shingle
    contributes no candidates, (b) true near-dup pairs whose overlap
    doesn't hinge on boilerplate are still found with jaccard a lower
    bound of the exact value, and (c) pairs are a subset of exact."""
    from filesystemagent_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved worldwide"
    rows = []
    for i in range(40):
        body = f"unique text number {i} about topic {i % 7} item {i}"
        rows.append((i, f"{body} {boiler}"))
    # one true near-dup pair sharing their whole body
    rows.append((100, f"shared body of text alpha beta gamma delta {boiler}"))
    rows.append((101, f"shared body of text alpha beta gamma delta epsilon {boiler}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.3
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.3, max_doc_freq=10
        ).collect()
    }
    assert (100, 101) in exact and (100, 101) in capped
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j <= exact[pair] + 1e-12  # n_common only shrinks


def test_ngram_jaccard_prune_is_exact_when_under_cap(spark, sf_dir):
    """With a cap no shingle reaches, the pruned form equals the exact
    form bit-for-bit (the df==1 drop is always semantics-preserving)."""
    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.dedup import ngram_jaccard_pairs

    docs = Catalog(spark, sf_dir).documents
    exact = sorted(
        map(tuple, ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.4
        ).collect())
    )
    capped = sorted(
        map(tuple, ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.4,
            max_doc_freq=10**9,
        ).collect())
    )
    assert exact == capped
