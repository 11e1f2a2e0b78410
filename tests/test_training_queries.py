"""Semantic invariants for the round-2 training-pipeline queries
(queries/training.py) — independent of the oracle-parity hash check,
these pin the properties the SQL mirror can't state (monotonicity,
bounds, split discipline)."""

from __future__ import annotations

from filesystemagent_spark.queries import registry
from filesystemagent_spark.queries.training import TRAIN_PCT, _split_col

QUERIES = registry()


def test_repetition_bounds(spark, sf_dir):
    rows = QUERIES["doc_repetition_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_distinct_tokens <= r.n_tokens
        assert 0 <= r.n_distinct_2grams <= r.n_2grams
        assert 0.0 <= r.dup_token_ratio <= 1.0
        assert 0.0 <= r.dup_2gram_ratio <= 1.0
        # n tokens produce n-1 bigrams (or 0 for degenerate docs)
        assert r.n_2grams in (0, r.n_tokens - 1)


def test_funnel_is_monotone_nonincreasing(spark, sf_dir):
    rows = (
        QUERIES["events_funnel"].fn(spark, sf_dir)
        .orderBy("stage_order")
        .collect()
    )
    assert [r.stage for r in rows] == ["signup", "view", "click", "purchase"]
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    assert all(0.0 <= r.conversion_from_prev <= 1.0 for r in rows[1:])
    assert rows[0].conversion_from_first == 1.0 or rows[0].n_users == 0


def test_retention_day_zero_covers_every_user(spark, sf_dir):
    from filesystemagent_spark.catalog import Catalog

    ret = QUERIES["events_retention"].fn(spark, sf_dir)
    day0 = ret.filter("day_offset = 0").agg({"n_active_users": "sum"}).collect()[0][0]
    n_users = Catalog(spark, sf_dir).events.select("user_id").distinct().count()
    # every user is active on their own cohort day by construction
    assert day0 == n_users
    assert ret.filter("day_offset < 0").count() == 0


def test_contamination_only_test_split_and_bounded(spark, sf_dir):
    from filesystemagent_spark.catalog import Catalog

    out = QUERIES["doc_ngram_contamination"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "contamination check must be non-vacuous on testdata"
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_ngrams
        assert 0.0 <= r.contamination_rate <= 1.0
    # output ids are exactly the shingled test-split docs
    docs = Catalog(spark, sf_dir).documents
    test_ids = {
        r.doc_id
        for r in docs.select("doc_id", _split_col().alias("s"))
        .filter("s = 'test'")
        .collect()
    }
    out_ids = {r.doc_id for r in rows}
    assert out_ids <= test_ids
    assert 0 < TRAIN_PCT < 100


def test_quality_deciles_approx_agrees_with_exact(spark, sf_dir):
    """The sketch-boundary decile assignment must agree with exact
    NTILE(10) for nearly every document (disagreement only within
    sketch error of a boundary), and produce ~equal-sized deciles."""
    from filesystemagent_spark.queries import registry

    reg = registry()
    exact = {r.decile: r.n_docs for r in reg["doc_quality_deciles"].fn(spark, sf_dir).collect()}
    approx = {r.decile: r.n_docs for r in reg["doc_quality_deciles_approx"].fn(spark, sf_dir).collect()}
    n = sum(exact.values())
    assert sum(approx.values()) == n  # every doc assigned exactly once
    # per-decile counts within 20% of n/10 (ties can shift boundary mass)
    for d in range(1, 11):
        assert approx.get(d, 0) >= 0.5 * n / 10, (d, approx)
    # total absolute deviation from the exact histogram is small
    dev = sum(abs(exact.get(d, 0) - approx.get(d, 0)) for d in range(1, 11))
    assert dev <= 0.2 * n, (dev, exact, approx)
