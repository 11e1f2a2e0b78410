"""Bucketed-layout tests: the join of two same-bucketed tables must
contain no Exchange (shuffle) in its physical plan, and results must
match the plain join."""

from __future__ import annotations

import pytest

from filesystemagent_spark.sources.bucketed import shuffle_free_join, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force a sort-merge path so the Exchange assertion is meaningful
    (auto-broadcast would hide the shuffle question entirely)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    a = spark.range(0, 1000).selectExpr("id % 97 as k", "id as va")
    b = spark.range(0, 500).selectExpr("id % 97 as k", "id * 10 as vb")
    try:
        write_bucketed(a, "t_bk_a", "k", n_buckets=8)
        write_bucketed(b, "t_bk_b", "k", n_buckets=8)

        joined = shuffle_free_join(spark, "t_bk_a", "t_bk_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"

        want = a.join(b, "k").count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bk_a")
        spark.sql("DROP TABLE IF EXISTS t_bk_b")


def test_mismatched_buckets_still_correct(spark, no_broadcast):
    """Different bucket counts: plan legitimately shuffles one side,
    results stay correct — layout is an optimization, never a
    correctness dependency."""
    a = spark.range(0, 300).selectExpr("id % 13 as k", "id as va")
    b = spark.range(0, 300).selectExpr("id % 13 as k", "id as vb")
    try:
        write_bucketed(a, "t_bk_c", "k", n_buckets=8)
        write_bucketed(b, "t_bk_d", "k", n_buckets=4)
        joined = shuffle_free_join(spark, "t_bk_c", "t_bk_d", "k")
        assert joined.count() == a.join(b, "k").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bk_c")
        spark.sql("DROP TABLE IF EXISTS t_bk_d")
