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


def test_txtable_bucketed_compact_joins_exchange_free(spark, no_broadcast, tmp_path):
    """Round-6 flagship-format parity with the warehouse bucketed path:
    two TxTables compacted with the same bucket_by spec join on the
    bucket key with NO Exchange in the executed plan (and, one file per
    bucket, no runtime Sort on the probe side), while results match the
    plain-read join exactly."""
    from filesystemagent_spark.sources.txtable import TxTable

    a = TxTable(str(tmp_path / "ta"))
    b = TxTable(str(tmp_path / "tb"))
    a.init(spark.range(0, 1000).selectExpr("id % 97 as k", "id as va"))
    b.init(spark.range(0, 500).selectExpr("id % 97 as k", "id * 10 as vb"))
    a.compact(spark, bucket_by=(["k"], 8))
    b.compact(spark, bucket_by=(["k"], 8))

    da, db = a.read_bucketed(spark), b.read_bucketed(spark)
    joined = da.join(db, "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed TxTable join shuffled:\n{plan}"

    want = {
        (r.k, r.va, r.vb)
        for r in a.read(spark).join(b.read(spark), "k").collect()
    }
    got = {(r.k, r.va, r.vb) for r in joined.collect()}
    assert got == want and got


def test_txtable_bucketing_invalidated_by_dml(spark, tmp_path):
    """Any DML after the bucketed compact publishes a manifest WITHOUT
    the spec: read_bucketed refuses (stale clustering must never be
    silently trusted), read() still works, and a re-compact restores
    the bucketed path."""
    import pytest as _pytest

    from filesystemagent_spark.sources.txtable import TxTable

    t = TxTable(str(tmp_path / "t"))
    t.init(spark.range(0, 100).selectExpr("id % 7 as k", "id as v"))
    t.compact(spark, bucket_by=(["k"], 4))
    assert t.read_bucketed(spark).count() == 100

    t.merge_into(
        spark.createDataFrame([(3, 999)], "k bigint, v bigint"), ["k", "v"]
    )
    with _pytest.raises(ValueError, match="not bucket-clustered"):
        t.read_bucketed(spark)
    assert t.read(spark).count() == 101
    # the bucketed VERSION stays readable via time travel
    assert t.read_bucketed(spark, version=2).count() == 100
    t.compact(spark, bucket_by=(["k"], 4))
    assert t.read_bucketed(spark).count() == 101


def test_bucketed_compact_of_empty_snapshot(spark, tmp_path):
    """compact(bucket_by=...) on an empty snapshot stages zero bucket
    files; the manifest must then carry NO bucketing spec (a spec with
    dir='' made read_bucketed emit CREATE TABLE ... LOCATION '') —
    read() serves the empty snapshot, read_bucketed raises its
    designed not-clustered error."""
    from filesystemagent_spark.sources.txtable import TxTable

    t = TxTable(str(tmp_path / "tbl"))
    t.init(spark.range(0, 5).selectExpr("id AS k", "id AS v"))
    t.delete_where(spark, [("k", ">=", 0)])
    v = t.compact(spark, bucket_by=(["k"], 4))
    assert t.read(spark, v).count() == 0
    assert t._read_manifest(v).get("bucketing") is None
    with pytest.raises(ValueError, match="not bucket-clustered"):
        t.read_bucketed(spark, v)
