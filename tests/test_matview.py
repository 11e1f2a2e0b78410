"""Batch incremental materialized-view maintenance (plans/matview.py):
the refresh path must converge to exactly what a full rebuild computes,
touch only the requested partitions, and be idempotent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from filesystemagent_spark.plans.matview import MaterializedRollup
from tests.oracle_utils import canon_rows


def _rows(df):
    pdf = df.toPandas()
    return canon_rows(list(pdf.columns), list(pdf.itertuples(index=False, name=None)))


@pytest.fixture()
def mv_env(spark, tmp_path):
    src = str(tmp_path / "events_src")
    base = spark.range(0, 600).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(MINUTE, CAST(id * 7 AS INT),"
            " TIMESTAMP_NTZ '2026-01-01 00:00:00')"
        ).alias("ts"),
        (F.col("id") % 37).alias("user_id"),
        F.expr("element_at(array('view','click','purchase'), CAST(id % 3 AS INT) + 1)").alias(
            "event_type"
        ),
        (F.col("id") % 100 / 10.0).alias("value"),
    )
    base.write.parquet(src)
    mv = MaterializedRollup(
        src, str(tmp_path / "mv"), bucket_seconds=3600, group_cols=["event_type"]
    )
    return src, mv, base


def test_build_equals_direct_rollup(spark, mv_env):
    src, mv, base = mv_env
    mv.build(spark)
    got = mv.read(spark).drop(MaterializedRollup.PART_COL)
    want = mv._partials_for(spark.read.parquet(src)).drop(MaterializedRollup.PART_COL)
    assert _rows(got) == _rows(want)


def test_refresh_converges_after_append_and_restatement(spark, mv_env, tmp_path):
    src, mv, base = mv_env
    mv.build(spark)

    # Append a brand-new day AND restate rows inside an existing day.
    extra = spark.createDataFrame(
        [
            (9001, "2026-01-05 08:30:00", 1, "view", 42.0),  # new day
            (9002, "2026-01-02 01:15:00", 2, "click", 7.0),  # existing day
        ],
        "event_id bigint, ts string, user_id bigint, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    extra.write.mode("append").parquet(src)

    stale = mv.stale_days(spark)
    assert stale == ["2026-01-02", "2026-01-05"]

    mv.refresh(spark, stale)
    got = mv.read(spark).drop(MaterializedRollup.PART_COL)
    want = mv._partials_for(spark.read.parquet(src)).drop(MaterializedRollup.PART_COL)
    assert _rows(got) == _rows(want)
    assert mv.stale_days(spark) == []


def test_refresh_touches_only_named_partitions(spark, mv_env):
    src, mv, base = mv_env
    mv.build(spark)
    untouched = os.path.join(mv.mv_dir, "pday=2026-01-01")
    before = sorted(os.listdir(untouched))
    mtimes = {f: os.path.getmtime(os.path.join(untouched, f)) for f in before}

    mv.refresh(spark, ["2026-01-03"])
    after = sorted(os.listdir(untouched))
    assert after == before
    assert all(
        os.path.getmtime(os.path.join(untouched, f)) == mtimes[f] for f in after
    )


def test_refresh_is_idempotent(spark, mv_env):
    src, mv, base = mv_env
    mv.build(spark)
    mv.refresh(spark, ["2026-01-02"])
    first = _rows(mv.read(spark))
    mv.refresh(spark, ["2026-01-02"])
    assert _rows(mv.read(spark)) == first


def test_refresh_drops_fully_restated_day(spark, mv_env):
    """A restatement that removes ALL of a day's source rows must
    still converge: the now-empty MV partition directory is deleted
    (dynamic overwrite alone would leave it behind forever)."""
    src, mv, base = mv_env
    mv.build(spark)
    assert os.path.isdir(os.path.join(mv.mv_dir, "pday=2026-01-02"))

    # Restate the source without any 2026-01-02 rows.
    kept = spark.read.parquet(src).filter(
        F.date_format("ts", "yyyy-MM-dd") != "2026-01-02"
    )
    kept.localCheckpoint(eager=True).write.mode("overwrite").parquet(src)

    stale = mv.stale_days(spark)
    assert "2026-01-02" in stale
    mv.refresh(spark, stale)

    assert not os.path.exists(os.path.join(mv.mv_dir, "pday=2026-01-02"))
    got = mv.read(spark).drop(MaterializedRollup.PART_COL)
    want = mv._partials_for(spark.read.parquet(src)).drop(MaterializedRollup.PART_COL)
    assert _rows(got) == _rows(want)
    assert mv.stale_days(spark) == []


def test_refresh_converges_with_midnight_straddling_buckets(spark, tmp_path):
    """bucket_seconds that does NOT divide 86400: a bucket can span
    midnight, so a row's raw-ts day differs from its MV partition.
    Refresh scoping is by bucket-derived day, so the incremental MV
    must still converge to the full rebuild and never corrupt the
    neighboring day's directory."""
    src = str(tmp_path / "events_src")
    base = spark.range(0, 400).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(MINUTE, CAST(id * 11 AS INT),"
            " TIMESTAMP_NTZ '2026-01-01 00:00:00')"
        ).alias("ts"),
        F.expr("element_at(array('view','click'), CAST(id % 2 AS INT) + 1)").alias(
            "event_type"
        ),
        (F.col("id") % 100 / 10.0).alias("value"),
    )
    base.write.parquet(src)
    mv = MaterializedRollup(
        src, str(tmp_path / "mv"), bucket_seconds=7000, group_cols=["event_type"]
    )
    mv.build(spark)

    # Append a row at 00:05 on Jan 3 — its 7000 s bucket STARTS on
    # Jan 2, so the raw-ts day (Jan 3) and MV partition (Jan 2) differ.
    extra = spark.createDataFrame(
        [(9001, "2026-01-03 00:05:00", "view", 42.0)],
        "event_id bigint, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    extra.write.mode("append").parquet(src)

    stale = mv.stale_days(spark)
    assert stale == ["2026-01-02"]
    mv.refresh(spark, stale)

    got = mv.read(spark).drop(MaterializedRollup.PART_COL)
    want = mv._partials_for(spark.read.parquet(src)).drop(MaterializedRollup.PART_COL)
    assert _rows(got) == _rows(want)
    assert mv.stale_days(spark) == []


def test_reaggregate_from_mv_partials(spark, mv_env):
    """Coarser grain (daily) must derive from the stored hourly
    partials alone and equal the direct daily rollup of raw rows."""
    from filesystemagent_spark.operators.rollup import reaggregate

    src, mv, base = mv_env
    mv.build(spark)
    daily_from_mv = reaggregate(
        mv.read(spark).drop(MaterializedRollup.PART_COL),
        group_cols=["event_type"],
        bucket_seconds=86400,
    )
    from filesystemagent_spark.operators.rollup import continuous_aggregate

    daily_direct = continuous_aggregate(
        spark.read.parquet(src),
        ts_col="ts",
        value_col="value",
        group_cols=["event_type"],
        bucket_seconds=86400,
    )
    assert _rows(daily_from_mv) == _rows(daily_direct)


def test_write_sharded_deterministic_and_stable(spark, tmp_path):
    """Shard export: md5 membership is identical across re-exports,
    appending new rows never moves old ones, and every shard dir holds
    exactly its keys."""
    from pyspark.sql import functions as F

    from filesystemagent_spark.sources.layout import write_sharded

    d1 = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    out1 = str(tmp_path / "s1")
    write_sharded(d1, out1, key_col="doc_id", n_shards=8)
    a = {
        (r.doc_id, r.shard)
        for r in spark.read.parquet(out1).select("doc_id", "shard").collect()
    }
    # grow the corpus, re-export elsewhere: old assignments unchanged
    d2 = spark.range(0, 800).select(F.col("id").alias("doc_id"))
    out2 = str(tmp_path / "s2")
    write_sharded(d2, out2, key_col="doc_id", n_shards=8)
    b = {
        (r.doc_id, r.shard)
        for r in spark.read.parquet(out2).select("doc_id", "shard").collect()
    }
    assert a <= b and len(b) == 800
    shards = {s for _, s in b}
    # partition-column inference reads `shard=05` back as INT 5
    assert shards == set(range(8))


def test_expire_partitions_retention(spark, tmp_path):
    """Retention is a partition-directory metadata op: keep newest K
    day dirs, idempotent, and the surviving table still reads."""
    import os

    from pyspark.sql import functions as F

    from filesystemagent_spark.sources.layout import expire_partitions, write_partitioned

    df = spark.createDataFrame(
        [(i, f"2026-01-{d:02d}") for i, d in enumerate([1, 1, 2, 3, 4])],
        "v bigint, day string",
    )
    out = str(tmp_path / "ret")
    write_partitioned(df, out, "day")
    removed = expire_partitions(out, keep=2)
    assert removed == ["day=2026-01-01", "day=2026-01-02"]
    assert expire_partitions(out, keep=2) == []  # idempotent
    left = spark.read.parquet(out)
    # partition inference reads the dir value back as DATE
    assert sorted(str(r.day) for r in left.select("day").distinct().collect()) == [
        "2026-01-03",
        "2026-01-04",
    ]
    assert sorted(os.listdir(out))[-1].startswith("day=")
