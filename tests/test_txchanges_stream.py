"""Streaming change-feed source (sources/txchanges.py): each TxTable
commit is one micro-batch increment with a version-cursor checkpoint;
non-CDF versions fail the stream loudly."""

from __future__ import annotations

import os

import pytest

from filesystemagent_spark.sources.txchanges import register_txtable_changes
from filesystemagent_spark.sources.txtable import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "file_path string, size bigint")


def _drain(spark, tbl, out, ckpt):
    q = (
        spark.readStream.format("txtable_changes").option("path", tbl).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return {
        (r.file_path, r.size, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }


def test_stream_drains_and_resumes_from_version_cursor(spark, tmp_path):
    register_txtable_changes(spark)
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1), ("/b", 2)]))                          # v1
    t.merge_into(_df(spark, [("/b", 20), ("/c", 3)]), ["file_path"],
                 change_feed=True)                                      # v2
    t.delete_where(spark, [("file_path", "=", "/a")], change_feed=True)  # v3
    t.compact(spark, target_files=1)                                    # v4 (skipped)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = _drain(spark, tbl, out, ckpt)
    assert got == {
        ("/a", 1, "insert", 1), ("/b", 2, "insert", 1),
        ("/b", 20, "upsert", 2), ("/c", 3, "upsert", 2),
        ("/a", 1, "delete", 3),
    }
    # matches the batch reader over the same range
    batch = {
        (r.file_path, r.size, r._change_type, r._commit_version)
        for r in t.table_changes(spark, 1, to_version=4).collect()
    }
    assert got == batch

    # resume: only the new commit arrives (checkpoint holds the cursor)
    t.merge_into(_df(spark, [("/d", 4)]), ["file_path"], change_feed=True)  # v5
    got2 = _drain(spark, tbl, out, ckpt)
    assert got2 - got == {("/d", 4, "upsert", 5)}


def test_stream_fails_loudly_on_feed_gap(spark, tmp_path):
    register_txtable_changes(spark)
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))
    t.merge_into(_df(spark, [("/b", 2)]), ["file_path"])  # NO change feed

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txtable_changes").option("path", tbl).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="without change_feed"):
        q.awaitTermination()


def test_stream_fromversion_option_skips_history(spark, tmp_path):
    register_txtable_changes(spark)
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))                                       # v1
    t.merge_into(_df(spark, [("/b", 2)]), ["file_path"], change_feed=True)  # v2

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txtable_changes")
        .option("path", tbl).option("fromversion", "1").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.file_path, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("/b", 2)}
    assert os.path.isdir(ckpt)
