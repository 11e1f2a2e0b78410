"""Streaming change-feed source (sources/txchanges.py): each TxTable
commit is one micro-batch increment with a version-cursor checkpoint;
non-CDF versions fail the stream loudly; the read path is Arrow
end-to-end (per-file partitions, RecordBatch yields) with a
maxversionspertrigger admission bound."""

from __future__ import annotations

import os

import pytest

from filesystemagent_spark.sources.txchanges import (
    TxTableChangesDataSource,
    TxTableChangesStreamReader,
    register_txtable_changes,
)
from filesystemagent_spark.sources.txtable import TxTable


def _reader(spark, tbl, **opts):
    """Build the stream reader the way Spark would: resolve the source
    schema, then hand it to streamReader."""
    from pyspark.sql.types import _parse_datatype_string

    options = {"path": tbl, **{k.lower(): str(v) for k, v in opts.items()}}
    ds = TxTableChangesDataSource(options=options)
    schema = _parse_datatype_string(ds.schema())
    return TxTableChangesStreamReader(options, schema)


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
        ("/b", 2, "update_preimage", 2),  # old row the merge replaced
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


def test_partitions_split_per_change_file(spark, tmp_path):
    """A version staged as N files plans N partitions (cluster fan-out
    instead of one task per version)."""
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))
    ups = _df(spark, [("/b", 2), ("/c", 3), ("/d", 4)]).repartition(3)
    t.merge_into(ups, ["file_path"], change_feed=True)  # v2: 3 change files

    r = _reader(spark, tbl)
    parts = r.partitions({"version": 1}, {"version": 2})
    ups = [p for p in parts if p.change_type == "upsert"]
    # >= 3: the staged image is union(empty-frame, updates), so the
    # exact file count can exceed the update's partition count
    assert len(ups) >= 3
    assert len({p.file for p in parts}) == len(parts)
    assert all(p.version == 2 for p in parts)
    # a stats-less (empty) staged file conservatively counts as touched,
    # so a (possibly empty) update_preimage part may ride along
    assert {p.change_type for p in parts} <= {"upsert", "update_preimage"}


def test_read_yields_record_batches_not_rows(spark, tmp_path):
    """The executor path is Arrow end-to-end: read() yields pyarrow
    RecordBatches with the change columns appended arrow-side — no
    per-row Python tuples."""
    import pyarrow as pa

    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))
    t.merge_into(_df(spark, [("/b", 2), ("/c", 3)]), ["file_path"],
                 change_feed=True)

    r = _reader(spark, tbl)
    parts = r.partitions({"version": 1}, {"version": 2})
    out = [b for p in parts for b in r.read(p)]
    assert out and all(isinstance(b, pa.RecordBatch) for b in out)
    got = pa.Table.from_batches(out).to_pydict()
    assert got["_change_type"] == ["upsert", "upsert"]
    assert got["_commit_version"] == [2, 2]
    assert sorted(zip(got["file_path"], got["size"])) == [("/b", 2), ("/c", 3)]


def test_max_versions_per_trigger_bounds_each_batch(spark, tmp_path):
    """maxversionspertrigger=1: latestOffset advances one version per
    planned batch instead of jumping to the head — a long-history
    table is consumed in bounded micro-batches."""
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))
    for i in range(3):
        t.merge_into(_df(spark, [(f"/f{i}", i)]), ["file_path"],
                     change_feed=True)  # v2..v4

    r = _reader(spark, tbl, maxversionspertrigger=1)
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 1}   # bounded, not 4
    assert r.latestOffset() == {"version": 2}
    assert r.latestOffset() == {"version": 3}
    assert r.latestOffset() == {"version": 4}
    assert r.latestOffset() == {"version": 4}   # caught up, holds at head

    with pytest.raises(ValueError, match="maxversionspertrigger"):
        _reader(spark, tbl, maxversionspertrigger=0)


def test_max_versions_after_restart_never_plans_behind_checkpoint(spark, tmp_path):
    """Defensive fallback: if latestOffset ever fires with no cursor
    and no cursorfile it must be unbounded rather than risk an end
    BEHIND the checkpoint that would re-deliver rows; the cap
    re-engages once partitions OR commit syncs it. (In practice Spark
    4.x replays the offsets log through partitions AND calls commit
    first — pinned end-to-end by
    test_restart_keeps_admission_bound_engaged below.)"""
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))
    for i in range(4):
        t.merge_into(_df(spark, [(f"/f{i}", i)]), ["file_path"],
                     change_feed=True)  # v2..v5

    r = _reader(spark, tbl, maxversionspertrigger=1)  # fresh object = restart
    assert r.latestOffset() == {"version": 5}  # no initialOffset call: unbounded
    r2 = _reader(spark, tbl, maxversionspertrigger=1)
    r2.partitions({"version": 3}, {"version": 3})  # checkpoint sync
    assert r2.latestOffset() == {"version": 4}  # cap re-engaged from 3
    r3 = _reader(spark, tbl, maxversionspertrigger=1)
    r3.commit({"version": 3})  # restart's commit replay seeds too
    assert r3.latestOffset() == {"version": 4}


@pytest.mark.parametrize("cf_style", ["plain", "file_uri"])
def test_cursorfile_bounds_blind_restart_catchup(spark, tmp_path, cf_style):
    """Durable cursor belt: the reader persists every PLANNED version
    to the cursorfile BEFORE returning it, so a restarted reader whose
    very first call is latestOffset (the flow Spark doesn't use today)
    still caps the catch-up batch at planned + maxversionspertrigger
    instead of jumping to head — and never plans behind the
    checkpoint (file is written ahead of the offsets log). Runs over
    both a plain path and a file:// URI checkpoint spelling (the URI
    form is what a remote-checkpoint sink passes)."""
    import json as _json

    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))
    for i in range(4):
        t.merge_into(_df(spark, [(f"/f{i}", i)]), ["file_path"],
                     change_feed=True)  # v2..v5
    cf_path = str(tmp_path / "ckpt" / "txchanges_cursor.json")
    cf = cf_path if cf_style == "plain" else f"file://{cf_path}"

    # first life: plans v1 then v2, persisting each BEFORE returning
    r = _reader(spark, tbl, maxversionspertrigger=1, cursorfile=cf)
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 1}
    with open(cf_path) as fh:
        assert _json.load(fh) == {"version": 1}  # written ahead of the log
    assert r.latestOffset() == {"version": 2}

    # restart where latestOffset fires FIRST: capped at 2+1, not 5
    r2 = _reader(spark, tbl, maxversionspertrigger=1, cursorfile=cf)
    assert r2.latestOffset() == {"version": 3}
    assert r2.latestOffset() == {"version": 4}

    # a stale-behind file never wins over a live seed (monotone max)
    r3 = _reader(spark, tbl, maxversionspertrigger=1, cursorfile=cf)
    r3.partitions({"version": 4}, {"version": 4})
    assert r3.latestOffset() == {"version": 5}
    with open(cf_path) as fh:
        assert _json.load(fh) == {"version": 5}


def test_restart_keeps_admission_bound_engaged(spark, tmp_path):
    """End-to-end restart pin: Spark 4.x replays the offsets log's last
    entry through partitions(start, end) BEFORE the first post-restart
    latestOffset, which seeds the reader's cursor — so a restart
    against a 3-version backlog with maxversionspertrigger=1 still
    admits ONE version per micro-batch (offsets log advances +1 per
    batch) instead of planning one unbounded catch-up batch. If Spark
    ever stops replaying partitions first, the first post-restart
    offset jumps straight to head and this test fails."""
    import json
    import time

    register_txtable_changes(spark)
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))  # v1
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def logged_versions():
        d = os.path.join(ckpt, "offsets")
        if not os.path.isdir(d):
            return {}
        vers = {}
        for name in os.listdir(d):
            if not name.isdigit():
                continue
            with open(os.path.join(d, name), encoding="utf-8") as fh:
                last = fh.read().strip().splitlines()[-1]
            vers[int(name)] = json.loads(last)["version"]
        return vers

    def run_until(target_version, timeout=60):
        q = (
            spark.readStream.format("txtable_changes").option("path", tbl)
            .option("maxversionspertrigger", "1").load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds").start()
        )
        try:
            deadline = time.time() + timeout
            while time.time() < deadline:
                if max(logged_versions().values(), default=0) >= target_version:
                    return
                time.sleep(0.2)
            raise AssertionError(
                f"stream never reached v{target_version}: {logged_versions()}"
            )
        finally:
            q.stop()

    run_until(1)  # first run drains v1, checkpoint at version 1
    for i in range(3):  # backlog: v2..v4
        t.merge_into(_df(spark, [(f"/f{i}", i)]), ["file_path"],
                     change_feed=True)
    run_until(4)  # restart against the backlog

    vers = [v for _, v in sorted(logged_versions().items())]
    # monotone, and every post-restart step admits at most ONE version
    assert vers[-1] == 4
    steps = [b - a for a, b in zip(vers, vers[1:])]
    assert all(0 <= s <= 1 for s in steps), f"unbounded catch-up batch: {vers}"


def test_stream_null_fills_columns_added_after_the_image(spark, tmp_path):
    """Schema evolution: change images written before a column existed
    stream with that column null-filled (arrow-side), under the table's
    LATEST schema."""
    register_txtable_changes(spark)
    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(_df(spark, [("/a", 1)]))                                     # v1: 2 cols
    t.merge_into(
        spark.createDataFrame([("/b", 2, 0.5)],
                              "file_path string, size bigint, score double"),
        ["file_path"], change_feed=True,
    )                                                                   # v2: 3 cols

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txtable_changes").option("path", tbl).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.file_path, r.size, r.score, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("/a", 1, None, "insert", 1),
        ("/b", 2, 0.5, "upsert", 2),
    }


def test_read_path_has_no_per_row_python():
    """Regression pin for the round-4 verdict's 'weak' finding: the
    change-feed read path must stay arrow-batched."""
    import inspect

    import filesystemagent_spark.sources.txchanges as m

    src = inspect.getsource(m)
    assert "to_pylist" not in src
    assert "iter_batches" in src


def test_local_checkpoint_dir_scheme_handling():
    """The cursor belt engages for every local spelling Hadoop accepts
    and stays off for remote stores (a naive '://' test misread
    file:/p as relative and skipped file:///p; review finding). A
    file: URI naming a REMOTE authority is NOT driver-local — treating
    file://otherhost/ck as /ck wrote the cursor to a wrong local
    location (round-7 review finding)."""
    from filesystemagent_spark.streaming.sinks import _local_checkpoint_dir

    assert _local_checkpoint_dir("/tmp/ck") == "/tmp/ck"
    assert _local_checkpoint_dir("ckpt/rel") == "ckpt/rel"
    assert _local_checkpoint_dir("file:/tmp/ck") == "/tmp/ck"
    assert _local_checkpoint_dir("file:///tmp/ck") == "/tmp/ck"
    assert _local_checkpoint_dir("file://localhost/tmp/ck") == "/tmp/ck"
    assert _local_checkpoint_dir("file://otherhost/ck") is None
    assert _local_checkpoint_dir("hdfs://nn/ck") is None
    assert _local_checkpoint_dir("s3a://bucket/ck") is None


def test_cursorfile_location_covers_remote_checkpoints():
    """Remote checkpoints get a cursorfile URI on the checkpoint's OWN
    filesystem (the third belt no longer silently disappears on
    s3a/hdfs); local ones keep the plain joined path."""
    from filesystemagent_spark.streaming.sinks import _cursorfile_location

    assert _cursorfile_location("/tmp/ck") == "/tmp/ck/txchanges_cursor.json"
    assert (
        _cursorfile_location("file:///tmp/ck")
        == "/tmp/ck/txchanges_cursor.json"
    )
    assert (
        _cursorfile_location("s3a://bucket/ck")
        == "s3a://bucket/ck/txchanges_cursor.json"
    )
    assert (
        _cursorfile_location("hdfs://nn/ck/")
        == "hdfs://nn/ck/txchanges_cursor.json"
    )


def test_cursor_store_selection_and_arrow_fs_roundtrip(tmp_path):
    """_make_cursor_store picks the atomic local store for local
    spellings, the pyarrow.fs store for serviceable URIs (exercised
    here via file:// — the same code path an hdfs:// or s3:// URI
    takes), and belt-off (None) for URIs pyarrow cannot service."""
    from filesystemagent_spark.sources.txchanges import (
        _ArrowFsCursorStore,
        _LocalCursorStore,
        _make_cursor_store,
    )

    local = _make_cursor_store(str(tmp_path / "c.json"))
    assert isinstance(local, _LocalCursorStore)
    assert isinstance(
        _make_cursor_store(f"file://{tmp_path}/c.json"), _LocalCursorStore
    )
    assert _make_cursor_store(None) is None
    assert _make_cursor_store("") is None
    # unknown scheme -> pyarrow can't service it -> belt off, no raise
    assert _make_cursor_store("nosuchfs://host/c.json") is None
    # a remote-authority file URI must not be misread as local /c.json
    remote_file = _make_cursor_store("file://otherhost/c.json")
    assert not (
        isinstance(remote_file, _LocalCursorStore)
        and remote_file.path == "/c.json"
    )

    # the pyarrow store round-trips through FileSystem.from_uri —
    # write-into-missing-parent, load, monotone overwrite
    store = _ArrowFsCursorStore(f"file://{tmp_path}/sub/dir/c.json")
    assert store.load() is None
    store.save(3)
    assert store.load() == 3
    store.save(7)
    assert store.load() == 7
    # torn/garbage file degrades to None (the documented cursor-less
    # fallback), never an exception
    (tmp_path / "sub" / "dir" / "c.json").write_text("{not json")
    assert store.load() is None
