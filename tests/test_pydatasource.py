"""Tests for the custom Python DataSource (toollog format)."""

from __future__ import annotations

import os

import pytest

from filesystemagent_spark.sources.pydatasource import register_toollog

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
CLAM = os.path.join(FIX, "clamscan_scan.log")


def _read(spark, path):
    register_toollog(spark)
    return (
        spark.read.format("toollog")
        .option("kind", "clamscan")
        .option("path", path)
        .load()
    )


def test_matches_text_regex_normalizer(spark):
    """The registered format and the text+regex path must agree."""
    from filesystemagent_spark.sources import normalizers as N

    via_ds = {(r.file, r.malware) for r in _read(spark, CLAM).collect()}
    via_text = {
        (r.target, r.title.removeprefix("ClamAV: "))
        for r in N.clamscan_findings(spark, CLAM).collect()
    }
    assert via_ds == via_text
    assert via_ds  # non-vacuous


def test_directory_mode_one_partition_per_file(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"scan_{i}.log").write_text(
            f"/tmp/f{i}: Sig.{i} FOUND\nscanned: 10\n/tmp/ok{i}: OK\n"
        )
    df = _read(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() == 3
    rows = sorted((r.file, r.malware) for r in df.collect())
    assert rows == [(f"/tmp/f{i}", f"Sig.{i}") for i in range(3)]


def test_unknown_kind_rejected(spark):
    register_toollog(spark)
    with pytest.raises(Exception):
        spark.read.format("toollog").option("kind", "nope").option(
            "path", CLAM
        ).load().collect()


def _stream_once(spark, path, ckpt, sink):
    register_toollog(spark)
    q = (
        spark.readStream.format("toollog")
        .option("kind", "clamscan")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def test_stream_reader_drains_to_batch_answer(spark, tmp_path):
    """One availableNow drain of the streaming toollog source must
    equal the batch read of the same fixture."""
    import shutil

    stage = tmp_path / "logs"
    stage.mkdir()
    shutil.copy(CLAM, stage / "scan_0.log")
    got = {
        (r.file, r.malware)
        for r in _stream_once(
            spark, str(stage), str(tmp_path / "ck"), "toollog_s1"
        ).collect()
    }
    want = {(r.file, r.malware) for r in _read(spark, str(stage)).collect()}
    assert got == want and got


def test_stream_reader_is_incremental_across_batches(spark, tmp_path):
    """Restarting against the same checkpoint after a log grows must
    emit ONLY the appended lines (offset = per-file line count)."""
    stage = tmp_path / "logs"
    stage.mkdir()
    log = stage / "scan.log"
    log.write_text("/a/x.bin: Win.Trojan.Agent FOUND\nclean line\n")
    ckpt = str(tmp_path / "ck2")
    out = str(tmp_path / "out")

    def drain():
        # file sink (memory sink cannot recover from a checkpoint)
        register_toollog(spark)
        q = (
            spark.readStream.format("toollog")
            .option("kind", "clamscan")
            .option("path", str(stage))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.file, r.malware) for r in spark.read.parquet(out).collect()}

    assert drain() == {("/a/x.bin", "Win.Trojan.Agent")}
    with log.open("a") as fh:
        fh.write("/b/y.dll: Win.Worm.Mydoom FOUND\n")
    # same checkpoint: the second drain appends ONLY the new line
    assert drain() == {
        ("/a/x.bin", "Win.Trojan.Agent"),
        ("/b/y.dll", "Win.Worm.Mydoom"),
    }


def test_toollog_writer_roundtrip(spark, tmp_path):
    """Write path: rows render back to clamscan text via the staged
    two-phase commit (part files + _SUCCESS only appear at commit),
    and reading the written directory reproduces the rows exactly."""
    import os

    from filesystemagent_spark.sources.pydatasource import register_toollog

    register_toollog(spark)
    out = str(tmp_path / "written")
    df = spark.createDataFrame(
        [("/tmp/a.bin", "Eicar-Test"), ("/tmp/b.bin", "Worm.X")],
        "file string, malware string",
    ).repartition(2)
    df.write.format("toollog").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.startswith("_staged-")]

    back = spark.read.format("toollog").option("kind", "clamscan").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_toollog_writer_overwrite_replaces(spark, tmp_path):
    from filesystemagent_spark.sources.pydatasource import register_toollog

    register_toollog(spark)
    out = str(tmp_path / "written2")
    one = spark.createDataFrame([("/a", "X")], "file string, malware string")
    two = spark.createDataFrame([("/b", "Y")], "file string, malware string")
    one.write.format("toollog").mode("overwrite").save(out)
    two.write.format("toollog").mode("overwrite").save(out)
    back = spark.read.format("toollog").load(out)
    assert [tuple(r) for r in back.collect()] == [("/b", "Y")]


def test_toollog_read_paths_yield_record_batches(tmp_path):
    """Round-5 pin: both toollog read paths (batch + stream) must yield
    pyarrow RecordBatches — rows cross the Python-JVM boundary as
    Arrow, not one pickled tuple each (the arrowipc/txchanges
    standard)."""
    import pyarrow as pa

    from filesystemagent_spark.sources.pydatasource import (
        ToolLogReader,
        ToolLogStreamReader,
        _FilePartition,
        _FileRangePartition,
    )

    log = tmp_path / "scan.log"
    log.write_text(
        "/a/x.exe: Win.Trojan.Foo FOUND\nnoise line\n/b/y.dll: Eicar FOUND\n"
    )
    r = ToolLogReader({"kind": "clamscan", "path": str(log)})
    out = list(r.read(_FilePartition(str(log))))
    assert out and all(isinstance(b, pa.RecordBatch) for b in out)
    assert pa.Table.from_batches(out).to_pydict() == {
        "file": ["/a/x.exe", "/b/y.dll"],
        "malware": ["Win.Trojan.Foo", "Eicar"],
    }
    sr = ToolLogStreamReader({"kind": "clamscan", "path": str(log)})
    out2 = list(sr.read(_FileRangePartition(str(log), 2, 3)))
    assert all(isinstance(b, pa.RecordBatch) for b in out2)
    assert pa.Table.from_batches(out2).to_pydict()["file"] == ["/b/y.dll"]
