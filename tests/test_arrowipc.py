"""Arrow IPC source/sink (sources/arrowipc.py): batch-granular splits,
round trips through the etl_io dispatch, overwrite semantics, and
interop with files written by plain pyarrow."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from filesystemagent_spark.sources.arrowipc import register_arrowipc
from filesystemagent_spark.sources.etl_io import detect_format, read_any, write_any


def _write_feather(path, table, chunk=4):
    with ipc.new_file(path, table.schema) as w:
        for b in table.to_batches(max_chunksize=chunk):
            w.write_batch(b)


def test_detect_format_dispatches_arrow_extensions():
    assert detect_format("/x/a.arrow") == "arrowipc"
    assert detect_format("/x/a.feather") == "arrowipc"


def test_reads_pyarrow_written_file_with_batch_granular_splits(spark, tmp_path):
    t = pa.table({"a": list(range(10)), "s": [f"x{i}" for i in range(10)]})
    _write_feather(str(tmp_path / "f1.arrow"), t, chunk=4)  # 3 batches
    df = read_any(spark, str(tmp_path), fmt="arrowipc")
    assert df.count() == 10
    # one split per record batch — the scan parallelism claim
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r["a"] for r in df.collect()) == list(range(10))


def test_directory_of_files_scans_all(spark, tmp_path):
    for i in range(3):
        t = pa.table({"a": [i * 10 + j for j in range(5)]})
        _write_feather(str(tmp_path / f"f{i}.arrow"), t, chunk=5)
    df = read_any(spark, str(tmp_path), fmt="arrowipc")
    assert df.count() == 15
    assert df.rdd.getNumPartitions() == 3


def test_write_roundtrip_and_overwrite(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS s")
    write_any(df.repartition(4), out, fmt="arrowipc")
    names = sorted(os.listdir(out))
    assert all(n.startswith("part-") and n.endswith(".arrow") for n in names)
    back = read_any(spark, out, fmt="arrowipc")
    assert sorted(r["id"] for r in back.collect()) == list(range(100))
    # overwrite with fewer partitions must not leave stale parts
    write_any(df.repartition(2), out, fmt="arrowipc")
    assert read_any(spark, out, fmt="arrowipc").count() == 100
    assert len([n for n in os.listdir(out) if n.startswith("part-")]) <= 2


def test_typed_columns_survive(spark, tmp_path):
    out = str(tmp_path / "typed")
    df = spark.sql(
        "SELECT id, CAST(id AS DOUBLE) AS d, array(id, id+1) AS arr, "
        "timestamp'2024-01-02 03:04:05' AS ts FROM range(5)"
    )
    write_any(df, out, fmt="arrowipc")
    back = read_any(spark, out, fmt="arrowipc")
    assert back.schema.simpleString() == df.schema.simpleString()
    assert back.count() == 5
    assert sorted(r["arr"] for r in back.collect())[0] == [0, 1]


def test_empty_partitions_write_no_files(spark, tmp_path):
    out = str(tmp_path / "empty")
    df = spark.range(0, 2).repartition(8)  # most partitions empty
    write_any(df, out, fmt="arrowipc")
    assert read_any(spark, out, fmt="arrowipc").count() == 2


def test_missing_path_raises(spark, tmp_path):
    register_arrowipc(spark)
    with pytest.raises(Exception, match="No such file|no Arrow IPC files"):
        read_any(spark, str(tmp_path / "nope.arrow")).count()  # noqa


def test_append_mode_does_not_clobber_existing_parts(spark, tmp_path):
    # Regression: final names used to be part-{pid}.arrow only, so an
    # append job with the same partition ids os.replace()d the previous
    # job's files. Names now embed a per-job uuid (parquet discipline).
    out = str(tmp_path / "app")
    df = spark.range(0, 50).selectExpr("id")
    write_any(df.repartition(2), out, fmt="arrowipc")
    write_any(df.repartition(2), out, fmt="arrowipc", mode="append")
    names = [n for n in os.listdir(out) if n.startswith("part-")]
    assert len(names) == 4  # 2 parts per job, nothing replaced
    back = read_any(spark, out, fmt="arrowipc")
    assert back.count() == 100
    assert sorted(r["id"] for r in back.collect()) == sorted(
        list(range(50)) * 2
    )
