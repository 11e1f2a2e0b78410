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
