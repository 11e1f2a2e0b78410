"""CLI surface (python -m filesystemagent_spark) — each subcommand
drives the same library plans; tests call main() in-process so the
shared test SparkSession is reused (get_spark getOrCreate's it)."""

from __future__ import annotations

import os

from filesystemagent_spark.__main__ import main

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _mkfiles(root, files: dict[str, bytes]):
    for rel, content in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(content)


def test_audit_scan(spark, tmp_path, capsys):
    report = tmp_path / "report.html"
    out = tmp_path / "findings.parquet"
    rc = main(["audit-scan", FIXTURES, "--report", str(report), "--out", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "hayabusa" in text and "critical" in text
    assert report.read_text().startswith("<!DOCTYPE html") or "<html" in report.read_text()
    assert spark.read.parquet(str(out)).count() > 0


def test_index_and_find_duplicates(spark, tmp_path, capsys):
    data = tmp_path / "data"
    _mkfiles(str(data), {
        "x/one.txt": b"same-bytes",
        "y/two.txt": b"same-bytes",
        "z/uniq.txt": b"different",
    })
    catalog = tmp_path / "catalog.parquet"
    assert main(["index", str(data), "--out", str(catalog)]) == 0
    assert "indexed 3 files" in capsys.readouterr().out

    assert main(["find-duplicates", "--catalog", str(catalog)]) == 0
    assert "1 duplicate group(s)" in capsys.readouterr().out


def test_convert_roundtrip(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,x\n2,y\n")
    dest = tmp_path / "out.json"
    assert main(["convert", str(src), str(dest)]) == 0
    back = spark.read.json(str(dest))
    assert back.count() == 2


def test_migrate_dry_run_then_execute_and_verify(tmp_path, capsys):
    src = tmp_path / "src"
    _mkfiles(str(src), {"a.txt": b"alpha", "sub/b.txt": b"bravo"})
    dest = tmp_path / "dst"

    assert main(["migrate", str(src), str(dest)]) == 0
    assert "dry run: 2 planned action(s)" in capsys.readouterr().out
    assert not dest.exists()

    rc = main(["migrate", str(src), str(dest), "--execute", "--verify"])
    assert rc == 0
    assert "all 2 copies hash-match" in capsys.readouterr().out
    assert (dest / "sub/b.txt").read_bytes() == b"bravo"


def test_query_runs_registered_query(tmp_path, capsys):
    rc = main([
        "query", "events_user_topk", "--sf-dir", "/root/testdata/sf0.001",
        "--limit", "5",
    ])
    assert rc == 0
    assert "total_value" in capsys.readouterr().out


def test_query_unknown_name(capsys):
    assert main(["query", "nope_not_here"]) == 2
    assert "unknown query" in capsys.readouterr().out


def test_migrate_execute_rc_nonzero_on_failed_rows(tmp_path, capsys):
    """A failed row must surface in the exit code, not just the text.
    A DIRECTORY squatting on a planned dest is invisible to the
    binaryFile listing (files only), so the row plans 'new', the
    copy raises, and the run must exit non-zero."""
    src = tmp_path / "src"
    dest = tmp_path / "dst"
    _mkfiles(str(src), {"a.txt": b"alpha"})
    (dest / "a.txt").mkdir(parents=True)  # dir at the file's dest path
    rc = main(["migrate", str(src), str(dest), "--execute"])
    assert rc == 1
    assert (dest / "a.txt").is_dir()  # squatter untouched


def test_migrate_verify_moves_reports_nothing_auditable(tmp_path, capsys):
    src = tmp_path / "src"
    _mkfiles(str(src), {"a.txt": b"alpha"})
    dest = tmp_path / "dst"
    rc = main(["migrate", str(src), str(dest), "--operation", "move",
               "--execute", "--verify"])
    assert rc == 0
    assert "nothing auditable" in capsys.readouterr().out


def test_cli_table_history_show_restore_vacuum(spark, tmp_path, capsys):
    """The `table` subcommand: history lists versions with their kind
    and feed flag; --show time-travels; --restore rolls forward;
    --vacuum reclaims orphans."""
    from filesystemagent_spark.__main__ import main
    from filesystemagent_spark.sources.txtable import TxTable

    tbl = str(tmp_path / "tbl")
    t = TxTable(tbl)
    t.init(spark.createDataFrame([("/a", 1)], "file_path string, size bigint"))
    t.merge_into(
        spark.createDataFrame([("/b", 2)], "file_path string, size bigint"),
        ["file_path"], change_feed=True,
    )

    assert main(["table", tbl]) == 0
    out = capsys.readouterr().out
    assert "v1" in out and "v2" in out and "+feed" in out

    assert main(["table", tbl, "--show", "--version", "1"]) == 0
    assert "/a" in capsys.readouterr().out

    assert main(["table", tbl, "--restore", "1"]) == 0
    assert "restored v1 as v3" in capsys.readouterr().out
    assert t.latest_version() == 3

    t._write_data(  # aborted stage -> orphan
        spark.createDataFrame([("/junk", 0)], "file_path string, size bigint")
    )
    assert main(["table", tbl, "--vacuum", "--grace", "0"]) == 0
    assert "vacuumed 1" in capsys.readouterr().out
