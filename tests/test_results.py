"""Tests for run-result persistence (S21/W4), job metrics (A6),
migration counters (A10), and the HTML report sink (S23)."""

from __future__ import annotations

import pytest

from filesystemagent_spark.plans import reporting, results


def test_save_load_newest_first(spark, tmp_path):
    base = str(tmp_path / "runs")
    for ts, n in [("20260810T000000", 1), ("20260812T000000", 2), ("20260811T000000", 3)]:
        df = spark.createDataFrame([(ts, n)], ["name", "n_findings"])
        results.save_result(df, base, ts)
    loaded = results.load_results(spark, base, limit=2)
    got = [r["run_ts"] for r in loaded.select("run_ts").distinct().collect()]
    assert sorted(got) == ["20260811T000000", "20260812T000000"]
    # newest first
    assert loaded.first()["run_ts"] == "20260812T000000"


def test_save_result_idempotent_overwrite(spark, tmp_path):
    base = str(tmp_path / "runs")
    ts = "20260812T000000"
    results.save_result(spark.createDataFrame([(1,)], ["v"]), base, ts)
    results.save_result(spark.createDataFrame([(2,)], ["v"]), base, ts)
    loaded = results.load_results(spark, base)
    assert loaded.count() == 1
    assert loaded.first()["v"] == 2


def test_job_metrics(spark):
    jobs = spark.createDataFrame(
        [
            ("j1", "completed", 10.0),
            ("j2", "completed", 20.0),
            ("j3", "failed", 5.0),
            ("j4", "running", None),
        ],
        ["job_id", "status", "duration_seconds"],
    )
    row = results.job_metrics(jobs).first()
    assert row["total_jobs"] == 4
    assert row["running"] == 1
    assert row["completed"] == 2
    assert row["failed"] == 1
    assert row["avg_duration_completed"] == pytest.approx(15.0)


def test_status_counters(spark):
    res = spark.createDataFrame(
        [("ok", 100), ("ok", 200), ("failed", 50), ("skipped", 10)],
        ["status", "file_size"],
    )
    rows = {r["status"]: r for r in results.status_counters(res).collect()}
    assert rows["ok"]["n_files"] == 2 and rows["ok"]["total_bytes"] == 300
    assert rows["failed"]["n_files"] == 1
    assert rows["skipped"]["total_bytes"] == 10


def test_html_report(spark):
    findings = spark.createDataFrame(
        [
            ("f1", "yara", "critical", "malware", "Rule <hit>", "d", "t1", "security", None, None, None),
            ("f2", "clamav", "low", "av", "Eicar & co", "d", "t2", "security", None, None, None),
            ("f3", "yara", "high", "malware", "Other", "d", "t3", "security", None, None, None),
        ],
        "finding_id string, tool_name string, severity string, category string, "
        "title string, description string, target string, domain string, "
        "raw_data map<string,string>, timestamp timestamp, mitre_attack string",
    )
    out = reporting.html_report(findings, title="Unit <report>", generated_at="2026-08-13T00:00:00")
    # escaping applied to title and cell content
    assert "Unit &lt;report&gt;" in out
    assert "Rule &lt;hit&gt;" in out
    assert "Eicar &amp; co" in out
    # severity ordering: critical row rendered before the low row
    assert out.index("critical") < out.index("low")
    assert "3 findings" in out


def test_observe_counters_single_pass(spark, sf_dir):
    """observe() metrics must equal recomputed aggregates while the
    action itself only runs once (the migration-counter pattern)."""
    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.plans.observe import funnel_counters, observed

    docs = Catalog(spark, sf_dir).documents
    kept, obs = funnel_counters(docs, F.col("n_chars") >= 200)
    written = kept.count()
    m = obs.get
    assert m["n_seen"] == docs.count()
    assert m["n_kept"] == written == docs.filter("n_chars >= 200").count()

    df2, obs2 = observed(
        docs,
        total_chars=F.sum("n_chars"),
        n_docs=F.count(F.lit(1)),
    )
    df2.count()
    m2 = obs2.get
    assert m2["n_docs"] == docs.count()
    assert m2["total_chars"] == docs.agg(F.sum("n_chars")).collect()[0][0]
