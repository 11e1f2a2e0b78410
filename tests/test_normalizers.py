"""Golden-fixture tests for the tool-output normalizers — the
reference's dominant test pattern (SURVEY.md §5.1) applied to the
Spark sources layer. Fixture content is synthetic (tests/fixtures/),
shaped per FIXTURES.md §8."""

from __future__ import annotations

import os

import pytest

from filesystemagent_spark.schemas import FINDING
from filesystemagent_spark.sources import normalizers as N

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def fx(name: str) -> str:
    return os.path.join(FIX, name)


def matches_finding_schema(df) -> bool:
    """Names+types match FINDING (nullability of computed columns is
    whatever the expressions imply, so it isn't compared)."""
    return [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in FINDING.fields
    ]


def by_severity(rows):
    out: dict[str, int] = {}
    for r in rows:
        out[r["severity"]] = out.get(r["severity"], 0) + 1
    return out


def test_hayabusa(spark):
    df = N.hayabusa_findings(spark, fx("hayabusa_timeline.csv"))
    assert matches_finding_schema(df)
    rows = [r.asDict() for r in df.collect()]
    # 7 fixture rows, 2 info-level dropped ('info' + 'informational')
    assert len(rows) == 5
    assert by_severity(rows) == {"high": 1, "medium": 1, "critical": 2, "low": 1}
    crit = sorted(r["title"] for r in rows if r["severity"] == "critical")
    # 'crit' alias maps to critical (result_parser.py:159-170)
    assert crit == ["Hayabusa: Audit Log Cleared", "Hayabusa: Suspicious Service Install"]
    svc = next(r for r in rows if "Service Install" in r["title"])
    assert svc["target"] == "HOST-B:System"
    assert svc["category"] == "event_log_alert"
    assert "ServiceName: updaterd" in svc["description"]
    assert svc["raw_data"]["EventID"] == "7045"
    assert svc["timestamp"] is not None


def test_clamscan(spark):
    df = N.clamscan_findings(spark, fx("clamscan_scan.log"))
    rows = [r.asDict() for r in df.collect()]
    assert len(rows) == 4  # OK lines and summary carry no findings
    assert all(r["severity"] == "high" for r in rows)
    assert all(r["category"] == "malware_signature" for r in rows)
    eicar = next(r for r in rows if "Eicar" in r["title"])
    assert eicar["target"] == "/home/web/cache/eicar_test.com"
    assert eicar["raw_data"]["malware"] == "Eicar-Signature"

    summary = {r["key"]: r["val"] for r in N.clamscan_summary(spark, fx("clamscan_scan.log")).collect()}
    assert summary["Infected files"] == "4"
    assert summary["Known viruses"] == "8712345"


def test_sigcheck(spark):
    df = N.sigcheck_findings(spark, fx("sigcheck_scan.csv"))
    rows = sorted((r.asDict() for r in df.collect()), key=lambda r: r["target"])
    assert len(rows) == 2  # only Verified == Unsigned
    assert all(r["severity"] == "medium" and r["category"] == "unsigned_binary" for r in rows)
    assert rows[0]["title"] == "Sigcheck: unsigned binary collector.exe"
    assert "Publisher: unknown" in rows[0]["description"]  # empty publisher
    assert "Publisher: Contoso Ltd" in rows[1]["description"]


def test_autorunsc(spark):
    df = N.autorunsc_findings(spark, fx("autorunsc_scan.csv"))
    rows = [r.asDict() for r in df.collect()]
    # 2 unsigned (UpdaterDaemon, LegacyHelper) + 2 VT hits (UpdaterDaemon 7|70, CleanTool 3|68)
    assert by_severity(rows) == {"high": 2, "critical": 2}
    assert all(r["mitre_attack"] == "T1547" for r in rows)
    vt = sorted(r["title"] for r in rows if r["severity"] == "critical")
    assert vt == ["Autoruns: VT hit on CleanTool", "Autoruns: VT hit on UpdaterDaemon"]
    upd = next(r for r in rows if r["severity"] == "high" and "UpdaterDaemon" in r["title"])
    assert upd["target"] == "C:\\ProgramData\\updaterd.exe"


def test_chainsaw(spark):
    df = N.chainsaw_findings(spark, fx("chainsaw_detections.json"))
    rows = [r.asDict() for r in df.collect()]
    assert len(rows) == 3  # informational dropped
    assert by_severity(rows) == {"high": 1, "critical": 1, "medium": 1}
    # title/severity fallbacks: 'title' + 'severity' keys, source from document.path
    task = next(r for r in rows if "Scheduled Task" in r["title"])
    assert task["severity"] == "medium"
    assert task["target"].endswith("TaskScheduler.evtx")
    assert "at 2024-02-01T09:45:00Z" in task["description"]


def test_hollows_hunter(spark):
    df = N.hollows_hunter_findings(spark, fx("hollows_hunter_report.json"))
    rows = [r.asDict() for r in df.collect()]
    # pid 3344: replaced+patched; pid 7777: implanted, hdr_modified,
    # iat_hooked, unreachable_file; pid 5120 clean → 6 findings
    assert len(rows) == 6
    assert by_severity(rows) == {"critical": 2, "high": 3, "medium": 1}
    repl = next(r for r in rows if "replaced" in r["title"])
    assert repl["mitre_attack"] == "T1055.012"
    assert repl["target"] == "PID:3344"
    assert "Found 1 replaced anomaly" in repl["description"]
    pat = next(r for r in rows if "patched" in r["title"])
    assert "2 patched anomalies" in pat["description"]  # plural form


def test_yara(spark):
    df = N.yara_findings(spark, fx("yara_matches.json"))
    rows = [r.asDict() for r in df.collect()]
    # 3 modern matches + 2 legacy rules
    assert len(rows) == 5
    # no-metadata matches default to high (yara_scanner.py:113-122)
    assert by_severity(rows) == {"critical": 1, "high": 3, "medium": 1}
    locknote = next(r for r in rows if "LockNote" in r["title"])
    assert locknote["severity"] == "critical"
    assert locknote["mitre_attack"] == "T1486"
    keylog = next(r for r in rows if "KeyLogger" in r["title"])
    assert keylog["severity"] == "medium"
    assert keylog["target"] == "D:\\share\\old\\legacy_tool.exe"
    stub = next(r for r in rows if "Legacy_Stub" in r["title"])
    assert stub["severity"] == "high"  # default when no metadata


def test_listdlls(spark):
    mods = [r.asDict() for r in N.listdlls_modules(spark, fx("listdlls_dump.txt")).collect()]
    assert len(mods) == 3
    byproc: dict[str, list] = {}
    for m in mods:
        byproc.setdefault(m["process"], []).append(m)
    assert set(byproc) == {"browser_helper.exe", "print_spool.exe"}
    assert byproc["browser_helper.exe"][0]["pid"] == "6100"
    # path with spaces survives
    assert any(m["dll_path"] == "C:\\ProgramData\\Shared Libs\\hook layer.dll" for m in mods)

    f = [r.asDict() for r in N.listdlls_findings(spark, fx("listdlls_dump.txt")).collect()]
    assert len(f) == 3
    assert all(r["mitre_attack"] == "T1055.001" and r["severity"] == "medium" for r in f)


def test_union_findings(spark):
    u = N.union_findings(
        N.hayabusa_findings(spark, fx("hayabusa_timeline.csv")),
        N.clamscan_findings(spark, fx("clamscan_scan.log")),
        N.yara_findings(spark, fx("yara_matches.json")),
    )
    assert matches_finding_schema(u)
    assert u.count() == 5 + 4 + 5
    assert u.select("finding_id").distinct().count() == 14  # deterministic unique ids
