"""Analyzer-semantics tests on synthetic snapshot rows — the
reference's baseline-differ / resource-analyzer test coverage
(SURVEY.md §5.3) re-expressed for the DataFrame layer."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from filesystemagent_spark.operators import analyzers as A

NOW = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)


def wmi(days_ago: float) -> str:
    return f"/Date({int((NOW - dt.timedelta(days=days_ago)).timestamp() * 1000)})/"


PROC_SCHEMA = (
    "pid int, name string, path string, parent_pid int, cpu_percent double, "
    "ram_mb double, thread_count int, handle_count int, created_at string, is_signed boolean"
)


@pytest.fixture(scope="module")
def procs(spark):
    rows = [
        # system roots
        (0, "System Idle Process", None, None, 0.0, 1.0, 1, 10, wmi(30), True),
        (4, "System", None, 0, 0.0, 4.0, 100, 500, wmi(30), True),
        # normal
        (100, "app_server.exe", r"C:\Program Files\App\app_server.exe", 4, 100.0, 512.0, 50, 400, wmi(2), True),
        # resource hog: ram + threads
        (200, "bloated.exe", r"C:\Tools\bloated.exe", 100, 100.0, 4096.0, 300, 400, wmi(1), True),
        # cpu hog
        (300, "cruncher.exe", r"C:\Tools\cruncher.exe", 100, 7200.0, 128.0, 8, 100, wmi(0.5), True),
        # stale (10d), parent alive
        (400, "forgotten.exe", r"C:\Temp\forgotten.exe", 100, 1.0, 10.0, 2, 50, wmi(10), True),
        # orphan + stale (parent 999 gone, 3d old)
        (500, "ghost.exe", r"C:\Temp\ghost.exe", 999, 1.0, 10.0, 2, 50, wmi(3), True),
        # orphan + unsigned (young)
        (600, "shady.exe", r"C:\Temp\shady.exe", 888, 1.0, 10.0, 2, 50, wmi(0.1), False),
        # orphan but young AND signed → not flagged
        (700, "fine.exe", r"C:\Temp\fine.exe", 777, 1.0, 10.0, 2, 50, wmi(0.1), True),
        # allowlisted stale
        (800, "svchost.exe", r"C:\Windows\System32\svchost.exe", 4, 1.0, 10.0, 2, 50, wmi(30), True),
    ]
    return spark.createDataFrame(rows, PROC_SCHEMA)


def test_top_consumers(procs):
    top2 = A.top_consumers(procs, "ram_mb", 2).select("pid").collect()
    assert [r["pid"] for r in top2] == [200, 100]


def test_resource_hogs(procs):
    rows = {(r["pid"], r["category"]) for r in A.resource_hogs(procs).collect()}
    assert rows == {(200, "high_ram"), (200, "high_threads"), (300, "high_cpu")}


def test_stale_processes(procs):
    got = {r["pid"] for r in A.stale_processes(procs, F.lit(NOW)).collect()}
    # 400 stale; 500 only 3d (<168h); svchost allowlisted; pid 4 system
    assert got == {400}


def test_orphan_processes(procs):
    rows = {r["pid"]: r for r in A.orphan_processes(procs, F.lit(NOW)).collect()}
    assert set(rows) == {500, 600}
    assert rows[500]["is_stale"] and not rows[500]["is_unsigned"]
    assert rows[600]["is_unsigned"] and not rows[600]["is_stale"]


CONN_SCHEMA = (
    "local_address string, local_port int, remote_address string, remote_port int, "
    "state string, pid int, process_name string"
)


@pytest.fixture(scope="module")
def conns(spark):
    rows = [("0.0.0.0", 4444, None, None, "Listen", 600, "shady.exe"),
            ("0.0.0.0", 443, None, None, "Listen", 100, "app_server.exe"),
            ("127.0.0.1", 9999, None, None, "Listen", 100, "app_server.exe")]
    # pid 300: 12 established external conns to 3 addresses
    for i in range(12):
        rows.append(
            ("192.168.1.5", 50000 + i, f"52.1.2.{i % 3}", 443, "Established", 300, "cruncher.exe")
        )
    # pid 100: 2 external (below threshold), 5 internal
    rows += [("192.168.1.5", 60000, "8.8.8.8", 53, "Established", 100, "app_server.exe"),
             ("192.168.1.5", 60001, "8.8.4.4", 53, "Established", 100, "app_server.exe")]
    for i in range(5):
        rows.append(("192.168.1.5", 61000 + i, "10.0.0.9", 5432, "Established", 100, "app_server.exe"))
    return spark.createDataFrame(rows, CONN_SCHEMA)


def test_connection_state_counts(conns):
    got = {r["state"]: r["n"] for r in A.connection_state_counts(conns).collect()}
    assert got == {"Listen": 3, "Established": 19}


def test_external_conns_per_process(conns):
    rows = [r.asDict() for r in A.external_conns_per_process(conns).collect()]
    assert len(rows) == 1
    r = rows[0]
    assert r["pid"] == 300
    assert r["connection_count"] == 12
    assert r["n_remote_addrs"] == 3
    assert sorted(r["remote_addresses"]) == ["52.1.2.0", "52.1.2.1", "52.1.2.2"]


def test_suspicious_listeners(conns):
    got = [r["local_port"] for r in A.suspicious_listeners(conns).collect()]
    assert got == [4444]  # 443 common, 9999 loopback


def test_baseline_diff_all(spark, conns):
    mk = lambda rows, schema: spark.createDataFrame(rows, schema)
    svc = "name string, account string, state string"
    tasks = "task_name string, run_level string, state string"
    keys = "registry_path string, name string, value string"
    current = {
        "services": mk([("svc_a", "LocalSystem", "Running"), ("svc_new", "user", "Running")], svc),
        "scheduled_tasks": mk([("task_1", "Limited", "Ready")], tasks),
        "run_keys": mk([(r"HKLM\...\Run", "upd", "u.exe"), (r"HKLM\...\Run", "new", "n.exe")], keys),
        "listeners": conns,
    }
    baseline = {
        "services": mk([("svc_a", "LocalSystem", "Running"), ("svc_gone", "user", "Running")], svc),
        "scheduled_tasks": mk([("task_1", "Limited", "Ready"), ("task_old", "Highest", "Ready")], tasks),
        "run_keys": mk([(r"HKLM\...\Run", "upd", "u.exe")], keys),
        "listeners": conns.filter(F.col("local_port") != 4444),
    }
    diff = A.baseline_diff_all(current, baseline)
    got = {(r["category"], r["change_type"], r["key"]) for r in diff.collect()}
    assert got == {
        ("services", "added", "svc_new"),
        ("services", "removed", "svc_gone"),
        ("scheduled_tasks", "removed", "task_old"),
        ("run_keys", "added", r"HKLM\...\Run|new"),
        ("listeners", "added", "0.0.0.0:4444"),
    }

    from filesystemagent_spark.operators.relational import diff_summary

    summary = {
        (r["category"], r["change_type"]): r["n_changes"]
        for r in diff_summary(diff, "category").collect()
    }
    assert summary[("services", "added")] == 1
    assert summary[("services", "removed")] == 1


def test_enrichment_joins(spark, procs, conns):
    cpu = spark.createDataFrame([(300, 99.5)], "pid int, cpu_now double")
    enriched = A.enrich_with_cpu(procs, cpu)
    assert enriched.filter(F.col("pid") == 300).first()["cpu_now"] == 99.5
    assert enriched.count() == procs.count()  # left join keeps all

    sigs = spark.createDataFrame(
        [(r"C:\Temp\shady.exe", "invalid")], "path string, sig_status string"
    )
    assert (
        A.enrich_with_signatures(procs, sigs)
        .filter(F.col("sig_status").isNotNull())
        .first()["pid"]
        == 600
    )

    ec = A.enrich_conns_with_process(conns, procs)
    assert ec.filter((F.col("pid") == 300) & (F.col("proc_name") == "cruncher.exe")).count() == 12


def test_writable_system_binaries(spark):
    svcs = spark.createDataFrame(
        [
            ("vuln_svc", "LocalSystem", "Running", r'"C:\Apps\vuln service\svc.exe" -k'),
            ("safe_svc", "LocalSystem", "Running", r"C:\Windows\System32\safe.exe"),
            ("user_svc", "DOMAIN\\bob", "Running", r"C:\Apps\vuln service\svc.exe"),
            ("stopped", "LocalSystem", "Stopped", r"C:\Apps\vuln service\svc.exe"),
        ],
        "name string, account string, state string, binary_path string",
    )
    writable = spark.createDataFrame([(r"C:\Apps\vuln service\svc.exe",)], "path string")
    got = [r["name"] for r in A.writable_system_binaries(svcs, writable).collect()]
    assert got == ["vuln_svc"]


def test_salted_join_matches_plain_join(spark):
    """Salting only splits groups; inner/left results are identical
    to the unsalted join."""
    from filesystemagent_spark.operators.relational import salted_join

    # one hot key (90% of rows) + a key missing from the dim side
    facts = spark.createDataFrame(
        [("hot", i) for i in range(900)]
        + [("cold", i) for i in range(90)]
        + [("orphan", i) for i in range(10)],
        "key string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "key string, label string"
    )

    for how in ("inner", "left"):
        got = salted_join(facts, dim, ["key"], how=how, salt_buckets=8)
        want = facts.join(dim, ["key"], how)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_rollup_reaggregate_lossless(spark):
    """Merging 5-min partials to 1h equals aggregating raw rows:
    the mergeable-partials invariant behind continuous aggregates."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from filesystemagent_spark.operators import rollup as R

    t0 = datetime(2026, 1, 1)
    rows = [
        ("a", t0 + timedelta(minutes=m), float(m)) for m in range(0, 150, 7)
    ] + [("b", t0 + timedelta(minutes=m), float(-m)) for m in range(0, 90, 11)]
    ev = spark.createDataFrame(rows, "k string, ts timestamp, value double")

    fine = R.continuous_aggregate(
        ev, ts_col="ts", value_col="value", group_cols=["k"], bucket_seconds=300
    )
    coarse = R.reaggregate(fine, group_cols=["k"], bucket_seconds=3600)
    direct = (
        ev.groupBy(R.time_bucket(F.col("ts"), 3600).alias("bucket"), "k")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    assert coarse.exceptAll(direct).count() == 0
    assert direct.exceptAll(coarse).count() == 0
    avg = R.with_derived_stats(coarse)
    row = avg.filter("k = 'a'").orderBy("bucket").first()
    assert abs(row["avg_v"] - row["sum_v"] / row["n"]) < 1e-12


def test_snapshot_diff_null_key_is_not_a_change(spark):
    """SURVEY §7.5 trap: the reference coalesces None path to "" in
    diff keys — a null-path process present in both snapshots must not
    appear as added+removed."""
    from filesystemagent_spark.operators.relational import snapshot_diff

    cur = spark.createDataFrame(
        [("svchost", None), ("new", "c:\\new.exe")], "name string, path string"
    )
    base = spark.createDataFrame(
        [("svchost", None), ("old", "c:\\old.exe")], "name string, path string"
    )
    diff = snapshot_diff(cur, base, ["name", "path"]).collect()
    got = {(r["name"], r["change_type"]) for r in diff}
    assert got == {("new", "added"), ("old", "removed")}


def test_keep_first_tie_break_deterministic(spark):
    """SURVEY §7.5 trap: keep-oldest on equal modified_time must pick
    a deterministic winner (path asc), not an arbitrary row."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from filesystemagent_spark.operators.relational import keep_first

    t = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("h1", t, "/b"), ("h1", t, "/a"), ("h1", t, "/c")],
        "file_hash string, modified_time timestamp, path string",
    )
    for _ in range(3):  # stable across runs
        kept = keep_first(
            df, ["file_hash"], [F.col("modified_time").asc(), F.col("path").asc()]
        ).collect()
        assert [(r["file_hash"], r["path"]) for r in kept] == [("h1", "/a")]


def test_rrf_fuse_combines_rankings_and_handles_single_source(spark):
    """RRF (round 5): rrf(id) = sum over retrievers of 1/(k + rank).
    A doc ranked well by BOTH retrievers must beat a doc ranked #1 by
    only one when the math says so, and docs surfaced by a single
    retriever still appear with n_retrievers=1."""
    from filesystemagent_spark.operators.relational import rrf_fuse

    bm = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id bigint, rnk bigint"
    )
    ti = spark.createDataFrame(
        [(11, 1), (12, 2), (13, 3)], "doc_id bigint, rnk bigint"
    )
    out = rrf_fuse(
        [("bm25", bm), ("tfidf", ti)], id_col="doc_id", k=60
    ).collect()
    rows = {r.doc_id: r for r in out}
    # doc 11: 1/62 + 1/61; doc 10: 1/61 alone; doc 12: 1/63 + 1/62
    assert [r.doc_id for r in out][:2] == [11, 12]  # both-retriever docs first
    assert rows[11].rrf_score == round(1 / 62 + 1 / 61, 9)
    assert rows[10].n_retrievers == 1 and rows[10].rank_bm25 == 1
    assert rows[10].rank_tfidf is None
    assert rows[13].n_retrievers == 1 and rows[13].rank_tfidf == 3
    # top_k bounds the fused list
    assert len(rrf_fuse([("a", bm), ("b", ti)], id_col="doc_id", top_k=2).collect()) == 2
