"""Analyzer queries (SURVEY.md §2.3-2.5): the reference's pure-Python
dataflow analyzers as DataFrame transforms over the snapshot tables
(processes / services / connections / scheduled_tasks / run_keys).

Every function takes snapshot DataFrames and returns DataFrames —
no collection, no caps: the reference's 50-path enrichment cap
(service_auditor.py:142) and per-host loops disappear because the
work distributes (SURVEY §4 'remove the cap').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from filesystemagent_spark.functions.tscompat import epoch_seconds
from filesystemagent_spark.operators import filters as P
from filesystemagent_spark.operators.relational import snapshot_diff, top_k

# ---------------------------------------------------------------------------
# W1: top-N resource consumers (resource_analyzer.py:123-142)


def top_consumers(procs: DataFrame, metric: str, n: int = 10) -> DataFrame:
    """Global top-N by a resource metric with pid tie-break. Executes
    as TakeOrdered (per-partition heap + driver merge), no full sort."""
    return top_k(procs, [F.col(metric).desc(), F.col("pid").asc()], n)


# ---------------------------------------------------------------------------
# P9: resource hogs → long-form (one row per exceeded threshold),
# matching the reference's one-finding-per-threshold loop
# (resource_analyzer.py:144-215)

_THRESHOLDS: list[tuple[str, str, float]] = [
    ("high_ram", "ram_mb", P.HIGH_RAM_MB),
    ("high_cpu", "cpu_percent", P.HIGH_CPU_SECONDS),
    ("high_threads", "thread_count", P.HIGH_THREAD_COUNT),
    ("high_handles", "handle_count", P.HIGH_HANDLE_COUNT),
]


def resource_hogs(procs: DataFrame) -> DataFrame:
    """Rows (pid, name, path, category, value, threshold) for every
    exceeded threshold — stack + filter, a single narrow pass."""
    stacked = procs.filter(P.is_user_process(F.col("pid"))).select(
        "pid",
        "name",
        "path",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cat).alias("category"),
                        F.col(c).cast("double").alias("value"),
                        F.lit(thr).cast("double").alias("threshold"),
                    )
                    for cat, c, thr in _THRESHOLDS
                ]
            )
        ).alias("t"),
    )
    return stacked.select("pid", "name", "path", "t.*").filter(
        F.col("value") > F.col("threshold")
    )


# ---------------------------------------------------------------------------
# P10 + J8: stale and orphan processes (resource_analyzer.py:265-366)


def stale_processes(procs: DataFrame, now: Column) -> DataFrame:
    return procs.filter(
        P.is_stale_process(F.col("name"), F.col("pid"), F.col("created_at"), now)
    )


def orphan_processes(procs: DataFrame, now: Column) -> DataFrame:
    """Processes whose parent pid is gone AND (stale >24h OR unsigned).

    The reference builds a pid set and probes it per row
    (resource_analyzer.py:318-341); here it's a left-anti self-join on
    parent_pid = pid — broadcast-able since the probe side is just the
    pid column."""
    candidates = procs.filter(
        P.is_user_process(F.col("pid"))
        & ~F.lower(F.col("name")).isin(*P.KNOWN_LONG_RUNNING)
        & F.col("parent_pid").isNotNull()
        & ~F.col("parent_pid").isin(0, 4)
    )
    orphans = candidates.join(
        broadcast(procs.select(F.col("pid").alias("parent_pid")).distinct()),
        on="parent_pid",
        how="left_anti",
    )
    created = P.parse_wmi_date(F.col("created_at"))
    is_stale = created.isNotNull() & (
        (epoch_seconds(now) - epoch_seconds(created))
        > P.ORPHAN_STALE_HOURS * 3600
    )
    is_unsigned = F.col("is_signed") == F.lit(False)
    return (
        orphans.withColumn("is_stale", F.coalesce(is_stale, F.lit(False)))
        .withColumn("is_unsigned", F.coalesce(is_unsigned, F.lit(False)))
        .filter(F.col("is_stale") | F.col("is_unsigned"))
    )


# ---------------------------------------------------------------------------
# A7/A8/P15: connection analytics (network_mapper.py:82-164)


def connection_state_counts(conns: DataFrame) -> DataFrame:
    return conns.groupBy("state").agg(F.count("*").alias("n"))


def external_conns_per_process(
    conns: DataFrame, min_conns: int = 10, sample_addrs: int = 20
) -> DataFrame:
    """Established external connections grouped by pid; flags processes
    with >= min_conns (network_mapper.py:131-164). collect_set gives
    the distinct remote set; slice(...) caps the reported sample like
    the reference's [:20] — the COUNT is over the full set either way."""
    ext = conns.filter(
        (F.col("state") == "Established")
        & P.is_external_address(F.col("remote_address"))
    )
    per_pid = ext.groupBy("pid").agg(
        F.count("*").alias("connection_count"),
        F.count_distinct("remote_address").alias("n_remote_addrs"),
        F.slice(F.sort_array(F.collect_set("remote_address")), 1, sample_addrs).alias(
            "remote_addresses"
        ),
        F.max("process_name").alias("process_name"),
    )
    return per_pid.filter(F.col("connection_count") >= min_conns)


def suspicious_listeners(conns: DataFrame) -> DataFrame:
    return conns.filter(
        P.is_listener(F.col("state"))
        & P.is_suspicious_listener(F.col("local_address"), F.col("local_port"))
    )


# ---------------------------------------------------------------------------
# J1-J4 + A9: baseline diff over all snapshot categories
# (baseline_differ.py:103-360)

#: category → diff key columns (baseline_differ.py: processes (name,path),
#: services name, listeners addr:port, tasks task_name, run_keys composite)
DIFF_KEYS: dict[str, list[str]] = {
    "processes": ["name", "path"],
    "services": ["name"],
    "listeners": ["listen_key"],
    "scheduled_tasks": ["task_name"],
    "run_keys": ["registry_path", "name"],
}


def listeners_of(conns: DataFrame) -> DataFrame:
    """Listen-state rows keyed addr:port (baseline_differ.py:364-372)."""
    return conns.filter(P.is_listener(F.col("state"))).withColumn(
        "listen_key", P.listener_key(F.col("local_address"), F.col("local_port"))
    )


def baseline_diff_all(
    current: dict[str, DataFrame], baseline: dict[str, DataFrame]
) -> DataFrame:
    """Diff every category present in both snapshot dicts; returns
    (category, change_type, key) long-form — the union the reference
    builds per category then sums (A9)."""
    parts: list[DataFrame] = []
    for cat, keys in DIFF_KEYS.items():
        if cat not in current or cat not in baseline:
            continue
        cur, base = current[cat], baseline[cat]
        if cat == "listeners":
            cur, base = listeners_of(cur), listeners_of(base)
        d = snapshot_diff(cur, base, keys)
        parts.append(
            d.select(
                F.lit(cat).alias("category"),
                F.col("change_type"),
                F.concat_ws("|", *[F.col(k) for k in keys]).alias("key"),
            )
        )
    if not parts:
        raise ValueError("no common categories to diff")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# J5-J7, J9: enrichment joins — small side broadcast


def enrich_with_cpu(procs: DataFrame, cpu_samples: DataFrame) -> DataFrame:
    """J5: left join processes ← cpu samples on pid
    (process_snapshot.py:133-157)."""
    return procs.join(broadcast(cpu_samples), "pid", "left")


def enrich_with_signatures(procs: DataFrame, signatures: DataFrame) -> DataFrame:
    """J6: left join processes ← signature results on path; the
    reference caps at 50 paths (process_snapshot.py:188-215) — no cap
    here, the join distributes."""
    return procs.join(signatures, "path", "left")


def enrich_conns_with_process(conns: DataFrame, procs: DataFrame) -> DataFrame:
    """J7: pid → process name, the reference's PowerShell hash map
    (network_mapper.py:20-32) as a broadcast join."""
    names = procs.select("pid", F.col("name").alias("proc_name"))
    return conns.join(broadcast(names), "pid", "left")


def writable_system_binaries(services: DataFrame, writable_paths: DataFrame) -> DataFrame:
    """J9: running SYSTEM services whose exe is in the writable set
    (service_auditor.py:121-163) — semi join on the extracted exe path."""
    sys_svcs = services.filter(
        (F.col("state") == "Running")
        & F.col("binary_path").isNotNull()
        & P.is_system_account(F.col("account"))
    ).withColumn("exe_path", P.extract_exe_path(F.col("binary_path")))
    return sys_svcs.join(
        broadcast(writable_paths.select(F.col("path").alias("exe_path"))),
        "exe_path",
        "left_semi",
    )
