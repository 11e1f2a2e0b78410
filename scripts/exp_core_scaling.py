"""Core-scaling profile of the bench headliners (round 11, VERDICT
item 2): separate per-query EXECUTOR TASK TIME from WALL time at two
core counts, so the flat wall ratios the driver measures at 8 vs 32
cores (PERF_r10 `suspect_cpus_ignored`) are attributable — a query
whose wall does not improve 8→32 while its summed task time is small
and unchanged sits on a FIXED-COST FLOOR (micro-batch/state machinery,
commit protocol, driver-side planning), not on a harness that ignores
the core count.

Outer mode spawns one subprocess per core count (the master string is
frozen into a JVM, so each count needs a fresh one), inner mode runs
every headliner min-of-3 with the event log on and reports, for the
minimum-wall run: wall seconds, summed executor task-time, summed
executor CPU time, job count, and max concurrent tasks observed.

    python scripts/exp_core_scaling.py [sf_dir] [cpus,cpus,...]

Prints one JSON document; the SCALE.md "fixed-cost floor" table is
derived from it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGDIR_TMPL = "/tmp/r11_corescale_{cpus}"


def inner(sf_dir: str, cpus: str) -> None:
    from filesystemagent_spark.caching import release_tracked_caches
    from filesystemagent_spark.queries import registry
    from filesystemagent_spark.session import get_spark
    from scripts.exp_headliner_profile import parse_eventlog

    logdir = LOGDIR_TMPL.format(cpus=cpus)
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    spark = get_spark(
        f"core-scaling-{cpus}-{uuid.uuid4().hex[:6]}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n, q in sorted(registry().items()) if q.headline]
    qs = registry()
    # Same warm-up discipline as bench.py: first-touch JIT/codegen and
    # parquet footer reads are not what scales with cores.
    qs[names[0]].fn(spark, sf_dir).count()
    release_tracked_caches()

    runs: dict[str, list[dict]] = {}
    for name in names:
        runs[name] = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name}#r{i}")
            t0 = time.time()
            qs[name].fn(spark, sf_dir).count()
            t1 = time.time()
            spark.sparkContext.setJobDescription(None)
            runs[name].append(
                {"wall_s": t1 - t0, "t0_ms": t0 * 1000, "t1_ms": t1 * 1000}
            )
        release_tracked_caches()

    app_id = spark.sparkContext.applicationId
    spark.stop()
    log = os.path.join(logdir, app_id)
    out = {}
    for name, rs in runs.items():
        best = min(rs, key=lambda r: r["wall_s"])
        prof = parse_eventlog(log, best["t0_ms"], best["t1_ms"])
        task_ms = sum(m["exec_run_ms"] for m in prof["stages"].values())
        cpu_ms = sum(m["cpu_ms"] for m in prof["stages"].values())
        n_tasks = sum(m["tasks"] for m in prof["stages"].values())
        out[name] = {
            "wall_s": round(best["wall_s"], 3),
            "task_time_s": round(task_ms / 1000, 3),
            "cpu_time_s": round(cpu_ms / 1000, 3),
            "n_jobs": prof["n_jobs"],
            "n_stages": len(prof["stages"]),
            "n_tasks": n_tasks,
            "injob_s": round(prof["injob_ms"] / 1000, 3),
            "driver_gap_s": round(best["wall_s"] - prof["injob_ms"] / 1000, 3),
        }
    print("INNER_JSON:" + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        inner(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus_list = (sys.argv[2] if len(sys.argv) > 2 else "8,32").split(",")
    per_cpus: dict[str, dict] = {}
    for cpus in cpus_list:
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=sf_dir)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", sf_dir, cpus],
            env=env, capture_output=True, text=True,
        )
        line = next(
            (ln for ln in p.stdout.splitlines() if ln.startswith("INNER_JSON:")),
            None,
        )
        if line is None:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            raise SystemExit(f"inner run at {cpus} cores produced no JSON")
        per_cpus[cpus] = json.loads(line[len("INNER_JSON:"):])

    lo, hi = cpus_list[0], cpus_list[-1]
    report = {"sf_dir": sf_dir, "cpus": cpus_list, "per_query": {}}
    for name in sorted(per_cpus[hi]):
        a, b = per_cpus[lo][name], per_cpus[hi][name]
        wall_ratio = round(a["wall_s"] / b["wall_s"], 2) if b["wall_s"] else None
        task_ratio = (
            round(a["task_time_s"] / b["task_time_s"], 2)
            if b["task_time_s"]
            else None
        )
        # Floor classification: if the summed task time is small at
        # BOTH core counts (under ~2x the wall at the low count — i.e.
        # there was never enough parallel work to keep 8 cores busy,
        # let alone 32), the query's wall is machinery, not scan.
        floor = (
            "fixed-cost floor (machinery/driver)"
            if a["task_time_s"] < 2 * a["wall_s"]
            else "task-bound (scales with cores)"
        )
        report["per_query"][name] = {
            f"wall_s@{lo}": a["wall_s"],
            f"wall_s@{hi}": b["wall_s"],
            f"task_s@{lo}": a["task_time_s"],
            f"task_s@{hi}": b["task_time_s"],
            f"driver_gap_s@{lo}": a["driver_gap_s"],
            f"driver_gap_s@{hi}": b["driver_gap_s"],
            "n_jobs": b["n_jobs"],
            "wall_ratio_lo_over_hi": wall_ratio,
            "task_ratio_lo_over_hi": task_ratio,
            "verdict": floor,
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
