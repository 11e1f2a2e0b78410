"""Event-log profile of the bench headliners (round 10 optimization).

Runs each headliner once warm + once measured with the Spark event log
enabled, then parses the log to split the measured run's wall time into
  - in-job time (union of job intervals),
  - driver gaps (time between jobs — commit protocol, pyarrow metadata,
    planning, py4j round-trips),
and per-stage executor metrics (run time, shuffle bytes, input bytes)
for the heaviest stages. This is the guide §1.1 empirical loop without
a live UI: the same numbers the Stages tab would show.

    python scripts/exp_headliner_profile.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filesystemagent_spark.caching import release_tracked_caches  # noqa: E402
from filesystemagent_spark.queries import registry  # noqa: E402
from filesystemagent_spark.session import get_spark  # noqa: E402

LOGDIR = "/tmp/r10_eventlog"


def _log_lines(path: str):
    """Yield event-log lines; handles both the single-file layout and
    the Spark 4 rolling layout (eventlog_v2_<app>/events_*)."""
    if not os.path.exists(path):
        rolled = os.path.join(os.path.dirname(path), f"eventlog_v2_{os.path.basename(path)}")
        if os.path.isdir(rolled):
            parts = sorted(
                f for f in os.listdir(rolled) if f.startswith("events_")
            )
            for p in parts:
                with open(os.path.join(rolled, p)) as fh:
                    yield from fh
            return
        raise FileNotFoundError(path)
    with open(path) as fh:
        yield from fh


def parse_eventlog(path: str, t0_ms: float, t1_ms: float) -> dict:
    """Jobs/stages that started inside [t0_ms, t1_ms]."""
    jobs = {}  # id -> [start, end]
    stages = {}  # id -> metrics
    if True:
        for line in _log_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                if t0_ms <= ev["Submission Time"] <= t1_ms:
                    jobs[ev["Job ID"]] = [ev["Submission Time"], None]
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]][1] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                if sub is None or not (t0_ms <= sub <= t1_ms):
                    continue
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in si.get("Accumulables", [])
                    if isinstance(a.get("Value"), int)
                }
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "wall_ms": (si.get("Completion Time") or sub) - sub,
                    "exec_run_ms": acc.get("internal.metrics.executorRunTime", 0),
                    "cpu_ms": acc.get("internal.metrics.executorCpuTime", 0) // 1_000_000,
                    "input_mb": round(acc.get("internal.metrics.input.bytesRead", 0) / 1e6, 1),
                    "sh_read_mb": round(
                        (
                            acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                            + acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                        )
                        / 1e6,
                        2,
                    ),
                    "sh_write_mb": round(
                        acc.get("internal.metrics.shuffle.write.bytesWritten", 0) / 1e6, 2
                    ),
                }
    done = [(s, e) for s, e in jobs.values() if e is not None]
    done.sort()
    injob = 0
    cur_s = cur_e = None
    for s, e in done:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                injob += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        injob += cur_e - cur_s
    return {
        "n_jobs": len(done),
        "injob_ms": injob,
        "stages": stages,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    shutil.rmtree(LOGDIR, ignore_errors=True)
    os.makedirs(LOGDIR, exist_ok=True)
    spark = get_spark(
        f"headliner-profile-{uuid.uuid4().hex[:6]}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOGDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n, q in sorted(registry().items()) if q.headline]
    if only:
        names = [n for n in names if n in only]
    qs = registry()
    out = {}
    for name in names:
        qs[name].fn(spark, sf_dir).count()  # warm
        release_tracked_caches()
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        qs[name].fn(spark, sf_dir).count()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        release_tracked_caches()
        out[name] = {"wall_s": round(t1 - t0, 3), "t0_ms": t0 * 1000, "t1_ms": t1 * 1000}

    app_id = spark.sparkContext.applicationId
    spark.stop()
    log = os.path.join(LOGDIR, app_id)
    for name, rec in out.items():
        prof = parse_eventlog(log, rec.pop("t0_ms"), rec.pop("t1_ms"))
        rec["n_jobs"] = prof["n_jobs"]
        rec["injob_s"] = round(prof["injob_ms"] / 1000, 3)
        rec["driver_gap_s"] = round(rec["wall_s"] - rec["injob_s"], 3)
        top = sorted(
            prof["stages"].items(), key=lambda kv: -kv[1]["wall_ms"]
        )[:8]
        rec["top_stages"] = [
            {"id": sid, **m} for sid, m in top if m["wall_ms"] >= 20
        ]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
