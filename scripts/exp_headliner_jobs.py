"""Per-headliner job-count + wall-time profile (round 10 optimization).

For each bench headliner: one warm run, then one measured run inside a
job group — wall seconds and the number of Spark JOBS the query
launches. Lifecycle queries (TxTable DML, streaming drains) run many
jobs whose fixed scheduling cost dominates at bench scale and whose
extra data passes dominate at 100 TB; the job count is the cheapest
proxy for "how many passes does this operator make".

    python scripts/exp_headliner_jobs.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filesystemagent_spark.caching import release_tracked_caches  # noqa: E402
from filesystemagent_spark.queries import registry  # noqa: E402
from filesystemagent_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("headliner-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n, q in sorted(registry().items()) if q.headline]
    qs = registry()
    out = {}
    for name in names:
        qs[name].fn(spark, sf_dir).count()  # warm
        release_tracked_caches()
        group = f"prof_{name}_{uuid.uuid4().hex[:6]}"
        spark.sparkContext.setJobGroup(group, name)
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        qs[name].fn(spark, sf_dir).count()
        dt = time.time() - t0
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
        spark.sparkContext.setJobGroup(None, None)
        out[name] = {"sec": round(dt, 3), "n_jobs": len(jobs)}
        release_tracked_caches()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
