"""Time every registered query at sf0.1 (one run each, bare-ish
session), print a sorted table. Straggler-hunting harness, not part of
the driver contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filesystemagent_spark.caching import release_tracked_caches
from filesystemagent_spark.queries import registry
from filesystemagent_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark()
    reg = registry()
    # warmup
    reg["pricing_summary"].fn(spark, SF).count()
    times = {}
    for name, q in reg.items():
        t0 = time.monotonic()
        try:
            n = q.fn(spark, SF).count()
            times[name] = (time.monotonic() - t0, n, "")
        except Exception as e:  # noqa: BLE001
            times[name] = (time.monotonic() - t0, -1, str(e).splitlines()[0][:80])
        release_tracked_caches()  # drain operator-internal persists
        print(f"DONE {name} {times[name][0]:.2f}s rows={times[name][1]}", flush=True)
    print("\n=== slowest 25 ===")
    for name, (t, n, err) in sorted(times.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{t:8.2f}s {n:>9} {name} {err}")
    errs = [n for n, v in times.items() if v[1] < 0]
    print(f"\nerrors: {errs}")
    print(f"total: {sum(v[0] for v in times.values()):.1f}s")


if __name__ == "__main__":
    main()
