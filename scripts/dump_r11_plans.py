"""Dump `.explain("formatted")` for every bench headliner into
plans/r11/<query>_<tag>.txt (tag = before|after, argv[1]).

    python scripts/dump_r11_plans.py before [names...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filesystemagent_spark.caching import release_tracked_caches  # noqa: E402
from filesystemagent_spark.queries import registry  # noqa: E402
from filesystemagent_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-r11-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, q in registry().items():
        if only:
            if name not in only:
                continue
        elif not q.headline:
            continue
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        release_tracked_caches()
        print(name)


if __name__ == "__main__":
    main()
