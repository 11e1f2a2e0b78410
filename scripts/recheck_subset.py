"""Re-run a subset of registered queries against their DuckDB oracles.

Same bare-session + hash methodology as driver_sim.py, restricted to
the names given on argv — for re-adjudicating queries that failed a
full sweep under host contention (streaming Python-worker spawn
timeouts look like query failures but are environment state).

    python scripts/recheck_subset.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from scripts.driver_sim import TABLES, value_hash


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = SparkSession.builder.master("local[8]").appName("recheck").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    out = {}
    for name in names:
        t0 = time.time()
        try:
            pdf = queries[name](spark, sf_dir).toPandas()
            s_hash = value_hash(
                list(pdf.columns), list(pdf.itertuples(index=False, name=None))
            )
            rec = {"rows": len(pdf), "sec": round(time.time() - t0, 2)}
            if name in oracles:
                ddf = con.sql(oracles[name]).fetchdf()
                d_hash = value_hash(
                    list(ddf.columns), list(ddf.itertuples(index=False, name=None))
                )
                rec["oracle_rows"] = len(ddf)
                rec["match"] = s_hash == d_hash and len(pdf) == len(ddf)
                if not rec["match"]:
                    failed.append(name)
            out[name] = rec
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:300]}
            failed.append(name)
        finally:
            from filesystemagent_spark.caching import release_tracked_caches

            release_tracked_caches()
    print(json.dumps(out, indent=1))
    print(f"RECHECK: {len(names)} queries, failed={failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
