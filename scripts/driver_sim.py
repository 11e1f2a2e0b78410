"""Simulate the driver's verify loop against __spark_entry__.

Builds a BARE SparkSession (none of the engine's session defaults, as
the driver would), runs entry() as smoke, then every queries() entry
at the given SF, comparing against oracle_sql() via DuckDB with
order-insensitive value hashing. Usage:

    python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.oracle_utils import canon_rows

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(columns, rows) -> str:
    h = hashlib.sha256()
    for row in canon_rows(columns, rows):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows in {time.time()-t0:.1f}s schema={edf.columns}")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    failed = []
    for name in sorted(queries):
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            pdf = sdf.toPandas()
            s_hash = value_hash(list(pdf.columns), list(pdf.itertuples(index=False, name=None)))
            dt = time.time() - t0
            if name in oracles:
                ddf = con.sql(oracles[name]).fetchdf()
                d_hash = value_hash(list(ddf.columns), list(ddf.itertuples(index=False, name=None)))
                match = s_hash == d_hash and len(pdf) == len(ddf)
                results[name] = {
                    "rows": len(pdf), "oracle_rows": len(ddf),
                    "match": match, "sec": round(dt, 2),
                }
                if not match:
                    failed.append(name)
            else:
                results[name] = {"rows": len(pdf), "match": None, "sec": round(dt, 2)}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:200]}
            failed.append(name)
        finally:
            # Operator-internal persisted sketches (bands, buckets,
            # inverted indexes, edge lists) are registered centrally;
            # drain them between queries so a 163-query session doesn't
            # accumulate MEMORY_AND_DISK entries.
            from filesystemagent_spark.caching import release_tracked_caches

            release_tracked_caches()
    print(json.dumps(results, indent=1))
    n_oracle = sum(1 for r in results.values() if r.get("match") is True)
    # a 0-row "match" is vacuous — it compares two empty sets and
    # proves nothing about the operator; surface those loudly.
    vacuous = sorted(n for n, r in results.items() if r.get("rows") == 0)
    print(
        f"SUMMARY: {len(queries)} queries, {n_oracle} oracle-matched, "
        f"failed={failed}, zero-row={vacuous}"
    )
    return 1 if failed or vacuous else 0


if __name__ == "__main__":
    raise SystemExit(main())
