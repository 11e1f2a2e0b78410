"""probe_cap crossover measurement (round 10, verdict item 5).

`minhash_dedup_against_stored_index` picks a pruning rung by footprint
size: an exact (band, band_hash) IN-list DNF below `probe_cap` keys, a
per-band hash-range DNF above (round 10 — previously a FULL index
read, an index-sized scan any large batch silently paid). The in-list
predicate's manifest-stats evaluation cost grows linearly with the
footprint (every file checks membership against the key lists) while
its file-skip advantage over the range rung shrinks as the footprint
covers more of the hash space — so somewhere there is a crossover, and
probe_cap should sit at it instead of being a guess.

This measures it: build an UNCAPPED stored band index over the sf0.1
documents corpus staged clustered on (band, band_hash), then for
batches of increasing footprint measure, for each rung —
  inlist : the exact DNF ([band = b AND band_hash IN (...)] per band)
  range  : the per-band BETWEEN DNF (≤ bands conjunctions)
  full   : no predicate
— the driver-side read-resolution time (manifest stats evaluation),
the files actually scanned, and the wall time of counting the read.

Run: python scripts/exp_probe_cap.py [sf_dir] [n_files]
Output: one JSON line per (footprint, rung) + a summary table; paste
into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.dedup import (
        _banded_keys,
        _shingled_docs,
        minhash_band_index,
    )
    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import TxTable

    spark = get_spark()
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    n_docs = docs.count()
    kw = dict(shingle_n=3, num_hashes=64, bands=16, seed=42)

    stage = tempfile.mkdtemp(prefix="probe_cap_")
    path = os.path.join(stage, "bandidx")
    t = TxTable(path)
    t0 = time.monotonic()
    t.init(
        minhash_band_index(docs, "doc_id", "text", max_bucket=None, **kw)
        .repartitionByRange(n_files, "band", "band_hash")
    )
    total_files = len(t.read(spark).inputFiles())
    print(
        f"# index over {n_docs} docs: {total_files} files, "
        f"built in {time.monotonic() - t0:.1f}s",
        flush=True,
    )

    rows = []
    # footprint ≈ batch_docs × bands distinct keys (sf0.1 = 5000 docs,
    # so the ladder tops out at the full corpus ≈ 80k keys)
    for batch_docs in (64, 320, 640, 3200, n_docs):
        batch = docs.orderBy("doc_id").limit(batch_docs)
        banded = _banded_keys(
            _shingled_docs(batch, "doc_id", "text", kw["shingle_n"]),
            num_hashes=kw["num_hashes"], bands=kw["bands"],
            seed=kw["seed"], base="xxhash64", band_key="hash",
            max_bucket=1000,
        ).select("band", "band_hash").distinct().cache()
        fp = banded.groupBy("band").agg(
            F.collect_set("band_hash").alias("hs"),
            F.min("band_hash").alias("lo"),
            F.max("band_hash").alias("hi"),
        ).collect()
        banded.unpersist()
        n_keys = sum(len(r["hs"]) for r in fp)

        rungs = {
            "inlist": [
                [("band", "=", r["band"]), ("band_hash", "in", sorted(r["hs"]))]
                for r in sorted(fp, key=lambda r: r["band"])
            ],
            "range": [
                [
                    ("band", "=", r["band"]),
                    ("band_hash", ">=", r["lo"]),
                    ("band_hash", "<=", r["hi"]),
                ]
                for r in sorted(fp, key=lambda r: r["band"])
            ],
            "full": None,
        }
        for rung, where in rungs.items():
            t0 = time.monotonic()
            df = t.read(spark, where=where)
            resolve_s = time.monotonic() - t0
            files = len(df.inputFiles())
            t0 = time.monotonic()
            n_rows = df.count()
            scan_s = time.monotonic() - t0
            rec = {
                "footprint_keys": n_keys, "rung": rung,
                "resolve_sec": round(resolve_s, 3),
                "files_read": files, "total_files": total_files,
                "scan_sec": round(scan_s, 3), "rows": n_rows,
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    print("\n# footprint_keys | rung   | resolve_s | files | scan_s")
    for r in rows:
        print(
            f"# {r['footprint_keys']:>14} | {r['rung']:<6} |"
            f" {r['resolve_sec']:>9} | {r['files_read']:>3}/{r['total_files']}"
            f" | {r['scan_sec']}"
        )


if __name__ == "__main__":
    main()
