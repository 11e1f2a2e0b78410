"""Full-scan planning cost experiment (round 6, SCALE.md).

Round 5 bounded POINT-READ planning via stats segments + envelope
pruning; this measures the remaining gap the round-5 verdict named:
`read()` with no predicate materialized the complete surviving-file
list on the driver and shipped it through py4j as
`spark.read.parquet(*files)` — O(files) driver work per full scan.

Round 6's `_plan_scan_paths` groups fully-live staging DIRECTORIES
(proved live by the `dirs_created` census vs per-segment referenced
counts, both in the manifest JSON) and hands Spark one path per dir,
so file enumeration happens JVM-side via parallel partition
discovery.

Part 1 — driver-only planning at 10^6 files (synthetic manifest, no
FS): time + size of the planned path list, old vs new.

Part 2 — end-to-end DataFrame resolution at 100k REAL files (1000
commits x 100 files): time from path planning through
spark.read.parquet returning, old vs new, plus a count() equality
check.

Run: python scripts/exp_fullscan.py [--files-per-dir 100 --dirs 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filesystemagent_spark.sources.txtable import TxTable  # noqa: E402


def part1_synthetic(n_files: int = 1_000_000, per_dir: int = 1000) -> None:
    print(f"== part 1: driver-only planning, {n_files:,} synthetic files ==")
    n_dirs = n_files // per_dir
    seg_rows = 512
    t = TxTable("/tmp/exp_fullscan_synth")
    # synthetic format-2 manifest: segments of 512 files with per-dir
    # referenced counts, census marking every dir fully live
    files = [
        f"/tmp/exp_fullscan_synth/data/d{di:06d}/part-{fi:04d}.parquet"
        for di in range(n_dirs)
        for fi in range(per_dir)
    ]
    census = {
        f"/tmp/exp_fullscan_synth/data/d{di:06d}": per_dir
        for di in range(n_dirs)
    }
    segments = []
    for i in range(0, n_files, seg_rows):
        chunk = files[i : i + seg_rows]
        dirs: dict[str, int] = {}
        for f in chunk:
            d = os.path.dirname(f)
            dirs[d] = dirs.get(d, 0) + 1
        segments.append(
            {"path": f"/nonexistent/seg{i}.parquet", "n_files": len(chunk),
             "stats": {}, "dirs": dirs}
        )
    m = {"version": 1, "schema_ddl": "id bigint", "committed_at": 0.0,
         "app": {}, "segments": segments, "n_files": n_files,
         "dirs_created": census}
    print(f"manifest JSON: {len(json.dumps(m)) / 1e6:.1f} MB "
          f"({len(segments)} segment descriptors, {n_dirs} dirs)")

    # OLD path: _manifest_files would open every segment parquet; the
    # synthetic segments aren't real files, so time the equivalent
    # in-memory enumeration (a LOWER bound on the old cost — real
    # segment opens add 196+ parquet reads on top).
    t0 = time.perf_counter()
    old_paths = list(files)
    payload_old = sum(len(p) for p in old_paths)
    t_old = time.perf_counter() - t0
    print(f"old: {len(old_paths):,} paths, py4j payload "
          f"{payload_old / 1e6:.1f} MB, list-build {t_old * 1e3:.0f} ms "
          f"(+ {len(segments)} segment parquet opens in reality)")

    t0 = time.perf_counter()
    new_paths = t._plan_scan_paths(m)
    t_new = time.perf_counter() - t0
    payload_new = sum(len(p) for p in new_paths)
    print(f"new: {len(new_paths):,} paths, py4j payload "
          f"{payload_new / 1e3:.1f} KB, planning {t_new * 1e3:.0f} ms, "
          f"zero segment opens")


def part2_real(n_dirs: int = 1000, per_dir: int = 100) -> None:
    n_files = n_dirs * per_dir
    print(f"\n== part 2: end-to-end resolution, {n_files:,} real files ==")
    import pyarrow as pa
    import pyarrow.parquet as pq

    from filesystemagent_spark.sources.txtable import _collect_file_stats

    root = "/tmp/exp_fullscan_real"
    shutil.rmtree(root, ignore_errors=True)
    t = TxTable(root)
    os.makedirs(t.data_dir)
    ddl = "id bigint"
    build0 = time.perf_counter()
    acc_files: list[str] = []
    acc_stats: dict[str, dict] = {}
    for di in range(n_dirs):
        d = os.path.join(t.data_dir, f"d{di:06d}")
        os.makedirs(d)
        fs = []
        for fi in range(per_dir):
            p = os.path.join(d, f"part-{fi:04d}.parquet")
            pq.write_table(
                pa.table({"id": [di * per_dir + fi]}), p,
                write_statistics=False, compression="none",
            )
            fs.append(p)
        acc_files += fs
        acc_stats.update(_collect_file_stats(fs))
        # append commit: the snapshot is ALL files so far (stats passed
        # through so footers are read once, like merge's carried files)
        t._try_commit(
            di + 1, list(acc_files), ddl, stats=dict(acc_stats),
            new_dirs=[d],
        )
        if (di + 1) % 200 == 0:
            print(f"  built {di + 1}/{n_dirs} commits "
                  f"({time.perf_counter() - build0:.0f}s)")
    print(f"table built in {time.perf_counter() - build0:.0f}s")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    m = t._read_manifest(t.latest_version())

    # OLD: full file enumeration -> py4j varargs
    t0 = time.perf_counter()
    files = t._manifest_files(m)
    t_enum = time.perf_counter() - t0
    t0 = time.perf_counter()
    df_old = spark.read.schema(ddl).parquet(*files)
    t_resolve_old = time.perf_counter() - t0
    print(f"old: enumerate {len(files):,} files {t_enum * 1e3:.0f} ms, "
          f"resolve {t_resolve_old:.2f} s "
          f"(payload {sum(len(p) for p in files) / 1e6:.1f} MB)")

    # NEW: dir-grouped
    t0 = time.perf_counter()
    paths = t._plan_scan_paths(m)
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    df_new = spark.read.schema(ddl).parquet(*paths)
    t_resolve_new = time.perf_counter() - t0
    print(f"new: plan {len(paths):,} dir paths {t_plan * 1e3:.0f} ms, "
          f"resolve {t_resolve_new:.2f} s "
          f"(payload {sum(len(p) for p in paths) / 1e3:.1f} KB)")

    c_old, c_new = df_old.count(), df_new.count()
    print(f"count equality: old={c_old:,} new={c_new:,} "
          f"{'OK' if c_old == c_new == n_files else 'MISMATCH'}")
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree("/tmp/exp_fullscan_synth", ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", type=int, default=1000)
    ap.add_argument("--files-per-dir", type=int, default=100)
    args = ap.parse_args()
    part1_synthetic()
    part2_real(args.dirs, args.files_per_dir)
