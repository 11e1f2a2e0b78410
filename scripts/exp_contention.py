"""TxTable commit throughput under contention (round 6, directive #7).

Two measurements:

1. RAW CAS — N processes hammer the link(2) CAS loop directly (no
   Spark, no data): how many metadata commits/sec does the protocol
   sustain, and how bad is the retry storm (retries per commit)?
   Run with and without jittered backoff to decide whether backoff
   belongs in the product.

2. REAL merge_into — one Spark session, N threads each merging
   disjoint-key batches into one shared table: sustained end-to-end
   commit throughput with the rebase fast-path live.

Usage: python scripts/exp_contention.py [n_writers] [commits_each]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cas_worker(manifest_dir: str, n_commits: int, backoff: bool, out: mp.Queue):
    """The _try_commit CAS skeleton: write temp manifest, link into
    place, retry on EEXIST against a re-read head."""
    import random

    retries = 0
    t0 = time.perf_counter()
    done = 0
    while done < n_commits:
        attempt = 0
        while True:
            names = os.listdir(manifest_dir)
            head = max(
                (int(n[1:11]) for n in names if n.startswith("v")), default=0
            )
            tmp = os.path.join(manifest_dir, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump({"version": head + 1, "files": []}, fh)
                fh.flush()
                os.fsync(fh.fileno())
            target = os.path.join(manifest_dir, f"v{head + 1:010d}.json")
            try:
                os.link(tmp, target)
                os.unlink(tmp)
                break
            except FileExistsError:
                os.unlink(tmp)
                retries += 1
                attempt += 1
                if backoff:
                    time.sleep(random.uniform(0, 0.002 * (2 ** min(attempt, 5))))
        done += 1
    out.put((done, retries, time.perf_counter() - t0))


def raw_cas(n_writers: int, commits_each: int, backoff: bool) -> dict:
    d = tempfile.mkdtemp(prefix="txcas-")
    try:
        q: mp.Queue = mp.Queue()
        procs = [
            mp.Process(target=_cas_worker, args=(d, commits_each, backoff, q))
            for _ in range(n_writers)
        ]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        wall = time.perf_counter() - t0
        results = [q.get() for _ in range(n_writers)]
        total = sum(r[0] for r in results)
        retries = sum(r[1] for r in results)
        # every version must be unique and contiguous
        versions = sorted(
            int(n[1:11]) for n in os.listdir(d) if n.startswith("v")
        )
        assert versions == list(range(1, total + 1)), "version gap/dup!"
        return {
            "commits": total,
            "wall_s": round(wall, 3),
            "commits_per_s": round(total / wall, 1),
            "retries": retries,
            "retries_per_commit": round(retries / total, 2),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def real_merge(n_writers: int, commits_each: int) -> dict:
    import threading

    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import TxTable

    spark = get_spark()
    d = tempfile.mkdtemp(prefix="txmerge-")
    path = os.path.join(d, "tbl")
    try:
        t0_df = spark.range(0, 1).selectExpr("id - 1 AS k", "id AS v")
        TxTable(path).init(t0_df)
        errs: list[Exception] = []
        infos: list[dict] = []
        lock = threading.Lock()

        def writer(wid: int):
            t = TxTable(path)
            try:
                for i in range(commits_each):
                    # disjoint key spaces: the rebase fast-path case
                    batch = spark.range(0, 50).selectExpr(
                        f"id + {wid * 1_000_000 + i * 1000} AS k", "id AS v"
                    )
                    t.merge_into(batch, ["k"], max_retries=50)
                    with lock:
                        infos.append(dict(t.last_merge_info))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
        ]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        if errs:
            raise errs[0]
        t = TxTable(path)
        v = t.latest_version()
        n = t.read(spark).count()
        expected = 1 + n_writers * commits_each * 50
        assert n == expected, f"row loss: {n} != {expected}"
        rebased = sum(1 for i in infos if i.get("rebased"))
        return {
            "commits": len(infos),
            "final_version": v,
            "wall_s": round(wall, 3),
            "commits_per_s": round(len(infos) / wall, 2),
            "rebased": rebased,
            "rows_ok": True,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def maintenance_vs_dml(
    n_writers: int,
    commits_each: int,
    maintenance_interval_s: float = 1.0,
    max_retries: int = 100,
) -> dict:
    """Round-8 measurement (verdict item 6): bin-pack compaction and
    tombstone materialization running AGAINST concurrent
    merge_into/delete_keys writers on one shared table — how often
    does maintenance force DML rebases, what aborts, and do the
    change feeds stay gap-free?

    ``maintenance_interval_s`` is the knob that matters: a compaction
    rewrites (potentially) every file, so a concurrent merge can never
    take the rebase fast-path against it and must replan in full —
    and a ZERO-pause maintenance loop can commit faster than a writer
    replans, starving DML into `CommitConflict` aborts (measured
    below; the livelock regime). Paced maintenance (the deployment
    shape — compaction is periodic, not continuous) lets every writer
    through. Writers COUNT aborts instead of failing, so the
    starvation regime is measurable.

    Invariants checked at every pacing (and pinned smaller in
    tests/test_txtable.py::test_maintenance_vs_dml_feed_consistency):
    - no lost commits: the final snapshot holds exactly the keys of
      the batches that reported success
    - feed gap-free: table_changes(1, head) resolves every version
      (maintenance versions are layout-only and feed-transparent)
    - replay convergence: reconstructing the table from the feed's
      images in version order equals the final snapshot exactly.
    """
    import threading

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import CommitConflict, TxTable

    spark = get_spark()
    d = tempfile.mkdtemp(prefix="txmaint-")
    path = os.path.join(d, "tbl")
    try:
        TxTable(path).init(
            spark.range(0, 2000).selectExpr("id AS k", "id AS v")
        )
        errs: list[Exception] = []
        infos: list[dict] = []
        merged_batches: list[int] = []   # base key of each landed merge
        deleted_batches: list[int] = []
        aborts = {"merge": 0, "delete": 0}
        maint = {"compacts": 0, "materializes": 0, "conflicts": 0}
        lock = threading.Lock()
        stop = threading.Event()

        def writer(wid: int):
            t = TxTable(path)
            try:
                for i in range(commits_each):
                    base = 10_000 + wid * 1_000_000 + i * 1000
                    try:
                        t.merge_into(
                            spark.range(0, 50).selectExpr(
                                f"id + {base} AS k", "id AS v"
                            ),
                            ["k"], max_retries=max_retries,
                            change_feed=True,
                        )
                    except CommitConflict:
                        with lock:
                            aborts["merge"] += 1
                        continue  # nothing to delete for this batch
                    with lock:
                        infos.append(dict(t.last_merge_info))
                        merged_batches.append(base)
                    # delete half of what this writer just merged —
                    # MoR tombstones for maintenance to materialize
                    try:
                        t.delete_keys(
                            spark.range(0, 25).selectExpr(
                                f"id + {base} AS k"
                            ),
                            ["k"], max_retries=max_retries, mode="mor",
                            change_feed=True,
                        )
                        with lock:
                            deleted_batches.append(base)
                    except CommitConflict:
                        with lock:
                            aborts["delete"] += 1
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def maintainer():
            t = TxTable(path)
            while not stop.is_set():
                try:
                    t.compact(spark, target_files=4, max_retries=20)
                    with lock:
                        maint["compacts"] += 1
                    t.materialize_tombstones(spark, max_retries=20)
                    with lock:
                        maint["materializes"] += 1
                except CommitConflict:
                    with lock:
                        maint["conflicts"] += 1
                stop.wait(maintenance_interval_s)

        threads = [
            threading.Thread(target=writer, args=(w,))
            for w in range(n_writers)
        ]
        mt = threading.Thread(target=maintainer)
        t0 = time.perf_counter()
        mt.start()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        stop.set()
        mt.join()
        wall = time.perf_counter() - t0
        if errs:
            raise errs[0]

        t = TxTable(path)
        head = t.latest_version()
        n = t.read(spark).count()
        expected = (
            2000
            + len(merged_batches) * 50
            - len(deleted_batches) * 25
        )
        assert n == expected, f"lost commits: {n} != {expected}"

        # feed gap-free + replay convergence: last image per key wins,
        # delete images drop the key
        feed = t.table_changes(spark, 1, to_version=head)
        pri = F.when(
            F.col("_change_type") == "update_preimage", F.lit(0)
        ).otherwise(F.lit(1))
        w = Window.partitionBy("k").orderBy(
            F.col("_commit_version").desc(), pri.desc()
        )
        replayed = (
            feed.withColumn("_rn", F.row_number().over(w))
            .filter(
                (F.col("_rn") == 1)
                & F.col("_change_type").isin("insert", "upsert")
            )
            .select("k", "v")
        )
        mismatch = (
            replayed.join(t.read(spark), ["k", "v"], "full_outer")
            .filter(F.col("k").isNull() | F.col("v").isNull())
            .count()
        )
        assert mismatch == 0, f"feed replay diverges on {mismatch} rows"

        dml_commits = len(merged_batches) + len(deleted_batches)
        rebased = sum(1 for i in infos if i.get("rebased"))
        return {
            "maintenance_interval_s": maintenance_interval_s,
            "dml_commits": dml_commits,
            "dml_aborts": dict(aborts),
            "final_version": head,
            "wall_s": round(wall, 3),
            "commits_per_s": round(dml_commits / wall, 2) if wall else 0.0,
            "merges_rebased": rebased,
            "maint_compacts": maint["compacts"],
            "maint_materializes": maint["materializes"],
            "maint_conflicts": maint["conflicts"],
            "rows_ok": True,
            "feed_replay_ok": True,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    nw = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ce = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    print(f"RAW CAS, {nw} writers x {ce} commits, no backoff:")
    print(" ", raw_cas(nw, ce, backoff=False))
    print(f"RAW CAS, {nw} writers x {ce} commits, jittered backoff:")
    print(" ", raw_cas(nw, ce, backoff=True))
    print(f"REAL merge_into, {nw} threads x {max(3, ce // 10)} merges:")
    print(" ", real_merge(nw, max(3, ce // 10)))
    for interval in (2.0, 0.5, 0.0):
        print(f"MAINTENANCE vs DML, {nw} threads x {max(3, ce // 10)} "
              f"merge+delete pairs, compact/materialize every {interval}s:")
        print(" ", maintenance_vs_dml(nw, max(3, ce // 10),
                                      maintenance_interval_s=interval))
